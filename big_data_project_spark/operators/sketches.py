"""Sketch operators: approximate distinct counts and quantiles with
their exact counterparts side by side.

At 100 TB a COUNT(DISTINCT) is a two-phase exact aggregate and a
percentile needs a full sort; the sketch forms (HyperLogLog++ via
approx_count_distinct, Greenwald-Khanna via percentile_approx) are
one-pass, mergeable, and bounded-memory — the right default for
monitoring surfaces like the reference's KPI views, with the exact
operators kept for reconciliation.

Entries are *rows-only* (sketch estimates are engine-specific by
nature); the unit tests bound the relative error against the exact
values instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

HLL_RSD = 0.05  # target relative standard deviation for HLL


def route_cardinality_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vs HLL distinct vehicles per route, with the estimate's
    relative error."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    out = ev.groupBy(F.col("event_type").alias("route_id")).agg(
        F.countDistinct("user_id").alias("exact_vehicles"),
        F.approx_count_distinct("user_id", rsd=HLL_RSD).alias(
            "approx_vehicles"
        ),
    )
    return out.select(
        "route_id",
        "exact_vehicles",
        "approx_vehicles",
        F.when(
            F.col("exact_vehicles") > 0,
            F.round(
                F.abs(F.col("approx_vehicles") - F.col("exact_vehicles"))
                / F.col("exact_vehicles"),
                4,
            ),
        ).alias("rel_error"),  # NULL (not NaN) when a group has no ids
    )


def delay_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median vs percentile_approx sketch of per-route delay."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    return ev.groupBy(F.col("event_type").alias("route_id")).agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("exact_p50"),
        F.round(F.percentile_approx("value", 0.5, 10000), 4).alias(
            "approx_p50"
        ),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("exact_p95"),
        F.round(F.percentile_approx("value", 0.95, 10000), 4).alias(
            "approx_p95"
        ),
    )


QUERIES = {
    "route_cardinality_sketch": route_cardinality_sketch,
    "delay_quantile_sketch": delay_quantile_sketch,
}

ORACLES: dict[str, str] = {}  # rows-only: sketch estimates are engine-specific
