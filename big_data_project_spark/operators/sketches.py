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
from ..functions.portable import pround, sql_pround

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


CM_DEPTH = 4  # count-min hash rows
CM_WIDTH = 16  # buckets per row — below vocab size so collisions occur
CM_TOPK = 20  # heavy hitters audited against the sketch


def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy-hitter audit over the corpus token
    stream: build a CM_DEPTH x CM_WIDTH sketch with md5-derived row
    hashes, then compare the sketch estimate against the exact count
    for the top-CM_TOPK tokens (overestimate >= 0 always; the width is
    deliberately below the vocabulary size so collisions — the thing
    the audit measures — actually occur).

    Unlike the HLL/GK entries above, the CM construction is fully
    deterministic (md5 row hashes), so this sketch IS oracle-checkable
    — DuckDB rebuilds the identical table. Scale shape: one map-side
    CM_DEPTH-way expand + a (d, bucket)-keyed aggregate whose output
    is DEPTH*WIDTH rows; the probe join is top-K-sized against the
    broadcast sketch. The token groupBy for the exact side is the same
    single corpus-scale shuffle token_frequencies pays.
    """
    from .corpus import _tokens
    from .dedup import _hash60

    def _rows(tok):
        return F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    F.pmod(
                        _hash60(F.concat(F.lit(f"{d}|"), tok)),
                        F.lit(CM_WIDTH),
                    ).alias("bucket"),
                )
                for d in range(CM_DEPTH)
            ]
        )

    toks = _tokens(spark, sf_dir).select("tok")
    cm = (
        toks.select(F.explode(_rows(F.col("tok"))).alias("rb"))
        .groupBy(F.col("rb.d").alias("d"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    topk = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), "tok")
        .limit(CM_TOPK)
    )
    probes = topk.select(
        "tok", "exact_n", F.explode(_rows(F.col("tok"))).alias("rb")
    )
    est = (
        probes.join(
            F.broadcast(cm),
            (F.col("rb.d") == F.col("d"))
            & (F.col("rb.bucket") == F.col("bucket")),
        )
        .groupBy("tok", "exact_n")
        .agg(F.min("c").alias("cm_est"))
    )
    return est.select(
        "tok",
        "exact_n",
        "cm_est",
        (F.col("cm_est") - F.col("exact_n")).alias("overestimate"),
        pround(
            (F.col("cm_est") - F.col("exact_n")) / F.col("exact_n"), 4
        ).alias("rel_error"),
    ).orderBy(F.desc("exact_n"), "tok")


QUERIES = {
    "route_cardinality_sketch": route_cardinality_sketch,
    "delay_quantile_sketch": delay_quantile_sketch,
    "countmin_heavy_hitters": countmin_heavy_hitters,
}


def _sql_cm_hash(d_expr: str, tok_expr: str) -> str:
    return (
        f"((('0x' || substr(md5({d_expr} || '|' || {tok_expr}), 1, 15)))"
        f"::BIGINT) % {CM_WIDTH}"
    )


_SQL_CM_DD = ", ".join(f"({d})" for d in range(CM_DEPTH))

# route_cardinality_sketch / delay_quantile_sketch stay rows-only
# (HLL/GK estimates are engine-specific); the count-min audit is
# deterministic and fully oracle-checked.
ORACLES: dict[str, str] = {
    "countmin_heavy_hitters": f"""
        WITH toks AS (
          SELECT tok
          FROM (SELECT unnest(string_split(
                  regexp_replace(lower(trim(text)),
                                 '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'),
                  ' ')) AS tok
                FROM documents) t
          WHERE tok != ''
        ),
        dd(d) AS (VALUES {_SQL_CM_DD}),
        cm AS (
          SELECT dd.d, {_sql_cm_hash('dd.d', 'tok')} AS bucket,
                 count(*) AS c
          FROM toks CROSS JOIN dd
          GROUP BY dd.d, {_sql_cm_hash('dd.d', 'tok')}
        ),
        topk AS (
          SELECT tok, count(*) AS exact_n FROM toks GROUP BY tok
          ORDER BY exact_n DESC, tok LIMIT {CM_TOPK}
        ),
        est AS (
          SELECT t.tok, t.exact_n, min(cm.c) AS cm_est
          FROM topk t CROSS JOIN dd
          JOIN cm ON cm.d = dd.d
                 AND cm.bucket = {_sql_cm_hash('dd.d', 't.tok')}
          GROUP BY t.tok, t.exact_n
        )
        SELECT tok, exact_n, cm_est,
               cm_est - exact_n AS overestimate,
               {sql_pround('(cm_est - exact_n) / exact_n', 4)} AS rel_error
        FROM est
        ORDER BY exact_n DESC, tok
    """,
}
