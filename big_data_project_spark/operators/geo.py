"""Geo-style nested export: group child entities per parent as an
ordered list, the shape of the reference's routes→stops GeoJSON export.

Parity: /root/reference/src/optimization/export_routes_geo.py:26-66
(routes joined through trips/stop_times to stops, then grouped into a
per-route stop list). Lists are emitted as '|'-joined sorted strings so
the oracle hash is stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def routes_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        )
        .groupBy("r_regionkey", "r_name")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_stops"),
            F.concat_ws(
                "|", F.sort_array(F.collect_list("n_name"))
            ).alias("stop_list"),
        )
    )


def supplier_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same nested-list shape at fact scale: suppliers grouped per nation
    with their customer-facing stats (join through lineitem)."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_nationkey", "n_name")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_suppliers"),
            F.concat_ws(
                "|", F.sort_array(F.collect_list("s_name"))
            ).alias("supplier_list"),
        )
    )


QUERIES = {"routes_geo": routes_geo, "supplier_geo": supplier_geo}

ORACLES = {
    "routes_geo": """
        SELECT r_regionkey, r_name,
               count(*)::int AS n_stops,
               string_agg(n_name, '|' ORDER BY n_name) AS stop_list
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_regionkey, r_name
    """,
    "supplier_geo": """
        SELECT n_nationkey, n_name,
               count(*)::int AS n_suppliers,
               string_agg(s_name, '|' ORDER BY s_name) AS supplier_list
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_nationkey, n_name
    """,
}
