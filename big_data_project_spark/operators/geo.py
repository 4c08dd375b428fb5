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


def routes_geo_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-route nested stop lists in the exact item shape of the
    reference's ``routes_geo_latest.json``
    (export_routes_geo.py:26-66: a DISTINCT route→stop flat cut LIMIT
    1000, grouped into {route_id, route_short_name, route_long_name,
    stops: [{stop_id, stop_name, lat, lon}]}). The nesting happens in
    Spark (collect_list of a struct); the exporter only serializes.

    Routes = suppliers, stops = the stop_route_mapping part keys, and
    stop points reuse spatial.py's deterministic md5 synthesis — same
    domain mapping as the registry's spatial family."""
    from .spatial import LAT0, LAT_SPAN, LON0, LON_SPAN, _hash_frac
    from .tpch import stop_route_mapping

    from ..functions.portable import pround

    m = stop_route_mapping(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("route_id"),
        F.col("s_name").alias("route_short_name"),
        F.concat_ws(
            " - ",
            F.col("s_name"),
            F.concat(F.lit("Nation "), F.col("s_nationkey").cast("string")),
        ).alias("route_long_name"),
    )
    lat = F.lit(LAT0) + _hash_frac("slat", F.col("stop_id")) * F.lit(LAT_SPAN)
    lon = F.lit(LON0) + _hash_frac("slon", F.col("stop_id")) * F.lit(LON_SPAN)
    # The reference bounds the flat cut (LIMIT 1000, ordered by route)
    # BEFORE grouping — same here, so the export stays driver-sized at
    # any SF.
    flat = (
        m.select(
            "route_id",
            "stop_id",
            F.concat(
                F.lit("Stop "), F.col("stop_id").cast("string")
            ).alias("stop_name"),
            pround(lat, 6).alias("lat"),
            pround(lon, 6).alias("lon"),
        )
        .orderBy("route_id", "stop_id")
        .limit(1000)
    )
    return (
        flat.join(F.broadcast(supp), "route_id")
        .groupBy("route_id", "route_short_name", "route_long_name")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct("stop_id", "stop_name", "lat", "lon")
                )
            ).alias("stops")
        )
        .orderBy("route_id")
    )


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
