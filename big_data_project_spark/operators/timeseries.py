"""Time-series operators over the realtime feed: bounded as-of join,
rolling-window aggregates, per-group top-k.

The reference correlates feeds by hour-bucket equality (its ml dataset
joins weather_hourly ON the truncated hour — init-postgis.sql:222-246);
an as-of join is the general form a training pipeline needs when the
right side is irregular. Spark has no ASOF JOIN operator, so it is
composed from bounded bucket candidates (SURVEY §2's "custom operator as
a composition of existing DataFrame ops"); DuckDB *does* have ASOF JOIN,
and the oracle uses it — the two formulations agreeing IS the test.

Scale: the naive as-of (global sort or per-key union+carry-forward)
would shuffle the entire fact; the bounded form explodes each event to
ASOF_LOOKBACK_H candidate hour keys (map-side), equi-joins the
broadcast hourly dimension, and reduces with one max per event — no
global ordering anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import pround, sql_pround
from .hourly import SQL_DEMAND, SQL_WEATHER, weather_hourly

ASOF_LOOKBACK_H = 3
ROLLING_HOURS = 3
TOP_STOPS_K = 3


def asof_join_weather(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest weather observation at-or-before each event, per event.

    Lookback bound: strictly less than ASOF_LOOKBACK_H hours — the
    candidate hour keys are trunc(ts) - {0..H-1}h, so an observation
    exactly H hours old is out of reach, and the oracle's post-filter
    uses `<` to encode the same bound."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", F.col("event_type").alias("route_id")
    )
    wh = weather_hourly(spark, sf_dir)
    offsets = F.sequence(F.lit(0), F.lit(ASOF_LOOKBACK_H - 1))
    cand = ev.select(
        "event_id", "ts", "route_id", F.explode(offsets).alias("off")
    ).select(
        "event_id",
        "ts",
        "route_id",
        (
            F.date_trunc("hour", F.col("ts"))
            - F.make_interval(hours=F.col("off"))
        ).alias("hour_key"),
    )
    joined = cand.join(
        F.broadcast(wh), cand.hour_key == wh.hour_ts
    ).filter(F.col("hour_ts") <= F.col("ts"))
    w = Window.partitionBy("event_id").orderBy(F.desc("hour_ts"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "ts",
            "route_id",
            F.col("hour_ts").alias("weather_ts"),
            "temperature_c",
            "precipitation_mm",
        )
    )


def demand_rolling_3h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 3-hour demand per route (ROWS frame over the hourly
    rollup — the frame is tiny and already aggregated, so the window
    shuffles routes x hours rows only)."""
    from .hourly import demand_hourly

    d = demand_hourly(spark, sf_dir)
    w = (
        Window.partitionBy("route_id")
        .orderBy("hour_ts")
        .rowsBetween(-(ROLLING_HOURS - 1), Window.currentRow)
    )
    return d.select(
        "route_id",
        "hour_ts",
        "passengers",
        pround(
            F.sum(F.col("passengers").cast("decimal(28,6)"))
            .over(w)
            .cast("double"),
            2,
        ).alias("rolling_3h_passengers"),
        F.count(F.lit(1)).over(w).alias("rolling_n"),
    )


def top_stops_per_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K busiest stops per route by event count (per-group top-k:
    aggregate then rank inside each group; ties broken by stop id)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.col("event_type").alias("route_id"),
        F.col("user_id").alias("stop_id"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("route_id").orderBy(
        F.desc("n_events"), F.asc("stop_id")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_STOPS_K)
    )


QUERIES = {
    "asof_join_weather": asof_join_weather,
    "demand_rolling_3h": demand_rolling_3h,
    "top_stops_per_route": top_stops_per_route,
}

ORACLES = {
    # DuckDB's native ASOF JOIN is the oracle for the composed Spark
    # form; the lookback bound is applied as a post-filter on both sides
    # of the contract.
    "asof_join_weather": f"""
        WITH wh AS ({SQL_WEATHER})
        SELECT e.event_id, e.ts, e.event_type AS route_id,
               wh.hour_ts AS weather_ts,
               wh.temperature_c, wh.precipitation_mm
        FROM events e
        ASOF JOIN wh ON e.ts >= wh.hour_ts
        WHERE e.ts - wh.hour_ts < INTERVAL {ASOF_LOOKBACK_H} HOURS
    """,
    "demand_rolling_3h": f"""
        WITH d AS ({SQL_DEMAND})
        SELECT route_id, hour_ts, passengers,
               {sql_pround(
                   "(sum((passengers)::DECIMAL(28,6)) OVER w)::DOUBLE", 2)}
                 AS rolling_3h_passengers,
               count(*) OVER w AS rolling_n
        FROM d
        WINDOW w AS (PARTITION BY route_id ORDER BY hour_ts
                     ROWS BETWEEN {ROLLING_HOURS - 1} PRECEDING
                          AND CURRENT ROW)
    """,
    "top_stops_per_route": f"""
        SELECT route_id, stop_id, n_events, rnk
        FROM (
          SELECT route_id, stop_id, n_events,
                 row_number() OVER (
                   PARTITION BY route_id
                   ORDER BY n_events DESC, stop_id ASC
                 ) AS rnk
          FROM (
            SELECT event_type AS route_id, user_id AS stop_id,
                   count(*) AS n_events
            FROM events
            GROUP BY event_type, user_id
          ) c
        ) r
        WHERE rnk <= {TOP_STOPS_K}
    """,
}
