"""Hourly rollup operators over the realtime feed (``events`` table).

Parity targets (reference views, re-expressed Spark-first):
- ``kpi_active_vehicles_hourly``  /root/reference/src/optimization/kpi_views.sql:19-26
- ``vehicle_hourly``              /root/reference/initdb/init-postgis.sql:205-211
- ``delay_hourly``                /root/reference/initdb/init-postgis.sql:196-203
- ``passenger_demand_hourly``     /root/reference/initdb/init-postgis.sql:187-194
- ``weather_hourly``              /root/reference/initdb/init-postgis.sql:213-220
- ``stop_base_demand`` init       /root/reference/initdb/init-postgis.sql:170-176

Feed mapping (documented in SURVEY.md §1): events.user_id ≈ vehicle/stop
id, events.event_type ≈ route_id, events.value ≈ delay-seconds /
passenger-count / weather metric, events.ts ≈ observed_at.

Scale: each rollup is ONE shuffle on its group key; partial (map-side)
aggregation comes free from Catalyst. COUNT(DISTINCT) expands to a
two-phase aggregate; at 100 TB swap in approx_count_distinct via config
if exactness is not required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import davg, dsum, pround, sql_davg, sql_dsum, sql_pround
from ..functions.time import hour_trunc


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def active_users_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT vehicle) per route/hour (kpi_active_vehicles_hourly)."""
    ev = _events(spark, sf_dir)
    return (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("route_id"),
            hour_trunc("ts").alias("hour_ts"),
        )
        .agg(F.countDistinct("user_id").alias("active_vehicles"))
    )


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw event count per route/hour (vehicle_hourly)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy(
        F.col("event_type").alias("route_id"),
        hour_trunc("ts").alias("hour_ts"),
    ).agg(F.count(F.lit(1)).alias("vehicle_events"))


def delay_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event count + average delay per route/hour (delay_hourly)."""
    ev = _events(spark, sf_dir)
    return (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("route_id"),
            hour_trunc("ts").alias("hour_ts"),
        )
        .agg(
            F.count(F.lit(1)).alias("trip_update_events"),
            davg("value", 4).alias("avg_delay_seconds"),
        )
    )


def demand_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passenger demand per route/hour: flow events keyed by stop joined
    through the distinct stop→route mapping, then summed
    (passenger_demand_hourly ⋈ stop_to_route)."""
    ev = _events(spark, sf_dir)
    mapping = (
        ev.select(
            F.col("user_id").alias("stop_id"),
            F.col("event_type").alias("route_id"),
        )
        .distinct()
    )
    flow = ev.select(
        F.col("user_id").alias("stop_id"),
        F.col("ts"),
        F.col("value").alias("estimated_passengers"),
    )
    return (
        flow.join(F.broadcast(mapping), "stop_id")
        .groupBy("route_id", hour_trunc("ts").alias("hour_ts"))
        .agg(dsum("estimated_passengers", 2).alias("passengers"))
    )


def weather_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly weather profile; the JSON props extraction mirrors the
    reference's REST-payload normalization (weather-job.py:53-68)."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("double")
    return ev.groupBy(hour_trunc("ts").alias("hour_ts")).agg(
        davg("value", 4).alias("temperature_c"),
        pround(
            F.sum(k.cast("decimal(28,6)")).cast("double")
            / F.count(k)
            / 10.0,
            4,
        ).alias("precipitation_mm"),
        F.round(F.max("value") / 10.0, 4).alias("wind_speed_mps"),
    )


def stop_base_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped per-key base weight: LEAST(50, GREATEST(5, cnt*3))."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_partkey").alias("stop_id")).agg(
        F.least(F.lit(50), F.greatest(F.lit(5), F.count(F.lit(1)) * 3))
        .cast("int")
        .alias("base_weight")
    )


QUERIES = {
    "active_users_hourly": active_users_hourly,
    "events_hourly": events_hourly,
    "delay_hourly": delay_hourly,
    "demand_hourly": demand_hourly,
    "weather_hourly": weather_hourly,
    "stop_base_demand": stop_base_demand,
}

# Shared CTE snippets so composite oracles (kpi.py) reuse the exact text.
SQL_DEMAND = f"""
    SELECT m.route_id,
           date_trunc('hour', f.ts) AS hour_ts,
           {sql_dsum('f.value', 2)} AS passengers
    FROM events f
    JOIN (SELECT DISTINCT user_id, event_type AS route_id FROM events) m
      ON m.user_id = f.user_id
    GROUP BY m.route_id, date_trunc('hour', f.ts)
"""

SQL_DELAY = f"""
    SELECT event_type AS route_id,
           date_trunc('hour', ts) AS hour_ts,
           count(*)               AS trip_update_events,
           {sql_davg('value', 4)} AS avg_delay_seconds
    FROM events
    WHERE event_type IS NOT NULL
    GROUP BY event_type, date_trunc('hour', ts)
"""

SQL_VEHICLE = """
    SELECT event_type AS route_id,
           date_trunc('hour', ts) AS hour_ts,
           count(*)               AS vehicle_events
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
"""

SQL_WEATHER = f"""
    SELECT date_trunc('hour', ts) AS hour_ts,
           {sql_davg('value', 4)} AS temperature_c,
           {sql_pround(
               "(sum((CAST(json_extract_string(props, '$.k') AS DOUBLE))::DECIMAL(28,6)))::DOUBLE"
               " / count(CAST(json_extract_string(props, '$.k') AS DOUBLE)) / 10.0",
               4,
           )}
               AS precipitation_mm,
           round(max(value) / 10.0, 4) AS wind_speed_mps
    FROM events
    GROUP BY date_trunc('hour', ts)
"""

SQL_ACTIVE = """
    SELECT event_type AS route_id,
           date_trunc('hour', ts)  AS hour_ts,
           count(DISTINCT user_id) AS active_vehicles
    FROM events
    WHERE event_type IS NOT NULL
    GROUP BY event_type, date_trunc('hour', ts)
"""

ORACLES = {
    "active_users_hourly": SQL_ACTIVE,
    "events_hourly": SQL_VEHICLE,
    "delay_hourly": SQL_DELAY,
    "demand_hourly": SQL_DEMAND,
    "weather_hourly": SQL_WEATHER,
    "stop_base_demand": """
        SELECT l_partkey AS stop_id,
               CAST(least(50, greatest(5, count(*) * 3)) AS INT) AS base_weight
        FROM lineitem
        GROUP BY l_partkey
    """,
}
