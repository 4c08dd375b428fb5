"""Headway estimation: average gap between vehicles' first appearance
within a route/hour.

Parity: ``kpi_headway_hourly``
(/root/reference/src/optimization/kpi_views.sql:29-57):
MIN(observed_at) per (route, hour, vehicle) → LAG over first-seen
ordered within (route, hour) → AVG FILTER (gap BETWEEN 0.5 AND 60 min).

Scale: the first-seen aggregate shuffles on (route, hour, vehicle); the
window then runs per (route, hour) — a prefix of the same key, so AQE
reuses the partitioning without a second full shuffle. Gap arithmetic is
done in integer microseconds (unix_micros) so Spark and the oracle
produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.time import hour_trunc


def headway_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_seen = (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("route_id"),
            hour_trunc("ts").alias("hour_ts"),
            F.col("user_id").alias("vehicle_id"),
        )
        .agg(F.min("ts").alias("first_seen"))
    )
    w = Window.partitionBy("route_id", "hour_ts").orderBy("first_seen")
    gaps = first_seen.withColumn(
        "headway_min",
        (
            F.unix_micros("first_seen")
            - F.unix_micros(F.lag("first_seen").over(w))
        )
        / F.lit(60_000_000.0),
    )
    valid = F.when(
        F.col("headway_min").between(0.5, 60.0), F.col("headway_min")
    )
    # decimal accumulation: order-independent across partitionings and
    # engines (see functions/portable.py::davg)
    from ..functions.portable import pround

    return gaps.groupBy("route_id", "hour_ts").agg(
        pround(
            F.sum(valid.cast("decimal(28,6)")).cast("double")
            / F.count(valid),
            4,
        ).alias("avg_headway_min")
    )


QUERIES = {"headway_hourly": headway_hourly}

SQL_HEADWAY = """
    SELECT route_id, hour_ts,
           floor(((sum((headway_min)::DECIMAL(28,6)) FILTER (
                     WHERE headway_min BETWEEN 0.5 AND 60
                   ))::DOUBLE
                  / count(headway_min) FILTER (
                     WHERE headway_min BETWEEN 0.5 AND 60
                  )) * 10000.0 + 0.5) / 10000.0 AS avg_headway_min
    FROM (
      SELECT route_id, hour_ts, first_seen,
             (epoch_us(first_seen) - epoch_us(LAG(first_seen) OVER (
                PARTITION BY route_id, hour_ts ORDER BY first_seen
             ))) / 60000000.0 AS headway_min
      FROM (
        SELECT event_type AS route_id,
               date_trunc('hour', ts) AS hour_ts,
               user_id AS vehicle_id,
               MIN(ts) AS first_seen
        FROM events
        WHERE event_type IS NOT NULL
        GROUP BY event_type, date_trunc('hour', ts), user_id
      ) vehicle_first_seen
    ) ordered
    GROUP BY route_id, hour_ts
"""

ORACLES = {"headway_hourly": SQL_HEADWAY}
