"""JSON feed normalization: raw API/stream payloads -> typed rows.

Parity:
- weather: normalize_weather() in
  /root/reference/src/dag/weather-job.py:52-68 (open-meteo ``current``
  block -> observed_at/temperature_c/precipitation_mm/wind_speed_mps/
  weather_code).
- vehicle positions: the poller payloads consumed by
  /root/reference/src/db-ingestion-service/ingestor.py (vehicle_id,
  route_id, lat/lon, observed_at).

Spark-first: ``from_json`` with explicit schemas (JVM-side, codegen)
instead of per-record Python dict handling; the same expressions work
under readStream for the Kafka path.

``props_feed_normalize`` applies the identical pattern to the events
table's ``props`` JSON and is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

WEATHER_SCHEMA = (
    "current struct<time: string, temperature_2m: double, "
    "precipitation: double, wind_speed_10m: double, weather_code: long>"
)

VEHICLE_SCHEMA = (
    "vehicle struct<vehicle: struct<id: string>, "
    "trip: struct<trip_id: string, route_id: string>, "
    "position: struct<latitude: double, longitude: double>, "
    "timestamp: long>"
)


def normalize_weather(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """API JSON -> one typed weather observation per payload."""
    j = F.from_json(F.col(payload_col), WEATHER_SCHEMA)
    cur = j.getField("current")
    return raw.select(
        F.to_timestamp(cur.getField("time")).alias("observed_at"),
        cur.getField("temperature_2m").alias("temperature_c"),
        cur.getField("precipitation").alias("precipitation_mm"),
        cur.getField("wind_speed_10m").alias("wind_speed_mps"),
        cur.getField("weather_code").cast("string").alias("weather_code"),
    )


def normalize_vehicle_positions(
    raw: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """GTFS-RT-ish JSON -> typed vehicle position rows."""
    v = F.from_json(F.col(payload_col), VEHICLE_SCHEMA).getField("vehicle")
    return raw.select(
        v.getField("vehicle").getField("id").alias("vehicle_id"),
        v.getField("trip").getField("trip_id").alias("trip_id"),
        v.getField("trip").getField("route_id").alias("route_id"),
        v.getField("position").getField("latitude").alias("latitude"),
        v.getField("position").getField("longitude").alias("longitude"),
        F.timestamp_seconds(v.getField("timestamp")).alias("observed_at"),
    )


def props_feed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same normalization applied to events.props: typed metric +
    bucket classification per record."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    return ev.select(
        "event_id",
        F.col("ts").alias("observed_at"),
        F.col("event_type").alias("route_id"),
        k.alias("k_value"),
        (
            F.when(k >= 75, "high")
            .when(k >= 25, "mid")
            .otherwise("low")
        ).alias("k_bucket"),
    )


QUERIES = {"props_feed_normalize": props_feed_normalize}

ORACLES = {
    "props_feed_normalize": """
        SELECT event_id,
               ts AS observed_at,
               event_type AS route_id,
               CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_value,
               CASE WHEN CAST(json_extract_string(props, '$.k') AS DOUBLE)
                         >= 75 THEN 'high'
                    WHEN CAST(json_extract_string(props, '$.k') AS DOUBLE)
                         >= 25 THEN 'mid'
                    ELSE 'low' END AS k_bucket
        FROM events
    """,
}
