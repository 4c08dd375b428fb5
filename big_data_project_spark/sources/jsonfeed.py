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
from ..functions.portable import pround
from ..functions.portable import sql_pround as _sql_pround

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


def props_value_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-integrity audit: per route, the Pearson correlation between
    the payload metric (props.k) and the typed value column, plus both
    means — the check that catches a producer whose JSON payload and
    typed column drift apart (schema skew, unit change, stale enricher).
    NULL correlation when either side is constant.

    Determinism: the five moment sums are decimal-exact folds over
    values both engines extract with the same JSON path; corr is one
    fixed double expression (same pattern as trend.delay_headway_corr).

    Scale: one shuffle — the per-route aggregate; JSON extraction is
    map-side."""
    from ..functions.portable import dsum_exact

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )
    x = F.get_json_object("props", "$.k").cast("double")
    base = ev.select(
        F.col("event_type").alias("route_id"),
        x.alias("x"),
        F.col("value").alias("y"),
    ).filter(F.col("x").isNotNull())
    agg = base.groupBy("route_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum_exact(F.col("x")).alias("sx"),
        dsum_exact(F.col("y")).alias("sy"),
        dsum_exact(F.col("x") * F.col("x")).alias("sxx"),
        dsum_exact(F.col("y") * F.col("y")).alias("syy"),
        dsum_exact(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n_events")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_n = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = n * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when(
        (varx_n > 0) & (vary_n > 0), cov_n / F.sqrt(varx_n * vary_n)
    )
    return agg.select(
        "route_id",
        "n_events",
        pround(F.col("sx") / n, 4).alias("mean_k"),
        pround(F.col("sy") / n, 4).alias("mean_value"),
        pround(corr, 6).alias("k_value_corr"),
    ).orderBy("route_id")


QUERIES["props_value_consistency"] = props_value_consistency

ORACLES["props_value_consistency"] = f"""
    WITH b AS (
      SELECT event_type AS route_id,
             CAST(json_extract_string(props, '$.k') AS DOUBLE) AS x,
             value AS y
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
        AND CAST(json_extract_string(props, '$.k') AS DOUBLE)
            IS NOT NULL
    ),
    s AS (
      SELECT route_id, count(*) AS n_events,
             (sum((x)::DECIMAL(28,6)))::DOUBLE AS sx,
             (sum((y)::DECIMAL(28,6)))::DOUBLE AS sy,
             (sum((x * x)::DECIMAL(28,6)))::DOUBLE AS sxx,
             (sum((y * y)::DECIMAL(28,6)))::DOUBLE AS syy,
             (sum((x * y)::DECIMAL(28,6)))::DOUBLE AS sxy
      FROM b GROUP BY route_id
    )
    SELECT route_id, n_events,
           {{p_mean_k}} AS mean_k,
           {{p_mean_v}} AS mean_value,
           CASE WHEN n_events * sxx - sx * sx > 0
                 AND n_events * syy - sy * sy > 0 THEN
             {{p_corr}}
           END AS k_value_corr
    FROM s
    ORDER BY route_id
""".format(
    p_mean_k=_sql_pround("sx / n_events", 4),
    p_mean_v=_sql_pround("sy / n_events", 4),
    p_corr=_sql_pround(
        "(n_events * sxy - sx * sy) "
        "/ sqrt((n_events * sxx - sx * sx) "
        "* (n_events * syy - sy * sy))",
        6,
    ),
)
