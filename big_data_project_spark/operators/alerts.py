"""Service-alerts feed analog — the reference's third realtime topic.

Parity targets:
- alerts publisher   /root/reference/src/gtfs-realtime-poller/poller.py:158-188
  (FeedMessage alert entities -> {alert_id, cause/effect -> alert_type,
  description} payloads)
- alerts ingestion   /root/reference/src/db-ingestion-service/ingestor.py:115-137
  (INSERT INTO service_alerts)
- table shape        /root/reference/initdb/init-postgis.sql:137-144
  (alert_id, alert_type, description, observed_at)

The synthetic feed has no live GTFS-RT endpoint, so alerts are DERIVED
deterministically from the events feed (SURVEY §1 mapping: event_type ≈
route_id, value ≈ delay metric, props.k ≈ weather index): an event is an
alert when its delay metric crosses the severe threshold or the weather
index crosses the storm threshold. The classification mirrors the
cause/effect -> alert_type folding the reference's ingestor performs.

Scale: the normalization is a pushed-down filter + map-side projection
over the feed (no shuffle); the hourly rollup is one window pass on
(route, hour) — the same single-shuffle shape as every other hourly
view; the KPI join joins two (route, hour)-grain relations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.time import hour_trunc
from .kpi import SQL_KPI_HOURLY, kpi_hourly

SEVERE_DELAY = 18.0
ALERT_DELAY = 12.0
STORM_K = 85


def _k_int() -> Column:
    return F.get_json_object("props", "$.k").cast("int")


def _alerts_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per alert-worthy event, classified and described."""
    ev = load_table(spark, sf_dir, "events")
    k = _k_int()
    atype = (
        F.when(F.col("value") >= SEVERE_DELAY, F.lit("severe_delay"))
        .when(F.col("value") >= ALERT_DELAY, F.lit("delay"))
        .otherwise(F.lit("weather"))
    )
    desc = F.concat(
        F.lit("route="),
        F.coalesce(F.col("event_type"), F.lit("none")),
        F.lit(" type="),
        atype,
        F.lit(" k="),
        F.coalesce(k, F.lit(-1)).cast("string"),
    )
    return ev.filter(
        (F.col("value") >= ALERT_DELAY) | (k >= STORM_K)
    ).select(
        F.col("event_id").alias("alert_id"),
        F.col("event_type").alias("route_id"),
        atype.alias("alert_type"),
        desc.alias("description"),
        F.col("ts").alias("observed_at"),
        hour_trunc("ts").alias("hour_ts"),
    )


def service_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized service_alerts rows (the reference's table shape)."""
    return _alerts_base(spark, sf_dir).select(
        "alert_id", "alert_type", "description", "observed_at"
    )


def alerts_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert count/severity + latest alert per route/hour (ties broken
    by alert_id so the 'latest' pick is deterministic on both engines).
    """
    base = _alerts_base(spark, sf_dir)
    grp = Window.partitionBy("route_id", "hour_ts")
    rank = grp.orderBy(F.desc("observed_at"), F.desc("alert_id"))
    return (
        base.withColumn("rn", F.row_number().over(rank))
        .withColumn("n_alerts", F.count(F.lit(1)).over(grp))
        .withColumn(
            "n_severe",
            F.sum(
                F.when(F.col("alert_type") == "severe_delay", 1).otherwise(0)
            ).over(grp),
        )
        .filter(F.col("rn") == 1)
        .select(
            "route_id",
            "hour_ts",
            "n_alerts",
            "n_severe",
            F.col("alert_id").alias("last_alert_id"),
            F.col("alert_type").alias("last_alert_type"),
        )
    )


def kpi_alerts_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kpi_hourly ⟕ alerts_hourly: the KPI row enriched with the alert
    pressure for the same route-hour (reads the materialized kpi frame
    from the shared rollup tier)."""
    kpi = kpi_hourly(spark, sf_dir).select(
        "route_id",
        "hour_ts",
        "predicted_passengers",
        "observed_passengers",
        "avg_delay_seconds",
    )
    al = alerts_hourly(spark, sf_dir).select(
        "route_id", "hour_ts", "n_alerts", "n_severe", "last_alert_type"
    )
    return kpi.join(al, ["route_id", "hour_ts"], "left").select(
        "route_id",
        "hour_ts",
        "predicted_passengers",
        "observed_passengers",
        "avg_delay_seconds",
        F.coalesce("n_alerts", F.lit(0)).alias("n_alerts"),
        F.coalesce("n_severe", F.lit(0)).alias("n_severe"),
        F.coalesce("last_alert_type", F.lit("none")).alias(
            "last_alert_type"
        ),
    )


def alerts_latest_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest alert per (route, alert_type) — the reference's
    ``DISTINCT ON ... ORDER BY created_at DESC`` idiom
    (kpi_views.sql:136) applied to the alerts feed; ties broken by
    alert_id for engine-deterministic picks."""
    base = _alerts_base(spark, sf_dir).filter(F.col("route_id").isNotNull())
    w = Window.partitionBy("route_id", "alert_type").orderBy(
        F.desc("observed_at"), F.desc("alert_id")
    )
    return (
        base.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "route_id", "alert_type", "alert_id", "observed_at", "description"
        )
    )


QUERIES = {
    "service_alerts": service_alerts,
    "alerts_hourly": alerts_hourly,
    "kpi_alerts_hourly": kpi_alerts_hourly,
    "alerts_latest_per_type": alerts_latest_per_type,
}

_SQL_ATYPE = f"""
    CASE WHEN value >= {SEVERE_DELAY} THEN 'severe_delay'
         WHEN value >= {ALERT_DELAY}  THEN 'delay'
         ELSE 'weather' END
"""

_SQL_K = "CAST(json_extract_string(props, '$.k') AS INT)"

_SQL_ALERTS_BASE = f"""
    SELECT event_id AS alert_id,
           event_type AS route_id,
           {_SQL_ATYPE} AS alert_type,
           'route=' || coalesce(event_type, 'none')
             || ' type=' || {_SQL_ATYPE}
             || ' k=' || CAST(coalesce({_SQL_K}, -1) AS VARCHAR)
             AS description,
           ts AS observed_at,
           date_trunc('hour', ts) AS hour_ts
    FROM events
    WHERE value >= {ALERT_DELAY} OR {_SQL_K} >= {STORM_K}
"""

_SQL_ALERTS_HOURLY = f"""
    SELECT route_id, hour_ts, n_alerts, n_severe,
           alert_id AS last_alert_id, alert_type AS last_alert_type
    FROM (
      SELECT *,
             row_number() OVER (
               PARTITION BY route_id, hour_ts
               ORDER BY observed_at DESC, alert_id DESC
             ) AS rn,
             count(*) OVER (
               PARTITION BY route_id, hour_ts
             ) AS n_alerts,
             CAST(sum(CASE WHEN alert_type = 'severe_delay' THEN 1 ELSE 0 END)
               OVER (PARTITION BY route_id, hour_ts) AS BIGINT) AS n_severe
      FROM ({_SQL_ALERTS_BASE}) a
    ) r WHERE rn = 1
"""

ORACLES = {
    "service_alerts": f"""
        SELECT alert_id, alert_type, description, observed_at
        FROM ({_SQL_ALERTS_BASE}) a
    """,
    "alerts_hourly": _SQL_ALERTS_HOURLY,
    "alerts_latest_per_type": f"""
        SELECT route_id, alert_type, alert_id, observed_at, description
        FROM (
          SELECT *,
                 row_number() OVER (
                   PARTITION BY route_id, alert_type
                   ORDER BY observed_at DESC, alert_id DESC
                 ) AS rn
          FROM ({_SQL_ALERTS_BASE}) a
          WHERE route_id IS NOT NULL
        ) r WHERE rn = 1
    """,
    "kpi_alerts_hourly": f"""
        SELECT k.route_id, k.hour_ts,
               k.predicted_passengers, k.observed_passengers,
               k.avg_delay_seconds,
               coalesce(a.n_alerts, 0) AS n_alerts,
               coalesce(a.n_severe, 0) AS n_severe,
               coalesce(a.last_alert_type, 'none') AS last_alert_type
        FROM ({SQL_KPI_HOURLY}) k
        LEFT JOIN ({_SQL_ALERTS_HOURLY}) a
          ON a.route_id = k.route_id AND a.hour_ts = k.hour_ts
    """,
}


def scd2_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension history over the alerts feed: per
    (route_id, alert_type) key, each alert version carries its validity
    interval [valid_from, valid_to) and an is_current flag — the
    lake-side slowly-changing-dimension build whose ``is_current``
    slice IS the reference's ``DISTINCT ON ... ORDER BY created_at
    DESC`` latest-row view (kpi_views.sql:136; alerts_latest_per_type
    here), but keeping the full history a point-in-time join can
    replay. valid_to is the NEXT version's valid_from (half-open
    intervals chain with no gaps); ties on observed_at are ordered by
    alert_id so version numbering is engine-deterministic.

    Scale: ONE shuffle on the dimension key feeds both window
    functions (row_number and lead share the same partitioning/order);
    at 100 TB of feed the history build is exactly this one exchange —
    the same shape the incremental foreachBatch upsert
    (plans/sinks.py::upsert_parquet) maintains per batch."""
    base = _alerts_base(spark, sf_dir).filter(F.col("route_id").isNotNull())
    w = Window.partitionBy("route_id", "alert_type").orderBy(
        "observed_at", "alert_id"
    )
    valid_to = F.lead("observed_at").over(w)
    return base.select(
        "route_id",
        "alert_type",
        "alert_id",
        F.row_number().over(w).alias("version_seq"),
        F.col("observed_at").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().cast("int").alias("is_current"),
    )


QUERIES["scd2_alerts"] = scd2_alerts

ORACLES["scd2_alerts"] = f"""
    SELECT route_id, alert_type, alert_id,
           (row_number() OVER w)::INT AS version_seq,
           observed_at AS valid_from,
           lead(observed_at) OVER w AS valid_to,
           (CASE WHEN lead(observed_at) OVER w IS NULL
                 THEN 1 ELSE 0 END)::INT AS is_current
    FROM ({_SQL_ALERTS_BASE}) a
    WHERE route_id IS NOT NULL
    WINDOW w AS (PARTITION BY route_id, alert_type
                 ORDER BY observed_at, alert_id)
"""
