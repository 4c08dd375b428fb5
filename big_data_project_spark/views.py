"""Named-view parity: the reference's user interface is a set of
Postgres views (initdb/init-postgis.sql, src/optimization/kpi_views.sql)
queried by name. ``register_analytics_views`` exposes the same surface
as Spark SQL temp views, so `spark.sql("SELECT * FROM kpi_hourly ...")`
works exactly as it does against the reference database.

View name mapping (reference -> here):
  kpi_active_vehicles_hourly -> active_users_hourly
  vehicle_hourly             -> events_hourly
  delay_hourly               -> delay_hourly
  passenger_demand_hourly    -> demand_hourly
  weather_observations agg   -> weather_hourly
  kpi_headway_hourly         -> headway_hourly
  ml_dataset_hourly          -> ml_dataset_hourly
  kpi_hourly                 -> kpi_hourly
  route_suggestions_latest   -> suggestions_latest
  service_alerts table       -> service_alerts
  latest-alert DISTINCT ON   -> alerts_latest_per_type
  (+ alerts_hourly / kpi_alerts_hourly, the alert-enriched KPI row)
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .catalog import register_views
from .registry import QUERIES

ANALYTICS_VIEWS = (
    "active_users_hourly",
    "events_hourly",
    "delay_hourly",
    "demand_hourly",
    "weather_hourly",
    "headway_hourly",
    "ml_dataset_hourly",
    "kpi_hourly",
    "suggestions",
    "suggestions_latest",
    "peak_hours_summary",
    "service_alerts",
    "alerts_hourly",
    "alerts_latest_per_type",
    "kpi_alerts_hourly",
    # round-4 monitoring tier over the same rollups (the views an
    # operations dashboard would read next to kpi_hourly)
    "delay_anomaly_hours",
    "delay_cusum_changepoint",
    "headway_regularity",
    "delay_seasonal_profile",
    # round-4 product-analytics tier over the events stream (the
    # funnel/retention dashboard surface)
    "funnel_conversion",
    "retention_cohorts",
    "dau_rolling_wau",
    "event_transition_matrix",
    "interevent_gap_histogram",
    # cross-KPI diagnostic joining the two monitoring rollups
    "delay_headway_corr",
)


def register_analytics_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the base tables and every analytic view by name.

    Views are lazy plans — nothing materializes until queried, and
    Catalyst optimizes across the view boundary (filters on a view
    push down into the underlying scans).
    """
    register_views(spark, sf_dir)
    for name in ANALYTICS_VIEWS:
        QUERIES[name](spark, sf_dir).createOrReplaceTempView(name)
