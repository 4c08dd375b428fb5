"""Semantics tests for the service-alerts analog and spatial operators
(oracle parity is covered by test_oracle_parity via the registry)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from big_data_project_spark.operators import alerts, spatial

from tests.conftest import SF_DIR


def test_alert_classification_thresholds(spark):
    base = alerts._alerts_base(spark, SF_DIR)
    rows = base.select("alert_type", "description").collect()
    assert rows, "expected at least one alert at sf0.001"
    for r in rows:
        assert r.alert_type in {"severe_delay", "delay", "weather"}
        assert f" type={r.alert_type} " in r.description + " "


def test_alerts_hourly_counts_match_base(spark):
    base = alerts._alerts_base(spark, SF_DIR)
    hourly = alerts.alerts_hourly(spark, SF_DIR)
    assert hourly.agg(F.sum("n_alerts")).first()[0] == base.count()
    # the 'latest' pick is a real alert of that route-hour
    joined = hourly.join(
        base.select(
            F.col("route_id"),
            F.col("hour_ts"),
            F.col("alert_id").alias("last_alert_id"),
        ),
        ["route_id", "hour_ts", "last_alert_id"],
        "left_semi",
    )
    assert joined.count() == hourly.count()


def test_kpi_alerts_left_join_keeps_all_kpi_rows(spark):
    from big_data_project_spark.operators.kpi import kpi_hourly

    k = kpi_hourly(spark, SF_DIR).count()
    ka = alerts.kpi_alerts_hourly(spark, SF_DIR)
    assert ka.count() == k
    assert ka.filter(F.col("n_alerts") < 0).count() == 0


def test_stops_geo_in_bounding_box(spark):
    g = spatial.stops_geo(spark, SF_DIR)
    bad = g.filter(
        (F.col("lat") < spatial.LAT0)
        | (F.col("lat") >= spatial.LAT0 + spatial.LAT_SPAN)
        | (F.col("lon") < spatial.LON0)
        | (F.col("lon") >= spatial.LON0 + spatial.LON_SPAN)
    )
    assert bad.count() == 0
    # cell ids consistent with coordinates
    chk = g.filter(
        F.floor((F.col("lat") - spatial.LAT0) / spatial.CELL_DEG)
        != F.col("cell_x")
    )
    assert chk.count() == 0


def test_nearest_stop_is_true_argmin_within_ring(spark):
    """Brute-force cross check at sf0.001: for every reported pair, no
    other stop in the 3x3 ring is closer (planar metric)."""
    near = {
        (r.pos_id, r.stop_id): r.distance_m
        for r in spatial.nearest_stop(spark, SF_DIR).collect()
    }
    assert near, "expected at least one nearest_stop row"
    stops = spatial.stops_geo(spark, SF_DIR).collect()
    veh = {
        r.pos_id: (r.vlat, r.vlon)
        for r in spatial._vehicle_positions(spark, SF_DIR).collect()
    }
    for (pos_id, stop_id), dist in near.items():
        vlat, vlon = veh[pos_id]
        vcx = math.floor((vlat - spatial.LAT0) / spatial.CELL_DEG)
        vcy = math.floor((vlon - spatial.LON0) / spatial.CELL_DEG)
        best = None
        for s in stops:
            if abs(s.cell_x - vcx) <= 1 and abs(s.cell_y - vcy) <= 1:
                d = math.sqrt(
                    ((vlat - s.lat) * spatial.M_PER_DEG_LAT) ** 2
                    + ((vlon - s.lon) * spatial.M_PER_DEG_LON) ** 2
                )
                if best is None or d < best[1]:
                    best = (s.stop_id, d)
        assert best is not None and best[0] == stop_id
        assert dist == pytest.approx(best[1], abs=0.01)


def test_haversine_against_known_distance(spark):
    # Paris (48.8566, 2.3522) -> London (51.5074, -0.1278) ~ 343.5 km
    df = spark.range(1).select(
        spatial.haversine_m(
            F.lit(48.8566), F.lit(2.3522), F.lit(51.5074), F.lit(-0.1278)
        ).alias("d")
    )
    d = df.first().d
    assert d == pytest.approx(343_500, rel=0.01)
    # planar approximation agrees with haversine at city scale
    df2 = spark.range(1).select(
        spatial.haversine_m(
            F.lit(44.40), F.lit(26.10), F.lit(44.41), F.lit(26.12)
        ).alias("d")
    )
    planar = math.sqrt(
        (0.01 * spatial.M_PER_DEG_LAT) ** 2
        + (0.02 * spatial.M_PER_DEG_LON) ** 2
    )
    assert df2.first().d == pytest.approx(planar, rel=0.01)
