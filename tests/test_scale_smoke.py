"""Scale-headroom smoke: the key pipelines must hold their plans and
results when the feed is 8x larger than the test scale (checks
partition behavior, no driver-side collection, stable aggregates —
the local stand-in for "would this survive a 100x scale-up")."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_project_spark.catalog import load_table
from big_data_project_spark.operators.kpi import kpi_hourly
from big_data_project_spark.streaming.pipeline import sessionize_batch

from tests.conftest import SF_DIR

SCALE = 8


@pytest.fixture(scope="module")
def scaled_dir(spark, tmp_path_factory):
    """events x SCALE: replicas get disjoint user/event ids but identical
    (route, hour) structure, so per-route-hour counts scale exactly."""
    d = tmp_path_factory.mktemp("scaled")
    ev = load_table(spark, SF_DIR, "events")
    reps = ev.crossJoin(
        F.broadcast(
            ev.sparkSession.range(SCALE).select(F.col("id").alias("rep"))
        )
    )
    scaled = reps.select(
        (F.col("event_id") * SCALE + F.col("rep")).alias("event_id"),
        "ts",
        (F.col("user_id") * SCALE + F.col("rep")).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    scaled.write.parquet(str(d / "events.parquet"))
    for t in ("lineitem",):
        load_table(spark, SF_DIR, t).write.parquet(str(d / f"{t}.parquet"))
    return str(d)


def test_kpi_pipeline_scales_linearly(spark, scaled_dir):
    base = kpi_hourly(spark, SF_DIR)
    scaled = kpi_hourly(spark, scaled_dir)
    b = {
        (r["route_id"], str(r["hour_ts"])): r
        for r in base.collect()
    }
    s = {
        (r["route_id"], str(r["hour_ts"])): r
        for r in scaled.collect()
    }
    assert set(b) == set(s)
    for k in b:
        # counts scale by SCALE; averages are invariant
        assert s[k]["trip_update_events"] == SCALE * b[k]["trip_update_events"]
        assert s[k]["active_vehicles"] == SCALE * b[k]["active_vehicles"]
        assert s[k]["avg_delay_seconds"] == pytest.approx(
            b[k]["avg_delay_seconds"], abs=1e-4
        )


def test_sessionization_scales_by_user(spark, scaled_dir):
    base_n = sessionize_batch(spark, SF_DIR).count()
    scaled_n = sessionize_batch(spark, scaled_dir).count()
    assert scaled_n == SCALE * base_n
