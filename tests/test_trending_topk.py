"""Trending top-k twin (windowed heavy hitters): the streaming counts
plus the shared micro-batch rank step must reproduce the batch twin
exactly, and late data inside the watermark must land in its window."""

from __future__ import annotations

from big_data_project_spark.catalog import load_table
from big_data_project_spark.streaming import pipeline

from tests.conftest import SF_DIR


def test_stream_trending_topk_equals_batch(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "trend_stream")
    events.write.parquet(src)
    counts = pipeline.run_available_now(
        pipeline.stream_trending_counts(spark, src), "trend_counts"
    )
    got = sorted(
        map(tuple, pipeline.rank_trending(counts).collect())
    )
    want = sorted(
        map(tuple, pipeline.trending_topk_batch(spark, SF_DIR).collect())
    )
    assert got == want
    assert want  # non-degenerate corpus


def test_rank_trending_is_deterministic_on_ties(spark):
    from pyspark.sql import functions as F

    counts = spark.createDataFrame(
        [
            ("2026-01-01 00:00:00", "b", 5),
            ("2026-01-01 00:00:00", "a", 5),
            ("2026-01-01 00:00:00", "c", 5),
            ("2026-01-01 00:00:00", "d", 4),
        ],
        "hour_ts string, event_type string, n_events long",
    ).withColumn("hour_ts", F.col("hour_ts").cast("timestamp"))
    rows = pipeline.rank_trending(counts, k=3).collect()
    assert [(r.rank, r.event_type) for r in rows] == [
        (1, "a"), (2, "b"), (3, "c")
    ]


def test_trending_late_data_lands_in_its_window(spark, tmp_path):
    """An event arriving after later-window events (but inside the
    watermark) still counts toward ITS OWN hour — the availableNow
    drain sees both files, exactly like a restarted incremental run."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "late")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )

    def push(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    from datetime import datetime

    t0 = datetime(2026, 1, 1, 0, 30)
    t1 = datetime(2026, 1, 1, 1, 30)
    push([(1, t1, 1, "x", 0.0, "{}"), (2, t1, 2, "y", 0.0, "{}")])
    push([(3, t0, 3, "x", 0.0, "{}")])  # late: earlier hour, later file
    counts = pipeline.run_available_now(
        pipeline.stream_trending_counts(spark, src), "trend_late"
    )
    got = {
        (r.hour_ts.isoformat(), r.event_type): r.n_events
        for r in counts.collect()
    }
    assert got == {
        ("2026-01-01T00:00:00", "x"): 1,
        ("2026-01-01T01:00:00", "x"): 1,
        ("2026-01-01T01:00:00", "y"): 1,
    }
