"""JDBC serving sink (plans/jdbc.py) against embedded Derby — the
in-process database that ships with Spark's jars, standing in for the
reference's Postgres serving store (ingestor.py ON CONFLICT upserts).

Covers: create-on-first-use, update-vs-nothing conflict semantics,
within-batch key collisions (version winner), streaming foreachBatch
end-to-end, and redelivery absorption (same batch merged twice lands
in the same target state).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_project_spark.plans.jdbc import (
    foreach_batch_jdbc_upsert,
    jdbc_upsert,
    read_jdbc_table,
)


@pytest.fixture
def url(tmp_path):
    return f"jdbc:derby:{tmp_path}/servedb;create=true"


def _rows(spark, data):
    return spark.createDataFrame(
        data, "route_id string, hour long, delay double"
    )


def test_upsert_creates_then_updates(spark, url):
    first = _rows(spark, [("r1", 0, 1.0), ("r2", 0, 2.0)])
    jdbc_upsert(first, url, "delays", ["route_id", "hour"])
    got = {
        (r.route_id, r.hour): r.delay
        for r in read_jdbc_table(spark, url, "delays").collect()
    }
    assert got == {("r1", 0): 1.0, ("r2", 0): 2.0}

    # second batch: one update, one new key — ON CONFLICT DO UPDATE
    second = _rows(spark, [("r1", 0, 9.0), ("r3", 1, 3.0)])
    jdbc_upsert(second, url, "delays", ["route_id", "hour"])
    got = {
        (r.route_id, r.hour): r.delay
        for r in read_jdbc_table(spark, url, "delays").collect()
    }
    assert got == {("r1", 0): 9.0, ("r2", 0): 2.0, ("r3", 1): 3.0}


def test_on_conflict_nothing_keeps_existing(spark, url):
    jdbc_upsert(
        _rows(spark, [("r1", 0, 1.0)]), url, "vp", ["route_id", "hour"],
        on_conflict="nothing",
    )
    jdbc_upsert(
        _rows(spark, [("r1", 0, 99.0), ("r2", 0, 2.0)]), url, "vp",
        ["route_id", "hour"], on_conflict="nothing",
    )
    got = {
        (r.route_id, r.hour): r.delay
        for r in read_jdbc_table(spark, url, "vp").collect()
    }
    # existing row untouched (DO NOTHING), new key inserted
    assert got == {("r1", 0): 1.0, ("r2", 0): 2.0}


def test_within_batch_duplicates_pick_version_winner(spark, url):
    df = spark.createDataFrame(
        [("r1", 0, 5.0, 1), ("r1", 0, 7.0, 3), ("r1", 0, 6.0, 2)],
        "route_id string, hour long, delay double, version long",
    )
    jdbc_upsert(df, url, "versioned", ["route_id", "hour"],
                version_col="version")
    rows = read_jdbc_table(spark, url, "versioned").collect()
    assert len(rows) == 1
    assert rows[0].delay == 7.0 and rows[0].version == 3


def test_redelivered_batch_is_absorbed(spark, url):
    batch = _rows(spark, [("r1", 0, 1.0), ("r2", 1, 2.0)])
    jdbc_upsert(batch, url, "replay", ["route_id", "hour"])
    before = sorted(
        map(tuple, read_jdbc_table(spark, url, "replay").collect())
    )
    # crash-before-checkpoint replay: the SAME batch merges again
    jdbc_upsert(batch, url, "replay", ["route_id", "hour"])
    after = sorted(
        map(tuple, read_jdbc_table(spark, url, "replay").collect())
    )
    assert before == after and len(after) == 2


def test_streaming_foreach_batch_serves_rollup(spark, url, tmp_path):
    """End-to-end serving loop: file stream -> hourly rollup ->
    foreachBatch JDBC upsert -> the serving table equals the batch
    rollup, and a second availableNow run over grown input UPDATES
    changed keys rather than duplicating them."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = "route_id string, hour long, delay double"

    def push(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run_once():
        sdf = spark.readStream.schema(schema).parquet(src)
        agg = sdf.groupBy("route_id", "hour").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("delay"), 4).alias("delay_sum"),
        )
        q = (
            agg.writeStream.foreachBatch(
                foreach_batch_jdbc_upsert(url, "served", ["route_id", "hour"])
            )
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    push([("r1", 0, 1.0), ("r1", 0, 2.0), ("r2", 5, 4.0)])
    run_once()
    got = {
        (r.route_id, r.hour): (r.n, r.delay_sum)
        for r in read_jdbc_table(spark, url, "served").collect()
    }
    assert got == {("r1", 0): (2, 3.0), ("r2", 5): (1, 4.0)}

    push([("r1", 0, 10.0), ("r3", 2, 7.0)])
    run_once()
    got = {
        (r.route_id, r.hour): (r.n, r.delay_sum)
        for r in read_jdbc_table(spark, url, "served").collect()
    }
    assert got == {
        ("r1", 0): (3, 13.0),
        ("r2", 5): (1, 4.0),
        ("r3", 2): (1, 7.0),
    }


def test_reference_topology_end_to_end(spark, url, tmp_path):
    """The reference's full realtime topology in one loop:
    poller -> Kafka topic -> ingestion service -> Postgres
    becomes
    envelope-shaped stream -> decode_events_envelope ->
    stream_events_hourly -> foreach_batch_jdbc_upsert -> Derby.
    The served table must equal the batch rollup computed directly
    from the raw events."""
    from pyspark.sql import functions as F

    from big_data_project_spark.catalog import load_table
    from big_data_project_spark.functions.portable import davg
    from big_data_project_spark.sources.kafka import (
        decode_events_envelope,
        encode_events_envelope,
    )
    from big_data_project_spark.streaming import pipeline

    from tests.conftest import SF_DIR

    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "topic")
    encode_events_envelope(events, "events").withColumn(
        "timestamp", F.lit("2026-01-01 00:00:00").cast("timestamp")
    ).write.parquet(src)

    raw = spark.readStream.schema(
        "key binary, value binary, topic string, timestamp timestamp"
    ).parquet(src)
    agg = pipeline.stream_events_hourly(
        spark,
        decode_events_envelope(raw).drop("kafka_ts", "corrupt_payload"),
    )
    q = (
        agg.writeStream.foreachBatch(
            foreach_batch_jdbc_upsert(url, "hourly", ["route_id", "hour_ts"])
        )
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    served = sorted(
        map(tuple, read_jdbc_table(spark, url, "hourly").collect())
    )
    batch = sorted(
        map(
            tuple,
            events.groupBy(
                F.date_trunc("hour", "ts").alias("hour_ts"),
                F.col("event_type").alias("route_id"),
            )
            .agg(
                F.count(F.lit(1)).alias("vehicle_events"),
                davg("value", 4).alias("avg_delay_seconds"),
            )
            .select(agg.columns)
            .collect(),
        )
    )
    assert served == batch


def test_bad_inputs_fail_loudly(spark, url):
    df = _rows(spark, [("r1", 0, 1.0)])
    with pytest.raises(ValueError, match="key columns"):
        jdbc_upsert(df, url, "t", ["nope"])
    with pytest.raises(ValueError, match="on_conflict"):
        jdbc_upsert(df, url, "t", ["route_id"], on_conflict="merge")


def test_schema_evolution_rejected_by_default(spark, url):
    jdbc_upsert(
        _rows(spark, [("r1", 0, 1.0)]), url, "evo", ["route_id", "hour"]
    )
    widened = spark.createDataFrame(
        [("r1", 0, 9.0, 12)],
        "route_id string, hour long, delay double, riders long",
    )
    with pytest.raises(ValueError, match=r"\['riders'\]"):
        jdbc_upsert(widened, url, "evo", ["route_id", "hour"])


def test_schema_evolution_adds_column_and_patches(spark, url):
    """ALTER TABLE ADD COLUMN on evolution: historical rows read NULL
    for the new column, the merged key carries the value, and a later
    SLIMMER batch column-patches (stored evolved values survive) —
    the reference's partial ON CONFLICT SET semantics."""
    jdbc_upsert(
        _rows(spark, [("r1", 0, 1.0), ("r2", 0, 2.0)]),
        url, "evo2", ["route_id", "hour"],
    )
    widened = spark.createDataFrame(
        [("r1", 0, 9.0, 12), ("r3", 1, 3.0, 7)],
        "route_id string, hour long, delay double, riders long",
    )
    jdbc_upsert(
        widened, url, "evo2", ["route_id", "hour"],
        allow_schema_evolution=True,
    )
    got = {
        (r.route_id, r.hour): (r.delay, r.riders)
        for r in read_jdbc_table(spark, url, "evo2").collect()
    }
    assert got == {
        ("r1", 0): (9.0, 12),
        ("r2", 0): (2.0, None),
        ("r3", 1): (3.0, 7),
    }
    # slimmer follow-up batch: only delay is patched, riders survives
    jdbc_upsert(
        _rows(spark, [("r1", 0, 5.0)]), url, "evo2", ["route_id", "hour"]
    )
    got = {
        (r.route_id, r.hour): (r.delay, r.riders)
        for r in read_jdbc_table(spark, url, "evo2").collect()
    }
    assert got[("r1", 0)] == (5.0, 12)


def test_schema_evolution_string_and_decimal_types(spark, url):
    """The ALTER type mapping covers the column classes the serving
    tables use (VARCHAR via string_type, DECIMAL passthrough)."""
    jdbc_upsert(
        _rows(spark, [("r1", 0, 1.0)]), url, "evo3", ["route_id", "hour"]
    )
    from decimal import Decimal

    widened = spark.createDataFrame(
        [("r1", 0, 2.0, "on-time", Decimal("3.14"))],
        "route_id string, hour long, delay double, status string,"
        " score decimal(10,2)",
    )
    jdbc_upsert(
        widened, url, "evo3", ["route_id", "hour"],
        allow_schema_evolution=True,
    )
    row = {
        (r.route_id, r.hour): r
        for r in read_jdbc_table(spark, url, "evo3").collect()
    }[("r1", 0)]
    assert row.status == "on-time"
    assert float(row.score) == 3.14


def test_foreach_batch_sink_evolves_mid_stream(spark, url):
    """Schema drift arriving MID-STREAM: the foreachBatch wrapper
    plumbs allow_schema_evolution through, so a later micro-batch that
    gained a column widens the serving table instead of killing the
    query."""
    sink = foreach_batch_jdbc_upsert(
        url, "live", ["route_id", "hour"], allow_schema_evolution=True
    )
    sink(_rows(spark, [("r1", 0, 1.0)]), 0)
    widened = spark.createDataFrame(
        [("r1", 0, 2.0, 5), ("r2", 0, 3.0, 8)],
        "route_id string, hour long, delay double, riders long",
    )
    sink(widened, 1)
    got = {
        (r.route_id, r.hour): (r.delay, r.riders)
        for r in read_jdbc_table(spark, url, "live").collect()
    }
    assert got == {("r1", 0): (2.0, 5), ("r2", 0): (3.0, 8)}
