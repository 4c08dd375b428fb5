"""Opt-in integration test against a REAL Kafka broker.

The broker-free envelope tests (tests/test_sources_streaming.py) prove
the decode/encode contract on envelope-shaped frames; this module
retires the remaining "config + this decode" caveat by running the
same round trip through an actual cluster — but only when one is
provided, since the build container ships no broker:

    SPARK_GRAFT_KAFKA_BOOTSTRAP=host:9092 python -m pytest \
        tests/test_kafka_broker_optin.py -q

Skipped (not failed) by default so the suite stays green everywhere.
Requires the spark-sql-kafka package on the session classpath; the
test declares it via spark.jars.packages on its own session, so it
also needs network access to resolve the artifact the first time.
"""

from __future__ import annotations

import os
import time
import uuid

import pytest

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="set SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port to run the "
    "real-broker integration test",
)


@pytest.fixture(scope="module")
def kafka_spark():
    """Separate session with the Kafka connector on the classpath
    (the shared test session is built without it)."""
    from pyspark.sql import SparkSession

    import pyspark

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-optin")
        .config(
            "spark.jars.packages",
            "org.apache.spark:spark-sql-kafka-0-10_2.13:"
            + pyspark.__version__,
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_envelope_round_trip_through_real_broker(kafka_spark, tmp_path):
    """encode -> PRODUCE to the broker -> consume -> decode == input,
    exercising the exact write/read configs the docstring in
    sources/kafka.py promises are 'configuration plus one tested
    function'."""
    from big_data_project_spark.sources.kafka import (
        decode_events_envelope,
        encode_events_envelope,
    )

    spark = kafka_spark
    topic = f"spark_graft_optin_{uuid.uuid4().hex[:8]}"
    events = spark.createDataFrame(
        [
            (1, "2024-03-01 08:00:00.123456", 10, "view", 1.5, '{"k":1}'),
            (2, "2024-03-01 08:30:00.654321", 11, "click", None, None),
            (3, "2024-03-01 09:00:00.000001", 10, "purchase", 9.99, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id",
        "to_timestamp(ts) AS ts",
        "user_id",
        "event_type",
        "value",
        "props",
    )

    (
        encode_events_envelope(events, topic)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .save()
    )

    # Batch read back (startingOffsets=earliest) with a bounded wait for
    # broker-side visibility.
    deadline = time.monotonic() + 30
    raw = None
    while time.monotonic() < deadline:
        raw = (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", BOOTSTRAP)
            .option("subscribe", topic)
            .option("startingOffsets", "earliest")
            .load()
        )
        if raw.count() >= 3:
            break
        time.sleep(1)
    assert raw is not None and raw.count() == 3

    decoded = decode_events_envelope(raw, drop_malformed=True)
    got = sorted(
        (
            r["event_id"],
            r["ts"].isoformat(),
            r["user_id"],
            r["event_type"],
            r["value"],
            r["props"],
        )
        for r in decoded.collect()
    )
    want = sorted(
        (
            r["event_id"],
            r["ts"].isoformat(),
            r["user_id"],
            r["event_type"],
            r["value"],
            r["props"],
        )
        for r in events.collect()
    )
    assert got == want  # microsecond timestamps survive the broker hop

    # keyed-by-user contract: the producer set the message key so a
    # keyed topic preserves per-user order for the stateful twins
    keys = {r["key"] for r in raw.select("key").collect()}
    assert keys == {str(u).encode() for u in (10, 11)}
