"""Kafka-envelope decoding for the streaming pipeline's injected-source
seam.

The reference's realtime path is Kafka-first: the poller publishes JSON
payloads to topics (reference src/gtfs-realtime-poller/poller.py:69-188)
and the ingestion service consumes and upserts them
(src/db-ingestion-service/ingestor.py:34-137). Spark's Kafka source
(`spark.readStream.format("kafka")`) always yields the SAME fixed
envelope regardless of broker:

    key binary, value binary, topic string, partition int, offset long,
    timestamp timestamp, timestampType int

so the decode step — envelope ``value`` bytes -> typed EVENTS_SCHEMA
columns — is a pure column transformation that can be written and
tested WITHOUT a broker: any DataFrame with those columns (static or
streaming) decodes identically. That is what this module provides; with
it, pointing the pipeline at a real cluster is exactly

    raw = (spark.readStream.format("kafka")
           .option("kafka.bootstrap.servers", ...)
           .option("subscribe", "events").load())
    stream_events_hourly(spark, decode_events_envelope(raw))

— configuration plus one tested function, no library edits.

JSON is decoded with ``from_json`` (JVM-side Jackson, whole-stage
codegen friendly — never a Python UDF). Malformed payloads decode to
all-NULL rows, kept by default WITH the original bytes in a
``corrupt_payload`` column so the caller can route them to a
dead-letter sink with something to archive; ``drop_malformed=True``
filters them (and omits the column — the clean path keeps the clean
schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Typed view of the poller's event payload: matches EVENTS_SCHEMA
# (streaming/pipeline.py) minus nothing — props stays a raw JSON string
# exactly as the events table stores it.
EVENT_PAYLOAD_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

# to_json's default timestampFormat is millisecond-precision; event
# timestamps carry microseconds, so both directions pin a microsecond
# format or the round trip silently truncates 3 digits.
_TS_OPTS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}


def is_json_object(raw_col):
    """NULL-safe probe: true iff the bytes parse as a JSON OBJECT.
    PERMISSIVE from_json maps malformed payloads to all-NULL rows, not
    NULL structs, so validity needs this separate map-typed re-parse —
    it catches non-JSON bytes AND well-formed non-objects ('42',
    '\"hi\"', '[1,2,3]'). JVM-side, same codegen stage. Shared by every
    JSON envelope decoder (events, CDC)."""
    return F.from_json(raw_col.cast("string"), "map<string,string>").isNotNull()


def dead_letter_col(is_object, raw_col):
    """The kept-malformed routing column: NULL on well-formed rows, the
    original payload bytes on malformed ones, and EMPTY bytes on Kafka
    tombstones (value IS NULL — a compacted-topic deletion marker has
    nothing to archive but must still hit the dead-letter filter)."""
    return (
        F.when(is_object, F.lit(None).cast("binary"))
        .otherwise(F.coalesce(raw_col, F.lit(b"")))
        .alias("corrupt_payload")
    )


def decode_events_envelope(
    raw: DataFrame, drop_malformed: bool = False
) -> DataFrame:
    """Decode a Kafka-envelope DataFrame (``value`` binary holding the
    poller's JSON event payload) into EVENTS_SCHEMA columns.

    Works identically on streaming and static frames — the envelope is
    plain columns, so tests decode a hand-built static frame and the
    pipeline decodes the live source. The broker ``timestamp``
    (log-append time) is surfaced as ``kafka_ts`` for ingest-lag
    audits; event time remains the payload's own ``ts``.

    Scale: one map-side projection — no shuffle, no Python. At 100 TB/
    day of feed the decode rides inside the same codegen stage as the
    downstream watermark filter.
    """
    # the broker stamps `timestamp` on append; a pre-broker frame (the
    # encode side's output, replay fixtures) simply has none yet
    kafka_ts = (
        F.col("timestamp")
        if "timestamp" in raw.columns
        else F.lit(None).cast("timestamp")
    )
    parsed = raw.select(
        F.from_json(
            F.col("value").cast("string"), EVENT_PAYLOAD_SCHEMA, _TS_OPTS
        ).alias("e"),
        F.col("value").alias("__raw"),
        kafka_ts.alias("kafka_ts"),
    )
    # PERMISSIVE from_json maps a malformed payload to an all-NULL
    # row, not a NULL struct, so validity needs its own probe:
    # re-parsing as a MAP is NULL exactly when the payload is not a
    # JSON OBJECT — catching non-JSON bytes AND well-formed
    # non-objects ('42', '"hi"', '[1,2,3]') that a JSON-validity
    # check alone would let through as all-NULL event rows.
    # JVM-side, same codegen stage.
    is_object = is_json_object(F.col("__raw"))
    if drop_malformed:
        return parsed.filter(is_object).select("e.*", "kafka_ts")
    # kept-malformed path: the all-NULL row alone is undiagnosable, so
    # surface the original bytes — the dead-letter sink archives
    # `corrupt_payload IS NOT NULL` (see dead_letter_col for the
    # tombstone contract).
    return parsed.select(
        "e.*",
        "kafka_ts",
        dead_letter_col(is_object, F.col("__raw")),
    )


def encode_events_envelope(events: DataFrame, topic: str) -> DataFrame:
    """Inverse transform for the write side (and for tests): pack typed
    event rows into the Kafka sink contract (``key``/``value`` binary +
    ``topic``). Keyed by user_id so a keyed topic preserves per-user
    order — the property the stateful twins (funnel/attribution)
    document as their cross-batch assumption."""
    payload = F.to_json(
        F.struct(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        ),
        _TS_OPTS,
    )
    return events.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        payload.cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
    )
