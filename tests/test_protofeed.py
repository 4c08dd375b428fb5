"""Wire-format tests for the GTFS-RT-style protobuf feed on crafted
binary fixtures (the oracle-parity suite covers the full round-trip
rollup)."""

from __future__ import annotations

import pandas as pd
import pytest

from big_data_project_spark.sources.protofeed import (
    _enc_int,
    _enc_len,
    _enc_tag,
    _enc_varint,
    decode_feed,
    decode_trip_update_entity,
    encode_feed,
    encode_trip_update_entity,
)

from tests.conftest import SF_DIR


def test_varint_boundaries():
    for v in (0, 1, 127, 128, 300, 2**31 - 1, -1, -2**31):
        b = encode_trip_update_entity("e", "t", "r", v)
        assert decode_trip_update_entity(b)[3] == v


def test_roundtrip_with_and_without_route():
    assert decode_trip_update_entity(
        encode_trip_update_entity("42", "t42", "route_7", -250)
    ) == ("42", "t42", "route_7", -250)
    assert decode_trip_update_entity(
        encode_trip_update_entity("42", "t42", None, 0)
    ) == ("42", "t42", None, 0)


def test_unknown_fields_are_skipped():
    """A real parser ignores fields it doesn't know: splice varint,
    length-delimited, i32, and i64 fields with unused numbers into the
    entity and between submessage fields."""
    body = encode_trip_update_entity("e9", "t9", "r9", 77)
    spliced = (
        _enc_int(15, 12345)  # unknown varint before known fields
        + body
        + _enc_len(14, b"\x01\x02\x03")  # unknown bytes after
        + _enc_tag(13, 5)
        + b"\x00\x01\x02\x03"  # unknown i32
        + _enc_tag(12, 1)
        + b"\x00" * 8  # unknown i64
    )
    assert decode_trip_update_entity(spliced) == ("e9", "t9", "r9", 77)


def test_truncated_payload_raises():
    body = encode_trip_update_entity("e1", "t1", "r1", 5)
    with pytest.raises((IndexError, ValueError)):
        decode_trip_update_entity(body[:-2] + b"\x80")


def test_spark_encode_decode_identity(spark):
    from big_data_project_spark.catalog import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events").limit(200)
    decoded = decode_feed(encode_feed(ev))
    got = {
        r.entity_id: (r.trip_id, r.route_id, r.delay_centi)
        for r in decoded.collect()
    }
    import math

    want = {
        str(r.event_id): (
            f"t{r.event_id}",
            r.event_type,
            int(math.floor(r.value * 100)),
        )
        for r in ev.collect()
    }
    assert got == want
