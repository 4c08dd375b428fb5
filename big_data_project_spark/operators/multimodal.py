"""Multimodal-column plumbing: opaque binary payloads with typed
metadata, processed by an Arrow-batched ``mapInPandas`` decode stage.

The reference pipeline is text/numeric only (GTFS CSVs, JSON weather —
src/dag/*.py); this module adds the image/audio/video column handling a
training-data pipeline needs. The container has no image/audio codecs,
so the DECODE step is a deterministic stub (sha256 + derived fake
dimensions) behind ``_decode_payload``; the Spark-side plumbing —
binary column, metadata struct, mapInPandas batch iteration, output
schema — is real and oracle-checked.

Scale: mapInPandas streams Arrow record batches through Python once,
map-side only (no shuffle); at 100 TB the payload column stays columnar
end-to-end and per-batch memory is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

MODALITIES = ("image", "audio", "video")

_OUT_SCHEMA = (
    "doc_id bigint, modality string, byte_len bigint, "
    "payload_sha256 string, fake_width int, fake_height int"
)


def _decode_payload(payload: bytes) -> dict:
    """Stub decoder: real codecs (PIL/ffmpeg) are not in this container.
    Deterministic so the DuckDB oracle can reproduce it; a production
    build swaps this body for the actual decode and keeps the plumbing.
    """
    n = len(payload)
    return {
        "byte_len": n,
        "payload_sha256": hashlib.sha256(payload).hexdigest(),
        "fake_width": 16 + n % 64,
        "fake_height": 16 + (n * 7) % 64,
    }


def _decode_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        decoded = pdf["payload"].map(_decode_payload)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "byte_len": decoded.map(lambda d: d["byte_len"]),
                "payload_sha256": decoded.map(lambda d: d["payload_sha256"]),
                "fake_width": decoded.map(lambda d: d["fake_width"]),
                "fake_height": decoded.map(lambda d: d["fake_height"]),
            }
        )


def multimodal_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents re-typed as a multimodal table: binary payload + typed
    metadata struct (modality assigned deterministically per doc)."""
    docs = load_table(spark, sf_dir, "documents")
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            modality.alias("modality"),
            F.col("source").alias("origin"),
            F.col("n_chars").alias("content_hint"),
        ).alias("meta"),
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-stub pass over the multimodal table via mapInPandas."""
    mm = multimodal_table(spark, sf_dir).select(
        "doc_id", "payload", F.col("meta.modality").alias("modality")
    )
    return mm.mapInPandas(_decode_batches, schema=_OUT_SCHEMA)


_FEAT_SCHEMA = (
    "doc_id bigint, modality string, byte_len bigint, n_distinct_bytes int, "
    "mean_byte double, frame_offsets array<int>"
)

FRAME_SAMPLE_N = 4


def _feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Feature-extract + frame-sample stub: byte-level statistics stand
    in for codec-derived features (no PIL/ffmpeg in this container);
    frame offsets are the deterministic sample grid a video decoder
    would read. The Arrow batch shape, schema, and partition behavior
    are the production plumbing."""
    for pdf in batches:
        feats = []
        for doc_id, modality, payload in zip(
            pdf["doc_id"], pdf["modality"], pdf["payload"]
        ):
            n = len(payload)
            step = max(1, n // FRAME_SAMPLE_N)
            feats.append(
                {
                    "doc_id": doc_id,
                    "modality": modality,
                    "byte_len": n,
                    "n_distinct_bytes": len(set(payload)),
                    "mean_byte": (sum(payload) / n) if n else 0.0,
                    "frame_offsets": (
                        [i * step for i in range(FRAME_SAMPLE_N)]
                        if modality == "video"
                        else []
                    ),
                }
            )
        yield pd.DataFrame(feats)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction pass (byte stats + frame-sample offsets) over
    the multimodal table via mapInPandas; rows-only entry (byte-level
    loops are not expressible in the oracle dialect)."""
    mm = multimodal_table(spark, sf_dir).select(
        "doc_id", "payload", F.col("meta.modality").alias("modality")
    )
    return mm.mapInPandas(_feature_batches, schema=_FEAT_SCHEMA).select(
        "doc_id",
        "modality",
        "byte_len",
        "n_distinct_bytes",
        F.round("mean_byte", 4).alias("mean_byte"),
        F.size("frame_offsets").alias("n_frames"),
    )


# documents.text is ASCII (asserted in tests), so the oracle's per-char
# statistics equal the stub's per-byte ones.
_SQL_FEATURES = """
    SELECT doc_id,
           CASE doc_id % 3
             WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
           END AS modality,
           strlen(text)::BIGINT AS byte_len,
           (CASE WHEN strlen(text) = 0 THEN 0
                 ELSE len(list_distinct(string_split(text, '')))
            END)::INT AS n_distinct_bytes,
           CASE WHEN strlen(text) = 0 THEN 0.0
                ELSE round(list_avg(list_transform(string_split(text, ''),
                                                   c -> ascii(c))), 4)
           END AS mean_byte,
           (CASE WHEN doc_id % 3 = 2 THEN 4 ELSE 0 END)::INT AS n_frames
    FROM documents
"""


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_features": multimodal_features,
}

# strlen() = bytes (documents.text is UTF-8; payload = encode(text)).
ORACLES = {
    "multimodal_features": _SQL_FEATURES,
    "multimodal_meta": """
        SELECT doc_id,
               CASE doc_id % 3
                 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
               END AS modality,
               strlen(text)::BIGINT AS byte_len,
               sha256(text) AS payload_sha256,
               (16 + strlen(text) % 64)::INT AS fake_width,
               (16 + (strlen(text) * 7) % 64)::INT AS fake_height
        FROM documents
    """,
}
