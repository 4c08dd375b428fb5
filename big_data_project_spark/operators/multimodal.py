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


QUERIES = {"multimodal_meta": multimodal_meta}

# strlen() = bytes (documents.text is UTF-8; payload = encode(text)).
ORACLES = {
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
