"""Batch sinks: keyed upsert and partitioned append over parquet.

Parity: the reference's ingestion service upserts Kafka records into
Postgres (`/root/reference/src/db-ingestion-service/ingestor.py` —
INSERT ... ON CONFLICT (key) DO UPDATE) and the DAGs append versioned
rows. On a data lake the same contracts are:

- ``upsert_parquet``: last-writer-wins merge by natural key. Implemented
  as union + row_number window (newest ``version_col`` per key), the
  merge strategy every lakehouse MERGE compiles to; at 100 TB you would
  point this at Delta/Iceberg ``MERGE INTO`` — the keyed semantics and
  the plan shape (broadcast of the small delta, shuffle on key only)
  are the same.
- ``write_partitioned``: hive-style partition layout so downstream scans
  prune on the partition column.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def upsert_parquet(
    spark: SparkSession,
    target_path: str,
    delta: DataFrame,
    keys: list[str],
    version_col: str,
) -> DataFrame:
    """Merge ``delta`` into the parquet table at ``target_path``:
    one surviving row per key, highest ``version_col`` wins (ties favor
    the delta). Returns the merged frame after writing."""
    # Probe via the reader, not os.path — the target may live on any
    # Hadoop-compatible filesystem (s3a://, hdfs://), where a local
    # stat would silently report "absent" and turn the merge into an
    # overwrite.
    try:
        current = spark.read.parquet(target_path).withColumn(
            "__src", F.lit(0)
        )
        current.schema  # force analysis so a missing path raises here
    except AnalysisException:
        current = None
    incoming = delta.withColumn("__src", F.lit(1))
    unioned = (
        incoming if current is None else current.unionByName(incoming)
    )
    w = Window.partitionBy(*keys).orderBy(
        F.desc(version_col), F.desc("__src")
    )
    merged = (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
    # Materialize before overwrite: the plan reads the same files it
    # replaces, so stage through a local collect-free checkpoint dir.
    tmp = target_path + ".staging"
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(target_path)
    out = spark.read.parquet(target_path)
    out.count()  # force the read before the staging files disappear
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(target_path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Hive-partitioned parquet append (partition pruning for readers)."""
    df.write.mode("append").partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Bucketed (hash-clustered) table: rows are pre-shuffled into
    ``n_buckets`` files by ``bucket_col`` at WRITE time, so every later
    join or aggregation on that key reads co-located data and skips its
    Exchange entirely — the standard way to amortize the shuffle of a
    100 TB fact table across all downstream queries. Optionally
    sort-within-buckets so sort-merge joins also skip their Sort.

    Parquet `saveAsTable` with Spark's native bucketing (no Hive
    needed); both sides of a join must be bucketed with the same count
    on the join key for the exchange-free plan.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col
    )
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)  # external table, caller-owned dir
    w.saveAsTable(table)
