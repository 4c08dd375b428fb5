"""Additive schema evolution on the keyed parquet upsert: the
Delta-Lake ``mergeSchema`` contract on a plain parquet lake — loud
default, union-schema opt-in, footer-merged reads for evolved
hive-partitioned tables."""

from __future__ import annotations

import pytest

from big_data_project_spark.plans.sinks import (
    read_upsert_table,
    upsert_parquet,
)


def _seed(spark, path, partition_col=None):
    base = spark.createDataFrame(
        [
            (1, "r1", 10, "a"),
            (2, "r2", 10, "a"),
            (3, "r3", 10, "b"),
        ],
        "id long, name string, version long, part string",
    )
    return upsert_parquet(
        spark, path, base, ["id"], "version", partition_col=partition_col
    )


def test_schema_mismatch_fails_loudly_by_default(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    widened = spark.createDataFrame(
        [(2, "r2v2", 20, "a", 0.9)],
        "id long, name string, version long, part string, score double",
    )
    with pytest.raises(ValueError, match=r"added=\['score'\]"):
        upsert_parquet(spark, path, widened, ["id"], "version")
    narrowed = spark.createDataFrame(
        [(2, "r2v2", 20)], "id long, name string, version long"
    )
    with pytest.raises(ValueError, match=r"removed=\['part'\]"):
        upsert_parquet(spark, path, narrowed, ["id"], "version")


def test_additive_evolution_unpartitioned(spark, tmp_path):
    """New column appears table-wide; historical rows carry NULL, the
    upserted key carries the value, and the key merge still applies."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    widened = spark.createDataFrame(
        [(2, "r2v2", 20, "a", 0.9), (4, "r4", 20, "b", 0.5)],
        "id long, name string, version long, part string, score double",
    )
    out = upsert_parquet(
        spark, path, widened, ["id"], "version",
        allow_schema_evolution=True,
    )
    rows = {r.id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[2].name == "r2v2" and rows[2].score == 0.9
    assert rows[4].score == 0.5
    assert rows[1].score is None and rows[3].score is None
    # the table stays evolvable AND readable without options: the
    # unpartitioned path rewrites every file at the union schema
    assert "score" in spark.read.parquet(path).columns


def test_additive_evolution_partitioned_untouched_partitions(
    spark, tmp_path
):
    """Partition-scoped merge: only the delta's partition is rewritten
    at the wider schema; the untouched partition keeps its original
    files and surfaces NULL for the new column through the
    footer-merged read."""
    path = str(tmp_path / "t")
    _seed(spark, path, partition_col="part")
    widened = spark.createDataFrame(
        [(1, "r1v2", 20, "a", 7)],
        "id long, name string, version long, part string, clicks long",
    )
    upsert_parquet(
        spark, path, widened, ["id"], "version",
        partition_col="part", allow_schema_evolution=True,
    )
    out = read_upsert_table(spark, path)
    rows = {r.id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].name == "r1v2" and rows[1].clicks == 7
    assert rows[2].clicks is None  # same partition, losing version
    assert rows[3].clicks is None  # untouched partition 'b'
    # a NON-merged read of the untouched partition proves its files
    # were never rewritten (the O(delta) contract survives evolution)
    b_only = spark.read.parquet(path + "/part=b")
    assert "clicks" not in b_only.columns


def test_evolution_row_replace_semantics_on_dropped_column(
    spark, tmp_path
):
    """A winning delta row that lacks an existing column replaces the
    key's row wholesale: the column goes NULL for that key (row-level
    replace), while losing keys keep their stored values."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    slim = spark.createDataFrame(
        [(2, 20, "a"), (3, 5, "b")],
        "id long, version long, part string",
    )
    out = upsert_parquet(
        spark, path, slim, ["id"], "version",
        allow_schema_evolution=True,
    )
    rows = {r.id: r for r in out.collect()}
    assert rows[2].name is None  # delta (v20) won without the column
    assert rows[3].name == "r3"  # delta (v5) lost to stored v10
    assert rows[1].name == "r1"


def test_repeated_evolution_is_idempotent_for_redelivery(spark, tmp_path):
    """Replaying the SAME widened delta (foreachBatch redelivery after
    a crash) re-merges to the identical table state."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    widened = spark.createDataFrame(
        [(2, "r2v2", 20, "a", 0.9)],
        "id long, name string, version long, part string, score double",
    )
    first = upsert_parquet(
        spark, path, widened, ["id"], "version",
        allow_schema_evolution=True,
    ).collect()
    second = upsert_parquet(
        spark, path, widened, ["id"], "version",
        allow_schema_evolution=True,
    ).collect()
    key = lambda r: r.id  # noqa: E731
    assert sorted(map(tuple, first), key=lambda t: t[0]) == sorted(
        map(tuple, second), key=lambda t: t[0]
    )
