"""The brute-force baselines and the driver-side export collect are
guarded; these tests prove the guards trip."""

from __future__ import annotations

import pytest

from big_data_project_spark import catalog
from big_data_project_spark.operators import dedup, similarity
from big_data_project_spark.plans import exports

from tests.conftest import SF_DIR


def test_baseline_guard_trips_on_low_cap(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BASELINE_LIMIT_MB", "0")
    with pytest.raises(ValueError, match="recall baseline"):
        catalog.assert_baseline_scale(
            SF_DIR, "documents", "dedup_ngram_jaccard", "dedup_minhash_lsh"
        )


def test_ngram_jaccard_guard_trips(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BASELINE_LIMIT_MB", "0")
    with pytest.raises(ValueError, match="dedup_minhash_lsh"):
        dedup.dedup_ngram_jaccard(spark, SF_DIR)


def test_ann_cosine_guard_trips(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BASELINE_LIMIT_MB", "0")
    with pytest.raises(ValueError, match="ann_lsh_topk"):
        similarity.ann_cosine_topk(spark, SF_DIR)


def test_baseline_guard_passes_at_test_scale(spark):
    # default 1 GiB cap: sf0.001 documents are far below it
    catalog.assert_baseline_scale(
        SF_DIR, "documents", "dedup_ngram_jaccard", "dedup_minhash_lsh"
    )


def test_export_rows_cap_trips(spark, monkeypatch):
    monkeypatch.setattr(exports, "MAX_EXPORT_ROWS", 2)
    df = spark.range(3)
    with pytest.raises(ValueError, match="export payload exceeds"):
        exports._collect(df)


def test_export_rows_under_cap_ok(spark):
    assert len(exports._collect(spark.range(5))) == 5
