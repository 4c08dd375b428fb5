"""Round-5 seventh batch: shingle containment (asymmetric near-dup)
and consecutive-anomaly runs (gaps-and-islands).

Semantics are checked against the module's own exact primitives and
pandas replications; the containment test also proves the asymmetric
measure on planted excerpt documents (the class the corpus lacks).
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from big_data_project_spark.operators.dedup import (
    CONTAIN_TAU,
    TAU,
    doc_shingle_containment,
)
from big_data_project_spark.operators.timeseries import (
    delay_anomaly_hours,
    delay_anomaly_runs,
)

from tests.conftest import SF_DIR


def test_containment_bounds_and_dup_consistency(spark):
    rows = doc_shingle_containment(spark, SF_DIR).collect()
    assert len(rows) > 0  # the corpus's planted dups must surface
    for r in rows:
        assert r.a_id < r.b_id
        assert r.contained_id in (r.a_id, r.b_id)
        # containment dominates jaccard and both are probabilities
        assert 0.0 <= r.jaccard <= r.containment <= 1.0 + 1e-9
        assert r.containment >= CONTAIN_TAU - 1e-9
        assert r.jaccard_missed == int(r.jaccard < TAU)
    # this corpus's near-dups are whole-document: symmetric dedup
    # already catches them all (the flag exists for excerpt feeds)
    assert sum(r.jaccard_missed for r in rows) == 0


def test_containment_flags_planted_excerpt(spark, tmp_path):
    """A document contained in a larger one has containment ~1 but low
    jaccard — exactly the pair the flag exists for."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    big = base + (
        " extra filler words continue the much longer document body "
        "with many additional unique tokens one two three four five "
        "six seven eight nine ten eleven twelve thirteen fourteen"
    )
    docs = spark.createDataFrame(
        [(1, base, "en", "s", len(base)), (2, big, "en", "s", len(big))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path)
    docs.write.parquet(f"{d}/documents.parquet")
    out = doc_shingle_containment(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r.contained_id == 1
    assert r.containment == pytest.approx(1.0, abs=1e-6)
    assert r.jaccard < TAU
    assert r.jaccard_missed == 1


def test_anomaly_runs_partition_the_anomalous_hours(spark):
    runs = delay_anomaly_runs(spark, SF_DIR).collect()
    hours = delay_anomaly_hours(spark, SF_DIR).collect()
    # every anomalous hour belongs to exactly one run
    assert sum(r.run_hours for r in runs) == len(hours)
    by_route: dict = {}
    for h in hours:
        by_route.setdefault(h.route_id, []).append(h)
    for r in runs:
        # span is consistent with length: maximal consecutive hours
        span_hours = (
            int((r.run_end - r.run_start).total_seconds()) // 3600 + 1
        )
        assert span_hours == r.run_hours
        covered = [
            h
            for h in by_route[r.route_id]
            if r.run_start <= h.hour_ts <= r.run_end
        ]
        assert len(covered) == r.run_hours
        assert r.peak_abs_z == pytest.approx(
            max(abs(h.z_score) for h in covered), abs=1e-6
        )
    # runs are maximal: no two adjacent runs on a route touch
    by_route_runs: dict = {}
    for r in runs:
        by_route_runs.setdefault(r.route_id, []).append(r)
    for rs in by_route_runs.values():
        rs.sort(key=lambda r: r.run_start)
        for a, b in zip(rs, rs[1:]):
            gap = int((b.run_start - a.run_end).total_seconds()) // 3600
            assert gap >= 2  # a gap of 1 hour would have merged them
