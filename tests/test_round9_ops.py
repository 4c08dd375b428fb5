"""Round 9: hardening + depth (round-8 verdict items).

- demand_leaderboard_audit: the oracle-backed twin of the rows-only RF
  leaderboard — coverage columns must MATCH the rows-only key arm by
  arm, leaving only mae(random_forest) unverified.
"""

from __future__ import annotations

import pytest

from big_data_project_spark.ml import demand as _demand

from tests.conftest import SF_DIR


def test_leaderboard_audit_matches_rows_only_leaderboard(spark):
    """Every deterministic cell of demand_model_leaderboard is now under
    the hash gate via the audit twin: n_eval agrees arm-by-arm (the
    portable cume-dist cut selects the same test rows as the
    approxQuantile cut), the baseline arms' MAE agrees exactly, and the
    ONLY cell the audit leaves NULL is the RF's own score."""
    audit = {
        r["model"]: r
        for r in _demand.demand_leaderboard_audit(spark, SF_DIR).collect()
    }
    board = {
        r["model"]: r
        for r in _demand.demand_model_leaderboard(spark, SF_DIR).collect()
    }
    assert set(audit) == set(board) == {
        "random_forest", "persistence", "seasonal_naive"
    }
    for m in board:
        assert audit[m]["n_eval"] == board[m]["n_eval"], m
    assert audit["persistence"]["mae"] == board["persistence"]["mae"]
    assert audit["seasonal_naive"]["mae"] == board["seasonal_naive"]["mae"]
    assert audit["random_forest"]["mae"] is None
    assert board["random_forest"]["mae"] is not None


def test_streaming_kmv_converges_to_batch_sketch(spark, tmp_path):
    """Three micro-batches of KMV union-recut merges reproduce the
    batch operator's sketch columns EXACTLY — the theta-family
    mergeability claim (top-k of a union == top-k of per-part top-ks),
    exercised through the streaming twin and read off the served
    state with the shared pair-estimate algebra."""
    from pyspark.sql import functions as F

    from big_data_project_spark.catalog import load_table
    from big_data_project_spark.operators.sketches import (
        kmv_set_intersection,
    )
    from big_data_project_spark.streaming.pipeline import (
        EVENTS_SCHEMA,
        read_kmv_intersection,
        serve_kmv_foreach_batch,
    )

    ev = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "events_stream")
    ev.repartition(3).write.parquet(src)
    state = str(tmp_path / "kmv_state")
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    serve_kmv_foreach_batch(spark, stream, state, str(tmp_path / "ckpt"))
    served = {
        (r["route_a"], r["route_b"]): r
        for r in read_kmv_intersection(spark, state).collect()
    }
    batch = {
        (r["route_a"], r["route_b"]): r
        for r in kmv_set_intersection(spark, SF_DIR).collect()
    }
    assert set(served) == set(batch) and len(batch) > 0
    for k, s in served.items():
        assert s["n_common_sample"] == batch[k]["n_common_sample"], k
        assert s["est_common"] == batch[k]["est_common"], k


def test_kmv_merge_replay_guard(spark, tmp_path):
    """A replayed batch_id is a no-op (returns False, state untouched)
    and the next id merges — the monotonic-guard idempotence contract
    shared with merge_quantile_bins_batch."""
    from pyspark.sql import functions as F

    from big_data_project_spark.catalog import load_table
    from big_data_project_spark.plans.sinks import read_upsert_table
    from big_data_project_spark.streaming.pipeline import merge_kmv_batch

    ev = load_table(spark, SF_DIR, "events")
    state = str(tmp_path / "kmv_state")
    assert merge_kmv_batch(ev, 0, state)
    before = sorted(
        tuple(r)
        for r in read_upsert_table(spark, state)
        .select("route_id", "user_id")
        .collect()
    )
    assert not merge_kmv_batch(ev, 0, state)
    after = sorted(
        tuple(r)
        for r in read_upsert_table(spark, state)
        .select("route_id", "user_id")
        .collect()
    )
    assert before == after
    assert merge_kmv_batch(ev.limit(0), 1, state)
    assert (
        read_upsert_table(spark, state).agg(F.max("last_batch")).first()[0]
        == 1
    )


def test_nmf_rounds_objective_monotone(spark):
    """Lee & Seung Theorem 1 over the UNROLLED rounds: the Frobenius
    reconstruction objective is non-increasing across every
    alternating (H, W) multiplicative round — the convergence evidence
    the round-8 verdict asked to put under the oracle gate (the same
    per-round rows the hash gate checks carry it)."""
    from big_data_project_spark.operators.corpus import (
        NMF_ROUNDS,
        nmf_topic_rounds,
    )

    rows = nmf_topic_rounds(spark, SF_DIR).collect()
    assert [r["round"] for r in rows] == list(range(NMF_ROUNDS + 1))
    objs = [r["objective"] for r in rows]
    for a, b in zip(objs, objs[1:]):
        # 9dp factor quantization between updates can nudge the exact
        # guarantee by a hair; the descent itself is orders larger
        assert b <= a + 1e-6, objs
    # a real fit, not a fixed point: the first round must actually move
    assert objs[1] < objs[0]
    for r in rows:
        assert r["h_l1"] > 0 and r["w_l1"] > 0
