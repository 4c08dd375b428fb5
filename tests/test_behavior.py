"""Behavior-analytics family (operators/behavior.py): strict-funnel
semantics on crafted inputs, plan-shape guarantees, and invariants the
oracle-parity hash can't see (monotonicity, probability normalization).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_project_spark.operators import behavior

from tests.conftest import SF_DIR


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    d = tmp_path / "sf"
    df.write.parquet(str(d / "events.parquet"))
    return str(d)


def test_funnel_strict_ordering(spark, tmp_path):
    """A click BEFORE the user's first view must not advance the
    funnel; a purchase before the qualifying click must not either."""
    rows = [
        # user 1: full ordered funnel
        (1, "2026-01-01 10:00:00", 1, "view", 0.0, "{}"),
        (2, "2026-01-01 10:01:00", 1, "click", 0.0, "{}"),
        (3, "2026-01-01 10:02:00", 1, "purchase", 0.0, "{}"),
        # user 2: click precedes first view -> stage 1 only
        (4, "2026-01-01 09:00:00", 2, "click", 0.0, "{}"),
        (5, "2026-01-01 10:00:00", 2, "view", 0.0, "{}"),
        # user 3: purchase precedes the click-after-view -> stage 2
        (6, "2026-01-01 10:00:00", 3, "view", 0.0, "{}"),
        (7, "2026-01-01 10:01:00", 3, "purchase", 0.0, "{}"),
        (8, "2026-01-01 10:02:00", 3, "click", 0.0, "{}"),
        # user 4: never views -> not an entrant
        (9, "2026-01-01 10:00:00", 4, "purchase", 0.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {
        r["stage"]: r["n_users"]
        for r in behavior.funnel_conversion(spark, sf).collect()
    }
    assert out == {1: 3, 2: 2, 3: 1}


def test_funnel_single_exchange_plan(spark):
    """The per-user funnel must keep all three stage window-mins and
    the final aggregate on ONE user_id exchange."""
    df = behavior._user_funnel(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_funnel_counts_monotone(spark):
    rows = behavior.funnel_conversion(spark, SF_DIR).collect()
    counts = [r["n_users"] for r in sorted(rows, key=lambda r: r["stage"])]
    assert counts == sorted(counts, reverse=True)
    assert rows[0]["conversion"] <= 1.0


def test_retention_offset_zero_is_full_cohort(spark):
    """Every cohort member is active on their own first day."""
    for r in behavior.retention_cohorts(spark, SF_DIR).collect():
        if r["day_offset"] == 0:
            assert r["n_active"] == r["cohort_users"]
            assert r["retention"] == 1.0
        assert 0 < r["retention"] <= 1.0


def test_dau_never_exceeds_wau(spark):
    for r in behavior.dau_rolling_wau(spark, SF_DIR).collect():
        assert 0 < r["dau"] <= r["wau"]
        assert 0 < r["stickiness"] <= 1.0


def test_transition_probs_normalize(spark):
    rows = behavior.event_transition_matrix(spark, SF_DIR).collect()
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r["from_type"]] = by_from.get(r["from_type"], 0.0) + r["prob"]
    for total in by_from.values():
        # each row is rounded to 4dp before summing
        assert abs(total - 1.0) < 5e-4 * 5


def test_conversion_lag_positive(spark, tmp_path):
    rows = [
        (1, "2026-01-01 10:00:00", 1, "view", 0.0, "{}"),
        (2, "2026-01-01 10:00:30", 1, "click", 0.0, "{}"),
        (3, "2026-01-01 10:02:00", 1, "purchase", 0.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    [r] = behavior.funnel_conversion_lag(spark, sf).collect()
    assert r["n_converted"] == 1
    assert r["avg_view_to_click_s"] == 30.0
    assert r["avg_click_to_purchase_s"] == 90.0
