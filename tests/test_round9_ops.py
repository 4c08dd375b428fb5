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
