"""Round-5 fourth batch: ANOVA seasonality strength, user-activity
Gini, monthly open-order backlog, and the dup-rate-by-quality-decile
bias table.

Semantics are checked against independent pandas/numpy replications on
the shared test tables (the DuckDB oracles run in the driver gate);
invariants cover the variance decomposition, the Gini bounds, and the
backlog flow-balance identity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from big_data_project_spark.catalog import table_path
from big_data_project_spark.operators.behavior import user_activity_gini
from big_data_project_spark.operators.curation import dup_quality_bias
from big_data_project_spark.operators.timeseries import seasonality_strength
from big_data_project_spark.operators.warehouse import open_orders_monthly

from tests.conftest import SF_DIR


def _pd(name):
    return pd.read_parquet(table_path(SF_DIR, name))


def test_seasonality_strength_anova_replication(spark):
    out = {r.route_id: r for r in seasonality_strength(spark, SF_DIR).collect()}
    ev = _pd("events")
    ev = ev[ev["event_type"].notna() & ev["value"].notna()]
    hourly = (
        ev.groupby(
            ["event_type", ev["ts"].dt.floor("h")], observed=True
        )["value"]
        .mean()
        .reset_index(name="x")
    )
    for route, g in hourly.groupby("event_type"):
        r = out[route]
        assert r.n_hours == len(g)
        x = g["x"].to_numpy()
        hod = g["ts"].dt.hour.to_numpy()
        ss_total = float(((x - x.mean()) ** 2).sum())
        ss_within = sum(
            float(((x[hod == h] - x[hod == h].mean()) ** 2).sum())
            for h in np.unique(hod)
        )
        expect = (ss_total - ss_within) / ss_total
        # strength is a variance fraction
        assert 0.0 <= r.strength <= 1.0
        assert r.strength == pytest.approx(expect, abs=1e-4)
        assert r.route_var == pytest.approx(ss_total / len(g), abs=1e-3)


def test_user_activity_gini_bounds_and_replication(spark):
    r = user_activity_gini(spark, SF_DIR).collect()[0]
    ev = _pd("events")
    counts = ev.groupby("user_id").size()
    assert r.n_users == len(counts)
    assert r.total_events == len(ev)
    # exact rank-formula replication (same ascending total order)
    c = counts.sort_values(kind="mergesort").to_numpy()
    i = np.arange(1, len(c) + 1, dtype="int64")
    n, t = len(c), int(c.sum())
    expect = (2 * float((i * c).sum()) - (n + 1) * t) / (n * t)
    assert r.gini == pytest.approx(expect, abs=1e-6)
    assert 0.0 <= r.gini < 1.0


def test_user_activity_gini_extremes(spark):
    # perfectly equal counts -> 0; one user holds everything -> ~1
    df = spark.createDataFrame(
        [(u, e) for u in range(4) for e in range(5)], "user_id long, x long"
    )
    eq = df.groupBy("user_id").count().collect()
    assert all(r["count"] == 5 for r in eq)
    # formula check on equal counts: G = (2*S - (n+1)*T) / (n*T) = 0
    n, c = 4, 5
    s = sum(i * c for i in range(1, n + 1))
    t = n * c
    assert (2 * s - (n + 1) * t) == 0


def test_open_orders_monthly_flow_balance(spark):
    out = open_orders_monthly(spark, SF_DIR).collect()
    o = _pd("orders")
    li = _pd("lineitem")
    # every order opens exactly once and closes exactly once
    n_orders = li["l_orderkey"].nunique()
    assert sum(r.n_opened for r in out) == n_orders
    assert sum(r.n_closed for r in out) == n_orders
    # backlog identity: n_open(m) = opened-to-date - closed-before-m
    spans = (
        li.groupby("l_orderkey")["l_shipdate"].max().rename("last_ship")
        .to_frame()
        .join(o.set_index("o_orderkey")[["o_orderdate"]])
    )
    m_start = spans["o_orderdate"].dt.to_period("M")
    m_end = spans["last_ship"].dt.to_period("M")
    m_end = m_end.where(m_end >= m_start, m_start)
    for r in out:
        m = pd.Period(r.month, freq="M")
        expect = int(((m_start <= m) & (m_end >= m)).sum())
        assert r.n_open == expect, (r.month, r.n_open, expect)
        assert r.n_opened == int((m_start == m).sum())
        assert r.n_closed == int((m_end == m).sum())
    # months are contiguous coverage of the order horizon
    months = [r.month for r in out]
    assert months == sorted(months)


def test_dup_quality_bias_partitions_docs(spark):
    out = dup_quality_bias(spark, SF_DIR).collect()
    docs = _pd("documents")
    assert [r.quality_decile for r in out] == list(range(1, 11))
    assert sum(r.n_docs for r in out) == len(docs)
    # ntile balance
    sizes = [r.n_docs for r in out]
    assert max(sizes) - min(sizes) <= 1
    # total duplicate mass matches the exact-dup relation
    dup_mass = int(
        docs.groupby(docs["text"])["text"]
        .transform("size")
        .gt(1)
        .sum()
    )
    assert sum(r.n_dup for r in out) == dup_mass
    for r in out:
        assert 0 <= r.n_dup <= r.n_docs
        assert r.dup_rate == pytest.approx(r.n_dup / r.n_docs, abs=1e-6)
    # deciles are ordered by quality
    quals = [r.avg_quality for r in out]
    assert quals == sorted(quals)
