"""Round-5 second batch: warehouse-operations surface (per-column
table profile, LTV deciles, exact rank-based fulfillment percentiles,
monthly priority mix, tenure cohorts), robust MAD outlier screen,
last-touch attribution, weekly-half-life decayed popularity, and the
inverted-index posting-list sample.

Semantics are checked against independent pandas/numpy replications on
the shared test tables (not against the DuckDB oracles — those run in
the driver gate); invariants cover the bucket/decile edges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from big_data_project_spark.catalog import load_table, table_path
from big_data_project_spark.operators.behavior import (
    attribution_last_touch,
    event_value_decay,
)
from big_data_project_spark.operators.corpus_stats import (
    INVIDX_TOP,
    inverted_index_sample,
)
from big_data_project_spark.operators.trend import (
    MAD_CUT,
    route_delay_mad_outliers,
)
from big_data_project_spark.operators.warehouse import (
    LTV_DECILES,
    TENURE_BUCKET_DAYS,
    customer_ltv_deciles,
    customer_tenure_histogram,
    order_fulfillment_lag,
    orders_monthly_share,
    table_profile_lineitem,
)

from tests.conftest import SF_DIR


def test_table_profile_covers_every_column(spark):
    rows = {r.col_name: r for r in table_profile_lineitem(spark, SF_DIR).collect()}
    li = load_table(spark, SF_DIR, "lineitem")
    assert sorted(rows) == sorted(li.columns)
    n = li.count()
    assert all(r.n_rows == n for r in rows.values())
    # keys are dense and non-null in the generated data
    assert rows["l_orderkey"].n_null == 0
    # exact distincts and portable renders agree with direct computation
    flags = li.select("l_returnflag").distinct().collect()
    assert rows["l_returnflag"].n_distinct == len(flags)
    assert rows["l_returnflag"].min_repr == min(r[0] for r in flags)
    qmin = li.agg(F.min("l_quantity")).collect()[0][0]
    assert rows["l_quantity"].min_repr == f"{qmin:.6f}"
    # timestamp renders as a plain ISO date
    assert len(rows["l_shipdate"].min_repr) == 10


def test_customer_ltv_deciles_partition_customers(spark):
    out = customer_ltv_deciles(spark, SF_DIR).collect()
    assert [r.decile for r in out] == list(range(1, LTV_DECILES + 1))
    n_cust = (
        load_table(spark, SF_DIR, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in out) == n_cust
    # ntile over the revenue ordering: decile value ranges are nested
    for lo, hi in zip(out, out[1:]):
        assert lo.max_rev <= hi.min_rev
        assert lo.min_rev <= lo.max_rev
    # ntile balance: bucket sizes differ by at most one
    sizes = [r.n_customers for r in out]
    assert max(sizes) - min(sizes) <= 1


def test_order_fulfillment_lag_rank_percentiles(spark):
    out = order_fulfillment_lag(spark, SF_DIR).collect()
    assert len(out) == 5  # five priorities in the generated data
    for r in out:
        assert r.p50 <= r.p90 <= r.p99
    # replicate one priority's p90 with numpy rank arithmetic
    orders = pd.read_parquet(table_path(SF_DIR, "orders"))
    li = pd.read_parquet(table_path(SF_DIR, "lineitem"))
    last = li.groupby("l_orderkey")["l_shipdate"].max()
    m = orders.join(last, on="o_orderkey", how="inner")
    m["lag"] = (
        m["l_shipdate"].dt.normalize() - m["o_orderdate"].dt.normalize()
    ).dt.days
    got = {r.o_orderpriority: r for r in out}
    for prio, grp in m.groupby("o_orderpriority"):
        lags = np.sort(grp["lag"].to_numpy())
        assert got[prio].n_orders == len(lags)
        rank = max(int(np.ceil(0.9 * len(lags))), 1)
        assert got[prio].p90 == lags[rank - 1]


def test_orders_monthly_share_sums_to_one(spark):
    out = orders_monthly_share(spark, SF_DIR).toPandas()
    total = load_table(spark, SF_DIR, "orders").count()
    assert int(out["n_orders"].sum()) == total
    by_month = out.groupby("order_month")["month_share"].sum()
    assert ((by_month - 1.0).abs() < 1e-4).all()


def test_customer_tenure_histogram_bucket_edges(spark):
    out = customer_tenure_histogram(spark, SF_DIR).collect()
    n_cust = (
        load_table(spark, SF_DIR, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in out) == n_cust
    for r in out:
        assert r.min_tenure_days >= r.tenure_bucket * TENURE_BUCKET_DAYS
        assert r.max_tenure_days < (r.tenure_bucket + 1) * TENURE_BUCKET_DAYS
        assert r.avg_orders >= 1.0


def test_route_delay_mad_outliers_vs_numpy(spark):
    out = {r.route_id: r for r in route_delay_mad_outliers(spark, SF_DIR).collect()}
    ev = pd.read_parquet(table_path(SF_DIR, "events"))
    ev = ev[ev["event_type"].notna() & ev["value"].notna()]
    for route, grp in ev.groupby("event_type"):
        x = np.sort(grp["value"].to_numpy())
        n = len(x)
        med = (x[(n + 1) // 2 - 1] + x[n // 2]) / 2.0
        dev = np.sort(np.abs(grp["value"].to_numpy() - med))
        mad = (dev[(n + 1) // 2 - 1] + dev[n // 2]) / 2.0
        r = out[route]
        assert r.n_events == n
        assert r.median_delay == pytest.approx(med, abs=1e-12)
        assert r.mad == pytest.approx(mad, abs=1e-12)
        assert r.n_outliers == int((dev > MAD_CUT * mad).sum())


def test_attribution_last_touch_vs_pandas(spark):
    out = {
        r.attributed_type: r
        for r in attribution_last_touch(spark, SF_DIR).collect()
    }
    ev = pd.read_parquet(table_path(SF_DIR, "events")).sort_values(
        ["user_id", "ts", "event_id"]
    )
    counts: dict[str, int] = {}
    values: dict[str, float] = {}
    for _, grp in ev.groupby("user_id"):
        last_touch = None
        for _, row in grp.iterrows():
            if row["event_type"] == "purchase":
                key = last_touch or "direct"
                counts[key] = counts.get(key, 0) + 1
                values[key] = values.get(key, 0.0) + row["value"]
            else:
                last_touch = row["event_type"]
    assert {k: r.n_purchases for k, r in out.items()} == counts
    for k, r in out.items():
        assert r.total_value == pytest.approx(values[k], abs=0.01)
    # attribution never credits the conversion event itself
    assert "purchase" not in out


def test_event_value_decay_weights_are_powers_of_two(spark):
    out = {r.event_type: r for r in event_value_decay(spark, SF_DIR).collect()}
    ev = pd.read_parquet(table_path(SF_DIR, "events"))
    ev = ev[ev["value"].notna()]
    anchor = ev["ts"].max()
    weeks = (
        (anchor - ev["ts"]).dt.total_seconds() * 1_000_000
    ) // (7 * 24 * 3600 * 1_000_000)
    decayed = ev["value"] * np.power(0.5, weeks.astype(float))
    by_type = decayed.groupby(ev["event_type"]).sum()
    for t, r in out.items():
        assert 0.0 < r.retention_ratio <= 1.0
        assert r.decayed_value == pytest.approx(by_type[t], abs=0.01)
        assert r.decayed_value <= r.raw_value


def test_inverted_index_sample_consistency(spark):
    rows = inverted_index_sample(spark, SF_DIR).collect()
    assert 0 < len(rows) <= INVIDX_TOP
    # sorted head: document frequency is non-increasing
    dfs = [r.n_docs for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    for r in rows:
        assert r.n_docs <= r.n_occurrences
        assert r.first_doc_id <= r.last_doc_id
    # occurrence counts agree with the corpus-wide token frequencies
    from big_data_project_spark.operators.curation import token_frequencies

    freqs = {r.tok: r.n for r in token_frequencies(spark, SF_DIR).collect()}
    for r in rows:
        if r.tok in freqs:
            assert r.n_occurrences == freqs[r.tok]
