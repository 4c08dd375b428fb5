"""Round-5 third batch: commerce analytics (ABC classification,
market-basket brand pairs, repeat-purchase cadence, supplier HHI,
GROUPING SETS report) and C4-style normalized exact dedup.

Semantics are checked against independent pandas replications on the
shared test tables (the DuckDB oracles run in the driver gate);
invariants cover the Pareto cut edges, pair symmetry, grouping-flag
algebra, and the normalization collapse direction.
"""

from __future__ import annotations

import itertools

import pandas as pd
import pytest

from pyspark.sql import functions as F

from big_data_project_spark.catalog import load_table, table_path
from big_data_project_spark.operators.commerce import (
    ABC_A_PCT,
    ABC_B_PCT,
    BASKET_TOP_PAIRS,
    GAP_BUCKET_DAYS,
    basket_part_pairs,
    customer_order_gaps,
    dedup_normalized,
    part_revenue_abc,
    sales_grouping_sets,
    supplier_concentration_hhi,
)

from tests.conftest import SF_DIR


def _pd(name):
    return pd.read_parquet(table_path(SF_DIR, name))


def test_part_revenue_abc_partitions_and_shares(spark):
    out = {r.abc_class: r for r in part_revenue_abc(spark, SF_DIR).collect()}
    assert sorted(out) == ["A", "B", "C"]
    li = _pd("lineitem")
    n_parts = li["l_partkey"].nunique()
    assert sum(r.n_parts for r in out.values()) == n_parts
    # shares sum to ~1 and respect the Pareto cuts: A holds <= 80%,
    # A+B <= 95% plus at most one straddling part each
    shares = {k: r.revenue_share for k, r in out.items()}
    assert abs(sum(shares.values()) - 1.0) < 1e-4
    assert shares["A"] <= ABC_A_PCT / 100 + 1e-9
    assert shares["A"] + shares["B"] <= ABC_B_PCT / 100 + 1e-9
    # A carries the revenue mass by construction of the cut
    assert shares["A"] > shares["C"]
    # pandas replication of the exact-unit cut
    units = (
        (li["l_extendedprice"] * (1 - li["l_discount"]) * 10000 + 0.5)
        .pipe(lambda s: s.astype("int64"))
        .groupby(li["l_partkey"])
        .sum()
        .sort_index()
    )
    ranked = units.sort_values(ascending=False, kind="mergesort")
    # mergesort keeps index order for ties == partkey tie-break
    run = ranked.cumsum()
    total = int(units.sum())
    cls = pd.Series("C", index=ranked.index)
    cls[run * 100 <= total * ABC_B_PCT] = "B"
    cls[run * 100 <= total * ABC_A_PCT] = "A"
    counts = cls.value_counts()
    for k in "ABC":
        assert out[k].n_parts == int(counts[k])


def test_basket_pairs_match_pandas_counts(spark):
    out = basket_part_pairs(spark, SF_DIR).collect()
    assert len(out) == BASKET_TOP_PAIRS
    assert [r.pair_rank for r in out] == list(range(1, BASKET_TOP_PAIRS + 1))
    # support is non-increasing and pairs are canonically ordered
    for r in out:
        assert r.brand_a < r.brand_b
    for hi, lo in zip(out, out[1:]):
        assert hi.n_orders >= lo.n_orders
    # pandas replication of pair supports
    li = _pd("lineitem")
    part = _pd("part")[["p_partkey", "p_brand"]]
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    support: dict = {}
    for _, brands in j.groupby("l_orderkey")["p_brand"]:
        for a, b in itertools.combinations(sorted(set(brands)), 2):
            support[(a, b)] = support.get((a, b), 0) + 1
    for r in out:
        assert support[(r.brand_a, r.brand_b)] == r.n_orders
    top_support = sorted(support.values(), reverse=True)
    assert [r.n_orders for r in out] == top_support[:BASKET_TOP_PAIRS]


def test_customer_order_gaps_bucket_edges_and_mass(spark):
    out = customer_order_gaps(spark, SF_DIR).collect()
    o = _pd("orders")
    n_orders = len(o)
    n_customers = o["o_custkey"].nunique()
    # every order except each customer's first contributes one gap
    assert sum(r.n_gaps for r in out) == n_orders - n_customers
    for r in out:
        assert r.bucket_lo_days == r.gap_bucket * GAP_BUCKET_DAYS
        assert r.bucket_lo_days <= r.avg_gap_days < r.bucket_lo_days + GAP_BUCKET_DAYS
    # pandas replication of the bucket counts
    o = o.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    gaps = (
        o.groupby("o_custkey")["o_orderdate"]
        .diff()
        .dt.days.dropna()
        .astype("int64")
    )
    counts = (gaps // GAP_BUCKET_DAYS).value_counts()
    for r in out:
        assert counts[r.gap_bucket] == r.n_gaps


def test_supplier_hhi_bounds_and_pandas(spark):
    out = supplier_concentration_hhi(spark, SF_DIR).collect()
    nat = _pd("nation")
    li = _pd("lineitem")
    sup = _pd("supplier")[["s_suppkey", "s_nationkey"]]
    units = (
        (li["l_extendedprice"] * (1 - li["l_discount"]) * 10000 + 0.5)
        .astype("int64")
        .groupby(li["l_suppkey"])
        .sum()
        .rename("units")
        .reset_index()
    )
    j = units.merge(sup, left_on="l_suppkey", right_on="s_suppkey").merge(
        nat, left_on="s_nationkey", right_on="n_nationkey"
    )
    j["rev"] = (j["units"] + 50) // 100 / 100.0
    # one output row per nation that has revenue-bearing suppliers
    assert {r.nation for r in out} == set(j["n_name"].unique())
    for r in out:
        g = j[j["n_name"] == r.nation]
        assert r.n_suppliers == len(g)
        # 1/n <= HHI <= 1
        assert 1.0 / len(g) - 1e-9 <= r.hhi <= 1.0
        expected = float((g["rev"] ** 2).sum() / g["rev"].sum() ** 2)
        assert r.hhi == pytest.approx(expected, abs=2e-6)
        assert r.total_revenue == pytest.approx(float(g["rev"].sum()), abs=0.01)


def test_sales_grouping_sets_subtotal_algebra(spark):
    rows = sales_grouping_sets(spark, SF_DIR).collect()
    detail = [r for r in rows if r.g_year == 0 and r.g_priority == 0]
    by_year = [r for r in rows if r.g_year == 0 and r.g_priority == 1]
    by_prio = [r for r in rows if r.g_year == 1 and r.g_priority == 0]
    grand = [r for r in rows if r.g_year == 1 and r.g_priority == 1]
    assert len(grand) == 1
    n = grand[0].n_orders
    assert n == len(_pd("orders"))
    # every grouping set partitions the same corpus
    assert sum(r.n_orders for r in detail) == n
    assert sum(r.n_orders for r in by_year) == n
    assert sum(r.n_orders for r in by_prio) == n
    # subtotal rows carry NULL on the grouped-out column, detail rows
    # carry real values (GROUPING disambiguates)
    assert all(r.priority is None for r in by_year)
    assert all(r.order_year is None for r in by_prio)
    assert all(
        r.order_year is not None and r.priority is not None for r in detail
    )
    # revenue subtotals agree across cuts to the rounding grain
    assert sum(r.revenue for r in by_year) == pytest.approx(
        grand[0].revenue, abs=0.05
    )


def test_dedup_normalized_collapse_direction(spark):
    r = dedup_normalized(spark, SF_DIR).collect()[0]
    docs = _pd("documents")
    assert r.n_docs == len(docs)
    assert r.raw_distinct == docs["text"].nunique()
    # normalization can only merge classes, never split them
    assert r.norm_distinct <= r.raw_distinct
    assert r.collapsed == r.raw_distinct - r.norm_distinct
    norm = (
        docs["text"]
        .str.lower()
        .str.replace(r"[^a-z0-9 ]", "", regex=True)
        .str.replace(r" +", " ", regex=True)
        .str.strip()
    )
    assert r.norm_distinct == norm.nunique()
    # planted case/punctuation twins collapse under normalization
    spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello   world"), (3, "other doc")],
        "doc_id long, text string",
    ).createOrReplaceTempView("_norm_probe")
    probe = spark.sql(
        """SELECT count(DISTINCT md5(text)) AS raw,
                  count(DISTINCT md5(trim(regexp_replace(
                    regexp_replace(lower(text), '[^a-z0-9 ]', ''),
                    ' +', ' ')))) AS norm
           FROM _norm_probe"""
    ).collect()[0]
    assert probe.raw == 3 and probe.norm == 2
