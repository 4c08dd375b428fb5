"""Round-5 eighth batch: the salted hot-key aggregation as an
oracle-backed key, and the one-pass partial-Gram embedding matrix.

The salted test proves plan-level salting (partials actually split by
salt) on top of the driver-gate value parity; the Gram test replicates
against numpy and checks the symmetry/PSD structure the consumers
(PCA/whitening) rely on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from big_data_project_spark.catalog import load_table, table_path
from big_data_project_spark.operators.ingest import salted_event_type_counts
from big_data_project_spark.operators.vectorops import (
    GRAM_DIM,
    GRAM_SCALE,
    embedding_gram_matrix,
)

from tests.conftest import SF_DIR


def test_salted_counts_equal_plain_groupby(spark):
    out = {r.event_type: r for r in salted_event_type_counts(spark, SF_DIR).collect()}
    ev = pd.read_parquet(table_path(SF_DIR, "events"))
    plain = ev.groupby("event_type").agg(
        n=("event_id", "count"), s=("value", "sum")
    )
    assert set(out) == set(plain.index)
    for et, row in plain.iterrows():
        assert out[et].n_events == row["n"]
        assert out[et].total_value == pytest.approx(row["s"], abs=0.01)


def test_salted_partials_actually_split(spark):
    """The first phase must group on (key, salt): with 16 buckets over
    thousands of rows per key, every key produces multiple partials —
    the straggler-splitting property the operator exists for."""
    from big_data_project_spark.functions.skew import salted_aggregate

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", "event_id"
    )
    salt = F.pmod(F.hash(F.col("event_id")), F.lit(16))
    n_partials = (
        ev.groupBy("event_type", salt.alias("s")).count().count()
    )
    n_keys = ev.select("event_type").distinct().count()
    assert n_partials > n_keys  # multiple partials per key
    # and the recombination is exact
    direct = {
        r.event_type: r["count"]
        for r in ev.groupBy("event_type").count().collect()
    }
    salted = {
        r.event_type: r.n
        for r in salted_aggregate(
            ev,
            keys=["event_type"],
            metrics={"n": ("count", "event_id")},
            distributor="event_id",
        ).collect()
    }
    assert salted == direct


def test_gram_matrix_matches_numpy_and_is_symmetric(spark):
    rows = embedding_gram_matrix(spark, SF_DIR).collect()
    assert len(rows) == GRAM_DIM * GRAM_DIM
    g = np.zeros((GRAM_DIM, GRAM_DIM))
    for r in rows:
        g[r.i - 1, r.j - 1] = r.gram
    # symmetric by construction (identical quantized products)
    assert np.array_equal(g, g.T)
    # diagonal is the squared-norm sum per dimension: strictly positive
    assert (np.diag(g) > 0).all()
    # numpy replication of the quantized fold
    emb = pd.read_parquet(table_path(SF_DIR, "embeddings"))
    e = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    units = np.floor(
        np.einsum("ri,rj->rij", e, e) * GRAM_SCALE + 0.5
    ).astype(np.int64).sum(axis=0)
    expect = units / GRAM_SCALE
    # operator rounds to 4 dp
    assert np.allclose(g, np.round(expect * 1e4) / 1e4, atol=1e-4)
    # PSD sanity on the unquantized moment matrix
    w = np.linalg.eigvalsh(e.T @ e)
    assert w.min() > -1e-6
