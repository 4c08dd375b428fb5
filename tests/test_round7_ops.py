"""Round 7 operators: oracle parity at sf0.001 + semantic unit tests."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from big_data_project_spark.registry import ORACLES, QUERIES

from .conftest import SF_DIR

ROUND7_KEYS = [
    "pca_gram_invariants",
    "bpe_vocab_k_rounds",
    "weighted_reservoir_sample",
    "delay_mean_bootstrap",
    "join_key_skew_audit",
    "event_graph_khop",
    "context_len_padding_audit",
    "expanding_window_backtest",
]


@pytest.mark.parametrize("name", ROUND7_KEYS)
def test_oracle_parity(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(ORACLES[name])
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()
    assert sorted(c.lower() for c in sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)

    def norm(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        out = []
        for r in rows:
            vals = []
            for i in order:
                v = r[i]
                if isinstance(v, float):
                    vals.append(f"{round(v, 6):.6f}")
                else:
                    vals.append(str(v))
            out.append("|".join(vals))
        return sorted(out)

    assert norm(srows, [c.lower() for c in sdf.columns]) == norm(
        drows, dcols
    )


def test_pca_invariants_trace_equals_eigensum(spark):
    """The oracle-backed invariant slice really constrains the
    rows-only eigendecomposition: sum(variance) == trace(cov) ==
    sum(eigenvalues). The PCA key reports top-16 components with
    explained_var = ev / total, so total = eigenvalue_1 /
    explained_var_1."""
    inv = QUERIES["pca_gram_invariants"](spark, SF_DIR).collect()
    trace = sum(r["variance"] for r in inv)
    pca = QUERIES["embedding_pca_variance"](spark, SF_DIR).collect()
    eig_total = pca[0]["eigenvalue"] / pca[0]["explained_var"]
    assert math.isclose(trace, eig_total, abs_tol=1e-3)
    # variances are non-negative (second moment >= mean^2 up to 6dp)
    assert all(r["variance"] >= -1e-6 for r in inv)
    assert len(inv) == 64 and all(r["n_vecs"] == inv[0]["n_vecs"] for r in inv)


def _py_bpe(words: dict[str, int], rounds: int):
    """Reference greedy BPE (Sennrich et al.'s pseudocode): per round,
    count adjacent symbol pairs weighted by word freq, merge the
    winning pair greedily left-to-right in every word."""
    vocab = {tuple(w): f for w, f in words.items()}
    out = []
    for r in range(1, rounds + 1):
        counts: dict[tuple, int] = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        (a, b), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1])
        )
        new_vocab: dict[tuple, int] = {}
        for syms, f in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            key = tuple(merged)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
        tokens = sum(len(s) * f for s, f in vocab.items())
        out.append((r, f"{a} {b}", a + b, n, tokens))
    return out


def test_bpe_k_rounds_matches_reference_greedy(spark, duck):
    """The declarative K-round unroll (double-replace greedy) equals
    the reference per-word greedy merge loop on the real corpus —
    including overlapping-occurrence words where a single replace()
    pass would diverge."""
    import re

    docs = duck.execute("SELECT text FROM documents").fetchall()
    words: dict[str, int] = {}
    for (text,) in docs:
        for w in re.sub(r"\s+", " ", str(text).lower().strip()).split(" "):
            if len(w) >= 2:
                words[w] = words.get(w, 0) + 1
    expected = _py_bpe(words, 5)
    got = [
        tuple(r)
        for r in QUERIES["bpe_vocab_k_rounds"](spark, SF_DIR).collect()
    ]
    assert got == expected


def test_bpe_k_rounds_fertility_drops(spark):
    rows = QUERIES["bpe_vocab_k_rounds"](spark, SF_DIR).collect()
    toks = [r["vocab_tokens"] for r in rows]
    assert all(a > b for a, b in zip(toks, toks[1:])), toks
    # round 1 learns exactly what the single-round key ranks first
    # (bpe_merge_pairs formats the pair as the merged bigram string)
    first = QUERIES["bpe_merge_pairs"](spark, SF_DIR).collect()[0]
    assert rows[0]["merged"] == first["pair"]
    assert rows[0]["pair_count"] == first["n"]


def test_weighted_reservoir_matches_python_aes(spark, duck):
    """The top-K by u^(1/w) (log form) equals a direct Python A-ES
    pass over the same md5 uniforms, and the draw is weight-biased:
    the sampled docs' mean weight exceeds the corpus mean."""
    import hashlib
    import math

    rows = duck.execute(
        "SELECT doc_id, n_chars FROM documents WHERE n_chars > 0"
    ).fetchall()
    keyed = []
    for doc_id, w in rows:
        h = int(hashlib.md5(f"wrs:{doc_id}".encode()).hexdigest()[:15], 16)
        u = (h + 1) / float(2**60)
        skey = math.floor(math.log(u) / w * 1e9 + 0.5) / 1e9
        keyed.append((-skey, doc_id))
    expected = [d for _k, d in sorted(keyed)[:100]]
    got = QUERIES["weighted_reservoir_sample"](spark, SF_DIR).collect()
    assert [r["doc_id"] for r in got] == expected
    sample_mean_w = sum(r["weight"] for r in got) / len(got)
    corpus_mean_w = sum(w for _d, w in rows) / len(rows)
    assert sample_mean_w > corpus_mean_w


def test_bootstrap_ci_brackets_mean_and_python_recount(spark, duck):
    """CI orientation + a full Python recount of one route's replicate
    means from the same md5-derived Poisson multiplicities."""
    import hashlib

    got = {r["event_type"]: r for r in
           QUERIES["delay_mean_bootstrap"](spark, SF_DIR).collect()}
    for r in got.values():
        assert r["boot_lo"] <= r["boot_hi"]
        assert r["boot_se"] >= 0
        # a 90% CI from 32 replicates almost surely brackets the mean
        assert r["boot_lo"] <= r["mean_delay"] <= r["boot_hi"]

    from big_data_project_spark.operators.trend import _POIS_CDF, BOOT_B

    route = sorted(got)[0]
    rows = duck.execute(
        "SELECT event_id, value FROM events"
        " WHERE value IS NOT NULL AND event_type = ?",
        [route],
    ).fetchall()
    means = []
    for b in range(BOOT_B):
        sv = n = 0.0
        for eid, v in rows:
            h = int(
                hashlib.md5(f"boot:{b}:{eid}".encode()).hexdigest()[:15], 16
            )
            u = (h + 1) / float(2**60)
            mult = 6
            for k, t in enumerate(_POIS_CDF):
                if u <= t:
                    mult = k
                    break
            sv += mult * v
            n += mult
        means.append(
            __import__("math").floor(sv / n * 1e6 + 0.5) / 1e6
        )
    means.sort()
    assert got[route]["boot_lo"] == means[1]  # rank 2 of 32
    assert got[route]["boot_hi"] == means[30]  # rank 31 of 32


def test_join_key_skew_audit_python_recount(spark, duck):
    got = {r["join_key"]: r for r in
           QUERIES["join_key_skew_audit"](spark, SF_DIR).collect()}
    for table, key in [("lineitem", "l_orderkey"), ("events", "user_id")]:
        sizes = dict(
            duck.execute(
                f"SELECT {key}, count(*) FROM {table} GROUP BY {key}"
            ).fetchall()
        )
        r = got[f"{table}.{key}"]
        assert r["n_keys"] == len(sizes)
        assert r["n_rows"] == sum(sizes.values())
        assert r["max_rows_per_key"] == max(sizes.values())
        heaviest = min(
            (k for k, c in sizes.items() if c == max(sizes.values()))
        )
        assert r["heaviest_key"] == heaviest
        assert r["skew_ratio"] >= 1.0
        assert r["p99_rows_per_key"] <= r["max_rows_per_key"]


def test_event_graph_khop_matches_python_bfs(spark, duck):
    """Direct BFS over the same distinct-edge list."""
    edges = duck.execute(
        """
        SELECT DISTINCT src, dst FROM (
          SELECT event_type AS src,
                 lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS dst
          FROM events) p
        WHERE dst IS NOT NULL AND dst <> src
        """
    ).fetchall()
    adj: dict[str, set[str]] = {}
    nodes = set()
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        nodes.update((s, d))
    expected = {}
    for start in nodes:
        frontier, dist, hops = {start}, {start: 0}, 0
        while frontier and hops < 3:
            hops += 1
            frontier = {
                d
                for s in frontier
                for d in adj.get(s, ())
                if d not in dist
            }
            for d in frontier:
                dist[d] = hops
        for dst, h in dist.items():
            if h > 0:
                expected[(start, dst)] = h
    got = {
        (r["from_type"], r["to_type"]): r["hops"]
        for r in QUERIES["event_graph_khop"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_context_len_padding_invariants(spark):
    rows = QUERIES["context_len_padding_audit"](spark, SF_DIR).collect()
    assert [r["max_len"] for r in rows] == [128, 256, 512, 1024]
    # same corpus at every config
    assert len({(r["n_docs"], r["total_tokens"]) for r in rows}) == 1
    # bigger context => never more sequences, never less single-seq share
    seqs = [r["total_seqs"] for r in rows]
    assert all(a >= b for a, b in zip(seqs, seqs[1:]))
    shares = [r["single_seq_share"] for r in rows]
    assert all(a <= b for a, b in zip(shares, shares[1:]))
    for r in rows:
        assert 0 <= r["pad_fraction"] < 1
        assert r["total_seqs"] * r["max_len"] >= r["total_tokens"]


def test_expanding_window_backtest_shape(spark):
    rows = QUERIES["expanding_window_backtest"](spark, SF_DIR).collect()
    by_route: dict[str, list] = {}
    for r in rows:
        by_route.setdefault(r["route_id"], []).append(r)
    for route, rs in by_route.items():
        rs.sort(key=lambda r: r["fold"])
        assert [r["fold"] for r in rs] == [2, 3, 4]
        # expanding window: training set strictly grows
        trains = [r["n_train"] for r in rs]
        assert all(a < b for a, b in zip(trains, trains[1:]))
        for r in rs:
            assert r["mae"] >= 0
            assert abs(r["bias"]) <= r["mae"] + 1e-9


def test_stream_weighted_sample_converges_to_batch(spark, tmp_path):
    """The streaming sample-maintenance twin: documents streamed in
    three micro-batches end in exactly the single-shot batch sample
    (A-ES mergeability), and a replayed batch (redelivery) leaves the
    served table unchanged (content-derived keys are idempotent)."""
    from big_data_project_spark.catalog import load_table
    from big_data_project_spark.operators.sampling import (
        wrs_keyed,
        wrs_top_k,
    )
    from big_data_project_spark.streaming.pipeline import (
        serve_weighted_sample_foreach_batch,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    src_dir = str(tmp_path / "docs_feed")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    state = str(tmp_path / "served_sample")
    serve_weighted_sample_foreach_batch(
        spark,
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, "
            "n_chars long"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir),
        state,
        str(tmp_path / "ckpt"),
        k=25,
    )
    served = sorted(
        tuple(r) for r in spark.read.parquet(state).collect()
    )
    expected = sorted(
        tuple(r) for r in wrs_top_k(wrs_keyed(docs), 25).collect()
    )
    assert served == expected

    # redelivery: replaying one batch through the merge is a no-op
    from big_data_project_spark.streaming import pipeline as sp

    replay = docs.filter(F.col("doc_id") % 3 == 1)
    from big_data_project_spark.operators.sampling import wrs_keyed as wk
    from big_data_project_spark.plans.sinks import (
        _read_or_none,
        stage_swap_parquet,
    )

    cand = wk(replay).select("doc_id", "weight", "skey").unionByName(
        _read_or_none(spark, state).select("doc_id", "weight", "skey")
    ).dropDuplicates(["doc_id"])
    stage_swap_parquet(spark, wrs_top_k(cand, 25), state)
    assert (
        sorted(tuple(r) for r in spark.read.parquet(state).collect())
        == expected
    )
