"""Round-6 second batch: epoch shard planning, temperature-sampled
token-budget mixing, BM25 ranked retrieval, and margin-based bitext
mining — semantics beyond the oracle gate (python-recomputed scores,
flattening/ balance identities, mutuality of the mining rule)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from big_data_project_spark.catalog import load_table
from big_data_project_spark.operators.corpus import (
    BM25_B,
    BM25_K1,
    BM25_QUERY_TERMS,
    BM25_TOP_K,
    bm25_retrieval_topk,
)
from big_data_project_spark.operators.curation import (
    MIX_TEMPERATURE,
    TOKEN_BUDGET,
    token_budget_mix,
)
from big_data_project_spark.operators.quality import (
    N_SHARDS,
    epoch_shard_plan,
    train_test_split,
)
from big_data_project_spark.operators.similarity import (
    BITEXT_K,
    BITEXT_Q,
    BITEXT_TAU,
    bitext_margin_mining,
)

from tests.conftest import SF_DIR


def _norm_tokens(text: str) -> list[str]:
    return [t for t in " ".join(text.lower().split()).split(" ") if t]


# ---------------------------------------------------------------- shards


def test_shard_plan_covers_exactly_the_train_split(spark):
    """Shard doc counts sum to the train side of train_test_split and
    doc_share sums to 1 — no doc is dropped or double-assigned."""
    shards = epoch_shard_plan(spark, SF_DIR).collect()
    split = {r.split: r.n_docs for r in train_test_split(spark, SF_DIR).collect()}
    assert sum(r.n_docs for r in shards) == split["train"]
    assert abs(sum(r.doc_share for r in shards) - 1.0) < 1e-4
    assert {r.shard for r in shards} <= set(range(N_SHARDS))


def test_shard_plan_is_reasonably_balanced(spark):
    """A content-independent hash over >=8x shard-count docs should not
    starve any shard (each shard within 3x of the mean) and every
    shard should see more than one source."""
    shards = epoch_shard_plan(spark, SF_DIR).collect()
    assert len(shards) == N_SHARDS
    mean = sum(r.n_docs for r in shards) / len(shards)
    for r in shards:
        assert mean / 3 <= r.n_docs <= mean * 3
        assert r.n_sources > 1


# ------------------------------------------------------------- token mix


def test_token_budget_mix_fills_the_budget(spark):
    """floor() loses less than one token per language, so the plan
    sums to TOKEN_BUDGET within n_langs tokens."""
    rows = token_budget_mix(spark, SF_DIR).collect()
    planned = sum(r.planned_tokens for r in rows)
    assert TOKEN_BUDGET - len(rows) <= planned <= TOKEN_BUDGET


def test_temperature_sampling_flattens_the_distribution(spark):
    """alpha=0.5 sampling lies strictly between raw and uniform: the
    dominant language's share shrinks, the smallest language's share
    grows, and ordering by share is preserved."""
    rows = token_budget_mix(spark, SF_DIR).collect()
    assert MIX_TEMPERATURE == 0.5
    hi = max(rows, key=lambda r: r.raw_share)
    lo = min(rows, key=lambda r: r.raw_share)
    uniform = 1.0 / len(rows)
    assert uniform < hi.sampled_share < hi.raw_share
    assert lo.raw_share < lo.sampled_share < uniform
    raw_order = [r.lang for r in sorted(rows, key=lambda r: r.raw_share)]
    samp_order = [
        r.lang for r in sorted(rows, key=lambda r: r.sampled_share)
    ]
    assert raw_order == samp_order


def test_epochs_equal_planned_over_available(spark):
    """epochs_i == budget * p_i / tokens_i with p_i ∝ tokens_i^alpha
    (python recompute through the LIVE temperature constant, tolerance
    covers the 6dp weight quantization)."""
    rows = token_budget_mix(spark, SF_DIR).collect()
    total_w = sum(x.n_tokens ** MIX_TEMPERATURE for x in rows)
    for r in rows:
        expect = (
            TOKEN_BUDGET
            * (r.n_tokens ** MIX_TEMPERATURE / total_w)
            / r.n_tokens
        )
        assert abs(r.epochs - expect) < 1e-3 * max(1.0, expect)


# ----------------------------------------------------------------- BM25


def test_bm25_matches_python_recompute(spark):
    """Full python BM25 over the raw corpus reproduces the operator's
    top-k lists per query (scores within 1e-5, same doc order)."""
    docs = {
        r.doc_id: _norm_tokens(r.text)
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    by_q = defaultdict(list)
    for qid, term in BM25_QUERY_TERMS:
        by_q[qid].append(term)
    expected = {}
    for qid, terms in by_q.items():
        scores = {}
        df = {
            t: sum(1 for toks in docs.values() if t in toks) for t in terms
        }
        for doc_id, toks in docs.items():
            c = Counter(toks)
            s = 0.0
            for t in terms:
                if c[t] == 0:
                    continue
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                tfc = (c[t] * (BM25_K1 + 1.0)) / (
                    c[t]
                    + BM25_K1
                    * (1.0 - BM25_B + BM25_B * (len(toks) / avgdl))
                )
                s += idf * tfc
            if s > 0:
                scores[doc_id] = s
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        expected[qid] = top[:BM25_TOP_K]
    got = defaultdict(list)
    for r in bm25_retrieval_topk(spark, SF_DIR).collect():
        got[r.query_id].append(r)
    for qid, rows in got.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert [r.doc_id for r in rows] == [d for d, _ in expected[qid]]
        for r, (_, s) in zip(rows, expected[qid]):
            assert abs(r.score - s) < 1e-5


def test_bm25_scores_non_increasing_within_query(spark):
    by_q = defaultdict(list)
    for r in bm25_retrieval_topk(spark, SF_DIR).collect():
        by_q[r.query_id].append(r)
    assert set(by_q) == {qid for qid, _ in BM25_QUERY_TERMS}
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        for a, b in zip(rows, rows[1:]):
            assert a.score >= b.score


# --------------------------------------------------------------- bitext


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return round(dot / (na * nb), 9)


def test_bitext_margin_matches_python_recompute(spark):
    """Python recompute of the full margin matrix agrees with the
    operator: same best match, margin, mutuality, and acceptance."""
    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }
    qs = sorted(v for v in emb if v < 2 * BITEXT_Q and v % 2 == 0)
    cs = sorted(v for v in emb if v % 2 == 1)
    cos = {(q, c): _cos(emb[q], emb[c]) for q in qs for c in cs}
    avgk_q = {
        q: sum(sorted((cos[(q, c)] for c in cs), reverse=True)[:BITEXT_K])
        / BITEXT_K
        for q in qs
    }
    avgk_c = {
        c: sum(sorted((cos[(q, c)] for q in qs), reverse=True)[:BITEXT_K])
        / BITEXT_K
        for c in cs
    }
    best_q_of_c = {
        c: min(qs, key=lambda q: (-cos[(q, c)], q)) for c in cs
    }
    rows = bitext_margin_mining(spark, SF_DIR).collect()
    assert len(rows) == len(qs)
    for r in rows:
        margins = {
            c: round(
                cos[(r.query_id, c)]
                / ((avgk_q[r.query_id] + avgk_c[c]) / 2.0),
                9,
            )
            for c in cs
        }
        best = min(cs, key=lambda c: (-margins[c], c))
        assert r.match_id == best
        assert abs(r.margin - margins[best]) < 1e-5
        assert r.mutual == (best_q_of_c[best] == r.query_id)
        assert r.accepted == (r.mutual and margins[best] > BITEXT_TAU)


def test_bitext_guard_trips(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BASELINE_LIMIT_MB", "0")
    with pytest.raises(ValueError, match="bitext_margin_mining"):
        bitext_margin_mining(spark, SF_DIR)


# --------------------------------------------------------------- hybrid


def test_hybrid_prf_fusion_is_consistent_with_its_inputs(spark):
    """Every fused row's rrf_score equals the reciprocal-rank sum of
    its own rank columns, fused ranks are dense 1..k per query, and
    every fused doc appears in at least one input list."""
    from big_data_project_spark.operators.similarity import (
        PRF_TOP_K,
        RRF_K,
        hybrid_prf_retrieval,
    )

    by_q = defaultdict(list)
    for r in hybrid_prf_retrieval(spark, SF_DIR).collect():
        by_q[r.query_id].append(r)
    assert set(by_q) == {qid for qid, _ in BM25_QUERY_TERMS}
    for rows in by_q.values():
        rows.sort(key=lambda r: r.fused_rank)
        assert [r.fused_rank for r in rows] == list(
            range(1, len(rows) + 1)
        )
        assert len(rows) <= PRF_TOP_K
        for r in rows:
            assert r.rank_bm25 is not None or r.rank_dense is not None
            expect = (
                (1.0 / (RRF_K + r.rank_bm25) if r.rank_bm25 else 0.0)
                + (1.0 / (RRF_K + r.rank_dense) if r.rank_dense else 0.0)
            )
            assert abs(r.rrf_score - expect) < 1e-6
        for a, b in zip(rows, rows[1:]):
            assert a.rrf_score >= b.rrf_score


def test_hybrid_prf_dense_side_matches_python_rocchio(spark):
    """Python recompute: mean the BM25 top-k embeddings (6dp per-dim),
    cosine-rank the corpus docs — the operator's rank_dense column
    reproduces that list."""
    from big_data_project_spark.operators.similarity import (
        PRF_TOP_K,
        hybrid_prf_retrieval,
    )

    seeds = defaultdict(list)
    for r in bm25_retrieval_topk(spark, SF_DIR).collect():
        seeds[r.query_id].append(r.doc_id)
    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }
    doc_ids = sorted(
        r.doc_id
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id")
        .collect()
    )
    got = defaultdict(dict)
    for r in hybrid_prf_retrieval(spark, SF_DIR).collect():
        if r.rank_dense is not None:
            got[r.query_id][r.doc_id] = r.rank_dense
    for qid, docs in seeds.items():
        vecs = [emb[d] for d in docs]
        dim = len(vecs[0])
        # mirror the operator's fold exactly: each component is cast to
        # DECIMAL(28,6) (i.e. quantized to 6dp) BEFORE the sum — a
        # full-precision sum can land the mean on the other side of the
        # final 6dp boundary and flip a near-tied dense rank
        cent = [
            math.floor(
                sum(round(v[i], 6) for v in vecs) / len(vecs) * 1e6 + 0.5
            )
            / 1e6
            for i in range(dim)
        ]
        ranked = sorted(
            doc_ids, key=lambda d: (-_cos(emb[d], cent), d)
        )[:PRF_TOP_K]
        expect = {d: i + 1 for i, d in enumerate(ranked)}
        # got[] only holds fused survivors; each must carry the
        # python-recomputed dense rank
        for d, rk in got[qid].items():
            assert expect.get(d) == rk


# ------------------------------------------------------- keep-best-quality


def test_keep_best_quality_picks_the_cluster_argmax(spark):
    """Python recompute over the cluster + quality relations: the keeper
    is the quality-argmax (tie: lowest doc_id), quality_gain is
    non-negative, and every near-dup cluster is covered exactly once."""
    from big_data_project_spark.operators.sampling import (
        dedup_clusters,
        dedup_keep_best_quality,
    )
    from big_data_project_spark.operators.textops import quality_score

    q = {
        r.doc_id: r.quality for r in quality_score(spark, SF_DIR).collect()
    }
    members = defaultdict(list)
    for r in dedup_clusters(spark, SF_DIR).collect():
        members[r.cluster_id].append(r.doc_id)
    rows = dedup_keep_best_quality(spark, SF_DIR).collect()
    assert {r.cluster_id for r in rows} == set(members)
    for r in rows:
        docs = members[r.cluster_id]
        assert r.n_members == len(docs)
        best = min(docs, key=lambda d: (-q[d], d))
        assert r.keep_doc_id == best
        assert r.rep_doc_id == min(docs)
        assert abs(r.best_quality - q[best]) < 1e-9
        assert abs(r.rep_quality - q[min(docs)]) < 1e-9
        assert r.quality_gain >= 0
        assert abs(
            r.quality_gain
            - math.floor((r.best_quality - r.rep_quality) * 1e6 + 0.5) / 1e6
        ) < 1e-9
