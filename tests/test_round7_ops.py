"""Round 7 operators: oracle parity at sf0.001 + semantic unit tests."""

from __future__ import annotations

import math

import pytest

from big_data_project_spark.registry import ORACLES, QUERIES

from .conftest import SF_DIR

ROUND7_KEYS = [
    "pca_gram_invariants",
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
