"""Document deduplication: exact-hash, exact n-gram Jaccard, MinHash-LSH,
and SimHash — the LLM-training-data operators layered on the reference's
dedup hygiene (drop_duplicates in gtfs-static-job.py:140-145 is the
reference's only dedup; these are its content-aware scale-out forms).

Portability: every hash is md5-derived (identical across engines) with
the top 60 bits taken as a BIGINT; shingling uses 1-based indexing in
both dialects.

Scale design:
- Shingling/hashing is map-side only.
- MinHash aggregates 16 signatures in ONE shuffle per doc; LSH banding
  turns candidate generation into an equi-join on (band_idx, band_val) —
  never a cross join. Candidate pairs are verified with exact Jaccard.
- SimHash candidates come from a 4×8-bit band equi-join; by pigeonhole
  any pair within hamming distance 3 shares at least one band, so the
  banded plan returns EXACTLY the brute-force result (the oracle is the
  brute-force form — recall 1.0 is provable, not hoped for).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, load_table_spread
from ..functions.portable import pround, sql_pround

TAU = 0.8  # exact-Jaccard duplicate threshold
SWEEP_TAUS = (0.5, 0.6, 0.7, 0.8, 0.9)  # dedup_threshold_sweep grid
MINHASH_N = 16
BANDS = 8  # 8 bands x 2 rows
# Affine MinHash permutations over GF(p), p = 2^31-1: ONE md5 per shingle
# (not one per signature), then m_j = min((A_j*h + B_j) mod p). h < p and
# A_j < p keep every product within signed-64 exact range in both engines.
MERSENNE_P = (1 << 31) - 1
_MH_A = [((2 * j + 1) * 2654435761) % MERSENNE_P for j in range(MINHASH_N)]
_MH_B = [(j * 40503 + 17) % MERSENNE_P for j in range(MINHASH_N)]
SIM_BITS = 32
SIM_BANDS = 4  # 4 bands x 8 bits -> exact for hamming <= 3
HAMMING_MAX = 3


# Explicit whitespace class: Java's \s includes \x0B, RE2's does not —
# spelling the class out keeps Spark and the oracle bit-identical on any
# input, not just the ASCII-printable test corpus.
_WS = r"[ \t\n\r\f\x0B]+"


def _norm(c: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(c)), _WS, " ")


def _hash60(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


_SQL_NORM = (
    "regexp_replace(lower(trim(text)), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')"
)


def _shingle_arr(c: Column) -> Column:
    """Array of DISTINCT 3-gram word shingles for one document — pure
    map-side array ops, zero shuffles.

    Built with ``zip_with`` over the token array and its slices rather
    than (a) a higher-order ``transform`` whose lambda CAPTURES the
    ``split()`` column — projection collapse inlines the split into the
    lambda and re-evaluates it per element, O(tokens^2) per doc — or
    (b) the round-1 posexplode + lead-window form, which paid a full
    shuffle+sort on doc_id just to build shingles. ``zip_with`` lambdas
    only touch their own arguments, so the split is evaluated a constant
    number of times per row. The shorter slice is null-padded by
    zip_with; the null concats mark the tail and are filtered off."""
    toks = F.split(_norm(c), " ")
    n = F.size(toks)
    g2 = F.zip_with(
        toks,
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    g3 = F.zip_with(
        g2,
        F.slice(toks, 3, F.greatest(n - 2, F.lit(0))),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    return F.array_distinct(F.filter(g3, lambda x: x.isNotNull()))


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh): distinct 3-gram word shingles per document —
    explode of the map-side shingle array (no window, no distinct
    shuffle; per-doc distinctness comes from array_distinct)."""
    docs = load_table_spread(spark, sf_dir, "documents", "doc_id")
    return docs.select(
        "doc_id", F.explode(_shingle_arr(F.col("text"))).alias("sh")
    )


_SQL_SHINGLES = f"""
    SELECT doc_id,
           unnest(list_distinct(list_transform(
             range(1, greatest(len(toks) - 1, 1)),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
           ))) AS sh
    FROM (SELECT doc_id, string_split({_SQL_NORM}, ' ') AS toks
          FROM documents) d
    WHERE len(toks) >= 3
"""


def _persisted(df: DataFrame) -> DataFrame:
    """MEMORY_AND_DISK-persist a relation the plan consumes several
    times. Spark re-executes shared subplans per use (no automatic CTE
    materialization), so the pair ops below would otherwise tokenize the
    corpus 3-4x. Tracked centrally (caching.py) so long-lived sessions
    can release the accumulated cache footprint via
    ``caching.release_caches()``."""
    from ..caching import persisted

    return persisted(df)


def _jaccard_pairs(shingles: DataFrame) -> DataFrame:
    """Exact pairwise Jaccard over the shingle sets (equi-join on the
    shingle value, never a cross join)."""
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(F.broadcast(sa), F.col("a_id") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("b_id") == F.col("sb.doc_id"))
        .select(
            "a_id",
            "b_id",
            (
                F.col("i").cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.col("i"))
            ).alias("jaccard"),
        )
    )


_SQL_JACCARD_PAIRS = f"""
    WITH s AS ({_SQL_SHINGLES}),
    sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT a_id, b_id,
           CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = a_id
    JOIN sz sb ON sb.doc_id = b_id
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 of whitespace-normalized text, keep min doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5(_norm(F.col("text"))).alias("doc_hash"))
        .groupBy("doc_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard >= TAU.

    RECALL BASELINE ONLY: the same-shingle equi-join is quadratic in
    per-shingle frequency (a stop-word-like shingle explodes it at
    corpus scale) — guarded so it can never be pointed at production
    data; dedup_minhash_lsh is the scale path."""
    from ..catalog import assert_baseline_scale

    assert_baseline_scale(
        sf_dir, "documents", "dedup_ngram_jaccard", "dedup_minhash_lsh"
    )
    pairs = _jaccard_pairs(_persisted(_shingles(spark, sf_dir)))
    return pairs.filter(F.col("jaccard") >= TAU).select(
        "a_id", "b_id", F.round("jaccard", 6).alias("jaccard")
    )


def _doc_hash_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, hs, n): per-doc array of DISTINCT 31-bit shingle hashes
    plus its size — entirely map-side (shingling, hashing, and the
    per-doc distinct are all array ops on the row). Shuffles only ever
    carry one compact array row per doc, never an exploded
    (doc, shingle) relation. Jaccard over hashed shingles equals Jaccard
    over the strings modulo 2^-31 collisions (the oracle hashes
    identically, so parity is exact either way)."""
    docs = load_table_spread(spark, sf_dir, "documents", "doc_id")
    # Docs with < 3 tokens have no shingles. Filter on the CHEAP token
    # count, not on size(hs): a predicate over the hash array would be
    # pushed below the repartition exchange and evaluate the whole
    # md5-shingle chain serially on the unsplit scan task (measured 4.5s
    # of the round-1 5.9s cold time); the token-count predicate pushes
    # down too but costs only a split().
    docs = docs.filter(
        F.size(F.split(_norm(F.col("text")), " ")) >= 3
    )
    hs = F.array_distinct(
        F.transform(
            _shingle_arr(F.col("text")), lambda s: _hash60(s) % MERSENNE_P
        )
    )
    # EXACTLY ONE copy of the hash chain in this projection. Higher-
    # order functions run interpreted (no whole-stage codegen, no
    # common-subexpression elimination), and CollapseProject inlines
    # this expression into every consumer — so callers MUST persist this
    # frame before deriving size/signature columns, or the md5 chain is
    # re-evaluated once per derived column (measured 18x at round 2).
    return docs.select("doc_id", hs.alias("hs"))


_SQL_SHINGLE_HASHES = f"""
    SELECT DISTINCT doc_id,
           {{h}} % {MERSENNE_P} AS h31
    FROM ({_SQL_SHINGLES}) s
"""


def _mh_perm(j: int):
    """One-arg lambda factory (PySpark derives higher-order-function
    arity from the lambda signature, so the closure index can't ride as
    a default argument)."""
    a, b = _MH_A[j], _MH_B[j]
    return lambda h: (F.lit(a) * h + F.lit(b)) % MERSENNE_P


def _band_relation(spark: SparkSession, sf_dir: str):
    """(docs_arr, bands): the persisted per-doc hash arrays and the
    exploded (doc_id, band_idx, band_val) LSH band relation — shared by
    dedup_minhash_lsh and the banding diagnostics."""
    # Persist BEFORE deriving signatures: the persist is the projection-
    # collapse barrier that keeps the md5 chain evaluated once per doc
    # (see _doc_hash_arrays). The relation is one compact array row per
    # doc and feeds the band build and both verify joins.
    docs_arr = _persisted(_doc_hash_arrays(spark, sf_dir))
    # MinHash signatures are per-doc minima over the cached hash array —
    # MAP-SIDE array ops over longs, no signature shuffle.
    sigs = docs_arr.select(
        "doc_id",
        *[
            F.array_min(F.transform("hs", _mh_perm(j))).alias(f"m{j}")
            for j in range(MINHASH_N)
        ],
    )
    band_cols = F.array(
        *[
            F.concat_ws(
                ",", F.col(f"m{2 * k}"), F.col(f"m{2 * k + 1}")
            )
            for k in range(BANDS)
        ]
    )
    bands = sigs.select(
        "doc_id", F.posexplode(band_cols).alias("band_idx", "band_val")
    )
    return docs_arr, bands


def _verified_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs with their UNROUNDED exact Jaccard, before
    any threshold: dedup_minhash_lsh filters this at TAU;
    dedup_threshold_sweep profiles it across thresholds;
    dedup_editdist_verify re-scores it at the character level.

    PERSISTED + SESSION-MEMOIZED (round-9 optimization, guide §2.4/§5
    + §7.3 driver-side planning cost): the relation is output-sized
    (candidate pairs, not the corpus) and has four in-session consumers
    (minhash_lsh → the shared pair list, threshold_sweep,
    editdist_verify, minhash_accuracy's exact arm) — without the
    persist each one re-runs the band self-join + distinct + both
    doc-array joins per execution. The memo (rollups.shared_rollup, the
    same tier the kpi frames and the k-means fit use) additionally
    builds the PLAN once per (application, sf_dir): re-CONSTRUCTING the
    LSH lineage (16 minhash permutation trees, band expressions) per
    call cost ~1 s of pure py4j/driver time in every consumer
    (measured: dedup_incremental construct 1.0 s vs action 0.5 s). At
    100 TB this is the pair list every dedup stage would read from the
    shuffle store anyway."""
    from ..rollups import shared_rollup

    return shared_rollup(
        spark, sf_dir, "lsh_verified_candidates", _verified_candidates_uncached
    )


def _verified_candidates_uncached(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs_arr, bands = _band_relation(spark, sf_dir)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .distinct()
    )
    # Exact-Jaccard verify on candidates only: join the candidate pairs
    # back to the per-doc hash arrays and intersect IN-ROW — no exploded
    # (doc, shingle) shuffle. No broadcast hint: at 100 TB neither side
    # of the doc-array join is broadcast-safe; AQE picks broadcast at
    # small SF on its own.
    za = docs_arr.select(
        F.col("doc_id").alias("a_id"),
        F.col("hs").alias("hs_a"),
        F.size("hs").alias("na"),
    )
    zb = docs_arr.select(
        F.col("doc_id").alias("b_id"),
        F.col("hs").alias("hs_b"),
        F.size("hs").alias("nb"),
    )
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    return (
        cand.join(za, "a_id")
        .join(zb, "b_id")
        .select(
            "a_id",
            "b_id",
            (
                inter.cast("double") / (F.col("na") + F.col("nb") - inter)
            ).alias("jaccard"),
        )
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates (16 sigs, 8 bands x 2) verified by exact
    Jaccard >= TAU. The oracle runs the identical LSH, so band recall is
    part of the checked contract.

    Unlike ``dedup_ngram_jaccard`` (the brute-force baseline), the
    exact-Jaccard verification here touches ONLY the candidate pairs:
    hashed shingles are joined back through the candidate list, so the
    verify cost scales with |candidates| x shingles-per-doc, never with
    all same-shingle pairs (that distinction is the whole point of LSH
    at 100 TB)."""
    return (
        _verified_candidates(spark, sf_dir)
        .filter(F.col("jaccard") >= TAU)
        .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
    )


def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-sensitivity profile of the near-dup decision: for each
    candidate Jaccard threshold, how many LSH-surfaced pairs would be
    declared duplicates and how many documents they touch — the curve a
    pipeline owner reads before fixing TAU (the single most consequential
    dedup knob; C4 vs RefinedWeb differ exactly here).

    The population is the LSH CANDIDATE set (pairs colliding in >= 1
    band), so counts at thresholds far below TAU are candidate-limited
    — stated here because the banding S-curve recalls low-similarity
    pairs only partially; the sweep characterizes the decision
    boundary, not exhaustive pair counts.

    Scale: the verified candidate relation is output-sized; the sweep
    is a broadcast spine fan-out (x|thresholds|) over it."""
    v = _verified_candidates(spark, sf_dir)
    spine = spark.createDataFrame(
        [(t,) for t in SWEEP_TAUS], "threshold double"
    )
    j = v.crossJoin(F.broadcast(spine)).filter(
        F.col("jaccard") >= F.col("threshold")
    )
    pairs = j.groupBy("threshold").agg(F.count(F.lit(1)).alias("n_pairs"))
    docs = (
        j.select(
            "threshold",
            F.explode(F.array("a_id", "b_id")).alias("doc"),
        )
        .distinct()
        .groupBy("threshold")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return (
        spine.join(pairs, "threshold", "left")
        .join(docs, "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
        )
        .orderBy("threshold")
    )


def minhash_band_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band LSH health report: bucket count, largest bucket, and
    the number of intra-bucket candidate pairs each band generates
    (Σ n·(n−1)/2 over its buckets). A band whose max bucket explodes is
    the hot-key that dominates the candidate join at 100 TB — this is
    the audit that catches it before the join does.

    Scale: one aggregate on (band_idx, band_val) — the same shuffle
    shape as the candidate join's build side — then a BANDS-sized
    rollup."""
    _docs_arr, bands = _band_relation(spark, sf_dir)
    bk = bands.groupBy("band_idx", "band_val").agg(
        F.count(F.lit(1)).alias("n")
    )
    n = F.col("n")
    return (
        bk.groupBy("band_idx")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("n").alias("max_bucket_size"),
            F.sum((n * (n - 1) / 2).cast("long")).alias(
                "n_candidate_pairs"
            ),
        )
        .orderBy("band_idx")
    )


def minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality audit: for every LSH candidate pair, the
    MinHash-estimated Jaccard (fraction of matching signature
    components) next to the exact Jaccard and the absolute error.

    This is the measurement a pipeline owner runs before trusting the
    sketch at 100 TB — if the observed error grows past the 1/sqrt(16)
    theoretical band, the signature width is too small for the corpus.
    Everything is md5-derived, so the audit itself is oracle-checked.

    Scale: identical dataflow to dedup_minhash_lsh (band equi-join for
    candidates, per-pair array intersection for exact Jaccard); the
    signature comparison is a map-side zip_with over 16-element arrays.
    """
    docs_arr = _persisted(_doc_hash_arrays(spark, sf_dir))
    sigs = _persisted(
        docs_arr.select(
            "doc_id",
            F.array(
                *[
                    F.array_min(F.transform("hs", _mh_perm(j)))
                    for j in range(MINHASH_N)
                ]
            ).alias("sig"),
        )
    )
    band_cols = F.array(
        *[
            F.concat_ws(
                ",",
                F.col("sig").getItem(2 * k),
                F.col("sig").getItem(2 * k + 1),
            )
            for k in range(BANDS)
        ]
    )
    bands = sigs.select(
        "doc_id", F.posexplode(band_cols).alias("band_idx", "band_val")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("a_id"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("b_id"), F.col("sig").alias("sig_b"))
    za = docs_arr.select(
        F.col("doc_id").alias("a_id"),
        F.col("hs").alias("hs_a"),
        F.size("hs").alias("na"),
    )
    zb = docs_arr.select(
        F.col("doc_id").alias("b_id"),
        F.col("hs").alias("hs_b"),
        F.size("hs").alias("nb"),
    )
    n_match = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m
        )
    )
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    jacc = inter.cast("double") / (F.col("na") + F.col("nb") - inter)
    est = F.col("n_match") / F.lit(float(MINHASH_N))
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("n_match", n_match)
        .join(za, "a_id")
        .join(zb, "b_id")
        .withColumn("jacc_raw", jacc)
        .select(
            "a_id",
            "b_id",
            "n_match",
            F.round(est, 6).alias("est_jaccard"),
            F.round("jacc_raw", 6).alias("exact_jaccard"),
            F.round(F.abs(est - F.col("jacc_raw")), 6).alias("abs_err"),
        )
        .orderBy("a_id", "b_id")
    )


def _bit_fold(b: int):
    """Two-arg (acc, element) lambda factory for the per-bit SimHash
    fold (same arity constraint as _mh_perm)."""
    return lambda acc, h: acc + F.when(
        F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
    ).otherwise(-1)


def _simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per doc from shingle hashes.

    The bit sums are per-doc folds over the doc's own (distinct-string)
    shingle-hash array — map-side ``aggregate`` calls, so the signature
    stage needs no shuffle at all (round 1 shuffled an exploded
    (doc, hash) relation through a 32-aggregate groupBy)."""
    docs = load_table_spread(spark, sf_dir, "documents", "doc_id")
    # Cheap token-count predicate instead of size(hs) — see
    # _doc_hash_arrays for why (pushdown below the exchange).
    docs = docs.filter(
        F.size(F.split(_norm(F.col("text")), " ")) >= 3
    )
    hs = F.transform(_shingle_arr(F.col("text")), _hash60)
    # Persist = projection-collapse barrier (see _doc_hash_arrays):
    # without it the 32 per-bit folds each inline and re-evaluate the
    # full md5-shingle chain.
    d = _persisted(docs.select("doc_id", hs.alias("hs")))
    bit_sums = d.select(
        "doc_id",
        *[
            F.aggregate("hs", F.lit(0).cast("long"), _bit_fold(b)).alias(
                f"c{b}"
            )
            for b in range(SIM_BITS)
        ],
    )
    sim = None
    for b in range(SIM_BITS):
        term = F.when(F.col(f"c{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    return bit_sums.select("doc_id", sim.alias("simhash"))


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance <= HAMMING_MAX.

    Candidates via 4x8-bit band equi-join — provably complete for
    hamming <= 3 (pigeonhole), so this equals the brute-force oracle.
    """
    sim = _persisted(_simhash(spark, sf_dir))  # tiny (one row per doc)
    band_arr = F.array(
        *[
            F.shiftright(F.col("simhash"), 8 * k).bitwiseAND(F.lit(255))
            for k in range(SIM_BANDS)
        ]
    )
    bands = sim.select(
        "doc_id",
        "simhash",
        F.posexplode(band_arr).alias("band_idx", "band_val"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= HAMMING_MAX)


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "minhash_accuracy": minhash_accuracy,
    "dedup_threshold_sweep": dedup_threshold_sweep,
    "minhash_band_analysis": minhash_band_analysis,
}


def _sql_hash60(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15)))::BIGINT"


_SQL_MINHASH_AGGS = ",\n           ".join(
    f"min(({_MH_A[j]} * h31 + {_MH_B[j]}) % {MERSENNE_P}) AS m{j}"
    for j in range(MINHASH_N)
)

_SQL_BANDS = "\n      UNION ALL\n".join(
    f"      SELECT doc_id, {k} AS band_idx, "
    f"(m{2 * k}::VARCHAR || ',' || m{2 * k + 1}::VARCHAR) AS band_val FROM mh"
    for k in range(BANDS)
)

_SQL_MINHASH_VERIFIED = f"""
    WITH hashed AS ({_SQL_SHINGLE_HASHES.format(h=_sql_hash60("sh"))}),
    mh AS (
      SELECT doc_id,
           {_SQL_MINHASH_AGGS}
      FROM hashed GROUP BY doc_id
    ),
    bands AS (
{_SQL_BANDS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM bands a
      JOIN bands b ON a.band_idx = b.band_idx
                  AND a.band_val = b.band_val
                  AND a.doc_id < b.doc_id
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM hashed GROUP BY doc_id),
    inter AS (
      SELECT c.a_id, c.b_id, count(*) AS i
      FROM cand c
      JOIN hashed a ON a.doc_id = c.a_id
      JOIN hashed b ON b.doc_id = c.b_id AND b.h31 = a.h31
      GROUP BY c.a_id, c.b_id
    )
    SELECT i.a_id, i.b_id,
           CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) AS jaccard
    FROM inter i
    JOIN sz sa ON sa.doc_id = i.a_id
    JOIN sz sb ON sb.doc_id = i.b_id
"""

_SQL_MINHASH_LSH = f"""
    SELECT a_id, b_id, round(jaccard, 6) AS jaccard
    FROM ({_SQL_MINHASH_VERIFIED}) p
    WHERE jaccard >= {TAU}
"""

_SQL_SIM_BIT_SUMS = ",\n           ".join(
    f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS c{b}"
    for b in range(SIM_BITS)
)

_SQL_SIM_TERMS = "\n             + ".join(
    f"(CASE WHEN c{b} > 0 THEN {1 << b}::BIGINT ELSE 0::BIGINT END)"
    for b in range(SIM_BITS)
)

_SQL_SIMHASH = f"""
    WITH s AS ({_SQL_SHINGLES}),
    hashed AS (SELECT doc_id, {_sql_hash60('sh')} AS h FROM s),
    bs AS (
      SELECT doc_id,
           {_SQL_SIM_BIT_SUMS}
      FROM hashed GROUP BY doc_id
    ),
    sim AS (
      SELECT doc_id,
             {_SQL_SIM_TERMS} AS simhash
      FROM bs
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sim a JOIN sim b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
"""

_SQL_SIG_MATCHES = " + ".join(
    f"CASE WHEN sa.m{j} = sb.m{j} THEN 1 ELSE 0 END"
    for j in range(MINHASH_N)
)

_SQL_MINHASH_ACCURACY = f"""
    WITH hashed AS ({_SQL_SHINGLE_HASHES.format(h=_sql_hash60("sh"))}),
    mh AS (
      SELECT doc_id,
           {_SQL_MINHASH_AGGS}
      FROM hashed GROUP BY doc_id
    ),
    bands AS (
{_SQL_BANDS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM bands a
      JOIN bands b ON a.band_idx = b.band_idx
                  AND a.band_val = b.band_val
                  AND a.doc_id < b.doc_id
    ),
    matches AS (
      SELECT c.a_id, c.b_id,
             ({_SQL_SIG_MATCHES}) AS n_match
      FROM cand c
      JOIN mh sa ON sa.doc_id = c.a_id
      JOIN mh sb ON sb.doc_id = c.b_id
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM hashed GROUP BY doc_id),
    inter AS (
      SELECT c.a_id, c.b_id, count(*) AS i
      FROM cand c
      JOIN hashed a ON a.doc_id = c.a_id
      JOIN hashed b ON b.doc_id = c.b_id AND b.h31 = a.h31
      GROUP BY c.a_id, c.b_id
    )
    SELECT m.a_id, m.b_id, m.n_match,
           round(m.n_match / {float(MINHASH_N)}, 6) AS est_jaccard,
           round(coalesce(jacc_raw, 0.0), 6) AS exact_jaccard,
           round(abs(m.n_match / {float(MINHASH_N)}
                     - coalesce(jacc_raw, 0.0)), 6) AS abs_err
    FROM matches m
    -- LEFT: a band collision with zero shingle overlap has no `inter`
    -- row but is still a candidate whose exact Jaccard is 0.
    LEFT JOIN (
      SELECT i.a_id, i.b_id,
             CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) AS jacc_raw
      FROM inter i
      JOIN sz sa ON sa.doc_id = i.a_id
      JOIN sz sb ON sb.doc_id = i.b_id
    ) j ON j.a_id = m.a_id AND j.b_id = m.b_id
    ORDER BY m.a_id, m.b_id
"""

ORACLES = {
    "dedup_exact": f"""
        SELECT md5({_SQL_NORM}) AS doc_hash,
               count(*) AS n_docs,
               min(doc_id) AS keep_doc_id
        FROM documents
        GROUP BY 1
    """,
    "dedup_ngram_jaccard": f"""
        SELECT a_id, b_id, round(jaccard, 6) AS jaccard
        FROM ({_SQL_JACCARD_PAIRS}) p WHERE jaccard >= {TAU}
    """,
    "dedup_minhash_lsh": _SQL_MINHASH_LSH,
    "dedup_simhash": _SQL_SIMHASH,
    "minhash_accuracy": _SQL_MINHASH_ACCURACY,
    "dedup_threshold_sweep": f"""
        WITH v AS ({_SQL_MINHASH_VERIFIED}),
        spine(threshold) AS (
          VALUES {", ".join(f"(CAST({t} AS DOUBLE))" for t in SWEEP_TAUS)}
        ),
        j AS (
          SELECT threshold, a_id, b_id
          FROM v CROSS JOIN spine
          WHERE jaccard >= threshold
        ),
        p AS (
          SELECT threshold, count(*) AS n_pairs
          FROM j GROUP BY threshold
        ),
        d AS (
          SELECT threshold, count(DISTINCT doc) AS n_docs
          FROM (SELECT threshold, unnest([a_id, b_id]) AS doc FROM j) u
          GROUP BY threshold
        )
        SELECT s.threshold,
               CAST(coalesce(p.n_pairs, 0) AS BIGINT) AS n_pairs,
               CAST(coalesce(d.n_docs, 0) AS BIGINT) AS n_docs
        FROM spine s
        LEFT JOIN p USING (threshold)
        LEFT JOIN d USING (threshold)
        ORDER BY s.threshold
    """,
    "minhash_band_analysis": f"""
        WITH hashed AS (
          {_SQL_SHINGLE_HASHES.format(h=_sql_hash60("sh"))}
        ),
        mh AS (
          SELECT doc_id,
               {_SQL_MINHASH_AGGS}
          FROM hashed GROUP BY doc_id
        ),
        bands AS (
{_SQL_BANDS}
        ),
        bk AS (
          SELECT band_idx, band_val, count(*) AS n
          FROM bands GROUP BY band_idx, band_val
        )
        SELECT band_idx,
               count(*) AS n_buckets,
               CAST(max(n) AS BIGINT) AS max_bucket_size,
               CAST(sum(CAST(n * (n - 1) / 2 AS BIGINT)) AS BIGINT)
                 AS n_candidate_pairs
        FROM bk GROUP BY band_idx
        ORDER BY band_idx
    """,
}


CONTAIN_TAU = 0.8  # containment threshold for the subset class


def doc_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup detection: LSH candidate pairs where the
    SMALLER document's shingle set is largely CONTAINED in the larger's
    (containment = |A∩B| / min(|A|,|B|) >= 0.8), with
    ``jaccard_missed`` flagging the pairs whose symmetric Jaccard stays
    below TAU — the quote/excerpt/boilerplate-subset class a
    Jaccard-thresholded dedup misses by construction (Broder's
    containment vs resemblance distinction; this corpus's near-dups are
    whole-document, so the flag is the monitoring bit that lights up
    when excerpts appear). ``contained_id`` names the smaller
    (engulfed) document, a_id on ties.

    Scale: identical cost profile to dedup_minhash_lsh — the banded
    candidate join bounds the pair set, the intersect runs in-row on
    the per-doc hash arrays; only the report predicate differs. (LSH
    banding recalls high-containment/low-Jaccard pairs only when the
    MinHash signatures still collide in >= 1 band; like
    dedup_threshold_sweep, the population is the candidate set and the
    operator characterizes the boundary, not exhaustive subset pairs.)
    """
    docs_arr, bands = _band_relation(spark, sf_dir)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .distinct()
    )
    za = docs_arr.select(
        F.col("doc_id").alias("a_id"),
        F.col("hs").alias("hs_a"),
        F.size("hs").alias("na"),
    )
    zb = docs_arr.select(
        F.col("doc_id").alias("b_id"),
        F.col("hs").alias("hs_b"),
        F.size("hs").alias("nb"),
    )
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    scored = (
        cand.join(za, "a_id")
        .join(zb, "b_id")
        .select(
            "a_id",
            "b_id",
            "na",
            "nb",
            inter.alias("i"),
        )
        .select(
            "a_id",
            "b_id",
            (
                F.col("i").cast("double")
                / (F.col("na") + F.col("nb") - F.col("i"))
            ).alias("jaccard"),
            (
                F.col("i").cast("double") / F.least("na", "nb")
            ).alias("containment"),
            F.when(F.col("na") <= F.col("nb"), F.col("a_id"))
            .otherwise(F.col("b_id"))
            .alias("contained_id"),
        )
    )
    return (
        scored.filter(F.col("containment") >= CONTAIN_TAU)
        .select(
            "a_id",
            "b_id",
            # pround, not F.round: i/min(na,nb) is an exact dyadic
            # whenever min(na,nb) is a power of two, and Spark HALF_UP
            # vs DuckDB half-to-even diverge on exactly those ties
            pround(F.col("jaccard"), 6).alias("jaccard"),
            pround(F.col("containment"), 6).alias("containment"),
            "contained_id",
            (F.col("jaccard") < TAU).cast("int").alias("jaccard_missed"),
        )
        .orderBy("a_id", "b_id")
    )


QUERIES["doc_shingle_containment"] = doc_shingle_containment

_SQL_CONTAINMENT = f"""
    WITH hashed AS ({_SQL_SHINGLE_HASHES.format(h=_sql_hash60("sh"))}),
    mh AS (
      SELECT doc_id,
           {_SQL_MINHASH_AGGS}
      FROM hashed GROUP BY doc_id
    ),
    bands AS (
{_SQL_BANDS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM bands a
      JOIN bands b ON a.band_idx = b.band_idx
                  AND a.band_val = b.band_val
                  AND a.doc_id < b.doc_id
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM hashed GROUP BY doc_id),
    inter AS (
      SELECT c.a_id, c.b_id, count(*) AS i
      FROM cand c
      JOIN hashed a ON a.doc_id = c.a_id
      JOIN hashed b ON b.doc_id = c.b_id AND b.h31 = a.h31
      GROUP BY c.a_id, c.b_id
    ),
    scored AS (
      SELECT i.a_id, i.b_id,
             CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) AS jaccard,
             CAST(i.i AS DOUBLE) / least(sa.n, sb.n) AS containment,
             CASE WHEN sa.n <= sb.n THEN i.a_id ELSE i.b_id END
               AS contained_id
      FROM inter i
      JOIN sz sa ON sa.doc_id = i.a_id
      JOIN sz sb ON sb.doc_id = i.b_id
    )
    SELECT a_id, b_id, {sql_pround("jaccard", 6)} AS jaccard,
           {sql_pround("containment", 6)} AS containment, contained_id,
           (CASE WHEN jaccard < {TAU} THEN 1 ELSE 0 END)::INT
             AS jaccard_missed
    FROM scored
    WHERE containment >= {CONTAIN_TAU}
    ORDER BY a_id, b_id
"""

ORACLES["doc_shingle_containment"] = _SQL_CONTAINMENT


# --- edit-distance verification tier ---------------------------------------

EDIT_TAU = 0.8  # normalized edit-similarity duplicate threshold


def dedup_editdist_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification of the LSH candidate pairs — the
    CHARACTER-level duplicate tier between shingle Jaccard (word-set
    overlap, order-blind) and exact-hash equality: normalized
    Levenshtein similarity 1 − dist/max(len) over the whitespace-
    normalized texts, with both verdicts (edit vs Jaccard at their
    thresholds) and their agreement flag side by side. Pairs where the
    two disagree are exactly the reorder/near-paraphrase class a
    production pipeline routes to human review or a stronger model.

    Scale: edit distance is O(len²) per pair, so it NEVER runs on the
    corpus — only on the LSH candidate list (the same
    candidates-only contract dedup_minhash_lsh's verify makes); the
    two text joins are candidate-sized. At 100 TB you additionally
    band the cost with Spark's bounded form
    ``levenshtein(l, r, threshold)`` (early-exits past the bound —
    the SQL oracle has no bounded form, so the checked contract here
    is the exact distance on the small-SF candidates).

    Parity: Spark ``levenshtein`` and DuckDB ``levenshtein`` are both
    unit-cost Wagner-Fischer; lengths/distances are exact INTs and the
    one division prounds at 6dp."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _norm(F.col("text")).alias("nt")
    )
    # Round-9 optimization, three fixes measured together (steady
    # 1.66 s pre-persist / 10.1 s once the shared candidate persist
    # landed → ~0.6 s):
    #   1. SPREAD the pair list before the O(len²) work. The persisted
    #      candidate relation materializes AQE-coalesced (tiny bytes →
    #      1 partition), so every levenshtein ran on ONE core. An
    #      explicit pair-keyed repartition (REPARTITION_BY_NUM — AQE
    #      cannot coalesce it back) spreads the verify compute over
    #      every core — the load_table_spread rationale at pair grain;
    #      at 100 TB the exchange moves ~24 bytes/pair against ~10^5
    #      char-ops/pair.
    #   2. Evaluate levenshtein ONCE per pair. The output needs it in
    #      three columns (dist, sim, verdict) and projection collapse
    #      with no interpreted CSE re-ran it per reference; inline(
    #      transform(array(dist), ...)) materializes the distance once
    #      per row (Generate) and derives every column from the bound
    #      lambda value.
    #   3. SORT BELOW the expensive projection. orderBy's range
    #      exchange samples its child with a full extra execution —
    #      with levenshtein below the sort, every distance was
    #      computed TWICE (guide §2.4's "orderBy used only to make
    #      output deterministic"). repartitionByRange + local sort on
    #      the CHEAP join output, heavy projection above it (1:1,
    #      order-preserving), gives the identical global order with
    #      the sampling pass touching only the cheap subtree — and
    #      the explicit partition count keeps the verify stage spread
    #      (fix 1's AQE-coalesce point applies to the range exchange
    #      too).
    par = spark.sparkContext.defaultParallelism
    cand = (
        _verified_candidates(spark, sf_dir)
        .select("a_id", "b_id", "jaccard")
        .repartition(par, F.col("a_id"), F.col("b_id"))
    )
    ta = docs.select(
        F.col("doc_id").alias("a_id"),
        F.col("nt").alias("nt_a"),
        F.length("nt").alias("len_a"),
    )
    tb = docs.select(
        F.col("doc_id").alias("b_id"),
        F.col("nt").alias("nt_b"),
        F.length("nt").alias("len_b"),
    )
    dist = F.levenshtein("nt_a", "nt_b")

    def sim_of(d):
        return F.lit(1.0) - d.cast("double") / F.greatest(
            F.greatest("len_a", "len_b").cast("double"), F.lit(1.0)
        )

    scored = F.inline(
        F.transform(
            F.array(dist),
            lambda d: F.struct(
                d.alias("edit_dist"),
                pround(sim_of(d), 6).alias("edit_sim"),
                pround(F.col("jaccard"), 6).alias("jaccard"),
                (pround(sim_of(d), 6) >= EDIT_TAU)
                .cast("int")
                .alias("edit_dup"),
                (pround(F.col("jaccard"), 6) >= TAU)
                .cast("int")
                .alias("jaccard_dup"),
            ),
        )
    )
    return (
        cand.join(ta, "a_id")
        .join(tb, "b_id")
        .repartitionByRange(par, "a_id", "b_id")
        .sortWithinPartitions("a_id", "b_id")
        .select("a_id", "b_id", "len_a", "len_b", scored)
        .withColumn(
            "verdicts_agree",
            (F.col("edit_dup") == F.col("jaccard_dup")).cast("int"),
        )
    )


QUERIES["dedup_editdist_verify"] = dedup_editdist_verify

_SQL_EDITDIST = f"""
    WITH pairs AS ({_SQL_MINHASH_VERIFIED}),
    nt AS (SELECT doc_id, {_SQL_NORM} AS nt FROM documents),
    scored AS (
      SELECT p.a_id, p.b_id,
             length(a.nt) AS len_a, length(b.nt) AS len_b,
             levenshtein(a.nt, b.nt) AS edit_dist,
             1.0 - levenshtein(a.nt, b.nt)::DOUBLE
                   / greatest(greatest(length(a.nt), length(b.nt))::DOUBLE,
                              1.0) AS sim,
             p.jaccard
      FROM pairs p
      JOIN nt a ON a.doc_id = p.a_id
      JOIN nt b ON b.doc_id = p.b_id
    )
    SELECT a_id, b_id, len_a, len_b, edit_dist,
           {sql_pround("sim", 6)} AS edit_sim,
           {sql_pround("jaccard", 6)} AS jaccard,
           (CASE WHEN {sql_pround("sim", 6)} >= {EDIT_TAU}
                 THEN 1 ELSE 0 END)::INT AS edit_dup,
           (CASE WHEN {sql_pround("jaccard", 6)} >= {TAU}
                 THEN 1 ELSE 0 END)::INT AS jaccard_dup,
           (CASE WHEN (CASE WHEN {sql_pround("sim", 6)} >= {EDIT_TAU}
                            THEN 1 ELSE 0 END)
                    = (CASE WHEN {sql_pround("jaccard", 6)} >= {TAU}
                            THEN 1 ELSE 0 END)
                 THEN 1 ELSE 0 END)::INT AS verdicts_agree
    FROM scored
    ORDER BY a_id, b_id
"""

ORACLES["dedup_editdist_verify"] = _SQL_EDITDIST


def blocking_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality metrics for the MinHash-LSH candidate
    generation (Christen 2012, "A Survey of Indexing Techniques for
    Scalable Record Linkage and Deduplication", TKDE — the standard
    three): REDUCTION RATIO (share of the n·(n−1)/2 comparison space
    the blocking prunes), PAIRS COMPLETENESS (recall: share of true
    ≥ TAU Jaccard duplicates the candidate list retains) and PAIRS
    QUALITY (precision: share of candidates that are true duplicates)
    — one audit row deciding whether the band parameters (BANDS ×
    ROWS_PER_BAND) are spending comparisons where the duplicates are.

    Ground truth is the brute-force shingle-Jaccard pass, so this is a
    small-SF / SAMPLED audit by construction (it inherits
    dedup_ngram_jaccard's scale guard); reduction ratio itself —
    candidates over possible pairs — is cheap at any scale and is the
    column a production run keeps while sampling the recall columns.

    Scale shape: counts over the candidate and true-pair relations the
    LSH family already builds; everything after is 1-row arithmetic."""
    n_docs = (
        load_table(spark, sf_dir, "documents")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    cand = _verified_candidates(spark, sf_dir)
    cand_counts = cand.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(
            (F.col("jaccard") >= TAU).cast("bigint")
        ).alias("n_true_in_candidates"),
    )
    true_n = dedup_ngram_jaccard(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_true_dups")
    )
    possible = (
        F.col("n_docs").cast("bigint")
        * (F.col("n_docs") - F.lit(1)).cast("bigint")
        / F.lit(2)
    ).cast("bigint")
    return (
        n_docs.join(cand_counts)
        .join(true_n)
        .select(
            "n_docs",
            possible.alias("n_possible_pairs"),
            "n_candidates",
            F.coalesce("n_true_in_candidates", F.lit(0)).alias(
                "n_true_in_candidates"
            ),
            "n_true_dups",
            pround(
                F.lit(1.0)
                - F.col("n_candidates") / possible.cast("double"),
                6,
            ).alias("reduction_ratio"),
            F.when(
                F.col("n_true_dups") > 0,
                pround(
                    F.coalesce("n_true_in_candidates", F.lit(0))
                    / F.col("n_true_dups").cast("double"),
                    6,
                ),
            ).alias("pairs_completeness"),
            F.when(
                F.col("n_candidates") > 0,
                pround(
                    F.coalesce("n_true_in_candidates", F.lit(0))
                    / F.col("n_candidates").cast("double"),
                    6,
                ),
            ).alias("pairs_quality"),
        )
    )


QUERIES["blocking_quality_audit"] = blocking_quality_audit

_SQL_BLOCKING_AUDIT = f"""
    WITH cand AS MATERIALIZED ({_SQL_MINHASH_VERIFIED}),
    brute AS MATERIALIZED (
      SELECT a_id, b_id FROM ({_SQL_JACCARD_PAIRS}) p
      WHERE jaccard >= {TAU}
    ),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    cc AS (
      SELECT count(*) AS n_candidates,
             CAST(coalesce(sum(CASE WHEN jaccard >= {TAU}
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_true_in_candidates
      FROM cand
    ),
    tn AS (SELECT count(*) AS n_true_dups FROM brute)
    SELECT n_docs,
           CAST(n_docs * (n_docs - 1) / 2 AS BIGINT) AS n_possible_pairs,
           n_candidates, n_true_in_candidates, n_true_dups,
           {sql_pround(
               '1.0 - n_candidates'
               ' / (n_docs * (n_docs - 1) / 2)::DOUBLE', 6
           )} AS reduction_ratio,
           CASE WHEN n_true_dups > 0 THEN
             {sql_pround(
                 'n_true_in_candidates / n_true_dups::DOUBLE', 6
             )}
           END AS pairs_completeness,
           CASE WHEN n_candidates > 0 THEN
             {sql_pround(
                 'n_true_in_candidates / n_candidates::DOUBLE', 6
             )}
           END AS pairs_quality
    FROM nd CROSS JOIN cc CROSS JOIN tn
"""

ORACLES["blocking_quality_audit"] = _SQL_BLOCKING_AUDIT


def dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join by prefix filtering — the
    AllPairs/PPJoin family (Bayardo, Ma & Srikant 2007 WWW; Xiao et
    al. 2008 WWW): order each doc's shingle set by ascending global
    document frequency (rarest first) and keep only the PREFIX of
    length |s| − ⌈TAU·|s|⌉ + 1; any pair with Jaccard ≥ TAU must
    share a prefix token (pigeonhole on the ⌈TAU·|s|⌉ overlap bound),
    so the prefix equi-join is a COMPLETE candidate generator — the
    deterministic-recall alternative to MinHash banding (LSH trades
    recall for candidate volume probabilistically; prefix filtering
    guarantees recall 1.0 and prunes by frequency instead). Verified
    by exact Jaccard ≥ TAU, same output contract as
    ``dedup_minhash_lsh`` — equality with the brute-force pass is
    test-asserted, making the completeness theorem an executable
    check.

    The ceiling is computed in INTEGER arithmetic ((4n + 4) // 5 for
    TAU = 4/5): a float ⌈0.8·n⌉ rounds UP on exact multiples
    (0.8·5 → 4.000000000000000222 → 5), silently shortening the
    prefix below the completeness bound — the same class of
    float-boundary bug the portable-rounding layer exists for.

    Scale: one exploded (doc, shingle) shuffle for document
    frequencies + one per-doc rank window (both the LSH path's cost
    class); the candidate join touches only prefix tokens — by
    construction the RAREST fraction of each set, the AllPairs
    heuristic that keeps the equi-join's per-key fan-out bounded where
    a naive same-shingle join explodes on stop-shingles."""
    if abs(TAU - 0.8) > 1e-12:  # pragma: no cover — guard the 4/5 form
        raise ValueError("integer prefix bound below is TAU=4/5-specific")
    docs_arr = _persisted(_doc_hash_arrays(spark, sf_dir))
    sized = docs_arr.select("doc_id", "hs", F.size("hs").alias("n"))
    ex = sized.select("doc_id", "n", F.explode("hs").alias("h31"))
    dfreq = ex.groupBy("h31").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("df", "h31")
    pref = (
        ex.join(dfreq, "h31")
        .withColumn("rk", F.row_number().over(w))
        .filter(
            F.col("rk")
            <= F.col("n")
            - ((F.col("n") * 4 + 4) / 5).cast("long")
            + 1
        )
        .select("doc_id", "h31")
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.h31") == F.col("b.h31"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
        )
        .distinct()
    )
    za = sized.select(
        F.col("doc_id").alias("a_id"),
        F.col("hs").alias("hs_a"),
        F.col("n").alias("na"),
    )
    zb = sized.select(
        F.col("doc_id").alias("b_id"),
        F.col("hs").alias("hs_b"),
        F.col("n").alias("nb"),
    )
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    jac = inter.cast("double") / (F.col("na") + F.col("nb") - inter)
    return (
        cand.join(za, "a_id")
        .join(zb, "b_id")
        .filter(jac >= TAU)
        .select("a_id", "b_id", F.round(jac, 6).alias("jaccard"))
    )


QUERIES["dedup_prefix_filter"] = dedup_prefix_filter

_SQL_PREFIX_FILTER = f"""
    WITH hashed AS MATERIALIZED (
      {_SQL_SHINGLE_HASHES.format(h=_sql_hash60("sh"))}
    ),
    sz AS MATERIALIZED (
      SELECT doc_id, count(*) AS n FROM hashed GROUP BY doc_id
    ),
    dfreq AS MATERIALIZED (
      SELECT h31, count(*) AS df FROM hashed GROUP BY h31
    ),
    pref AS MATERIALIZED (
      SELECT doc_id, h31 FROM (
        SELECT h.doc_id, h.h31, s.n,
               row_number() OVER (
                 PARTITION BY h.doc_id ORDER BY d.df, h.h31
               ) AS rk
        FROM hashed h
        JOIN dfreq d USING (h31)
        JOIN sz s USING (doc_id)
      ) r WHERE rk <= n - ((4 * n + 4) // 5) + 1
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM pref a JOIN pref b
        ON a.h31 = b.h31 AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT c.a_id, c.b_id, count(*) AS i
      FROM cand c
      JOIN hashed a ON a.doc_id = c.a_id
      JOIN hashed b ON b.doc_id = c.b_id AND b.h31 = a.h31
      GROUP BY c.a_id, c.b_id
    )
    SELECT i.a_id, i.b_id,
           round(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 6) AS jaccard
    FROM inter i
    JOIN sz sa ON sa.doc_id = i.a_id
    JOIN sz sb ON sb.doc_id = i.b_id
    WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= {TAU}
"""

ORACLES["dedup_prefix_filter"] = _SQL_PREFIX_FILTER
