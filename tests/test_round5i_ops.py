"""Round-5 sixth batch: SCD2 dimension history, YoY growth, tokenizer
fertility, the filter retention funnel, and the near-dup triangle
census — semantics beyond the oracle gate (interval chaining,
python-recomputed statistics, graph identities)."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from big_data_project_spark.catalog import load_table
from big_data_project_spark.operators.alerts import (
    alerts_latest_per_type,
    scd2_alerts,
)
from big_data_project_spark.operators.corpus_stats import (
    neardup_triangle_count,
)
from big_data_project_spark.operators.curation import (
    doc_filter_cascade,
    filter_retention_funnel,
)
from big_data_project_spark.operators.dedup import dedup_minhash_lsh
from big_data_project_spark.operators.textops import (
    token_count,
    tokenizer_fertility,
)
from big_data_project_spark.operators.warehouse import orders_yoy_growth

from tests.conftest import SF_DIR


def test_scd2_intervals_chain_without_gaps(spark):
    """Within every (route, alert_type) key the half-open validity
    intervals chain exactly: version k's valid_to equals version k+1's
    valid_from, and only the last version is current."""
    rows = scd2_alerts(spark, SF_DIR).collect()
    by_key = defaultdict(list)
    for r in rows:
        by_key[(r.route_id, r.alert_type)].append(r)
    assert by_key
    for key, versions in by_key.items():
        versions.sort(key=lambda r: r.version_seq)
        assert [r.version_seq for r in versions] == list(
            range(1, len(versions) + 1)
        )
        for prev, nxt in zip(versions, versions[1:]):
            assert prev.valid_to == nxt.valid_from, key
            assert prev.is_current == 0
        assert versions[-1].valid_to is None
        assert versions[-1].is_current == 1


def test_scd2_current_slice_is_latest_per_type(spark):
    """The is_current=1 slice IS the reference's DISTINCT ON latest-row
    view (alerts_latest_per_type) — same keys, same alert ids."""
    cur = {
        (r.route_id, r.alert_type): r.alert_id
        for r in scd2_alerts(spark, SF_DIR)
        .filter(F.col("is_current") == 1)
        .collect()
    }
    latest = {
        (r.route_id, r.alert_type): r.alert_id
        for r in alerts_latest_per_type(spark, SF_DIR).collect()
    }
    assert set(cur) == set(latest)
    # ties on observed_at are broken differently only when two alerts
    # share a timestamp: latest-per-type picks max alert_id, SCD2 orders
    # ascending so the LAST version is also the max alert_id — equal.
    assert cur == latest


def test_scd2_point_in_time_lookup(spark):
    """A point-in-time probe (the whole point of keeping history)
    returns exactly one covering version per key existing at that
    time."""
    scd = scd2_alerts(spark, SF_DIR)
    t = scd.agg(F.max("valid_from")).first()[0]
    covering = scd.filter(
        (F.col("valid_from") <= F.lit(t))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(t)))
    )
    per_key = covering.groupBy("route_id", "alert_type").count().collect()
    assert per_key and all(r["count"] == 1 for r in per_key)


def test_yoy_growth_matches_python(spark):
    orders = load_table(spark, SF_DIR, "orders").collect()
    by_year = defaultdict(lambda: [0, 0.0])
    for r in orders:
        y = r.o_orderdate.year
        by_year[y][0] += 1
        by_year[y][1] += r.o_totalprice
    got = {r.order_year: r for r in orders_yoy_growth(spark, SF_DIR).collect()}
    assert set(got) == set(by_year)
    for y, (n, rev) in by_year.items():
        assert got[y].n_orders == n
        assert got[y].revenue == pytest.approx(rev, abs=0.02)
        prev = by_year.get(y - 1)
        if prev is None:
            assert got[y].prev_revenue is None and got[y].yoy_pct is None
        else:
            assert got[y].yoy_pct == pytest.approx(
                (rev - prev[1]) / prev[1] * 100.0, abs=2e-4
            )


def test_fertility_aggregates_token_count(spark):
    """Fertility divides the SAME corpus sums token_count reports —
    recomputed from the per-doc relation joined to lang."""
    docs = {
        r.doc_id: r
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    sums = defaultdict(lambda: [0, 0, 0, 0])  # docs, ws, bpe, chars
    for r in token_count(spark, SF_DIR).collect():
        d = docs[r.doc_id]
        s = sums[d.lang]
        s[0] += 1
        s[1] += r.ws_tokens
        s[2] += r.bpe_tokens
        s[3] += d.n_chars
    got = {r.lang: r for r in tokenizer_fertility(spark, SF_DIR).collect()}
    assert set(got) == set(sums)
    for lang, (n, ws, bpe, chars) in sums.items():
        g = got[lang]
        assert (g.n_docs, g.ws_tokens, g.bpe_tokens) == (n, ws, bpe)
        assert g.fertility == pytest.approx(bpe / ws, abs=2e-4)
        assert g.chars_per_token == pytest.approx(chars / bpe, abs=2e-4)
    # BPE-ish tokens split punctuation off words, so fertility >= 1
    assert all(r.fertility >= 1.0 for r in got.values())


def test_retention_funnel_reconciles_with_cascade(spark):
    cascade = doc_filter_cascade(spark, SF_DIR).collect()
    total = len(cascade)
    reason_counts = defaultdict(int)
    for r in cascade:
        reason_counts[r.reason] += 1
    rows = filter_retention_funnel(spark, SF_DIR).collect()
    assert [r.stage_idx for r in rows] == sorted(r.stage_idx for r in rows)
    dropped_so_far = 0
    for r in rows:
        assert r.n_docs == reason_counts[r.stage]
        if r.stage != "keep":
            dropped_so_far += r.n_docs
        assert r.n_remaining == total - dropped_so_far
        assert r.retention == pytest.approx(
            r.n_remaining / total, abs=2e-6
        )
    keep_row = [r for r in rows if r.stage == "keep"]
    assert keep_row and keep_row[0].n_docs == keep_row[0].n_remaining


def test_triangle_census_identities_and_python_recount(spark):
    """Graph identities (sum deg = 2E; 3T <= wedges) plus an exact
    python recount of triangles over the collected pair list."""
    pairs = [
        (r.a_id, r.b_id)
        for r in dedup_minhash_lsh(spark, SF_DIR).collect()
    ]
    row = neardup_triangle_count(spark, SF_DIR).first()
    assert row.n_edges == len(pairs)
    deg = defaultdict(int)
    adj = defaultdict(set)
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
        adj[a].add(b)
        adj[b].add(a)
    assert row.n_nodes == len(deg)
    assert int(row.n_wedges) == sum(d * (d - 1) // 2 for d in deg.values())
    tri = 0
    for a, b in pairs:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b (pair order) and c above both: count once
                tri += 1
    assert row.n_triangles == tri
    assert 3 * row.n_triangles <= int(row.n_wedges) or int(row.n_wedges) == 0
    if row.global_clustering is not None:
        assert 0.0 <= row.global_clustering <= 1.0


def _file_cover_fraction(path, col, probe):
    """Fraction of parquet files whose [min,max] footer range on `col`
    covers `probe` — what file-level data skipping cannot prune."""
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert files
    covering = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = next(
            i for i in range(len(md.schema))
            if md.schema.column(i).name == col
        )
        lo, hi = None, None
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            assert st is not None and st.has_min_max
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo <= probe <= hi:
            covering += 1
    return covering / len(files)


def test_write_zordered_skips_on_both_dimensions(spark, tmp_path):
    """Z-ordering on (user_id, event_id) leaves BOTH columns' per-file
    ranges prunable, where the single-column sort leaves the second
    column spanning every file."""
    from big_data_project_spark.plans.sinks import (
        write_sorted,
        write_zordered,
    )

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    zpath = str(tmp_path / "z_events")
    spath = str(tmp_path / "s_events")
    write_zordered(ev, zpath, ["user_id", "event_id"], n_files=16)
    write_sorted(ev, spath, ["user_id"], n_files=16)

    assert spark.read.parquet(zpath).count() == ev.count()
    # row sets identical, not just counts
    assert (
        spark.read.parquet(zpath)
        .select("event_id")
        .exceptAll(ev.select("event_id"))
        .count()
        == 0
    )

    mid_user = ev.agg(F.percentile_approx("user_id", 0.5)).first()[0]
    mid_event = ev.agg(F.percentile_approx("event_id", 0.5)).first()[0]

    z_user = _file_cover_fraction(zpath, "user_id", mid_user)
    z_event = _file_cover_fraction(zpath, "event_id", mid_event)
    s_user = _file_cover_fraction(spath, "user_id", mid_user)
    s_event = _file_cover_fraction(spath, "event_id", mid_event)

    # the sorted layout is perfect on its own column and useless on
    # the other; the z-order prunes on BOTH
    assert s_user <= 0.25
    assert s_event >= 0.9
    assert z_user <= 0.7
    assert z_event <= 0.7
    # and z-order strictly beats single-sort on the second dimension
    assert z_event < s_event


def test_write_zordered_rejects_wrong_arity(spark, tmp_path):
    from big_data_project_spark.plans.sinks import write_zordered

    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError):
        write_zordered(ev, str(tmp_path / "x"), ["user_id"])


def test_semdedup_prune_keeps_the_outlier(spark, tmp_path):
    """Planted near-dup pair: the member FARTHER from its cluster
    centroid survives (SemDeDup's keep-the-outlier rule); vectors with
    no near-dup partner all keep."""
    from big_data_project_spark.operators import similarity

    emb = spark.createDataFrame(
        [
            # cluster of three mutually-close vectors: 0 and 1 are
            # near-dups (cos > 0.95); 2 pulls the centroid toward
            # itself, so 0 (farther from centroid than 1) must win
            (0, [1.0, 2.0, 3.0, 4.0], 0),
            (1, [1.01, 2.0, 3.0, 4.0], 0),
            (2, [-4.0, 3.0, -2.0, 1.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    d = tmp_path / "sf"
    emb.write.parquet(str(d / "embeddings.parquet"))
    rows = {
        r.vec_id: r
        for r in similarity.semdedup_prune(spark, str(d)).collect()
    }
    assert len(rows) == 3
    assert rows[2].n_dup_partners == 0 and rows[2].keep == 1
    pair = [rows[0], rows[1]]
    assert all(r.n_dup_partners == 1 for r in pair)
    kept = [r for r in pair if r.keep == 1]
    dropped = [r for r in pair if r.keep == 0]
    assert len(kept) == 1 and len(dropped) == 1
    # the keeper is the one with the LOWER centroid cosine (outlier)
    assert (kept[0].cos_centroid, kept[0].vec_id) <= (
        dropped[0].cos_centroid,
        dropped[0].vec_id,
    )


def test_semdedup_sf_corpus_all_keep(spark):
    """The sf corpora have no >=0.95-cosine pairs, so SemDeDup keeps
    everything — and every vector still gets a bucket and a centroid
    cosine in [-1, 1]."""
    from big_data_project_spark.operators import similarity

    rows = similarity.semdedup_prune(spark, SF_DIR).collect()
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert len(rows) == n_vecs
    assert all(r.keep == 1 and r.n_dup_partners == 0 for r in rows)
    assert all(-1.0 <= r.cos_centroid <= 1.0 for r in rows)


def test_write_zordered_nulls_and_fractional_domain(spark, tmp_path):
    """NULL keys route to the nulls-first (z = -1) file instead of
    inheriting the TOP grid coordinate, and a sub-1.0 fractional
    domain still spreads across the full grid (the +1 span pad would
    collapse it to a handful of buckets)."""
    import glob

    import pyarrow.parquet as pq

    from big_data_project_spark.plans.sinks import write_zordered

    df = spark.range(4000).select(
        F.col("id").alias("k"),
        # fractional domain [0, 0.4): narrower than 1.0
        (F.col("id") % 400 / 1000.0).alias("x"),
        F.when(F.col("id") % 100 == 0, None)
        .otherwise(F.col("id") % 97)
        .cast("double")
        .alias("y"),
    )
    path = str(tmp_path / "zfrac")
    write_zordered(df, path, ["x", "y"], n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == 4000
    assert back.filter(F.col("y").isNull()).count() == 40

    # NULL-y rows pack into the z=-1 (first) range partition only
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    files_with_nulls = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        yidx = next(
            i for i in range(len(md.schema))
            if md.schema.column(i).name == "y"
        )
        nulls = sum(
            md.row_group(g).column(yidx).statistics.null_count
            for g in range(md.num_row_groups)
        )
        if nulls:
            files_with_nulls += 1
    assert files_with_nulls == 1

    # fractional x still prunes: a mid-domain point probe must not be
    # covered by every file's [min,max] on x
    frac = _file_cover_fraction(path, "x", 0.2)
    assert frac <= 0.8
