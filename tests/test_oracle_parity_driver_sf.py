"""Driver-SF (sf0.01) replica of the t2 gate for the evidence-stale
cohort.

The driver's per-round CORRECTNESS window covers ~50 registry keys; with
49 first-run round-5 keys leading the rotation, the keys whose newest
driver row is CORRECTNESS_r01/r02 (suggestions / validation / geo /
tpch / tpch_ext / textops / dedup / similarity / sampling / multimodal /
feed-normalization families) cannot all re-enter the window this round.
This test re-runs exactly those keys against their DuckDB oracles at the
DRIVER's scale factor (sf0.01 — not the sf0.001 the full-suite
test_oracle_parity.py uses), so a green pytest run is itself
current-round evidence for the stale cohort at the gate's own SF.

Membership is pinned (not derived from the registry) so the cohort list
in this file is reviewable against VERDICT.md's staleness table.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from big_data_project_spark.registry import ORACLES, QUERIES

from tests.conftest import SF_DIR_MED

# Newest driver row is CORRECTNESS_r01 (VERDICT.md round 4, "What's
# missing" #3) minus whatever leads this round's rotation window.
R01_STALE = [
    "suggestions",
    "suggestions_latest",
    "top_priority",
    "summary_actions",
    "needs_data",
    "peak_hours_summary",
    "validation_global",
    "validation_by_hour",
    "validation_by_peak",
    "validation_by_route",
    "routes_geo",
    "supplier_geo",
    "referential_filter",
    "stop_route_mapping",
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q5_supplier_volume",
    "q6_revenue_delta",
    "q10_returned_items",
    "order_priority_count",
    "top_customers_window",
    "sales_rollup",
    "market_share",
    "avg_acctbal_filter",
    "q7_nation_volume",
    "q9_product_profit",
    "q14_promo_revenue",
    "q16_supplier_count",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "single_supplier_orders",
    "idle_rich_customers",
]
# Newest driver row is CORRECTNESS_r02 (oracle-backed keys only; the
# rows-only sketches/IVF are bounded in their own unit tests).
R02_STALE = [
    "passenger_flow_sim",
    "props_feed_normalize",
    "proto_delay_hourly",
    "lang_id",
    "quality_score",
    "token_count",
    "doc_fingerprint",
    "doc_stats",
    "doc_chunking",
    "pii_scrub",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "minhash_accuracy",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "stratified_doc_sample",
    "dedup_keep_list",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "embedding_norms",
    "embedding_label_outliers",
    "text_embedding_agreement",
    "multimodal_meta",
    "multimodal_features",
]

# Round 9 (round-8 verdict item 1): the nine oracle-backed keys whose
# newest driver row was CORRECTNESS_r03 lead this round's _PROMOTED
# rotation, but the verdict asks for them here too so no oracle-backed
# key can go >4 rounds without driver-SF evidence even if a future
# wall-budget cut rolls them again.
R03_STALE = [
    "shingle_novelty",
    "q2_min_cost_supplier",
    "tfidf_top_terms",
    "nearest_stop",
    "lm_bigram_logprob",
    "dedup_incremental",
    "kpi_alerts_hourly",
    "dedup_method_agreement",
    "cross_source_dup_matrix",
]
# The r04-stale cohort keys most likely to roll past the driver's ~50-key
# window this round (the expensive tail of the cheapest-first rotation in
# registry._PROMOTED): pre-covered here at the driver's SF so a roll-over
# still leaves current-round sf0.01 evidence.
R04_ROLLOVER_TAIL = [
    # round-9 extension: 11 new keys lead _PROMOTED this round, so the
    # window cut moves ~8 keys deeper into the cheapest-first r04 list
    "demand_hourly",
    "suggestion_stability",
    "label_centroid_similarity",
    "train_test_split",
    "retention_cohorts",
    "delay_cusum_changepoint",
    "near_dup_degree_histogram",
    "minhash_band_analysis",
    "funnel_conversion",
    "delay_headway_corr",
    "delay_ewma_24h",
    "token_pmi_bigrams",
    "source_token_kl",
    "countmin_heavy_hitters",
    "bloom_dedup_audit",
    "dau_rolling_wau",
    "dedup_cluster_sizes",
    "multimodal_frame_checksums",
    "ann_rrf_fusion",
    "dedup_threshold_sweep",
]

COHORT = R01_STALE + R02_STALE + R03_STALE + R04_ROLLOVER_TAIL


@pytest.fixture(scope="module")
def duck_med():
    con = duckdb.connect()
    from big_data_project_spark.catalog import TABLES, table_path

    for name in TABLES:
        con.execute(
            "CREATE VIEW {} AS SELECT * FROM '{}'".format(
                name, table_path(SF_DIR_MED, name)
            )
        )
    yield con
    con.close()


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if v is None:
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append("NaN" if math.isnan(v) else f"{round(v, 6):.6f}")
            elif hasattr(v, "isoformat"):
                vals.append(v.isoformat())
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def test_cohort_membership_is_registered():
    missing = [k for k in COHORT if k not in ORACLES]
    assert not missing, f"stale-cohort keys without oracles: {missing}"
    assert len(set(COHORT)) == len(COHORT)


@pytest.mark.parametrize("name", COHORT)
def test_stale_cohort_matches_oracle_at_driver_sf(spark, duck_med, name):
    sdf = QUERIES[name](spark, SF_DIR_MED)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck_med.execute(ORACLES[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    got = _normalize(spark_rows, spark_cols)
    want = _normalize(duck_rows, duck_cols)
    mismatches = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"
