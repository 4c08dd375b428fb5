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
)
from .ml import demand
from .sources import generators, jsonfeed, protofeed
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

# Key-level promotion: first-round keys added to modules that sit late
# in _MODULES (their siblings already have driver evidence) are hoisted
# to the front of the walk so they get a driver row this round.
_PROMOTED = [
    "countmin_heavy_hitters",
    "delay_seasonal_profile",
    "lang_rebalance_sample",
    "sequence_packing_bins",
    "token_pmi_bigrams",
    "ann_rrf_fusion",
    "dedup_threshold_sweep",
    "minhash_band_analysis",
    "doc_length_quantiles",
    "route_service_availability",
    "props_value_consistency",
    "source_lang_matrix",
    "suggestion_stability",
    "multimodal_frame_checksums",
    "demand_model_leaderboard",
]
_missing = [k for k in _PROMOTED if k not in QUERIES]
if _missing:
    raise ValueError(f"promoted keys not registered: {_missing}")
QUERIES = {
    **{k: QUERIES[k] for k in _PROMOTED},
    **{k: v for k, v in QUERIES.items() if k not in _PROMOTED},
}
