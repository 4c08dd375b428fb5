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
    curation,
    dedup,
    geo,
    headway,
    hourly,
    ingest,
    kpi,
    multimodal,
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
    validation,
)
from .ml import demand
from .sources import generators, jsonfeed, protofeed
from .streaming import pipeline as streaming_pipeline

# Order matters: the driver's correctness gate walks this list in
# registration order under a wall-time budget (round 1 stopped after 50
# entries, before any LLM-pipeline op). LLM-pipeline family first
# (cheapest modules leading), then the round-1-unchecked tail
# (timeseries/sketches/feeds/streaming twins), then the families the
# driver already covered in round 1 (hourly/kpi/tpch/relational).
_MODULES = [
    textops,
    curation,  # new in round 2: no driver evidence yet, lead with it
    sampling,
    multimodal,
    similarity,
    dedup,
    timeseries,
    sketches,
    generators,
    jsonfeed,
    protofeed,
    alerts,
    streaming_pipeline,
    tpch_sub,  # new in round 2: no driver evidence yet, ahead of checked tail
    hourly,
    headway,
    kpi,
    suggestions,
    validation,
    geo,
    spatial,
    ingest,
    tpch,
    tpch_ext,
    relational,
    demand,
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
