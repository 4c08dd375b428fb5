"""Tracked persist() for relations a plan consumes more than once.

Spark re-executes shared subplans per consumer (no automatic CTE
materialization), so multi-consumer relations — the LSH pair list, the
exploded bigram/shingle streams — are persisted MEMORY_AND_DISK at the
point of reuse. Spark's CacheManager dedupes by analyzed plan, so
re-invoking the same query in one session re-uses (not re-adds) the
cache entry; what DOES accumulate over a long session is the set of
*distinct* cached relations across different queries / sf_dirs
(round-3 advice item 1).

``release_caches()`` unpersists everything tracked here. The driver and
bench run fine without calling it (caches spill to disk past memory);
a long-lived embedding session running many registry queries should
call it between queries to bound the cache footprint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persisted(df: DataFrame) -> DataFrame:
    """MEMORY_AND_DISK-persist ``df`` and track it for later release.
    At cluster scale this is the step you'd persist or checkpoint to
    the shuffle store anyway."""
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _TRACKED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked relation (idempotent — unpersisting an
    already-released or never-materialized frame is a no-op) AND drop
    the session rollup/plan memo tier (rollups.shared_rollup persists
    its entries itself, outside this tracker; round-9 moved the LSH
    candidate list there, so a release that left the memo behind would
    leak its persisted pair relation). Returns the TOTAL number of
    entries released: tracked handles plus dropped memo-tier entries
    (round-9 advice: the count must mean "everything released")."""
    n = len(_TRACKED)
    while _TRACKED:
        _TRACKED.pop().unpersist()
    from .rollups import clear_rollup_cache

    return n + clear_rollup_cache()
