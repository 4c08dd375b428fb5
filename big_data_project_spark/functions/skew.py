"""Explicit skew handling: two-phase salted aggregation.

AQE's skew-join splitting covers joins, but a groupBy on a hot key
still funnels that key's rows into one reduce task. Salting splits each
key across ``buckets`` partial groups, aggregates the partials, then
combines — turning one straggler task into ``buckets`` even ones at the
cost of a second (tiny) shuffle.

The salt is derived from a hash of a distributor column (any
high-cardinality column works; row content beats rand() because retries
and speculative tasks stay deterministic).

Only algebraic aggregates can be salted (sum/count/min/max — anything
whose partials combine with the same op or a sum). avg is expressed by
the caller as sum/count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    metrics: dict[str, tuple[str, str]],
    distributor: str,
    buckets: int = 16,
) -> DataFrame:
    """Aggregate ``metrics`` ({out_name: (agg, col)}) by ``keys`` in two
    salted phases. Result is identical to a direct groupBy."""
    for out, (agg, _col) in metrics.items():
        if agg not in _PARTIAL:
            raise ValueError(f"{out}: non-algebraic aggregate {agg!r}")
    salt = F.pmod(F.hash(F.col(distributor)), F.lit(buckets)).alias("__salt")
    partial = df.groupBy(*keys, salt).agg(
        *[
            _PARTIAL[agg](F.col(col)).alias(out)
            for out, (agg, col) in metrics.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _COMBINE[agg](F.col(out)).alias(out)
            for out, (agg, _col) in metrics.items()
        ]
    )
