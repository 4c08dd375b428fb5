"""Rounding that is bit-identical between Spark and the DuckDB oracle.

``round()`` differs between engines on exact half-way doubles (Spark
rounds HALF_UP via BigDecimal, DuckDB half-to-even on doubles), which
shows up when rule outputs are blends of already-rounded values. This
floor-based form evaluates identically because both engines see the same
IEEE double and ``floor`` has no tie cases.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(c: Column | str, n: int = 4) -> Column:
    if isinstance(c, str):
        c = F.col(c)
    scale = float(10**n)
    return F.floor(c * scale + F.lit(0.5)) / F.lit(scale)


def sql_pround(expr: str, n: int = 4) -> str:
    scale = float(10**n)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
