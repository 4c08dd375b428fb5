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


# Order-independent float aggregation: double sums depend on accumulation
# order (partitioning / Expand nodes / engine), which flips the last
# rounded digit on large groups. Summing exact DECIMAL(28,6) is
# associative-commutative-exact; one double division + round at the end
# is deterministic on both engines.


# The exact sums make quotients land on exact half-way decimals far more
# often than raw float sums do, so the final rounding MUST be the pround
# floor form — engine-native round() diverges exactly there (HALF_UP vs
# shortest-repr behavior).


def davg(c: Column | str, n: int = 4) -> Column:
    if isinstance(c, str):
        c = F.col(c)
    return pround(
        F.sum(c.cast("decimal(28,6)")).cast("double") / F.count(c), n
    )


def sql_davg(expr: str, n: int = 4) -> str:
    return sql_pround(
        f"(sum(({expr})::DECIMAL(28,6)))::DOUBLE / count({expr})", n
    )


def dsum_exact(c: Column | str) -> Column:
    """Order-independent raw double sum: exact DECIMAL(28,6)
    accumulation cast back to double WITHOUT final rounding — for
    callers that combine several moment sums in one closed-form
    expression (corr, OLS, cosine) and round once at the end."""
    if isinstance(c, str):
        c = F.col(c)
    return F.sum(c.cast("decimal(28,6)")).cast("double")


def dsum(c: Column | str, n: int = 2) -> Column:
    if isinstance(c, str):
        c = F.col(c)
    return pround(F.sum(c.cast("decimal(28,6)")).cast("double"), n)


def sql_dsum(expr: str, n: int = 2) -> str:
    return sql_pround(f"(sum(({expr})::DECIMAL(28,6)))::DOUBLE", n)


# md5-derived uniform in (0, 1]: the deterministic stand-in for rand()
# every hash-randomized operator here builds on (weighted sampling,
# bootstrap multiplicities). (hash60 + 1) / 2^60 — the +1 keeps ln(u)
# finite; 2^60 because hash60 is the first 15 md5 hex chars. One
# definition on each engine so the parity-critical formula can never
# drift per-operator.


def uniform01(c: Column | str) -> Column:
    if isinstance(c, str):
        c = F.col(c)
    h = F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
    return (h + 1) / F.lit(float(2**60))


def sql_uniform01(expr: str) -> str:
    return (
        f"((('0x' || substr(md5({expr}), 1, 15))::BIGINT + 1))::DOUBLE"
        f" / {2**60}.0"
    )
