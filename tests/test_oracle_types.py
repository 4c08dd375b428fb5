"""Oracle type-portability gate (round-2 verdict item 7).

The driver's value hash is type-sensitive: DuckDB silently promotes
``SUM(BIGINT)`` (plain and windowed) to HUGEINT, which Spark cannot
produce, so an otherwise cell-identical result hash-mismatches. Every
red CORRECTNESS row across rounds 1-2 was this one bug. This test walks
every registered oracle, resolves its DuckDB result types and the Spark
query's schema, and fails on any (spark, duck) column-type pairing
outside the engine-portable set — so an un-CAST ``sum()`` cannot land
again.
"""

from __future__ import annotations

import pytest

from big_data_project_spark.registry import ORACLES, QUERIES

from tests.conftest import SF_DIR

# Integer widths hash alike through the driver's arrow->pandas path;
# width promotion within the 64-bit family is portable. Anything wider
# (HUGEINT/UHUGEINT) or of a different family (DECIMAL vs DOUBLE) is
# not representable on the Spark side and must be CAST in the oracle.
_INT_SPARK = {"tinyint", "smallint", "int", "bigint"}
_INT_DUCK = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
_SCALAR_PAIRS = {
    ("double", "DOUBLE"),
    ("float", "FLOAT"),
    ("string", "VARCHAR"),
    ("boolean", "BOOLEAN"),
    ("date", "DATE"),
    ("timestamp", "TIMESTAMP"),
    ("timestamp_ntz", "TIMESTAMP"),
    ("binary", "BLOB"),
}


def _portable(spark_type: str, duck_type: str) -> bool:
    base_duck = duck_type.split("(")[0].strip()
    if spark_type in _INT_SPARK and base_duck in _INT_DUCK:
        return True
    if spark_type.startswith("decimal") and base_duck == "DECIMAL":
        return spark_type.upper().replace(" ", "") == duck_type.replace(
            " ", ""
        )
    return (spark_type, base_duck) in _SCALAR_PAIRS


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_types_portable(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_types = {
        f.name.lower(): f.dataType.simpleString() for f in sdf.schema
    }
    rel = duck.sql(ORACLES[name])
    bad = []
    for col, dtype in zip(rel.columns, rel.types):
        st = spark_types.get(col.lower())
        dt = str(dtype)
        if st is None:
            bad.append(f"{col}: oracle-only column (duck={dt})")
        elif not _portable(st, dt):
            bad.append(f"{col}: spark={st} vs duck={dt}")
    assert not bad, (
        f"{name}: non-portable oracle column types (CAST in the oracle "
        f"SQL so DuckDB matches Spark): {bad}"
    )
