"""Dump (query, column, spark_type, duckdb_type) for every oracle-backed
query at sf0.001 — used to build/verify the oracle type-portability test."""

from __future__ import annotations

import duckdb

from big_data_project_spark.catalog import TABLES, table_path
from big_data_project_spark.registry import ORACLES, QUERIES
from big_data_project_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("oracle-types")
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{table_path(SF_DIR, name)}'"
        )
    pairs = set()
    for name in sorted(ORACLES):
        sdf = QUERIES[name](spark, SF_DIR)
        stypes = {f.name.lower(): f.dataType.simpleString() for f in sdf.schema}
        rel = con.sql(ORACLES[name])
        for col, dtype in zip(rel.columns, rel.types):
            col = col.lower()
            st = stypes.get(col, "<missing>")
            dt = str(dtype)
            pairs.add((st, dt))
            print(f"{name:35s} {col:28s} spark={st:20s} duck={dt}")
    print("\n== distinct (spark, duck) type pairs ==")
    for st, dt in sorted(pairs):
        print(f"  {st:25s} <-> {dt}")
    spark.stop()


if __name__ == "__main__":
    main()
