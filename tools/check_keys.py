"""Single/subset key parity check against the DuckDB oracle.

Usage: python tools/check_keys.py key1 [key2 ...] [--sf SF_DIR]
Runs the same compare as drive_contract.py but only for the named keys.
"""
import hashlib
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as e
from big_data_project_spark.session import get_spark


def vhash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    norm = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if v is None:
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append("NaN" if math.isnan(v) else f"{round(v, 6):.6f}")
            elif hasattr(v, "isoformat"):
                vals.append(v.isoformat())
            else:
                vals.append(str(v))
        norm.append("|".join(vals))
    return hashlib.md5("\n".join(sorted(norm)).encode()).hexdigest()


def main():
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2:]
    keys = args
    spark = get_spark("check")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, os_ = e.queries(), e.oracle_sql()
    fails = []
    for name in keys:
        sdf = qs[name](spark, sf)
        scols = [c.lower() for c in sdf.columns]
        srows = [tuple(r) for r in sdf.collect()]
        if name not in os_:
            print(f"{name}: rows-only rows={len(srows)}")
            continue
        res = con.execute(os_[name])
        dcols = [d[0].lower() for d in res.description]
        drows = res.fetchall()
        ok_schema = sorted(scols) == sorted(dcols)
        ok_rows = len(srows) == len(drows)
        ok_hash = vhash(srows, scols) == vhash(drows, dcols)
        status = "OK" if (ok_schema and ok_rows and ok_hash) else "MISMATCH"
        if status != "OK":
            fails.append(name)
            print(f"  spark types: {[(f.name, f.dataType.simpleString()) for f in sdf.schema.fields]}")
            print(f"  spark rows (<=5): {srows[:5]}")
            print(f"  duck  rows (<=5): {drows[:5]}")
        print(f"{name}: {status} rows={len(srows)}/{len(drows)} "
              f"schema={ok_schema} hash={ok_hash}")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
