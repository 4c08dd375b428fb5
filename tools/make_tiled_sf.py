"""Build a tiled scale-up dataset (~sf1) from an sf0.1 directory.

Round-6 verdict item 3: at sf0.1 the constant-factor bench cohort
measures task dispatch, not the engine (BASELINE.md's tiled-row
experiment shows crossover at ~10^4 rows). This tool materializes a
TILE-x copy of the test tables so the per-round bench can report a
tier where throughput, not fixed overhead, decides.

Tiling semantics — TILE disjoint "days" of the same world:
- Dimensions (region/nation/customer/supplier/part) are copied once;
  fact foreign keys into them stay valid.
- Facts (orders/lineitem/events/documents/embeddings) are replicated
  TILE times with their primary-key domains offset per tile (orderkey
  offsets shared by orders+lineitem; doc_id/vec_id offsets shared so
  the document<->embedding alignment contract survives).
- Document text gets a per-tile marker token prefixed (tile 0 is
  byte-identical to the source) so cross-tile texts are near- but not
  exact-duplicates — without it every doc would have TILE exact
  copies, which turns dedup benchmarks into a different (degenerate)
  workload. n_chars is adjusted to match.
- Timestamps are NOT shifted: per-hour group sizes grow TILE-x (more
  traffic), group counts stay — the axis the rollup tier is supposed
  to absorb via partial aggregation.

Facts are written as a `<table>.parquet/` DIRECTORY of part files
(per-table target sizes, >= ~10 files each) so Spark's scan gets real
splits — a 100 TB table is many files; a single-file fact would
serialize every map-side pipeline on one task and benchmark the
layout, not the engine. Both pandas (pyarrow dataset) and Spark read
the directory transparently.

Cached: a `_MANIFEST.json` fingerprint (source mtimes + tile + logic
version) skips the rebuild when nothing changed.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import duckdb

_VERSION = 5  # bump to invalidate caches when tiling logic changes

DIMS = ["region", "nation", "customer", "supplier", "part"]
FACTS = ["orders", "lineitem", "events", "documents", "embeddings"]


def _fingerprint(src: str, tile: int) -> dict:
    return {
        "version": _VERSION,
        "tile": tile,
        "src": src,
        "mtimes": {
            t: os.path.getmtime(os.path.join(src, f"{t}.parquet"))
            for t in DIMS + FACTS
        },
    }


def build_tiled_sf(
    src: str = "/root/testdata/sf0.1",
    dst: str = "/tmp/spark_graft_sf1",
    tile: int = 10,
) -> str:
    """Materialize (or reuse) the tiled dataset; returns ``dst``."""
    manifest = os.path.join(dst, "_MANIFEST.json")
    fp = _fingerprint(src, tile)
    if os.path.exists(manifest):
        try:
            if json.load(open(manifest)) == fp:
                return dst
        except (json.JSONDecodeError, OSError):
            pass
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)
    con = duckdb.connect()
    for t in DIMS + FACTS:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM '{os.path.join(src, t + '.parquet')}'"
        )
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM {t}) TO "
            f"'{os.path.join(dst, t + '.parquet')}' (FORMAT PARQUET)"
        )
    ok_off = con.execute(
        "SELECT max(o_orderkey) + 1 FROM orders"
    ).fetchone()[0]
    ev_off = con.execute(
        "SELECT max(event_id) + 1 FROM events"
    ).fetchone()[0]
    u_off = con.execute("SELECT max(user_id) + 1 FROM events").fetchone()[0]
    d_off = con.execute(
        "SELECT greatest((SELECT max(doc_id) FROM documents),"
        " (SELECT max(vec_id) FROM embeddings)) + 1"
    ).fetchone()[0]
    tiles = f"(SELECT unnest(range({tile}))::BIGINT AS t)"
    selects = {
        "orders": f"""
            SELECT o_orderkey + t * {ok_off} AS o_orderkey, o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM orders, {tiles}""",
        "lineitem": f"""
            SELECT l_orderkey + t * {ok_off} AS l_orderkey, l_partkey,
                   l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus,
                   l_shipdate
            FROM lineitem, {tiles}""",
        "events": f"""
            SELECT event_id + t * {ev_off} AS event_id, ts,
                   user_id + t * {u_off} AS user_id, event_type, value,
                   props
            FROM events, {tiles}""",
        "documents": f"""
            SELECT doc_id + t * {d_off} AS doc_id,
                   CASE WHEN t = 0 THEN text
                        ELSE 't' || t || ' ' || text END AS text,
                   lang, source,
                   n_chars + CASE WHEN t = 0 THEN 0
                                  ELSE length('t' || t || ' ') END
                     AS n_chars
            FROM documents, {tiles}""",
        "embeddings": f"""
            SELECT vec_id + t * {d_off} AS vec_id, embedding, label
            FROM embeddings, {tiles}""",
    }
    # Per-table target file sizes chosen so EVERY fact gets >= ~10
    # files (Spark parallelizes scans per file below
    # maxPartitionBytes; a 6 MB documents table in one file would run
    # every map-side text pipeline on one core and benchmark the
    # layout, not the engine). Small row groups let FILE_SIZE_BYTES
    # actually split the row-light tables (DuckDB checks size per row
    # group; a 50k-row table under the default 122k-row group would
    # always be one file).
    sizes = {
        "lineitem": "8MB",
        "orders": "2MB",
        "events": "1MB",
        "documents": "512KB",
        "embeddings": "512KB",
    }
    for t in FACTS:
        rg = ", ROW_GROUP_SIZE 2000" if t != "lineitem" else ""
        con.execute(
            f"COPY ({selects[t]}) TO "
            f"'{os.path.join(dst, t + '.parquet')}' "
            f"(FORMAT PARQUET, FILE_SIZE_BYTES '{sizes[t]}'{rg})"
        )
    con.close()
    with open(manifest, "w") as f:
        json.dump(fp, f)
    return dst


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    out = build_tiled_sf(src, dst, tile)
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(out)
        for f in fs
    )
    print(json.dumps({"dst": out, "tile": tile, "bytes": total}))
