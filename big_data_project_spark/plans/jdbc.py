"""JDBC serving sink: keyed upsert into an external SQL store.

Parity target: the reference serves EVERY analytics result out of
Postgres — its ingestion service consumes the realtime topics and
upserts row-by-row with psycopg2 ``INSERT ... ON CONFLICT (keys)
DO UPDATE SET col = EXCLUDED.col`` (trip_updates / service_alerts,
reference src/db-ingestion-service/ingestor.py:88-137) or ``DO
NOTHING`` (vehicle_positions, ingestor.py:50-86), and every DAG job
writes its rollups the same way. This module is the Spark-shaped
analog of that serving path:

1. the micro-batch is deduplicated per key (a set-based MERGE — like
   a multi-row ON CONFLICT insert — rejects two source rows hitting
   the same target row; the reference avoids this only because it
   writes one row at a time, last-consumed-wins),
2. written DISTRIBUTED through Spark's JDBC writer into a staging
   table (executors stream partitions concurrently — the scale path;
   no driver-side collect of the batch),
3. folded into the target with ONE ANSI ``MERGE`` statement
   (Postgres 15+/Derby/Oracle/SQL Server; semantically identical to
   ON CONFLICT DO UPDATE / DO NOTHING), executed driver-side over a
   plain JDBC connection.

``foreach_batch_jdbc_upsert`` wraps the upsert as a
``writeStream.foreachBatch`` sink: because the MERGE is keyed and the
per-key winner is deterministic, a replayed micro-batch (crash before
the checkpoint commit) re-merges to the SAME target state — the
redelivery absorption the reference gets from its ON CONFLICT clause.

Tested against embedded Derby (in-process, ships with Spark) — the
same statements run against Postgres by switching the URL. One
portability shim: Spark's Derby dialect maps StringType to CLOB,
which Derby cannot compare in a MERGE ON clause, so string columns
get explicit VARCHAR types via createTableColumnTypes (harmless on
Postgres).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# generous default for serving-table text columns (keys, names,
# descriptions); callers with longer payloads pass string_type
DEFAULT_STRING_TYPE = "VARCHAR(1024)"

# Spark simpleString -> ANSI column type for ALTER TABLE ADD COLUMN
# (schema evolution). DOUBLE PRECISION / REAL / BIGINT are the
# portable spellings Derby and Postgres both accept.
_ANSI_TYPES = {
    "bigint": "BIGINT",  # Spark simpleString for LongType
    "int": "INTEGER",
    "smallint": "SMALLINT",
    "tinyint": "SMALLINT",  # no ANSI 1-byte int; widen
    "double": "DOUBLE PRECISION",
    "float": "REAL",
    "boolean": "BOOLEAN",
    "timestamp": "TIMESTAMP",
    "date": "DATE",
}


def _ansi_type(field, string_type: str) -> str:
    s = field.dataType.simpleString()
    if s == "string":
        return string_type
    if s.startswith("decimal"):
        return s.upper()
    try:
        return _ANSI_TYPES[s]
    except KeyError:
        raise ValueError(
            f"no ANSI column type mapping for evolved column "
            f"{field.name!r} of type {s!r}"
        ) from None


def _q(ident: str) -> str:
    return '"' + ident.replace('"', '""') + '"'


# SQLSTATEs meaning "table already exists": Derby X0Y32, Postgres
# 42P07 (duplicate_table), SQL Server/MySQL-compatible 42S01. Matching
# the STATE (not the message) is locale-proof — Postgres localizes its
# error text under lc_messages, so 'already exists' never appears in
# e.g. a French-locale server's message.
_DUP_TABLE_SQLSTATES = {"X0Y32", "42P07", "42S01"}

# SQLSTATEs meaning "table does not exist": Derby 42Y55 (drop) /
# 42X05, Postgres 42P01 (undefined_table), SQL Server-compatible 42S02.
_NO_TABLE_SQLSTATES = {"42Y55", "42X05", "42P01", "42S02"}


def _sql_states(exc: Exception) -> set[str]:
    """Collect SQLSTATEs along the wrapped java.sql.SQLException cause
    chain of a py4j error (empty for non-JVM exceptions)."""
    states: set[str] = set()
    jexc = getattr(exc, "java_exception", None)
    seen = 0
    while jexc is not None and seen < 16:  # cycle guard
        try:
            state = jexc.getSQLState()
            if state:
                states.add(str(state))
        except Exception:  # noqa: BLE001 — not an SQLException layer
            pass
        try:
            jexc = jexc.getCause()
        except Exception:  # noqa: BLE001
            break
        seen += 1
    return states


def _jdbc_exec(
    spark: SparkSession, url: str, statements: list[str]
) -> list[str]:
    """Run DDL/DML statements over a driver-side JDBC connection
    (py4j); returns the statements that ran. O(1) per micro-batch —
    the data itself moved through the distributed staging write."""
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            for sql in statements:
                st.executeUpdate(sql)
        finally:
            st.close()
    finally:
        conn.close()
    return statements


def _dedup_per_key(
    df: DataFrame, key_cols: list[str], version_col: str | None
) -> DataFrame:
    """One row per key, deterministic winner: highest version first
    (NULLs last) when a version column exists, else the lexicographic
    max over the non-key columns — the set-based stand-in for the
    reference's last-consumed-wins row loop."""
    others = [c for c in df.columns if c not in key_cols]
    if not others:
        return df.dropDuplicates(key_cols)
    lead = [version_col] if version_col else []
    order = [
        F.col(c).desc_nulls_last()
        for c in lead + [c for c in others if c != version_col]
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _merge_sql(
    table: str,
    staging: str,
    cols: list[str],
    key_cols: list[str],
    on_conflict: str,
) -> str:
    on = " AND ".join(f"t.{_q(k)} = s.{_q(k)}" for k in key_cols)
    non_keys = [c for c in cols if c not in key_cols]
    # bare correlation names (no AS): Derby's MERGE grammar does not
    # accept AS before the correlation name; Postgres accepts both
    sql = f"MERGE INTO {_q(table)} t USING {_q(staging)} s ON ({on})"
    if on_conflict == "update" and non_keys:
        sets = ", ".join(f"{_q(c)} = s.{_q(c)}" for c in non_keys)
        sql += f" WHEN MATCHED THEN UPDATE SET {sets}"
    names = ", ".join(_q(c) for c in cols)
    vals = ", ".join(f"s.{_q(c)}" for c in cols)
    return sql + f" WHEN NOT MATCHED THEN INSERT ({names}) VALUES ({vals})"


def jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    *,
    version_col: str | None = None,
    on_conflict: str = "update",
    staging_table: str | None = None,
    string_type: str = DEFAULT_STRING_TYPE,
    num_partitions: int | None = None,
    allow_schema_evolution: bool = False,
) -> None:
    """Keyed upsert of ``df`` into JDBC table ``table``.

    on_conflict="update" mirrors the reference's ON CONFLICT DO
    UPDATE (ingestor.py:101-107); "nothing" mirrors DO NOTHING
    (ingestor.py:73) — existing rows keep their values, only new keys
    insert. The target table is created from the staging schema on
    first use.

    Schema contract: a batch carrying columns the target lacks fails
    loudly by default (naming them) — the MERGE would otherwise die in
    an opaque SQL error. With ``allow_schema_evolution`` the missing
    columns are added first (ALTER TABLE ADD COLUMN, NULL for existing
    rows) — the lake sink's additive contract, except updates here are
    COLUMN-PATCH, not row-replace: a batch MISSING some target columns
    is always legal SQL (the MERGE sets only the batch's columns,
    stored values survive) exactly like the reference's partial
    ON CONFLICT SET lists.

    Scale: the only corpus-sized movement is the distributed staging
    write (numPartitions concurrent INSERT streams); dedup is one
    keyed window over the BATCH (not the target), and the MERGE is
    one statement the database executes with its own join plan.
    """
    if on_conflict not in ("update", "nothing"):
        raise ValueError(f"on_conflict must be update|nothing: {on_conflict}")
    missing = [k for k in key_cols if k not in df.columns]
    if missing:
        raise ValueError(f"key columns not in frame: {missing}")
    spark = df.sparkSession
    staging = staging_table or f"{table}__stage"
    deduped = _dedup_per_key(df, key_cols, version_col)
    if num_partitions:
        deduped = deduped.coalesce(num_partitions)

    # Drop (not truncate) the transient staging table so each batch
    # recreates it at ITS OWN schema — a truncated leftover from a
    # prior batch rejects a widened batch with COLUMN_NOT_DEFINED.
    try:
        _jdbc_exec(spark, url, [f"DROP TABLE {_q(staging)}"])
    except Exception as exc:  # noqa: BLE001 — py4j wraps SQLException
        states = _sql_states(exc)
        if not (states & _NO_TABLE_SQLSTATES) and (
            states or "does not exist" not in str(exc)
        ):
            raise
    str_cols = [
        f.name for f in deduped.schema.fields
        if f.dataType.simpleString() == "string"
    ]
    writer = (
        deduped.write.format("jdbc")
        .option("url", url)
        .option("dbtable", _q(staging))
        .mode("overwrite")
    )
    if str_cols:
        writer = writer.option(
            "createTableColumnTypes",
            ", ".join(f"{c} {string_type}" for c in str_cols),
        )
    writer.save()

    try:
        _jdbc_exec(
            spark,
            url,
            [
                f"CREATE TABLE {_q(table)} AS SELECT * FROM {_q(staging)}"
                " WITH NO DATA"
            ],
        )
    except Exception as exc:  # noqa: BLE001 — py4j wraps SQLException
        # "table already exists" is the steady state; anything else is
        # a real DDL failure. Decide by SQLSTATE (locale-proof), with
        # the English-message substring only as a fallback for drivers
        # that do not surface a state through the py4j cause chain.
        states = _sql_states(exc)
        if not (states & _DUP_TABLE_SQLSTATES) and (
            states or "already exists" not in str(exc)
        ):
            raise
    target_cols = {
        c.lower() for c in read_jdbc_table(spark, url, table).columns
    }
    added = [
        f for f in deduped.schema.fields
        if f.name.lower() not in target_cols
    ]
    if added:
        if not allow_schema_evolution:
            raise ValueError(
                "batch carries columns the serving table lacks: "
                f"{sorted(f.name for f in added)}; pass "
                "allow_schema_evolution=True to ALTER TABLE ADD them"
            )
        _jdbc_exec(
            spark,
            url,
            [
                f"ALTER TABLE {_q(table)} ADD COLUMN "
                f"{_q(f.name)} {_ansi_type(f, string_type)}"
                for f in added
            ],
        )
    _jdbc_exec(
        spark,
        url,
        [_merge_sql(table, staging, deduped.columns, key_cols, on_conflict)],
    )


def foreach_batch_jdbc_upsert(
    url: str,
    table: str,
    key_cols: list[str],
    **kwargs,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink: each micro-batch keyed-upserts into the
    serving table. Redelivered batches (restart between sink write
    and checkpoint commit) re-merge idempotently — the streaming
    contract the reference's ON CONFLICT consumer provides."""

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        del epoch_id
        if batch_df.isEmpty():
            return
        jdbc_upsert(batch_df, url, table, key_cols, **kwargs)

    return _sink


def read_jdbc_table(
    spark: SparkSession, url: str, table: str
) -> DataFrame:
    """Read a serving table back (tests + downstream joins)."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", _q(table))
        .load()
    )
