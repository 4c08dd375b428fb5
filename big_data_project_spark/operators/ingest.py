"""Ingestion-hygiene operators: referential-integrity filtering and
key-dedup, the distributed form of the reference's GTFS validation step.

Parity: process() in /root/reference/src/dag/gtfs-static-job.py:101-164
(trips⋉routes, stop_times⋉trips⋉stops semi-join filtering followed by
drop_duplicates on the natural keys). Here the fact table is lineitem
and the dims are orders/part/supplier.

Scale: left-semi joins never materialize the dim payload; dims are
broadcast; dedup shuffles once on the natural key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table

# Duplicate natural keys can carry different payloads, so the surviving
# row must be picked by a total order for the result to be deterministic
# (dropDuplicates keeps an arbitrary row — fine for idempotence, not for
# cross-engine parity).
_TIEBREAK = ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
             "l_discount", "l_tax", "l_returnflag", "l_linestatus",
             "l_shipdate"]


def referential_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    filtered = (
        li.join(
            F.broadcast(orders), li.l_orderkey == orders.o_orderkey, "left_semi"
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey, "left_semi")
    )
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        *[F.asc(c) for c in _TIEBREAK]
    )
    filtered = (
        filtered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return filtered.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


QUERIES = {"referential_filter": referential_filter}

ORACLES = {
    "referential_filter": """
        WITH f AS (
          SELECT l.* FROM lineitem l
          WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
            AND EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
            AND EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
        ),
        d AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (
              PARTITION BY l_orderkey, l_linenumber
              ORDER BY l_partkey, l_suppkey, l_quantity, l_extendedprice,
                       l_discount, l_tax, l_returnflag, l_linestatus,
                       l_shipdate
            ) AS rn FROM f
          ) t WHERE rn = 1
        )
        SELECT l_returnflag,
               count(*) AS n_rows,
               count(DISTINCT l_orderkey) AS n_orders
        FROM d GROUP BY l_returnflag
    """,
}


def salted_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation through the salted two-phase path
    (functions/skew.py::salted_aggregate): event_type has single-digit
    cardinality, so a plain groupBy funnels ~1/5 of a 100 TB feed into
    ONE reduce task per key; salting splits each key across 16 partial
    groups and recombines. The oracle is the PLAIN group-by — the whole
    point is that the salted plan returns byte-identical answers, so
    the skew tool ships with a correctness contract instead of a
    promise.

    Determinism: count partials are integers; the value sum folds
    through DECIMAL(28,6) partials whose recombination is exact.

    Scale: two shuffles (corpus-scale on (key, salt) with 16x the key
    cardinality, then a keys x 16-sized combine) — the straggler task
    becomes 16 even ones."""
    from ..functions.portable import pround
    from ..functions.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.col("value").cast("decimal(28,6)").alias("value_dec"),
    )
    out = salted_aggregate(
        ev,
        keys=["event_type"],
        metrics={
            "n_events": ("count", "event_id"),
            "sum_dec": ("sum", "value_dec"),
        },
        distributor="event_id",
        buckets=16,
    )
    return out.select(
        "event_type",
        "n_events",
        pround(F.col("sum_dec").cast("double"), 2).alias("total_value"),
    ).orderBy("event_type")


QUERIES["salted_event_type_counts"] = salted_event_type_counts

from ..functions.portable import sql_pround as _sql_pround  # noqa: E402

ORACLES["salted_event_type_counts"] = f"""
    SELECT event_type,
           count(event_id)::BIGINT AS n_events,
           {_sql_pround("(sum((value)::DECIMAL(28,6)))::DOUBLE", 2)}
             AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
"""


# --- join-key skew audit (the pre-join diagnostic) --------------------------

_SKEW_KEYS = [
    ("lineitem", "l_orderkey"),  # the fact-fact shuffle key (orders join)
    ("events", "user_id"),  # the sessionization / behavior-family key
]


def join_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution profile for the two join/shuffle keys every
    heavy plan in this repo hashes on — the audit run BEFORE a big join
    to decide whether AQE skew splitting, salting, or a broadcast is
    needed (the relational twin of minhash_band_analysis, which plays
    this role for the LSH candidate join). One row per key: row/key
    counts, mean, p99 and max group sizes, the skew ratio max/mean
    (the number AQE's skewedPartitionFactor thresholds against), and
    the heaviest key itself for a targeted fix.

    Scale: ONE group-by shuffle per audited key (partial aggregation
    compresses map-side); the ranked-selection window runs over the
    keys-sized group relation — at corpus scale swap the exact p99 for
    approx_percentile over the same relation (the documented
    exact-rank/approx-quantile trade every quantile key here makes).

    Determinism: pure integer counts; p99 by the house integer-rank
    rule ceil(0.99 * n) on the ascending sort (ties by key); the
    heaviest key ties to the smallest key id; ratios 6dp-quantized."""
    from ..functions.portable import pround

    outs = []
    for table, key in _SKEW_KEYS:
        sizes = (
            load_table(spark, sf_dir, table)
            .groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w_asc = Window.orderBy(F.col("cnt").asc(), F.col("k").asc())
        w_desc = Window.orderBy(F.col("cnt").desc(), F.col("k").asc())
        w_all = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        ranked = (
            sizes.withColumn("rk", F.row_number().over(w_asc))
            .withColumn("rk_top", F.row_number().over(w_desc))
            .withColumn("n_keys", F.count(F.lit(1)).over(w_all))
        )
        outs.append(
            ranked.groupBy().agg(
                F.lit(f"{table}.{key}").alias("join_key"),
                F.sum("cnt").cast("bigint").alias("n_rows"),
                F.max("n_keys").cast("bigint").alias("n_keys"),
                F.max(
                    F.when(
                        F.col("rk")
                        == F.ceil(F.lit(0.99) * F.col("n_keys")),
                        F.col("cnt"),
                    )
                ).cast("bigint").alias("p99_rows_per_key"),
                F.max("cnt").cast("bigint").alias("max_rows_per_key"),
                F.max(F.when(F.col("rk_top") == 1, F.col("k")))
                .cast("bigint")
                .alias("heaviest_key"),
            )
        )
    out = outs[0]
    for more in outs[1:]:
        out = out.unionByName(more)
    return out.select(
        "join_key",
        "n_rows",
        "n_keys",
        pround(F.col("n_rows") / F.col("n_keys"), 6).alias(
            "avg_rows_per_key"
        ),
        "p99_rows_per_key",
        "max_rows_per_key",
        pround(
            F.col("max_rows_per_key") * F.col("n_keys") / F.col("n_rows"), 6
        ).alias("skew_ratio"),
        "heaviest_key",
    ).orderBy("join_key")


QUERIES["join_key_skew_audit"] = join_key_skew_audit


def _skew_branch_sql(table: str, key: str) -> str:
    return f"""
      SELECT '{table}.{key}' AS join_key,
             CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(max(n_keys) AS BIGINT) AS n_keys,
             CAST(max(CASE WHEN rk = ceil(0.99 * n_keys)
                           THEN cnt END) AS BIGINT) AS p99_rows_per_key,
             CAST(max(cnt) AS BIGINT) AS max_rows_per_key,
             CAST(max(CASE WHEN rk_top = 1 THEN k END) AS BIGINT)
               AS heaviest_key
      FROM (
        SELECT k, cnt,
               row_number() OVER (ORDER BY cnt ASC, k ASC) AS rk,
               row_number() OVER (ORDER BY cnt DESC, k ASC) AS rk_top,
               count(*) OVER () AS n_keys
        FROM (
          SELECT {key} AS k, count(*) AS cnt FROM {table} GROUP BY {key}
        ) s
      ) r
    """


ORACLES["join_key_skew_audit"] = f"""
    WITH u AS (
      {" UNION ALL ".join(_skew_branch_sql(t, k) for t, k in _SKEW_KEYS)}
    )
    SELECT join_key, n_rows, n_keys,
           {_sql_pround("n_rows::DOUBLE / n_keys", 6)} AS avg_rows_per_key,
           p99_rows_per_key, max_rows_per_key,
           {_sql_pround(
               "max_rows_per_key::DOUBLE * n_keys / n_rows", 6
           )} AS skew_ratio,
           heaviest_key
    FROM u ORDER BY join_key
"""
