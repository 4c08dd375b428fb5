"""Commerce-analytics surface: ABC/Pareto revenue classification,
market-basket co-occurrence, repeat-purchase cadence, supplier
concentration (HHI), a GROUPING SETS revenue report, and C4-style
normalized exact dedup.

Parity: the reference's analyst-facing views slice the same rollup
grain by priority/month/route (/root/reference/src/optimization/
kpi_views.sql:19-151) and its suggestion engine ranks entities by
cumulative contribution before acting
(/root/reference/src/suggestions/generate_suggestions.py:82-203 reads
load ordered by severity) — ABC classification, mix shares, and
concentration indexes are the standard warehouse companions to that
family, re-expressed Spark-first. ``dedup_normalized`` is the C4
"exact dedup after normalization" recipe (Raffel et al., 2020) the
LLM-pipeline section's raw exact dedup deliberately skips.

Scale design:
- Money is folded through BIGINT 1e-4-dollar units: the per-row
  ``l_extendedprice*(1-l_discount)`` has exactly 4 decimal places, so
  ``floor(x*10000+0.5)`` recovers the exact integer on both engines
  (the true value sits ~1e-13 relative from the double product — never
  near a .5 boundary) and every downstream sum/cumsum/comparison is
  exact integer arithmetic, order-independent by construction. Head-
  room: BIGINT units carry ~9e14 dollars of corpus revenue before the
  cross-multiplied threshold compare (x20) would overflow — beyond
  100 TB of TPC-H; past that the fold widens to DECIMAL unchanged.
- ``part_revenue_abc``'s running share uses cross-multiplied integer
  compares (run*5 <= total*4) instead of a double division — no
  boundary-tie risk at the 80/95 cuts. The full-order window is
  |parts|-sized, AFTER the corpus-scale aggregate.
- ``basket_part_pairs`` self-joins at ORDER grain on the distinct
  (order, type) set — fan-out bounded by types-per-order squared
  (~4 lines/order), never corpus x corpus.
- ``supplier_concentration_hhi`` squares per-supplier revenue only
  after rounding it to exact cents, so the squares are 4-dp-exact
  doubles that fold through DECIMAL(28,6) losslessly; HHI is a single
  closed-form division per nation.
- ``dedup_normalized`` is one pass: both exact distinct counts share
  one Expand(x2) over md5 hashes — the 32-byte shuffle rows, not the
  document bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable import davg, pround, sql_davg, sql_pround

QUERIES: dict = {}
ORACLES: dict = {}

ABC_A_PCT = 80  # cumulative-revenue cut for class A
ABC_B_PCT = 95  # cumulative-revenue cut for class B
BASKET_TOP_PAIRS = 20
GAP_BUCKET_DAYS = 30

def _rev_units():
    """Exact BIGINT 1e-4-dollar units for
    l_extendedprice*(1-l_discount) (built lazily — Columns need an
    active session)."""
    return F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
        + F.lit(0.5)
    )
_SQL_REV_UNITS = (
    "(floor(l_extendedprice*(1-l_discount)*10000 + 0.5))::BIGINT"
)


def part_revenue_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of parts by revenue: parts are
    ranked by revenue (partkey tie-break — total order), the running
    cumulative share cut at 80% (A) and 95% (B), and the report
    aggregates each class to count / revenue / exact share. The
    inventory-policy cut every warehouse runs first.

    Determinism: revenue units are exact integers folded at
    DECIMAL(38,0) (generated data carries ~3e15 units per SF, so the
    corpus total passes BIGINT's ~9.2e18 near SF 3000 and the
    cross-multiplied compare would wrap silently near SF 30 — decimal
    folds keep ~1e38 of headroom, far past 100 TB); the class cuts are
    cross-multiplied integer compares (run*100 <= total*80 / total*95),
    so the 80/95 boundaries have no float-tie cases on either engine.

    Scale: one corpus-scale aggregate to part grain, then a
    |parts|-sized fully-ordered window (single partition over ~200k
    rows/SF — the ranking is inherently global) and a 3-row output."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(_rev_units().cast("decimal(38,0)")).alias("units")
    )
    w_run = Window.orderBy(F.desc("units"), F.col("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    ranked = rev.select(
        "units",
        F.sum("units").over(w_run).alias("run_units"),
        F.sum("units").over(w_all).alias("total_units"),
    )
    cls = F.when(
        F.col("run_units") * 100 <= F.col("total_units") * ABC_A_PCT, "A"
    ).when(
        F.col("run_units") * 100 <= F.col("total_units") * ABC_B_PCT, "B"
    ).otherwise("C")
    return (
        ranked.select(cls.alias("abc_class"), "units", "total_units")
        .groupBy("abc_class", "total_units")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("units").alias("class_units"),
        )
        .select(
            "abc_class",
            "n_parts",
            pround(F.col("class_units") / 10000.0, 2).alias("revenue"),
            pround(
                F.col("class_units")
                / F.col("total_units").cast("double"),
                6,
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


ORACLES["part_revenue_abc"] = f"""
    WITH rev AS (
      -- HUGEINT (128-bit) mirrors the Spark side's DECIMAL(38,0)
      -- folds: the cross-multiplied class compare wraps BIGINT near
      -- SF 30 and the corpus total passes BIGINT near SF 3000.
      SELECT l_partkey, (sum({_SQL_REV_UNITS}))::HUGEINT AS units
      FROM lineitem GROUP BY l_partkey
    ), ranked AS (
      SELECT units,
             (sum(units) OVER (ORDER BY units DESC, l_partkey
                ROWS UNBOUNDED PRECEDING))::HUGEINT AS run_units,
             (sum(units) OVER ())::HUGEINT AS total_units
      FROM rev
    ), cls AS (
      SELECT CASE
               WHEN run_units*100 <= total_units*{ABC_A_PCT} THEN 'A'
               WHEN run_units*100 <= total_units*{ABC_B_PCT} THEN 'B'
               ELSE 'C' END AS abc_class,
             units, total_units
      FROM ranked
    )
    SELECT abc_class,
           count(*)::BIGINT AS n_parts,
           {sql_pround("(sum(units))::DOUBLE / 10000.0", 2)} AS revenue,
           {sql_pround(
               "(sum(units))::DOUBLE / total_units::DOUBLE", 6
           )} AS revenue_share
    FROM cls GROUP BY abc_class, total_units ORDER BY abc_class
"""


def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top part-BRAND pairs bought
    in the same order (support = distinct-order count), ranked with a
    total order (support desc, then the pair) so top-K is engine-
    deterministic. Brand grain (25 values here -> 300 possible pairs)
    gives statistically dense pairs where raw partkey pairs are almost
    all support-1 (and p_type has only 6 values -- degenerate).

    Scale: part is broadcast (carrying a dense 0-based brand id from a
    25-row dim, so brand sets become BIT MASKS in one long); ONE
    corpus-scale shuffle builds the per-order mask with a bit_or
    aggregate — 8 fixed bytes per partial instead of a
    variable-length string-set buffer — then a second aggregate
    collapses orders to DISTINCT masks (map-side partials shrink it
    to ≤ 2^|brands| rows), and the i<j pair expansion runs over
    those masks weighted by their order counts — fan-out bounded by
    distinct-brand-sets × pairs-per-set, never a self-join
    re-shuffle. The pair aggregate is |brands|²-bounded."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # the brand dim (bid, p_brand) from ONE collect_set aggregate
    # over part, posexploded in sorted order — bid = 0-based
    # lexicographic rank with no window and no distinct exchange;
    # every attach below is a ≤|brands|-row broadcast equi-join
    # (BroadcastHashJoin — the NO_NESTED_LOOP contract holds)
    bdim = part.agg(
        F.array_sort(F.collect_set("p_brand")).alias("brands")
    ).select(F.posexplode("brands").alias("bid", "p_brand"))
    bpart = part.join(F.broadcast(bdim), "p_brand").select(
        "p_partkey", "bid"
    )
    masks = (
        li.join(F.broadcast(bpart), li.l_partkey == bpart.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.expr("bit_or(shiftleft(1L, bid))").alias("mask"))
    )
    mc = masks.groupBy("mask").agg(F.count(F.lit(1)).alias("n_orders_m"))
    # set bits of the mask, ascending == p_brand lexicographic order
    bits = F.expr(
        "filter(sequence(0, 63), b -> (shiftright(mask, b) & 1) = 1)"
    )
    # all i<j pairs of the set-bit list, generated map-side
    pair_expr = F.expr(
        "flatten(transform(bits, (x, i) -> "
        "transform(slice(bits, i + 2, size(bits)), "
        "y -> struct(x AS ba, y AS bb))))"
    )
    counted = (
        mc.withColumn("bits", bits)
        .select(F.explode(pair_expr).alias("p"), "n_orders_m")
        .groupBy(
            F.col("p.ba").alias("ba"), F.col("p.bb").alias("bb")
        )
        .agg(F.sum("n_orders_m").alias("n_orders"))
        .join(
            F.broadcast(
                bdim.select(
                    F.col("bid").alias("ba"),
                    F.col("p_brand").alias("brand_a"),
                )
            ),
            "ba",
        )
        .join(
            F.broadcast(
                bdim.select(
                    F.col("bid").alias("bb"),
                    F.col("p_brand").alias("brand_b"),
                )
            ),
            "bb",
        )
        .select("brand_a", "brand_b", "n_orders")
    )
    rank = F.row_number().over(
        Window.orderBy(
            F.desc("n_orders"), F.col("brand_a"), F.col("brand_b")
        )
    )
    return (
        counted.withColumn("pair_rank", rank)
        .filter(F.col("pair_rank") <= BASKET_TOP_PAIRS)
        .orderBy("pair_rank")
    )


ORACLES["basket_part_pairs"] = f"""
    WITH ot AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ), counted AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             count(*)::BIGINT AS n_orders
      FROM ot a JOIN ot b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY a.p_brand, b.p_brand
    )
    SELECT brand_a, brand_b, n_orders, pair_rank FROM (
      SELECT *, (row_number() OVER (
               ORDER BY n_orders DESC, brand_a, brand_b))::INT AS pair_rank
      FROM counted
    ) WHERE pair_rank <= {BASKET_TOP_PAIRS} ORDER BY pair_rank
"""


def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence: the day gap between each customer's
    consecutive orders (lag over (custkey, orderdate, orderkey) — the
    orderkey tie-break totalizes same-day pairs), bucketed into 30-day
    bins with per-bin counts and the exact average gap. The
    inter-purchase-interval histogram a retention model calibrates on.

    Scale: one customer-key exchange for the lag window, then a
    buckets-sized aggregate. No self-join — the window IS the
    adjacency."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    gaps = (
        o.select(
            "o_custkey",
            "o_orderdate",
            "o_orderkey",
            F.datediff(
                F.to_date("o_orderdate"),
                F.to_date(F.lag("o_orderdate").over(w)),
            ).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    bucket = F.floor(F.col("gap_days") / GAP_BUCKET_DAYS)
    return (
        gaps.groupBy(bucket.alias("gap_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            davg(F.col("gap_days").cast("double"), 2).alias(
                "avg_gap_days"
            ),
        )
        .withColumn(
            "bucket_lo_days",
            (F.col("gap_bucket") * GAP_BUCKET_DAYS).cast("bigint"),
        )
        .select("gap_bucket", "bucket_lo_days", "n_gaps", "avg_gap_days")
        .orderBy("gap_bucket")
    )


ORACLES["customer_order_gaps"] = f"""
    WITH gaps AS (
      SELECT date_diff('day',
               lag(o_orderdate::DATE) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey),
               o_orderdate::DATE) AS gap_days
      FROM orders
    ), g AS (SELECT gap_days FROM gaps WHERE gap_days IS NOT NULL)
    SELECT (floor(gap_days / {GAP_BUCKET_DAYS}))::BIGINT AS gap_bucket,
           ((floor(gap_days / {GAP_BUCKET_DAYS}))::BIGINT
              * {GAP_BUCKET_DAYS})::BIGINT AS bucket_lo_days,
           count(*)::BIGINT AS n_gaps,
           {sql_davg("gap_days::DOUBLE", 2)} AS avg_gap_days
    FROM g GROUP BY 1, 2 ORDER BY gap_bucket
"""


def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier revenue concentration per nation: the
    Herfindahl-Hirschman index sum_i(share_i^2) of each supplier's
    revenue share within its nation — the antitrust-style
    concentration screen for a supply base.

    Determinism: per-supplier revenue folds to exact BIGINT cents
    ((units+50) div 100 — integer arithmetic, no float floor), the
    squares are then 4-dp-exact doubles folded through DECIMAL(28,6)
    losslessly (order-independent), and the HHI is one closed-form
    division per nation rounded once.

    Scale: one corpus-scale aggregate to supplier grain, broadcast
    supplier->nation joins, a nations-sized aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    per_sup = li.groupBy("l_suppkey").agg(
        F.sum(_rev_units()).alias("units")
    )
    # exact supplier revenue in cents: round-half-up in pure integers
    cents = F.expr("(units + 50) div 100")
    enriched = (
        per_sup.join(
            F.broadcast(sup), per_sup.l_suppkey == sup.s_suppkey
        )
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            cents.alias("rev_cents"),
        )
    )
    rev_d = F.col("rev_cents") / F.lit(100.0)
    return (
        enriched.groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum("rev_cents").alias("total_cents"),
            F.sum((rev_d * rev_d).cast("decimal(28,6)"))
            .cast("double")
            .alias("sumsq"),
        )
        .select(
            "nation",
            "n_suppliers",
            pround(F.col("total_cents") / 100.0, 2).alias(
                "total_revenue"
            ),
            pround(
                F.col("sumsq")
                / (
                    (F.col("total_cents") / F.lit(100.0))
                    * (F.col("total_cents") / F.lit(100.0))
                ),
                6,
            ).alias("hhi"),
        )
        .orderBy("nation")
    )


ORACLES["supplier_concentration_hhi"] = f"""
    WITH per_sup AS (
      SELECT l_suppkey, (sum({_SQL_REV_UNITS}))::BIGINT AS units
      FROM lineitem GROUP BY l_suppkey
    ), enriched AS (
      SELECT n_name AS nation, (units + 50) // 100 AS rev_cents
      FROM per_sup
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    )
    SELECT nation,
           count(*)::BIGINT AS n_suppliers,
           {sql_pround("(sum(rev_cents))::DOUBLE / 100.0", 2)}
             AS total_revenue,
           {sql_pround(
               "(sum(((rev_cents/100.0)*(rev_cents/100.0))"
               "::DECIMAL(28,6)))::DOUBLE"
               " / (((sum(rev_cents))::DOUBLE/100.0)"
               "*((sum(rev_cents))::DOUBLE/100.0))", 6
           )} AS hhi
    FROM enriched GROUP BY nation ORDER BY nation
"""


def sales_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain revenue report in ONE pass: GROUPING SETS
    ((year, priority), (year), (priority), ()) over orders, with
    GROUPING flags disambiguating real NULLs from subtotal rows —
    the report a BI layer issues instead of four separate scans.
    Complements ``sales_rollup`` (hierarchical) and ``sales_cube``
    (full lattice) with the arbitrary-sets case.

    Scale: Spark plans one Expand(x4) + single aggregate — the corpus
    is read once; output is |years| x |priorities| bounded."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.year("o_orderdate").alias("order_year"),
        F.col("o_orderpriority").alias("priority"),
        "o_totalprice",
    )
    return (
        base.groupingSets(
            [["order_year", "priority"], ["order_year"], ["priority"], []],
            "order_year",
            "priority",
        )
        .agg(
            F.grouping("order_year").cast("int").alias("g_year"),
            F.grouping("priority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            pround(
                F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast(
                    "double"
                ),
                2,
            ).alias("revenue"),
        )
        .select(
            "order_year",
            "priority",
            "g_year",
            "g_priority",
            "n_orders",
            "revenue",
        )
        .orderBy("g_year", "g_priority", "order_year", "priority")
    )


ORACLES["sales_grouping_sets"] = f"""
    SELECT (year(o_orderdate))::INT AS order_year,
           o_orderpriority AS priority,
           (GROUPING(year(o_orderdate)))::INT AS g_year,
           (GROUPING(o_orderpriority))::INT AS g_priority,
           count(*)::BIGINT AS n_orders,
           {sql_pround(
               "(sum(o_totalprice::DECIMAL(28,6)))::DOUBLE", 2
           )} AS revenue
    FROM orders
    GROUP BY GROUPING SETS
      ((year(o_orderdate), o_orderpriority),
       (year(o_orderdate)), (o_orderpriority), ())
    ORDER BY g_year, g_priority, order_year, priority
"""


def dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style normalized exact dedup audit: documents are normalized
    (lowercase, strip non-[a-z0-9 ], collapse runs of spaces, trim)
    and the corpus is summarized as raw-distinct vs normalized-distinct
    counts with the collapse rate — the near-exact-duplicate mass that
    raw ``dedup_exact`` cannot see (trivial reformatting, case,
    punctuation). Recipe: Raffel et al. 2020 (C4) normalization before
    exact matching.

    Determinism: the regex classes are explicit ASCII sets ('[^a-z0-9
    ]', ' +') — identical under Java regex and RE2 — and both distinct
    counts run over md5 hex digests.

    Scale: normalization is map-side; both exact distincts share one
    Expand(x2) aggregate over 32-byte hashes, output is one row."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return (
        d.select(
            F.md5(F.col("text")).alias("raw_h"),
            F.md5(norm).alias("norm_h"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("raw_h").alias("raw_distinct"),
            F.countDistinct("norm_h").alias("norm_distinct"),
        )
        .select(
            "n_docs",
            "raw_distinct",
            "norm_distinct",
            (F.col("raw_distinct") - F.col("norm_distinct")).alias(
                "collapsed"
            ),
            pround(
                (F.col("raw_distinct") - F.col("norm_distinct"))
                / F.col("raw_distinct").cast("double"),
                6,
            ).alias("collapse_rate"),
        )
    )


ORACLES["dedup_normalized"] = f"""
    WITH h AS (
      SELECT md5(text) AS raw_h,
             md5(trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
               ' +', ' ', 'g'))) AS norm_h
      FROM documents
    )
    SELECT count(*)::BIGINT AS n_docs,
           (count(DISTINCT raw_h))::BIGINT AS raw_distinct,
           (count(DISTINCT norm_h))::BIGINT AS norm_distinct,
           (count(DISTINCT raw_h) - count(DISTINCT norm_h))::BIGINT
             AS collapsed,
           {sql_pround(
               "(count(DISTINCT raw_h) - count(DISTINCT norm_h))::DOUBLE"
               " / (count(DISTINCT raw_h))::DOUBLE", 6
           )} AS collapse_rate
    FROM h
"""


QUERIES["part_revenue_abc"] = part_revenue_abc
QUERIES["basket_part_pairs"] = basket_part_pairs
QUERIES["customer_order_gaps"] = customer_order_gaps
QUERIES["supplier_concentration_hhi"] = supplier_concentration_hhi
QUERIES["sales_grouping_sets"] = sales_grouping_sets
QUERIES["dedup_normalized"] = dedup_normalized


def part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of the part catalog: the parts no
    other part dominates on (bigger size, cheaper price) — the classic
    multi-criteria OLAP query (Borzsony/Kossmann/Stocker, ICDE 2001
    "The Skyline Operator"). Dominance: q dominates p iff
    q.size >= p.size AND q.price <= p.price with at least one strict.

    Plan shape: NOT the naive O(n^2) NOT-EXISTS self-join — two
    RANGE-framed window minima over one size-ordered sort express
    dominance exactly:

      minp_gt = min(price) over sizes STRICTLY greater (RANGE .. 1
      PRECEDING on the size-descending order; integer size makes the
      1-offset exact)
      minp_ge = min(price) over sizes >= current (RANGE .. CURRENT ROW)

    p survives iff NOT (minp_gt <= price)  -- dominated via bigger size
          and NOT (minp_ge <  price)       -- dominated via cheaper tie

    The EXACT form here is the hash-checkable contract and — like every
    unpartitioned-window key in this repo (curriculum/ccnet ntiles,
    ABC ranking) — executes its global frame as ONE sorted task
    (Spark's WindowExec single-partition move; fine for a catalog-
    sized dimension, which `part` is). The corpus-scale swap keeps the
    same algebra without the single task: repartitionByRange on size,
    per-partition running minima, then compose each partition with the
    (partitions-sized, broadcast) minima of all size-greater
    partitions — min is associative, so the result is identical. Never
    the naive O(n²) NOT-EXISTS self-join either way.

    Determinism: exact integer/double comparisons only — no rounding
    anywhere, so the oracle (same two window minima) is bit-exact."""
    part = load_table(spark, sf_dir, "part")
    w_gt = (
        Window.orderBy(F.col("p_size").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_ge = (
        Window.orderBy(F.col("p_size").desc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = part.select(
        "p_partkey",
        "p_size",
        "p_retailprice",
        F.min("p_retailprice").over(w_gt).alias("minp_gt"),
        F.min("p_retailprice").over(w_ge).alias("minp_ge"),
    )
    # NULL-safe: the largest size has no strictly-greater frame
    # (minp_gt NULL); a bare <= would make the whole predicate NULL and
    # silently drop the row
    dominated = (
        F.col("minp_gt").isNotNull()
        & (F.col("minp_gt") <= F.col("p_retailprice"))
    ) | (F.col("minp_ge") < F.col("p_retailprice"))
    return (
        flagged.filter(~dominated)
        .select("p_partkey", "p_size", "p_retailprice")
        .orderBy(F.col("p_size").desc(), "p_partkey")
    )


QUERIES["part_skyline"] = part_skyline

ORACLES["part_skyline"] = """
    WITH flagged AS (
      SELECT p_partkey, p_size, p_retailprice,
             min(p_retailprice) OVER (
               ORDER BY p_size DESC
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS minp_gt,
             min(p_retailprice) OVER (
               ORDER BY p_size DESC
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS minp_ge
      FROM part
    )
    SELECT p_partkey, p_size, p_retailprice
    FROM flagged
    WHERE NOT ((minp_gt IS NOT NULL AND minp_gt <= p_retailprice)
               OR minp_ge < p_retailprice)
    ORDER BY p_size DESC, p_partkey
"""
