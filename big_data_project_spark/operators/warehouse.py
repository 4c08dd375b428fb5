"""Warehouse-operations surface: table profiling, customer-value
deciles, fulfillment-lag percentiles, order-mix shares, and tenure
cohorts over the TPC-H-shaped tables.

Parity: the reference ships its relational tables to analysts who run
exactly this family before anything else — column profiles (the ANALYZE
step its Postgres `initdb/init-postgis.sql` tables get implicitly),
priority/month mix summaries next to the q4-style counts
(/root/reference/src/optimization/kpi_views.sql:19-151 reads the same
rollup grain), and customer-value segmentation feeding the suggestion
engine's demand priors. Re-expressed Spark-first as declarative
DataFrame plans; every oracle is a line-for-line ANSI twin.

Scale design:
- ``table_profile_lineitem`` runs one pruned single-column scan per
  profiled column (parquet column pruning means total I/O equals ONE
  full-table read, spread over 11 branches) instead of one wide pass
  with 11 exact count-distincts, which would Expand the corpus x11
  through a single shuffle. Each branch is an independent 2-phase
  aggregate; the union output is columns-sized.
- Percentiles are EXACT and rank-based (row_number over an in-group
  sort + conditional aggregate) rather than interpolating: interpolated
  quantiles mix engine-specific float expression shapes, while ranks
  are integers and the selected values are raw column doubles —
  bit-identical on both engines. The sort is the same shuffle a
  percentile aggregate would need anyway.
- Every other key is one corpus-scale aggregate to entity grain
  followed by entity-sized windows/aggregates (deciles: |customers|;
  mix shares: months x priorities; tenure: |customers| then buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..caching import persisted as _persisted
from ..catalog import load_table
from ..functions.portable import (
    davg,
    dsum,
    dsum_exact,
    pround,
    sql_davg,
    sql_dsum,
    sql_pround,
)

QUERIES: dict = {}
ORACLES: dict = {}

LTV_DECILES = 10
TENURE_BUCKET_DAYS = 90  # one "quarter" per tenure bucket

# (column, render) pairs for the lineitem profile. Renders are chosen
# for bit-identical cross-engine strings (probed): integers/varchars
# cast directly, doubles through DECIMAL(28,6) (fixed 6-dp plain text
# on both engines — double->varchar would go scientific above 1e7 on
# the JVM), timestamps through DATE.
_PROFILE_COLS = [
    ("l_orderkey", "int"),
    ("l_partkey", "int"),
    ("l_suppkey", "int"),
    ("l_linenumber", "int"),
    ("l_quantity", "double"),
    ("l_extendedprice", "double"),
    ("l_discount", "double"),
    ("l_tax", "double"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
]


def _render(c: F.Column, kind: str) -> F.Column:
    if kind == "double":
        return c.cast("decimal(28,6)").cast("string")
    if kind == "ts":
        return F.to_date(c).cast("string")
    return c.cast("string")


def table_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of ``lineitem``: row count, null count, exact
    distinct count, and min/max rendered as engine-portable strings —
    the ANALYZE-style pass an engine runs before planning and an
    analyst runs before trusting a table.

    Scale: 11 independent single-column branches; parquet column
    pruning makes the union's total I/O one full-table read, and each
    branch is a 2-phase (partial + final) aggregate. No Expand, no
    corpus-wide shuffle of all columns at once."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = []
    for name, kind in _PROFILE_COLS:
        c = F.col(name)
        parts.append(
            li.select(c)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_null"),
                F.countDistinct(c).alias("n_distinct"),
                _render(F.min(c), kind).alias("min_repr"),
                _render(F.max(c), kind).alias("max_repr"),
            )
            .select(
                F.lit(name).alias("col_name"),
                "n_rows",
                "n_null",
                "n_distinct",
                "min_repr",
                "max_repr",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("col_name")


QUERIES["table_profile_lineitem"] = table_profile_lineitem


def _sql_render(expr: str, kind: str) -> str:
    if kind == "double":
        return f"(({expr})::DECIMAL(28,6))::VARCHAR"
    if kind == "ts":
        return f"(({expr})::DATE)::VARCHAR"
    return f"({expr})::VARCHAR"


ORACLES["table_profile_lineitem"] = "\nUNION ALL\n".join(
    f"""
    SELECT '{name}' AS col_name,
           count(*) AS n_rows,
           count(*) - count({name}) AS n_null,
           count(DISTINCT {name}) AS n_distinct,
           {_sql_render(f"min({name})", kind)} AS min_repr,
           {_sql_render(f"max({name})", kind)} AS max_repr
    FROM lineitem
    """
    for name, kind in _PROFILE_COLS
) + "\nORDER BY col_name"


def customer_ltv_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-value deciles: total spend per customer,
    ntile(10) over a FULLY ordered ranking (spend + custkey tie-break,
    engine-deterministic), then per-decile count / total / average /
    spend bounds — the cut a marketing or capacity planner reads first.

    Scale: one orders-scale aggregate to customer grain, one
    customers-sized ntile window, 10-row output."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("c")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
        .cast("double")
        .alias("rev_raw"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    base = per_cust.withColumn("rev", pround("rev_raw", 2))
    dec = F.ntile(LTV_DECILES).over(Window.orderBy(F.col("rev"), F.col("c")))
    return (
        base.select("c", "rev", "n_orders", dec.alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("rev", 2).alias("total_rev"),
            davg("rev", 2).alias("avg_rev"),
            F.min("rev").alias("min_rev"),
            F.max("rev").alias("max_rev"),
            davg("n_orders", 4).alias("avg_orders"),
        )
        .orderBy("decile")
    )


QUERIES["customer_ltv_deciles"] = customer_ltv_deciles

ORACLES["customer_ltv_deciles"] = f"""
    WITH per_cust AS (
      SELECT o_custkey AS c,
             (sum((o_totalprice)::DECIMAL(28,6)))::DOUBLE AS rev_raw,
             count(*) AS n_orders
      FROM orders GROUP BY o_custkey
    ),
    base AS (
      SELECT c, n_orders, {sql_pround('rev_raw', 2)} AS rev FROM per_cust
    ),
    scored AS (
      SELECT rev, n_orders,
             ntile({LTV_DECILES}) OVER (ORDER BY rev, c) AS decile
      FROM base
    )
    SELECT decile, count(*) AS n_customers,
           {sql_dsum('rev', 2)} AS total_rev,
           {sql_davg('rev', 2)} AS avg_rev,
           min(rev) AS min_rev,
           max(rev) AS max_rev,
           {sql_davg('n_orders', 4)} AS avg_orders
    FROM scored GROUP BY decile ORDER BY decile
"""

FULFILL_PCTS = [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]


def order_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fulfillment-lag percentiles per order priority: days from
    order date to the LAST lineitem ship date (order fully shipped),
    p50/p90/p99 picked by integer rank (value at ``ceil(p*n)``) — the
    SLA distribution behind order_priority_sla's pass/fail counts.

    Scale: one lineitem max-aggregate to order grain, an equi-join back
    to orders, one in-group sort per priority (the same shuffle an
    exact percentile aggregate needs), priorities-sized output. Ranks
    are integers and outputs raw day counts — no interpolation float."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    last_ship = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("last_ship")
    )
    j = orders.join(last_ship, orders.o_orderkey == F.col("l_orderkey")).select(
        "o_orderpriority",
        "o_orderkey",
        F.datediff(F.col("last_ship"), F.col("o_orderdate")).alias("lag_days"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("lag_days", "o_orderkey")
    ranked = j.select(
        "o_orderpriority",
        "lag_days",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_orderpriority"))
        .alias("n"),
    )
    aggs = [F.max("n").alias("n_orders")]
    for label, p in FULFILL_PCTS:
        # ceil(p * n) in DOUBLE on both engines (the oracle casts its
        # literal: DuckDB would otherwise fold p as exact DECIMAL and
        # disagree with the JVM double product at e.g. 0.9*10)
        target = F.greatest(F.ceil(F.lit(p) * F.col("n")), F.lit(1))
        aggs.append(
            F.max(F.when(F.col("rn") == target, F.col("lag_days"))).alias(
                label
            )
        )
    return (
        ranked.groupBy("o_orderpriority").agg(*aggs).orderBy("o_orderpriority")
    )


QUERIES["order_fulfillment_lag"] = order_fulfillment_lag

_PCT_SELECTS = ",\n           ".join(
    f"max(CASE WHEN rn = greatest(ceil(CAST({p} AS DOUBLE) * n), 1) "
    f"THEN lag_days END) AS {label}"
    for label, p in FULFILL_PCTS
)
ORACLES["order_fulfillment_lag"] = f"""
    WITH lags AS (
      SELECT o_orderpriority, o_orderkey,
             datediff('day', o_orderdate, last_ship) AS lag_days
      FROM orders
      JOIN (SELECT l_orderkey, max(l_shipdate) AS last_ship
            FROM lineitem GROUP BY l_orderkey) ls
        ON o_orderkey = ls.l_orderkey
    ),
    ranked AS (
      SELECT o_orderpriority, lag_days,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY lag_days, o_orderkey) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM lags
    )
    SELECT o_orderpriority,
           max(n) AS n_orders,
           {_PCT_SELECTS}
    FROM ranked GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def orders_monthly_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority mix by month: count per (month, priority) and its
    share of the month's total — the drift view next to q4's global
    priority counts.

    Scale: one orders-scale aggregate, then a months-sized window over
    the months x priorities rollup. Shares are integer-ratio doubles
    (identical division on both engines), floor-rounded to 6 dp."""
    orders = load_table(spark, sf_dir, "orders")
    month = F.to_date(F.date_trunc("month", "o_orderdate")).alias(
        "order_month"
    )
    counts = orders.groupBy(month, "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    total = F.sum("n_orders").over(Window.partitionBy("order_month"))
    return counts.select(
        "order_month",
        "o_orderpriority",
        "n_orders",
        pround(F.col("n_orders") / total, 6).alias("month_share"),
    ).orderBy("order_month", "o_orderpriority")


QUERIES["orders_monthly_share"] = orders_monthly_share

ORACLES["orders_monthly_share"] = f"""
    WITH counts AS (
      SELECT date_trunc('month', o_orderdate)::DATE AS order_month,
             o_orderpriority, count(*) AS n_orders
      FROM orders GROUP BY 1, 2
    )
    SELECT order_month, o_orderpriority, n_orders,
           {sql_pround(
               'n_orders::DOUBLE / (sum(n_orders) '
               'OVER (PARTITION BY order_month))::DOUBLE', 6)} AS month_share
    FROM counts ORDER BY order_month, o_orderpriority
"""


def customer_tenure_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer tenure cohorts: days between first and last order,
    bucketed into {TENURE_BUCKET_DAYS}-day quarters, with per-bucket
    customer count / average order count / tenure bounds — the
    engagement-longevity histogram.

    Scale: one orders-scale min/max aggregate to customer grain, then a
    buckets-sized aggregate. Buckets are integer floor-division — no
    float edges."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("c")).agg(
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    tenure = F.datediff("last_order", "first_order")
    base = per_cust.select(
        "c",
        "n_orders",
        tenure.alias("tenure_days"),
        F.floor(tenure / TENURE_BUCKET_DAYS).alias("tenure_bucket"),
    )
    return (
        base.groupBy("tenure_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            davg("n_orders", 4).alias("avg_orders"),
            F.min("tenure_days").alias("min_tenure_days"),
            F.max("tenure_days").alias("max_tenure_days"),
        )
        .orderBy("tenure_bucket")
    )


QUERIES["customer_tenure_histogram"] = customer_tenure_histogram

ORACLES["customer_tenure_histogram"] = f"""
    WITH per_cust AS (
      SELECT o_custkey AS c,
             datediff('day', min(o_orderdate), max(o_orderdate))
               AS tenure_days,
             count(*) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT floor(tenure_days::DOUBLE / {TENURE_BUCKET_DAYS})::BIGINT
             AS tenure_bucket,
           count(*) AS n_customers,
           {sql_davg('n_orders', 4)} AS avg_orders,
           min(tenure_days) AS min_tenure_days,
           max(tenure_days) AS max_tenure_days
    FROM per_cust GROUP BY 1 ORDER BY tenure_bucket
"""


def open_orders_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly open-order backlog: for every order month between the
    order date and its LAST lineitem ship date (inclusive, month
    grain), the order counts as in-flight; the report gives per-month
    backlog plus opened/closed flows — the interval-aggregation class
    (a point-in-time count over validity ranges) that a naive
    month-equality groupBy cannot express.

    Re-expression (round-9 optimization, guide §2.3 shuffle fewer
    bytes): the backlog is computed from the opened/closed MONTHLY
    FLOWS and a running difference, not by exploding each order into
    its covered month spine. Each order contributes exactly TWO
    month-grain aggregate rows (opened at m_start, closed at
    greatest(m_start, m_end)) instead of one row per covered month, so
    the fan-out (×order lifetime, previously the biggest relation in
    the plan) is gone; n_open(m) = cumOpened(m) − cumClosed(m−1) over
    a months-sized spine (built from one 1-row min/max aggregate), and
    a month is covered by ≥1 order iff n_open(m) > 0, so filtering the
    spine on that predicate yields exactly the exploded form's month
    set. The cumulative window is a single partition but months-sized
    (≤ a few thousand rows at any horizon), never the corpus. Orders
    with no lineitems (none in the generated data) would drop out of
    the inner join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    last_ship = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("last_ship")
    )
    spans = _persisted(
        o.join(last_ship, o.o_orderkey == F.col("l_orderkey")).select(
            F.to_date(F.date_trunc("month", "o_orderdate")).alias("m_start"),
            F.greatest(
                F.to_date(F.date_trunc("month", "o_orderdate")),
                F.to_date(F.date_trunc("month", "last_ship")),
            ).alias("m_end"),
        )
    )
    opened = spans.groupBy(F.col("m_start").alias("month")).agg(
        F.count(F.lit(1)).alias("n_opened")
    )
    closed = spans.groupBy(F.col("m_end").alias("month")).agg(
        F.count(F.lit(1)).alias("n_closed")
    )
    spine = spans.agg(
        F.min("m_start").alias("lo"), F.max("m_end").alias("hi")
    ).select(
        F.explode(
            F.expr("sequence(lo, hi, interval 1 month)")
        ).alias("month")
    )
    wc = (
        Window.orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(opened, "month", "left")
        .join(closed, "month", "left")
        .select(
            "month",
            F.coalesce("n_opened", F.lit(0).cast("long")).alias("n_opened"),
            F.coalesce("n_closed", F.lit(0).cast("long")).alias("n_closed"),
        )
        .select(
            "month",
            (
                F.sum("n_opened").over(wc)
                - F.sum("n_closed").over(wc)
                + F.col("n_closed")
            ).alias("n_open"),
            "n_opened",
            "n_closed",
        )
        .filter(F.col("n_open") > 0)
        .select("month", "n_open", "n_opened", "n_closed")
        .orderBy("month")
    )


QUERIES["open_orders_monthly"] = open_orders_monthly

ORACLES["open_orders_monthly"] = """
    WITH spans AS (
      SELECT (date_trunc('month', o_orderdate))::DATE AS m_start,
             (date_trunc('month', max(l_shipdate)))::DATE AS m_end
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderkey, o_orderdate
    ),
    covered AS (
      SELECT m_start, m_end,
             (unnest(generate_series(
               m_start, greatest(m_start, m_end),
               INTERVAL 1 MONTH)))::DATE AS month
      FROM spans
    )
    SELECT month,
           count(*)::BIGINT AS n_open,
           (sum(CASE WHEN month = m_start THEN 1 ELSE 0 END))::BIGINT
             AS n_opened,
           (sum(CASE WHEN month = greatest(m_start, m_end) THEN 1
                     ELSE 0 END))::BIGINT AS n_closed
    FROM covered GROUP BY month ORDER BY month
"""


def cohort_ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: customers grouped by
    first-order month, each cohort's revenue tracked by age (months
    since cohort start), with active-customer counts and the running
    cumulative revenue per cohort — the retention-economics table
    (cohort x age triangle) every subscription/commerce review reads.

    Determinism: month age is exact integer arithmetic
    (year*12 + month differences — no date subtraction semantics to
    align), revenue folds through DECIMAL(28,6), and the cumulative
    sum re-folds the per-cell doubles through DECIMAL(28,6) over the
    (cohorts x ages)-sized triangle.

    Scale: one orders-scale min-aggregate to customer grain, one
    customer-grain equi-join back to orders, a (cohorts x ages)
    aggregate, triangle-sized windows."""
    o = load_table(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.min(F.to_date(F.date_trunc("month", "o_orderdate"))).alias(
            "cohort_month"
        )
    )
    mnum = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    cells = (
        o.join(first, "o_custkey")
        .select(
            "o_custkey",
            "cohort_month",
            (
                mnum(F.col("o_orderdate")) - mnum(F.col("cohort_month"))
            ).alias("age_months"),
            "o_totalprice",
        )
        .groupBy("cohort_month", "age_months")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("rev_raw"),
        )
    )
    w_cum = (
        Window.partitionBy("cohort_month")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cells.select(
        "cohort_month",
        "age_months",
        "n_customers",
        pround(F.col("rev_raw"), 2).alias("revenue"),
        pround(
            F.sum(F.col("rev_raw").cast("decimal(28,6)"))
            .over(w_cum)
            .cast("double"),
            2,
        ).alias("cum_revenue"),
    ).orderBy("cohort_month", "age_months")


QUERIES["cohort_ltv_triangle"] = cohort_ltv_triangle

ORACLES["cohort_ltv_triangle"] = f"""
    WITH first AS (
      SELECT o_custkey,
             min((date_trunc('month', o_orderdate))::DATE)
               AS cohort_month
      FROM orders GROUP BY o_custkey
    ),
    cells AS (
      SELECT cohort_month,
             (year(o_orderdate)*12 + month(o_orderdate))
               - (year(cohort_month)*12 + month(cohort_month))
               AS age_months,
             count(DISTINCT o.o_custkey)::BIGINT AS n_customers,
             (sum((o_totalprice)::DECIMAL(28,6)))::DOUBLE AS rev_raw
      FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
      GROUP BY cohort_month, 2
    )
    SELECT cohort_month, age_months, n_customers,
           {sql_pround("rev_raw", 2)} AS revenue,
           {sql_pround(
               "(sum((rev_raw)::DECIMAL(28,6)) OVER ("
               "PARTITION BY cohort_month ORDER BY age_months "
               "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"
               "::DOUBLE", 2
           )} AS cum_revenue
    FROM cells ORDER BY cohort_month, age_months
"""


def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth: per order year, total order value
    plus the previous year's total and the YoY percentage change — the
    first slide of any commerce review, and the relational twin of the
    trend family's per-route deltas (reference kpi_views.sql reads the
    same rollup grain for its peak summaries).

    Determinism: yearly totals fold through DECIMAL(28,6) (order-
    independent), the YoY ratio divides the two UNROUNDED folds and
    rounds once; the first observed year reports NULLs rather than a
    fake 0% baseline.

    Scale: ONE corpus-scale aggregate to year grain (no join at all —
    order value lives on the orders row), then a years-sized
    range-window lookup of year-1 OVER THE AGGREGATED FRAME — not a
    self-join of the unpersisted aggregate, which would execute the
    corpus scan twice. rangeBetween(-1, -1) reads exactly the year-1
    row when it exists and NULL across gap years (lag() would wrongly
    bridge a missing year); at 100 TB of orders the only corpus-scale
    work is the map-side partial sum, and it runs once."""
    o = load_table(spark, sf_dir, "orders")
    yearly = o.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum_exact("o_totalprice").alias("rev_raw"),
    )
    w_prev = Window.orderBy("order_year").rangeBetween(-1, -1)
    return (
        yearly.withColumn("prev_raw", F.max("rev_raw").over(w_prev))
        .select(
            "order_year",
            "n_orders",
            pround(F.col("rev_raw"), 2).alias("revenue"),
            pround(F.col("prev_raw"), 2).alias("prev_revenue"),
            pround(
                (F.col("rev_raw") - F.col("prev_raw"))
                / F.col("prev_raw")
                * 100.0,
                4,
            ).alias("yoy_pct"),
        )
        .orderBy("order_year")
    )


QUERIES["orders_yoy_growth"] = orders_yoy_growth

ORACLES["orders_yoy_growth"] = f"""
    WITH yearly AS (
      SELECT year(o_orderdate) AS order_year,
             count(*) AS n_orders,
             (sum((o_totalprice)::DECIMAL(28,6)))::DOUBLE AS rev_raw
      FROM orders GROUP BY 1
    )
    SELECT y.order_year, y.n_orders,
           {sql_pround('y.rev_raw', 2)} AS revenue,
           {sql_pround('p.rev_raw', 2)} AS prev_revenue,
           {sql_pround(
               '(y.rev_raw - p.rev_raw) / p.rev_raw * 100.0', 4
           )} AS yoy_pct
    FROM yearly y
    LEFT JOIN yearly p ON p.order_year = y.order_year - 1
    ORDER BY y.order_year
"""


def priority_returns_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence audit: are line-item returns independent
    of order priority? Per (priority, returnflag) cell: observed count,
    expected count under independence (row_total x col_total / n), and
    the cell's chi-square contribution, plus the table-wide statistic
    and degrees of freedom stamped on every row — the categorical
    association test a warehouse runs before trusting a segmentation.

    Scale: one fact-side join (orders dim broadcast by Catalyst's
    size estimate), ONE corpus-scale aggregate to the contingency
    table (|priorities| x |flags| rows); every margin and the statistic
    derive from that tiny relation via windows.

    Determinism: observed counts are exact integers, expected is a
    pround(6) of exact integer arithmetic, contributions re-quantize at
    6dp and the statistic is a decimal fold of those quantized cells."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    cells = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("l_returnflag").alias("returnflag"),
        )
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    w_all = Window.partitionBy()
    w_row = Window.partitionBy("priority")
    w_col = Window.partitionBy("returnflag")
    expected = pround(
        F.sum("observed").over(w_row).cast("double")
        * F.sum("observed").over(w_col)
        / F.sum("observed").over(w_all),
        6,
    )
    contrib = pround(
        (F.col("observed") - F.col("expected"))
        * (F.col("observed") - F.col("expected"))
        / F.col("expected"),
        6,
    )
    # Spark forbids DISTINCT window aggregates, but collect_set IS a
    # window function — dof derives from the tiny contingency relation
    # itself (a separate .agg() branch re-executed the fact-scale
    # scan+join: Catalyst rewrites count_distinct into an Expand plan
    # whose exchange cannot be reused)
    dof = (
        (F.size(F.collect_set("priority").over(w_all)) - 1)
        * (F.size(F.collect_set("returnflag").over(w_all)) - 1)
    ).cast("int")
    return (
        cells.withColumn("dof", dof)
        .withColumn("expected", expected)
        .withColumn("contrib", contrib)
        .withColumn(
            "chisq_total",
            pround(
                F.sum(F.col("contrib").cast("decimal(28,6)"))
                .over(w_all)
                .cast("double"),
                4,
            ),
        )
        .select(
            "priority",
            "returnflag",
            "observed",
            "expected",
            "contrib",
            "chisq_total",
            "dof",
        )
        .orderBy("priority", "returnflag")
    )


QUERIES["priority_returns_chisq"] = priority_returns_chisq

ORACLES["priority_returns_chisq"] = f"""
    WITH cells AS (
      SELECT o_orderpriority AS priority, l_returnflag AS returnflag,
             count(*) AS observed
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ),
    ex AS (
      SELECT *,
             {sql_pround(
                 "(sum(observed) OVER (PARTITION BY priority))::DOUBLE"
                 " * sum(observed) OVER (PARTITION BY returnflag)"
                 " / sum(observed) OVER ()", 6)} AS expected,
             ((count(DISTINCT priority) OVER ()) - 1)
               * ((count(DISTINCT returnflag) OVER ()) - 1) AS dof_x
      FROM cells
    ),
    ct AS (
      SELECT *,
             {sql_pround(
                 "(observed - expected) * (observed - expected)"
                 " / expected", 6)} AS contrib
      FROM ex
    )
    SELECT priority, returnflag, observed, expected, contrib,
           {sql_pround(
               "(sum((contrib)::DECIMAL(28,6)) OVER ())::DOUBLE", 4
           )} AS chisq_total,
           dof_x::INT AS dof
    FROM ct
    ORDER BY priority, returnflag
"""


BENFORD_DIGITS = tuple(range(1, 10))

# 6dp-floor-quantized Benford expectations, shared by the Spark plan,
# the DuckDB oracle, and the tests — ONE place to change the precision.
import math as _math  # noqa: E402

BENFORD_SHARES = {
    d: _math.floor(_math.log10(1.0 + 1.0 / d) * 1e6 + 0.5) / 1e6
    for d in BENFORD_DIGITS
}


def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: the observed first-digit
    distribution of o_totalprice vs the Benford expectation
    log10(1 + 1/d), with per-digit chi-square contributions — the
    classic anomaly screen over financial columns (synthetic/uniform
    amounts FAIL it loudly, which is itself the informative finding on
    this corpus).

    Scale: first digit is a map-side string op; ONE aggregate to 9
    rows; everything downstream is constant-sized.

    Determinism: expected shares are pround(6) constants folded into
    the plan on both engines; observed shares and contributions are
    6dp prounds of exact integer counts."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.regexp_replace(
            F.format_number(F.col("o_totalprice"), 6), "[^1-9]", ""
        ),
        1,
        1,
    ).cast("int")
    counts = (
        orders.select(digit.alias("digit"))
        .filter(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_all = Window.partitionBy()
    exp_share = F.create_map(
        *[
            x
            for d in BENFORD_DIGITS
            for x in (F.lit(d), F.lit(BENFORD_SHARES[d]))
        ]
    )[F.col("digit")]
    total = F.sum("n").over(w_all)
    obs_share = pround(F.col("n") / total, 6)
    contrib = pround(
        (obs_share - F.col("exp_share"))
        * (obs_share - F.col("exp_share"))
        / F.col("exp_share")
        * total,
        4,
    )
    return (
        counts.withColumn("exp_share", exp_share)
        .withColumn("obs_share", obs_share)
        .withColumn("contrib", contrib)
        .select("digit", "n", "obs_share", "exp_share", "contrib")
        .orderBy("digit")
    )


QUERIES["benford_price_audit"] = benford_price_audit


def _benford_case() -> str:
    import math as _math

    whens = " ".join(
        f"WHEN {d} THEN "
        f"{_math.floor(_math.log10(1.0 + 1.0 / d) * 1e6 + 0.5) / 1e6}"
        for d in BENFORD_DIGITS
    )
    # ::DOUBLE: DuckDB types the literal CASE as DECIMAL(7,6)
    return f"(CASE digit {whens} END)::DOUBLE"


ORACLES["benford_price_audit"] = f"""
    WITH counts AS (
      SELECT CAST(substr(regexp_replace(
               format('{{:.6f}}', o_totalprice), '[^1-9]', '', 'g'
             ), 1, 1) AS INT) AS digit,
             count(*) AS n
      FROM orders
      GROUP BY 1
      HAVING digit IS NOT NULL
    ),
    shares AS (
      SELECT digit, n,
             {sql_pround("n::DOUBLE / sum(n) OVER ()", 6)} AS obs_share,
             {_benford_case()} AS exp_share,
             CAST(sum(n) OVER () AS BIGINT) AS total
      FROM counts
    )
    SELECT digit, n, obs_share, exp_share,
           {sql_pround(
               "(obs_share - exp_share) * (obs_share - exp_share)"
               " / exp_share * total", 4)} AS contrib
    FROM shares
    ORDER BY digit
"""
