"""Extended relational surface: the remaining TPC-H query shapes adapted
to the reduced test-table columns (no partsupp / shipmode / commitdate
columns exist, so those queries keep their plan SHAPE — join topology,
subquery class, aggregation pattern — over the columns available).

Complements operators/tpch.py; same conventions (dims broadcast, money
sums rounded to 2 dp, ratios to 4 dp, aliases mirrored in the oracles).
The reference's relational workload lives in Postgres views
(/root/reference/src/optimization/kpi_views.sql); these prove the rest
of the standard analytic SQL surface on Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def _rev() -> Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: shipping volume between two nations by year (fact join
    + two broadcast dim lookups + symmetric pair filter)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by supplier nation and year; supply cost proxied
    by 0.5 x retail price (no partsupp table)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("ring")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    # Mixed signs make this sum boundary-sensitive to accumulation order;
    # exact decimal accumulation keeps it order-independent cross-engine.
    amount = (
        _rev() - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(24,6)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(F.sum(amount), 2).cast("double").alias("sum_profit")
        )
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional revenue share (promo parts) in one month."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", _rev()).otherwise(0.0)
                )
                / F.sum(_rev()),
                4,
            ).alias("promo_revenue_pct")
        )
    )


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier count per part attribute group
    (lineitem is the part-supplier bridge; excludes one brand)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9") & F.col("p_size").isin(1, 5, 9, 13, 21)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING over a fact aggregate, then enrich + top-N."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunction of conjunctive brand/size/quantity bands
    (Catalyst pushes the common join key; the OR stays a residual)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#7")
            & F.col("p_size").between(10, 25)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(25, 50)
            & F.col("l_quantity").between(20, 35)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


def single_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (adapted: no commit/receipt dates): suppliers ranked by
    how many finalized orders they fulfilled alone (EXISTS self +
    NOT EXISTS other supplier, expressed as a per-order distinct-count)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    solo = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_semi")
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.min("l_suppkey").alias("s_key"),
        )
        .filter(F.col("n_supp") == 1)
    )
    return (
        solo.join(F.broadcast(supp), solo.s_key == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar subquery threshold + NOT EXISTS anti-join —
    well-funded customers with no orders, profiled per nation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    avg_pos = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("thr"))
    )
    return (
        cust.crossJoin(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


QUERIES = {
    "q7_nation_volume": q7_nation_volume,
    "q9_product_profit": q9_product_profit,
    "q14_promo_revenue": q14_promo_revenue,
    "q16_supplier_count": q16_supplier_count,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "single_supplier_orders": single_supplier_orders,
    "idle_rich_customers": idle_rich_customers,
}

ORACLES = {
    "q7_nation_volume": """
        SELECT supp_nation, cust_nation, l_year,
               round(sum(volume), 2) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 EXTRACT(YEAR FROM l_shipdate)::int AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier, lineitem, orders, customer, nation n1, nation n2
          WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
            AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
            AND c_nationkey = n2.n_nationkey
            AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "q9_product_profit": """
        SELECT nation, o_year,
               round(sum(amount), 2)::DOUBLE AS sum_profit
        FROM (
          SELECT n_name AS nation,
                 EXTRACT(YEAR FROM o_orderdate)::int AS o_year,
                 (l_extendedprice * (1 - l_discount)
                   - 0.5 * p_retailprice * l_quantity)::DECIMAL(24,6) AS amount
          FROM part, supplier, lineitem, orders, nation
          WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
            AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
            AND p_name LIKE '%ring%'
        ) profit
        GROUP BY nation, o_year
    """,
    "q14_promo_revenue": """
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                   THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                   / sum(l_extendedprice * (1 - l_discount)), 4)
               AS promo_revenue_pct
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    "q16_supplier_count": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND p_brand <> 'Brand#9'
          AND p_size IN (1, 5, 9, 13, 21)
        GROUP BY p_brand, p_type, p_size
    """,
    "q18_large_orders": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               round(o_totalprice, 2) AS o_totalprice, total_qty
        FROM (
          SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING round(sum(l_quantity), 2) > 150
        ) big
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    "q19_disjunctive_revenue": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 1 AND 15)
            OR (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 25
                AND l_quantity BETWEEN 10 AND 25)
            OR (p_brand = 'Brand#20' AND p_size BETWEEN 25 AND 50
                AND l_quantity BETWEEN 20 AND 35))
    """,
    "single_supplier_orders": """
        SELECT s_name, count(*) AS numwait
        FROM (
          SELECT l_orderkey,
                 count(DISTINCT l_suppkey) AS n_supp,
                 min(l_suppkey) AS s_key
          FROM lineitem
          WHERE EXISTS (SELECT 1 FROM orders
                        WHERE o_orderkey = l_orderkey
                          AND o_orderstatus = 'F')
          GROUP BY l_orderkey
          HAVING count(DISTINCT l_suppkey) = 1
        ) solo
        JOIN supplier ON s_suppkey = s_key
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
    """,
    "idle_rich_customers": """
        SELECT n_name,
               count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY n_name
    """,
}
