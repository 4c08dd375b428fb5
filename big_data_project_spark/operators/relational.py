"""Remaining relational surface: CUBE, pivot, set operations, full
outer join — the SQL shapes not already covered by tpch.py/tpch_ext.py,
each as a Catalyst plan with a line-for-line oracle.

The reference's SQL stays within joins/windows/DISTINCT ON
(kpi_views.sql); these complete the standard analytic grammar a user
would expect from a drop-in engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

PIVOT_HOURS = [7, 8, 9, 16, 17, 18]  # peak hours as pivot columns


def sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping combinations
    with grouping_id to disambiguate NULL-as-ALL from data NULLs."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.grouping_id().alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "cnt",
            "sum_qty",
            "gid",
        )
    )


def route_hour_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: event counts per route with one column per peak hour.
    Catalyst rewrites pivot to a single conditional aggregate — one
    shuffle regardless of pivot-column count."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    return (
        ev.withColumn("hh", F.hour("ts"))
        .filter(F.col("hh").isin(PIVOT_HOURS))
        .groupBy(F.col("event_type").alias("route_id"))
        .pivot("hh", PIVOT_HOURS)
        .agg(F.count(F.lit(1)))
        .select(
            "route_id",
            *[F.coalesce(str(h), F.lit(0)).alias(f"h{h}") for h in PIVOT_HOURS],
        )
    )


def weekday_weekend_routes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: routes active on weekdays INTERSECT weekends,
    plus the weekday-only EXCEPT set, as one labeled union."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    dow = F.dayofweek("ts")  # 1=Sunday, 7=Saturday
    weekday = (
        ev.filter(~dow.isin(1, 7)).select("event_type").distinct()
    )
    weekend = ev.filter(dow.isin(1, 7)).select("event_type").distinct()
    both = weekday.intersect(weekend).select(
        F.col("event_type").alias("route_id"), F.lit("both").alias("coverage")
    )
    wd_only = weekday.exceptAll(weekend).select(
        F.col("event_type").alias("route_id"),
        F.lit("weekday_only").alias("coverage"),
    )
    return both.unionByName(wd_only)


def demand_delay_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two hourly rollups — keeps route-hours seen by
    either side, with presence flags (the shape reconciliation jobs
    need; reference's views only left-join)."""
    from .hourly import delay_hourly
    from .kpi import _demand_cached

    d = _demand_cached(spark, sf_dir)
    dl = delay_hourly(spark, sf_dir).select(
        "route_id", "hour_ts", "trip_update_events"
    )
    return (
        d.join(dl, ["route_id", "hour_ts"], "full_outer")
        .select(
            "route_id",
            "hour_ts",
            F.coalesce("passengers", F.lit(0.0)).alias("passengers"),
            F.coalesce("trip_update_events", F.lit(0)).alias(
                "trip_update_events"
            ),
            (
                F.col("passengers").isNotNull().cast("int")
                + F.lit(2) * F.col("trip_update_events").isNotNull().cast("int")
            ).alias("presence"),
        )
    )


def demand_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: passengers within the trailing 2-hour
    event-time interval per route (unlike a ROWS frame, gaps in the
    hourly series shrink the window — interval semantics, not
    row-count semantics)."""
    from ..functions.portable import pround
    from .kpi import _demand_cached

    d = _demand_cached(spark, sf_dir)
    w = (
        Window.partitionBy("route_id")
        .orderBy(F.unix_timestamp("hour_ts"))
        .rangeBetween(-7200, 0)
    )
    return d.select(
        "route_id",
        "hour_ts",
        "passengers",
        pround(
            F.sum(F.col("passengers").cast("decimal(28,6)"))
            .over(w)
            .cast("double"),
            2,
        ).alias("trailing_2h_passengers"),
        F.count(F.lit(1)).over(w).alias("hours_in_window"),
    )


def customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile window: quartile summary of customer balances per nation."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    q = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("quartile", F.ntile(4).over(w))
    )
    return q.groupBy("n_name", "quartile").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


QUERIES = {
    "demand_range_window": demand_range_window,
    "customer_balance_quartiles": customer_balance_quartiles,
    "sales_cube": sales_cube,
    "route_hour_pivot": route_hour_pivot,
    "weekday_weekend_routes": weekday_weekend_routes,
    "demand_delay_full_outer": demand_delay_full_outer,
}

_SQL_PIVOT_COLS = ",\n               ".join(
    f"count(*) FILTER (WHERE hour(ts) = {h}) AS h{h}" for h in PIVOT_HOURS
)

ORACLES = {
    "demand_range_window": None,  # filled below (shares hourly CTEs)
    "customer_balance_quartiles": """
        SELECT n_name, quartile,
               count(*) AS n_cust,
               round(min(c_acctbal), 2) AS min_bal,
               round(max(c_acctbal), 2) AS max_bal
        FROM (
          SELECT n_name, c_acctbal,
                 ntile(4) OVER (PARTITION BY n_name
                                ORDER BY c_acctbal ASC, c_custkey ASC)
                   AS quartile
          FROM customer JOIN nation ON c_nationkey = n_nationkey
        ) q
        GROUP BY n_name, quartile
    """,
    "sales_cube": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS cnt,
               round(sum(l_quantity), 2) AS sum_qty,
               grouping(l_returnflag, l_linestatus) AS gid
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    "route_hour_pivot": f"""
        SELECT event_type AS route_id,
               {_SQL_PIVOT_COLS}
        FROM events
        WHERE event_type IS NOT NULL
          AND hour(ts) IN ({", ".join(str(h) for h in PIVOT_HOURS)})
        GROUP BY event_type
    """,
    "demand_delay_full_outer": None,  # filled below (shares hourly CTEs)
    "weekday_weekend_routes": """
        WITH weekday AS (
          SELECT DISTINCT event_type FROM events
          WHERE event_type IS NOT NULL AND dayofweek(ts) NOT IN (0, 6)
        ),
        weekend AS (
          SELECT DISTINCT event_type FROM events
          WHERE event_type IS NOT NULL AND dayofweek(ts) IN (0, 6)
        )
        SELECT event_type AS route_id, 'both' AS coverage
        FROM (SELECT * FROM weekday INTERSECT SELECT * FROM weekend) b
        UNION ALL
        SELECT event_type AS route_id, 'weekday_only' AS coverage
        FROM (SELECT * FROM weekday EXCEPT SELECT * FROM weekend) w
    """,
}

from .hourly import SQL_DELAY, SQL_DEMAND  # noqa: E402

ORACLES["demand_range_window"] = f"""
    WITH d AS ({SQL_DEMAND})
    SELECT route_id, hour_ts, passengers,
           floor(((sum((passengers)::DECIMAL(28,6)) OVER w)::DOUBLE)
                 * 100.0 + 0.5) / 100.0 AS trailing_2h_passengers,
           count(*) OVER w AS hours_in_window
    FROM d
    WINDOW w AS (PARTITION BY route_id ORDER BY hour_ts
                 RANGE BETWEEN INTERVAL 2 HOURS PRECEDING
                      AND CURRENT ROW)
"""

ORACLES["demand_delay_full_outer"] = f"""
    WITH d AS ({SQL_DEMAND}),
    dl AS (SELECT route_id, hour_ts, trip_update_events
           FROM ({SQL_DELAY}) x)
    SELECT coalesce(d.route_id, dl.route_id) AS route_id,
           coalesce(d.hour_ts, dl.hour_ts) AS hour_ts,
           coalesce(d.passengers, 0.0) AS passengers,
           coalesce(dl.trip_update_events, 0) AS trip_update_events,
           (CASE WHEN d.passengers IS NOT NULL THEN 1 ELSE 0 END
            + 2 * CASE WHEN dl.trip_update_events IS NOT NULL
                       THEN 1 ELSE 0 END) AS presence
    FROM d
    FULL OUTER JOIN dl
      ON d.route_id = dl.route_id AND d.hour_ts = dl.hour_ts
"""
