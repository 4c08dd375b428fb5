"""Prediction-validation metrics: MAE / RMSE / sMAPE / bias, global and
by hour-of-day / peak-flag / route.

Parity: /root/reference/src/optimization/validate_predictions.py:28-82
(numpy on a driver-side frame there; single distributed aggregate here).
The (y_true, y_pred) pairs come from the deterministic persistence
baseline (kpi.prediction_baseline) so every metric is oracle-checkable.

Numeric portability: y_true/y_pred are exact 2-decimal quantities, so
float sums differ across engines only by summation-order epsilon — which
is enough to flip a fixed-decimal round when the true quotient lands
exactly on a boundary (sum/“nice” count). MAE/RMSE/bias therefore
aggregate in integer cents (BIGINT sums are order-independent and
exact) and divide once at the end; sMAPE terms are irrational-ish, where
boundary collisions have ~zero probability, so a float avg is fine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import pround, sql_pround
from ..functions.time import hour_of_day, is_peak_hour
from .kpi import SQL_PREDICTION_BASELINE, prediction_baseline

_EPS = 1e-6


def _cents(c: Column) -> Column:
    """Nearest-integer cents; floor(x*100+0.5) is sign-safe for values
    already within 1e-9 of a 2-decimal grid point."""
    return F.floor(c * 100.0 + F.lit(0.5)).cast("long")


def _with_errors(df: DataFrame) -> DataFrame:
    err_c = _cents(F.col("y_pred")) - _cents(F.col("y_true"))
    smape_term = (
        F.lit(2.0)
        * F.abs(F.col("y_true") - F.col("y_pred"))
        / F.greatest(
            F.abs(F.col("y_true")) + F.abs(F.col("y_pred")), F.lit(_EPS)
        )
    )
    return (
        df.withColumn("err_c", err_c)
        .withColumn("abs_err_c", F.abs(err_c))
        .withColumn("sq_err_c2", err_c * err_c)
        .withColumn("smape_term", smape_term)
    )


def _metrics() -> list[Column]:
    n = F.count(F.lit(1))
    return [
        n.alias("n"),
        pround(F.sum("abs_err_c") / (100.0 * n)).alias("mae"),
        pround(F.sqrt(F.sum("sq_err_c2") / (10000.0 * n))).alias("rmse"),
        pround(F.avg("smape_term") * 100.0).alias("smape_pct"),
        pround(F.sum("err_c") / (100.0 * n)).alias("bias"),
    ]


def validation_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_errors(prediction_baseline(spark, sf_dir))
    return df.agg(*_metrics())


def validation_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_errors(prediction_baseline(spark, sf_dir))
    return df.groupBy(hour_of_day("hour_ts").alias("hour_of_day")).agg(
        *_metrics()
    )


def validation_by_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_errors(prediction_baseline(spark, sf_dir))
    return df.groupBy(is_peak_hour("hour_ts").alias("is_peak_hour")).agg(
        *_metrics()
    )


def validation_by_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_errors(prediction_baseline(spark, sf_dir))
    n = F.count(F.lit(1))
    return df.groupBy("route_id").agg(
        *_metrics(),
        pround(F.sum(_cents(F.col("y_true"))) / (100.0 * n)).alias("mean_true"),
        pround(F.sum(_cents(F.col("y_pred"))) / (100.0 * n)).alias("mean_pred"),
    )


QUERIES = {
    "validation_global": validation_global,
    "validation_by_hour": validation_by_hour,
    "validation_by_peak": validation_by_peak,
    "validation_by_route": validation_by_route,
}

_SQL_ERR = f"""
    SELECT *,
           (CAST(floor(y_pred * 100.0 + 0.5) AS BIGINT)
            - CAST(floor(y_true * 100.0 + 0.5) AS BIGINT)) AS err_c,
           abs(CAST(floor(y_pred * 100.0 + 0.5) AS BIGINT)
               - CAST(floor(y_true * 100.0 + 0.5) AS BIGINT)) AS abs_err_c,
           (CAST(floor(y_pred * 100.0 + 0.5) AS BIGINT)
            - CAST(floor(y_true * 100.0 + 0.5) AS BIGINT))
           * (CAST(floor(y_pred * 100.0 + 0.5) AS BIGINT)
              - CAST(floor(y_true * 100.0 + 0.5) AS BIGINT)) AS sq_err_c2,
           2.0 * abs(y_true - y_pred)
             / greatest(abs(y_true) + abs(y_pred), 1e-6) AS smape_term,
           CAST(floor(y_true * 100.0 + 0.5) AS BIGINT) AS y_true_c,
           CAST(floor(y_pred * 100.0 + 0.5) AS BIGINT) AS y_pred_c,
           EXTRACT(HOUR FROM hour_ts)::int AS hour_of_day,
           ((EXTRACT(HOUR FROM hour_ts) BETWEEN 7 AND 9)
            OR (EXTRACT(HOUR FROM hour_ts) BETWEEN 16 AND 18))::int
             AS is_peak_hour
    FROM ({SQL_PREDICTION_BASELINE}) b
"""

_SQL_METRICS = f"""
    count(*) AS n,
    {sql_pround('sum(abs_err_c) / (100.0 * count(*))')} AS mae,
    {sql_pround('sqrt(sum(sq_err_c2) / (10000.0 * count(*)))')} AS rmse,
    {sql_pround('avg(smape_term) * 100.0')} AS smape_pct,
    {sql_pround('sum(err_c) / (100.0 * count(*))')} AS bias
"""

ORACLES = {
    "validation_global": f"SELECT {_SQL_METRICS} FROM ({_SQL_ERR}) e",
    "validation_by_hour": f"""
        SELECT hour_of_day, {_SQL_METRICS}
        FROM ({_SQL_ERR}) e GROUP BY hour_of_day
    """,
    "validation_by_peak": f"""
        SELECT is_peak_hour, {_SQL_METRICS}
        FROM ({_SQL_ERR}) e GROUP BY is_peak_hour
    """,
    "validation_by_route": f"""
        SELECT route_id, {_SQL_METRICS},
               {sql_pround('sum(y_true_c) / (100.0 * count(*))')} AS mean_true,
               {sql_pround('sum(y_pred_c) / (100.0 * count(*))')} AS mean_pred
        FROM ({_SQL_ERR}) e GROUP BY route_id
    """,
}
