"""Time/calendar column expressions shared by the hourly operators.

Parity targets: the reference's ``date_trunc('hour', ...)`` /
``EXTRACT(HOUR/DOW ...)`` / peak-window logic
(`/root/reference/src/optimization/kpi_views.sql:84-88`,
`/root/reference/initdb/init-postgis.sql:236-239`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hour_trunc(ts: Column | str) -> Column:
    """``date_trunc('hour', ts)`` — hourly bucket, kept as timestamp."""
    return F.date_trunc("hour", ts)


def hour_of_day(ts: Column | str) -> Column:
    return F.hour(ts)


def day_of_week(ts: Column | str) -> Column:
    """Postgres ``EXTRACT(DOW ...)``: 0=Sunday..6=Saturday.

    Spark's ``dayofweek`` is 1=Sunday..7=Saturday, so shift by one.
    """
    return F.dayofweek(ts) - F.lit(1)


def is_peak_hour(ts: Column | str) -> Column:
    """1 when hour in [7,9] or [16,18] — the reference's peak window."""
    h = F.hour(ts)
    return (h.between(7, 9) | h.between(16, 18)).cast("int")


def gtfs_time_to_seconds(col: Column | str) -> Column:
    """'HH:MM:SS' (hours may exceed 23 per GTFS spec) → seconds.

    Parity: ``gtfs_time_to_seconds`` in
    `/root/reference/src/dag/gtfs-static-job.py:182-186`.
    """
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, ":")
    return (
        parts.getItem(0).cast("int") * 3600
        + parts.getItem(1).cast("int") * 60
        + parts.getItem(2).cast("int")
    )
