"""GTFS static feed source: CSV directory -> normalized, validated
DataFrames.

Parity: extract()/process() in
/root/reference/src/dag/gtfs-static-job.py:40-164 — read the five core
files as strings, trim id columns, referential filtering (trips⋉routes,
stop_times⋉trips⋉stops, trips⋉calendar), numeric casts, dedup on
natural keys, GeoJSON-style point geometry, feed checksum.

Spark-first: the pandas in-memory dict becomes five lazy DataFrames;
referential filtering is left-semi joins against broadcast key sets
(dims are tiny relative to stop_times); dedup is a deterministic
row_number over the natural key; the checksum comes from the binaryFile
source instead of a driver-side read loop.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

GTFS_FILES = ("routes", "stops", "trips", "stop_times", "calendar")

_ID_COLS = {
    "routes": ["route_id"],
    "stops": ["stop_id"],
    "trips": ["trip_id", "route_id", "service_id"],
    "stop_times": ["trip_id", "stop_id"],
    "calendar": ["service_id"],
}

_NATURAL_KEYS = {
    "routes": ["route_id"],
    "stops": ["stop_id"],
    "trips": ["trip_id"],
    "stop_times": ["trip_id", "stop_id", "stop_sequence"],
    "calendar": ["service_id"],
}


def extract_feed_zip(zip_path: str, out_dir: str) -> dict[str, str]:
    """Extract a GTFS feed zip into ``out_dir`` and return
    {"dir": extracted dir, "sha256": archive checksum} — the
    acquisition step between download and :func:`read_gtfs` (the
    reference's extract() task, gtfs-static-job.py:47-88: unzip +
    sha256 over the archive bytes + missing-file validation). The
    download itself (requests.get against a feed URL) stays out of
    engine scope — any fetcher can hand the zip path in. A feed zip is
    a single small static file, so this is honest driver-side work,
    exactly like the reference's task; the checksum is the feed
    VERSION key callers pass to change-detection (same role as
    ``feed_checksum`` below for extracted dirs).

    Raises FileNotFoundError for a missing archive or any missing core
    file after extraction (the reference's load_table contract)."""
    import hashlib
    import zipfile

    if not os.path.exists(zip_path):
        raise FileNotFoundError(f"GTFS zip not found: {zip_path}")
    os.makedirs(out_dir, exist_ok=True)
    with zipfile.ZipFile(zip_path, "r") as zf:
        zf.extractall(out_dir)
    missing = [
        f"{name}.txt"
        for name in GTFS_FILES
        if not os.path.exists(os.path.join(out_dir, f"{name}.txt"))
    ]
    if missing:
        raise FileNotFoundError(f"Missing GTFS file(s): {missing}")
    sha256 = hashlib.sha256()
    with open(zip_path, "rb") as fh:
        for chunk in iter(lambda: fh.read(8192), b""):
            sha256.update(chunk)
    return {"dir": out_dir, "sha256": sha256.hexdigest()}


def read_gtfs(spark: SparkSession, gtfs_dir: str) -> dict[str, DataFrame]:
    """Load the five core GTFS files as all-string DataFrames with ids
    trimmed (the reference's dtype=str + strip normalization)."""
    frames: dict[str, DataFrame] = {}
    for name in GTFS_FILES:
        path = os.path.join(gtfs_dir, f"{name}.txt")
        df = (
            spark.read.option("header", "true")
            .option("inferSchema", "false")
            .csv(path)
        )
        for c in _ID_COLS[name]:
            if c in df.columns:
                df = df.withColumn(c, F.trim(F.col(c)))
        frames[name] = df
    return frames


def _dedup_on(df: DataFrame, keys: list[str]) -> DataFrame:
    """Deterministic drop_duplicates: keep the first row of each natural
    key under a total order over all columns."""
    order = [F.asc(c) for c in df.columns]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def validate_gtfs(frames: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Referential filtering + casts + dedup + geometry, mirroring
    process() step by step (same filter order, so the same rows
    survive)."""
    routes = frames["routes"]
    stops = frames["stops"]
    trips = frames["trips"]
    stop_times = frames["stop_times"]
    calendar = frames["calendar"]

    trips = trips.join(
        F.broadcast(routes.select("route_id").distinct()),
        "route_id",
        "left_semi",
    )
    stop_times = stop_times.join(
        F.broadcast(trips.select("trip_id").distinct()),
        "trip_id",
        "left_semi",
    ).join(
        F.broadcast(stops.select("stop_id").distinct()),
        "stop_id",
        "left_semi",
    )
    trips = trips.join(
        F.broadcast(calendar.select("service_id").distinct()),
        "service_id",
        "left_semi",
    )

    stops = stops.withColumn(
        "stop_lat", F.col("stop_lat").cast("double")
    ).withColumn("stop_lon", F.col("stop_lon").cast("double"))
    stop_times = stop_times.withColumn(
        "stop_sequence", F.col("stop_sequence").cast("int")
    )
    stops = stops.withColumn(
        "geom",
        F.struct(
            F.lit("Point").alias("type"),
            F.array("stop_lon", "stop_lat").alias("coordinates"),
        ),
    )

    out = {
        "routes": routes,
        "stops": stops,
        "trips": trips,
        "stop_times": stop_times,
        "calendar": calendar,
    }
    return {
        name: _dedup_on(df, _NATURAL_KEYS[name]) for name, df in out.items()
    }


def feed_checksum(spark: SparkSession, gtfs_dir: str) -> DataFrame:
    """Per-file sha256 + byte length via the binaryFile source (the
    versioning/checksum step, computed on-cluster)."""
    return (
        spark.read.format("binaryFile")
        .load(os.path.join(gtfs_dir, "*.txt"))
        .select(
            F.element_at(F.split("path", "/"), -1).alias("file"),
            F.sha2(F.col("content"), 256).alias("sha256"),
            F.length("content").alias("bytes"),
        )
    )


QUERIES: dict = {}  # source module: exercised by tests, not the sf tables
ORACLES: dict[str, str] = {}
