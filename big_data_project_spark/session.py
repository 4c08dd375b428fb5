"""SparkSession factory tuned for this engine.

Local mode is a single JVM; the same config flags (AQE, shuffle
partitions, Arrow) are the ones that matter on a 1000-executor cluster —
AQE handles runtime coalescing and skew joins, UTC keeps timestamp
semantics identical to the oracle engine.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "big_data_project_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # local-mode driver hosts all executor threads; the 1g default
        # heap GC-thrashes under 32 concurrent tasks (takes effect only
        # when this process starts the JVM, which is the normal path)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "8g"))
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
