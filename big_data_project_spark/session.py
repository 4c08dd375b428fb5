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
        # Join-strategy knobs (guide §3.1/§9), env-parameterised.
        # PREFER_SMJ=false lets the planner pick shuffled-hash joins
        # (no sort) when its size conditions hold, and the AQE
        # threshold converts sort-merge to shuffled-hash at runtime
        # when every post-shuffle partition is under the limit —
        # measured −20-25% on the SMJ-heavy corpus-factor joins
        # (nmf_topic_rounds, semdedup_prune; OPTIMIZATION_r09.md).
        # Safe beyond local mode: both paths are size-guarded (the
        # planner's build-side condition / the 64m per-partition AQE
        # bound), so a build side that could OOM falls back to SMJ;
        # set SPARK_GRAFT_PREFER_SMJ=true to restore the old planner.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_AQE_SHJ_THRESHOLD", "64m"),
        )
        # Shuffle/spill codec (guide §2.3): default lz4; zstd trades
        # CPU for markedly better ratio — measured per-host
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
