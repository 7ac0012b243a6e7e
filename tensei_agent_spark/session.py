"""SparkSession factory.

Defaults are tuned for the driver harness (local[$SPARK_GRAFT_CPUS],
single JVM) but every knob is chosen to scale: AQE re-plans shuffles at
runtime, skew-join splitting handles hot keys, shuffle partitions track
core count locally (a real cluster would set 2-3× total cores), and the
session time zone is pinned to UTC so results are byte-comparable with
the DuckDB oracle and stable across deployments.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "tensei-agent-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    AQE owns runtime re-planning (partition coalescing, skew-join
    splitting, broadcast conversion); we only pin what AQE cannot pick:
    time zone, Arrow transfers, and an initial shuffle-partition count.
    """
    cpus = cpu_count()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # Deterministic, oracle-comparable timestamps.
        .config("spark.sql.session.timeZone", "UTC")
        # Adaptive execution: runtime shuffle coalescing, skew splitting,
        # sort-merge→broadcast conversion when a side turns out small.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Initial shuffle width ≈ cores in local mode. On a cluster this
        # would be 2-3× total executor cores; AQE coalesces down anyway.
        .config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions or cpus)
        )
        # Arrow for every pandas_udf / mapInPandas / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Dimension tables up to 64 MiB broadcast instead of shuffling.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # 128 MiB scan splits — the parquet row-group sweet spot.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # Keep managed-table data (bucketed tables) out of the repo cwd.
        .config("spark.sql.warehouse.dir", "/tmp/tensei_spark_warehouse")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
