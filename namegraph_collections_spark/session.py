"""SparkSession factory tuned for both local testing and cluster scale.

Local mode (the test harness) is a single JVM with N threads; the same
conf keys are the ones that matter on a 1000-executor cluster:
AQE (runtime re-plan + skew-join + partition coalescing), a shuffle
partition count sized to the parallelism, Arrow for the pandas-UDF
path, and UTC session time so results compare bit-for-bit against the
DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "namegraph-collections-spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (driver contract);
    on a real cluster the master/shuffle settings come from
    spark-submit and everything here remains valid.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Shuffle partitions ≈ 2× cores locally; on a cluster AQE coalesces
    # from this initial number, so a generous value is safe.
    shuffle_parts = max(int(cpus) * 2, 16)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
