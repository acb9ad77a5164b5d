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
    # Shuffle/spill scratch (guide §2.1: local disk bandwidth for
    # shuffle files can be the tighter limit). The sandbox's default
    # /tmp sits on the virtio root disk, where creating the M x R
    # shuffle block files dominates small-stage wall time (measured:
    # a 2-exchange toy aggregation ran 3.6s on /tmp vs 2.3s on tmpfs,
    # task wall ~1.3s at ~0.26s CPU — the gap is file I/O wait).
    # Parameterized: SPARK_GRAFT_LOCAL_DIR overrides; default prefers
    # the RAM-backed /dev/shm when present, else Spark's default. On
    # a real cluster the resource manager sets SPARK_LOCAL_DIRS to
    # NVMe scratch and this conf is ignored — the production analogue
    # of this choice is "point local dirs at the fastest scratch".
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/ngcs-spark-local"
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # WindowExec logs a blanket "No Partition Defined" warning on EVERY
    # empty-partition-spec window, regardless of input size, and a
    # constant partition spec cannot silence it (Catalyst folds
    # literals out of the spec before the physical plan — verified).
    # Every empty-spec window in this engine is k-bounded by
    # construction and MACHINE-CHECKED by the registry-wide plan guard
    # (tests/test_plans.py::test_no_unbounded_global_window), so the
    # warning is pure noise here; 300+ copies of it were drowning real
    # signals in the bench logs. Dropped to ERROR, justified by the
    # guard — if the guard ever goes red, this suppression is the
    # first thing to revisit.
    try:
        jvm = spark.sparkContext._jvm
        lvl = jvm.org.apache.logging.log4j.Level.ERROR
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec", lvl
        )
    except Exception:
        pass  # logging backend changed — cosmetic only, never fatal
    return spark
