"""Round-state bookkeeping for iterative DataFrame algorithms.

``localCheckpoint`` persists its partitions in executor storage and
PySpark exposes no handle to free them — so a driver loop that
checkpoints every round pins O(rounds) edge-sets for the life of the
session. Measured back-to-back at sf0.1, repeated closure runs slowed
16s → 22s as blocks accumulated; at 100 TB the same leak is an
executor-storage OOM, and the fix is the same one GraphX's Pregel
applies: unpersist superseded round state as soon as the next round's
state is fully materialized.

The only robust public-ish handle on a checkpoint's storage is the
SparkContext persistent-RDD map, so callers snapshot ids around each
checkpoint and free deltas. Assumes no CONCURRENT persist activity on
the session between the two snapshots (true for this engine: queries
are driver-sequential).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of RDDs currently persisted in this context (includes
    materialized localCheckpoint data)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def unpersist_rdd_ids(spark: SparkSession, ids: set[int]) -> None:
    """Asynchronously drop the given persisted RDDs, if still present.

    Unpersisting a localCheckpointed RDD makes it UNRECOMPUTABLE (the
    lineage was truncated) — callers must only pass ids no live
    DataFrame still reads.
    """
    if not ids:
        return
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for k in jmap.keySet().toArray():
        if int(k) in ids:
            jmap.get(k).unpersist(False)
