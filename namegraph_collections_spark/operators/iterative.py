"""Round-state bookkeeping for iterative DataFrame algorithms.

``localCheckpoint`` persists its partitions in executor storage and
PySpark exposes no public handle to free them — so a driver loop that
checkpoints every round pins O(rounds) edge-sets for the life of the
session. Measured back-to-back at sf0.1, repeated closure runs slowed
16s → 22s as blocks accumulated; at 100 TB the same leak is an
executor-storage OOM, and the fix is the one GraphX's Pregel applies:
unpersist superseded round state as soon as the next round has
materialized past it.

Checkpoint storage is identified EXACTLY, by reading the checkpoint
RDD's id off the plan's LogicalRDD node — not by diffing the
context's persistent-RDD map around the call, which can swallow cache
blocks the CALLER owns (materializing the input plan inside our first
job fills any caller-side persist() between two snapshots, and
freeing those would silently destroy the caller's cache).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def checkpoint_rdd_id(df: DataFrame) -> int:
    """The storage id of ``df``'s localCheckpoint — valid for eager
    and lazy checkpoints (the LogicalRDD and its RDD exist at plan
    time either way; a lazy checkpoint's blocks just appear on first
    materialization under the same id)."""
    return int(df._jdf.queryExecution().analyzed().rdd().id())


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of RDDs currently persisted in this context. For
    OBSERVATION (tests assert bounded residue) — never derive ids to
    free from diffs of this set; see the module docstring."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def unpersist_rdd_ids(spark: SparkSession, ids: set[int]) -> None:
    """Asynchronously drop the given persisted RDDs, if present.

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
