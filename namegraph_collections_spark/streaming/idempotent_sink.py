"""Replay-idempotent scored-row sink for foreachBatch scorers.

``foreachBatch`` is at-least-once: a crash between a plain
``mode("append")`` parquet write and the streaming checkpoint commit
redelivers the same batch id, and the append would duplicate every
scored row in the output. The maintenance twins solve exactly this
with stamp-keyed snapshots; this is the same contract for the
STATELESS scorers (DSIR ingest scoring, NB-quality ingest scoring):
each micro-batch lands in its own ``ingest_batch=<stamp>`` partition
via dynamic partition overwrite, so a redelivery OVERWRITES its own
partition instead of appending a second copy. The stamp column
doubles as provenance — a reader can ask which ingest wave scored a
row — and readers that want the batch scorer's exact schema just drop
it (the stream-parity tests do).

Scale shape: one extra constant column and a per-batch directory;
the write is still a single job over only the NEW rows, and dynamic
partitionOverwriteMode touches no other batch's files.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from namegraph_collections_spark.operators.additive_state import (
    batch_stamp,
    canonical_stamp,
    stamp_is_older,
)
from namegraph_collections_spark.operators.cdc import (
    pruned_stamps,
    write_prune_ledger,
)

#: Partition column carrying the micro-batch stamp in scored outputs.
INGEST_BATCH_COL = "ingest_batch"


def write_scored_batch(scored: DataFrame, out_dir: str, batch_id: int) -> None:
    """Write one micro-batch's scored rows under
    ``out_dir/ingest_batch=<stamp>/``, overwriting ONLY that partition
    on redelivery (dynamic partition overwrite).

    Refuses a replay of a stamp that retention has PRUNED
    (``prune_scored_batches``): a pruned batch's rows were deliberately
    deleted, and a late redelivery quietly re-materializing them would
    undo the retention policy — the same refuse-replay contract the
    keyed-state maintainers honor for pruned snapshots. Structured
    Streaming never replays past the latest batch, so the refusal only
    fires for out-of-contract batch-API calls.
    """
    stamp = batch_stamp(batch_id)
    if canonical_stamp(stamp) in pruned_stamps(scored.sparkSession, out_dir):
        raise ValueError(
            f"replay of pruned scored batch {stamp!r}: its partition was "
            "removed by retention; rewriting would resurrect deleted rows"
        )
    (
        scored.withColumn(INGEST_BATCH_COL, F.lit(stamp))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(INGEST_BATCH_COL)
        .parquet(out_dir)
    )


def prune_scored_batches(spark, out_dir: str, keep_last: int) -> list[str]:
    """Retention for the scored-batch store: delete all but the newest
    ``keep_last`` ``ingest_batch=`` partitions (oldest first by the
    keyed-state stamp comparison — numeric for batch-shaped stamps).
    Returns the pruned stamps.

    Why it exists: the sink lands one partition per MICRO-BATCH, so a
    long-lived scoring stream grows its directory count unboundedly —
    the same failure mode snapshot rotation had before
    ``prune_snapshots`` (operators/cdc.py). Same ledger, same ordering
    of operations (ledger BEFORE deletion, via the shared append-only
    ``_PRUNED.d/`` writer), same refuse-replay in the write path — the
    two durability surfaces share ONE contract.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    base = jvm.org.apache.hadoop.fs.Path(out_dir)
    fs = base.getFileSystem(conf)
    if not fs.exists(base):
        return []
    prefix = f"{INGEST_BATCH_COL}="
    stamps = []
    for status in fs.listStatus(base):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith(prefix):
            stamps.append(name[len(prefix):])
    stamps.sort(
        key=functools.cmp_to_key(
            lambda a, b: -1 if stamp_is_older(a, b) else (1 if stamp_is_older(b, a) else 0)
        )
    )
    victims = stamps[: max(0, len(stamps) - keep_last)]
    if not victims:
        return []
    write_prune_ledger(fs, jvm, out_dir, victims)
    for s in victims:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{out_dir}/{prefix}{s}"), True)
    return victims
