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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from namegraph_collections_spark.operators.additive_state import batch_stamp

#: Partition column carrying the micro-batch stamp in scored outputs.
INGEST_BATCH_COL = "ingest_batch"


def write_scored_batch(scored: DataFrame, out_dir: str, batch_id: int) -> None:
    """Write one micro-batch's scored rows under
    ``out_dir/ingest_batch=<stamp>/``, overwriting ONLY that partition
    on redelivery (dynamic partition overwrite)."""
    (
        scored.withColumn(INGEST_BATCH_COL, F.lit(batch_stamp(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(INGEST_BATCH_COL)
        .parquet(out_dir)
    )
