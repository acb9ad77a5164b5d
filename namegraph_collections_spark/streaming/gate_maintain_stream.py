"""Continuous maintenance of the domain-gate state — the foreachBatch
form of operators/gate_maintain.py.

The gate's page-grain state merge is a sum-by-key against a persisted
snapshot — exactly the shape Structured Streaming delegates to
``foreachBatch``: each micro-batch is a plain DataFrame, the merge
reuses the BATCH maintenance function verbatim (one code path, no
drift), and the dated-snapshot rotation gives the same
read-your-previous-write contract the daily job has. This is the
standard pattern for streaming upserts into a store Spark does not
manage transactionally (the Kafka→Delta MERGE idiom, restated over
parquet snapshots).

Exactly-once note: foreachBatch is at-least-once — a crash between
the snapshot rotation and the streaming checkpoint commit re-delivers
the same batch id on restart, and re-merging it would double every
additive measure. The maintenance is therefore IDEMPOTENT per stamp:
the stamp carries the batch id, and ``maintain_gate_state`` detects
an already-written ``snapshot=b<id>`` directory and only repoints the
marker instead of merging again (the replay-safety contract pinned by
tests/test_gate_maintain.py's replay test).

Scale shape: per micro-batch, scan-bandwidth per-doc programs + one
(domain, norm_url)-keyed partial-agg shuffle of the BATCH only + the
sum-by-key merge against state — identical to the batch maintenance,
cost proportional to new files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from namegraph_collections_spark.operators.additive_state import batch_stamp
from namegraph_collections_spark.operators.gate_maintain import (
    maintain_gate_state,
)


def run_gate_maintenance_stream(
    docs_stream: DataFrame, base_dir: str, checkpoint_dir: str
) -> None:
    """Drain an available-now documents stream through the gate-state
    maintenance: every micro-batch merges into the standing page-grain
    state via the batch function verbatim and rotates a dated
    snapshot stamped with the batch id."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        maintain_gate_state(
            batch_df.sparkSession, base_dir, batch_df, batch_stamp(batch_id)
        )

    (
        docs_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
