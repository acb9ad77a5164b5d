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

Exactly-once note: availableNow/foreachBatch delivers each batch id
once per successful run; a retried batch would re-merge its rows, so
a production deployment records the last-applied batch id inside the
snapshot directory and skips replays — modeled here by the rotation
stamp carrying the batch id (idempotent overwrite per (stamp, batch)).

Scale shape: per micro-batch, scan-bandwidth per-doc programs + one
(domain, norm_url)-keyed partial-agg shuffle of the BATCH only + the
sum-by-key merge against state — identical to the batch maintenance,
cost proportional to new files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

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
            batch_df.sparkSession, base_dir, batch_df, f"b{batch_id:06d}"
        )

    (
        docs_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
