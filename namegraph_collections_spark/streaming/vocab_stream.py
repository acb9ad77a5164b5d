"""Continuous vocabulary-index maintenance — the foreachBatch twin of
operators/vocab_maintain.py, identical in shape to the gate/DSIR/CMS
maintenance streams: each micro-batch merges via the BATCH function
verbatim (one code path, no drift), stamped with the shared
zero-padded batch id for replay idempotence. This is the mixed-monoid
stream: occurrence counts SUM, first-seen doc ids MIN — at-least-once
redelivery is still safe because a committed stamp only repoints.

Scale shape: per micro-batch, one scan+explode of the NEW files, a
token-grain partial-aggregated shuffle of the BATCH, and a
merge-by-key against the type dictionary — cost proportional to new
data, state bounded by the dictionary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from namegraph_collections_spark.operators.additive_state import batch_stamp
from namegraph_collections_spark.operators.vocab_maintain import (
    maintain_vocab_state,
)


def run_vocab_maintenance_stream(
    docs_stream: DataFrame, base_dir: str, checkpoint_dir: str
) -> None:
    """Drain an available-now documents stream through the vocabulary
    maintenance: every micro-batch's (type, first_doc, occ) rows merge
    into the standing index via the batch function verbatim."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        maintain_vocab_state(
            batch_df.sparkSession, base_dir, batch_df, batch_stamp(batch_id)
        )

    (
        docs_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
