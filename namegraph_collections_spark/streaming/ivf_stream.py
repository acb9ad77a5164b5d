"""Continuous IVF-statistics maintenance — the foreachBatch twin of
operators/ivf_maintain.py: new embedding files fold their per-list
(count, component-sum) statistics into the standing state via the
batch function verbatim, so an ANN index's refresh step reads
current sufficient statistics without rescanning the store. Same
stamp-keyed replay contract as every maintenance stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from namegraph_collections_spark.operators.additive_state import batch_stamp
from namegraph_collections_spark.operators.ivf_maintain import (
    maintain_ivf_state,
)
from namegraph_collections_spark.streaming.diversity_stream import (
    read_embeddings_stream,  # noqa: F401  (shared source; re-exported)
)


def run_ivf_maintenance_stream(
    emb_stream: DataFrame, base_dir: str, checkpoint_dir: str
) -> None:
    """Drain an available-now embeddings stream through the IVF
    maintenance: every micro-batch merges via the batch function
    verbatim, stamped with the shared zero-padded batch id."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        maintain_ivf_state(
            batch_df.sparkSession, base_dir, batch_df, batch_stamp(batch_id)
        )

    (
        emb_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
