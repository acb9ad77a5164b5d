"""Continuous maintenance of the Count-Min sketch — the foreachBatch
form of operators/cms_maintain.py, identical in shape to the gate and
DSIR maintenance twins: each micro-batch is a plain DataFrame, the
merge reuses the BATCH maintenance function verbatim (one code path,
no drift), and the dated-snapshot rotation gives the same
read-your-previous-write contract the daily job has. Replay safety
comes from the shared additive-state contract: stamps carry the
zero-padded batch id, so an at-least-once redelivery only repoints
the marker (tests/test_cms_maintain.py drains the same zone twice).

Scale shape: per micro-batch, one scan+explode of the NEW files, a
partial-aggregated shuffle that collapses to <= CMS_D x CMS_W rows
per task before the exchange, and a sum-by-key merge against a state
of the same bounded size — cost proportional to new data, state size
constant forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from namegraph_collections_spark.operators.additive_state import batch_stamp
from namegraph_collections_spark.operators.cms_maintain import (
    maintain_cms_state,
)


def run_cms_maintenance_stream(
    docs_stream: DataFrame, base_dir: str, checkpoint_dir: str
) -> None:
    """Drain an available-now documents stream through the CMS
    maintenance: every micro-batch's bigram cell counts merge into
    the standing sketch via the batch function verbatim."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        maintain_cms_state(
            batch_df.sparkSession, base_dir, batch_df, batch_stamp(batch_id)
        )

    (
        docs_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
