"""Continuous embedding-diversity maintenance — the foreachBatch twin
of operators/diversity_maintain.py: new embedding files fold their
(label, dim) component sums and per-label sentinel rows into the
standing state via the batch function verbatim, so an ingest pipeline
watches its clusters' redundancy drift without ever rescanning the
store. Same stamp-keyed replay contract as every maintenance stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (schema literals)
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from namegraph_collections_spark.operators.additive_state import batch_stamp
from namegraph_collections_spark.operators.diversity_maintain import (
    maintain_diversity_state,
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)


def read_embeddings_stream(spark: SparkSession, emb_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EMBEDDINGS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(emb_dir)
    )


def run_diversity_maintenance_stream(
    emb_stream: DataFrame, base_dir: str, checkpoint_dir: str
) -> None:
    """Drain an available-now embeddings stream through the diversity
    maintenance: every micro-batch merges via the batch function
    verbatim, stamped with the shared zero-padded batch id."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        maintain_diversity_state(
            batch_df.sparkSession, base_dir, batch_df, batch_stamp(batch_id)
        )

    (
        emb_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
