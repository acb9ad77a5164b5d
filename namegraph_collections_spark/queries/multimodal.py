"""Multimodal feature-extraction query (driver brief): binary payload
→ Arrow-batched mapInPandas histogram features, value-checked against
a char-code oracle (the documents are ASCII, so utf-8 payload bytes
and character codes coincide — the oracle can see through the stub).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from namegraph_collections_spark.functions.multimodal import (
    N_HIST_BINS,
    byte_histogram_features,
    synthesize_media,
)
from namegraph_collections_spark.queries.registry import register, spread, tbl


@register(
    "multimodal_byte_histogram",
    oracle=f"""
    SELECT doc_id AS media_id,
           array_to_string(list_transform(range({N_HIST_BINS}),
             b -> CAST(len(list_filter(
                    list_transform(range(1, len(text) + 1),
                                   i -> ascii(substr(text, CAST(i AS INT), 1))),
                    c -> c // 16 = b)) AS BIGINT)), ',') AS hist
    FROM documents
    """,
)
def multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction end-to-end: documents →
    synthesized media payloads (FAKE header + utf-8 body) →
    mapInPandas 16-bin byte histogram (driver brief).

    The Python stage is Arrow-batched and partition-parallel
    (spread()); at scale this is the exact shape of an embedding
    model over image bytes — fixed-width vectors out, one pass.
    """
    from pyspark.sql import functions as F

    docs = spread(tbl(spark, sf_dir, "documents"), "doc_id")
    media = synthesize_media(docs)
    feats = byte_histogram_features(media)
    # hist serialized to a CSV string so the driver's canonicalizer
    # (which cannot hash list cells) can value-check it.
    return feats.select(
        "media_id",
        F.array_join(F.transform("hist", lambda v: v.cast("string")), ",").alias("hist"),
    )
