"""Standing MinHash band-index maintenance — the missing write half
of the incremental dedup loop.

``queries/dedup.py::incremental_minhash_dedup`` (and its streaming
twin ``streaming/dedup_index_stream.py``) PROBE a standing band
index; this module is what keeps that index current: after a batch is
deduped and admitted, its band signatures are unioned into the index
and the result is rotated as a new dated snapshot (the same
dated-copies-plus-latest-marker rotation the CDC store uses,
``operators/cdc.py::rotate_snapshot`` — reference
update_es.py:361-370's archive pattern). Day N+1's probe then sees
day N's documents.

Scale shape: maintenance is O(batch) — bands are computed for the new
batch only, the union is a zero-shuffle concatenation, and the
snapshot write is the only materialization. At 100 TB the snapshot
write would be bucketed by (band, band_sig) so the daily probe join
is co-located; rewriting the full index per day is the simple form —
a production variant appends a per-day partition
(``index/day=<stamp>``) and compacts periodically, which this module
models with full rotation because the probe contract (an equi-join on
(band, band_sig)) is identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from namegraph_collections_spark.operators.cdc import (
    latest_snapshot,
    rotate_snapshot,
)
from namegraph_collections_spark.queries.dedup import _minhash_bands

#: Index schema: one row per (doc_id, band, band_sig).
INDEX_COLS = ["doc_id", "band", "band_sig"]


def band_index_for(docs: DataFrame) -> DataFrame:
    """Band signatures for a batch — the exact arithmetic of the batch
    index builder (and, byte-identically, the stateless streaming
    banding; pinned by tests/test_dedup_index_stream.py)."""
    return _minhash_bands(docs).select(*INDEX_COLS)


def maintain_band_index(
    spark: SparkSession, base_dir: str, new_docs: DataFrame, stamp: str
) -> DataFrame:
    """Union the new batch's band signatures into the standing index
    and rotate: reads the marker's current snapshot (empty before the
    first rotation), appends ``band_index_for(new_docs)``, writes the
    dated snapshot, and repoints the marker. Returns the rotated
    index as read back from storage (so callers probe exactly what
    the next day's job will see)."""
    new_bands = band_index_for(new_docs)
    current = latest_snapshot(spark, base_dir)
    index = new_bands if current is None else current.unionByName(new_bands)
    rotate_snapshot(index, base_dir, stamp)
    return latest_snapshot(spark, base_dir)


def probe_band_index(index: DataFrame, batch_docs: DataFrame) -> DataFrame:
    """Candidate (new_doc, old_doc) pairs: the batch's band signatures
    equi-join the standing index — the lookup half of
    ``incremental_minhash_dedup``, against a PERSISTED index instead
    of a same-query corpus split. Exact-Jaccard verification stays
    with the caller, which owns the document store."""
    new_b = band_index_for(batch_docs).withColumnRenamed("doc_id", "new_doc")
    old_b = index.withColumnRenamed("doc_id", "old_doc")
    return (
        new_b.join(old_b, ["band", "band_sig"])
        .select("new_doc", "old_doc")
        .distinct()
    )
