"""Index-maintenance loop: two rotations of the standing MinHash band
index, proving batch N+1 dedups against batch N's documents.

The corpus is split deterministically by doc_id % 10: rotation one
indexes docs with mod in {0..4}, rotation two adds mod in
{5, 6, 8, 9}, and the probe batch is mod == NEW_BATCH_MOD (7) — so
after both rotations the persisted index covers exactly the "old"
side of the driver-checked ``incremental_minhash_dedup`` query, and
the probe's candidate pairs must equal that query's pairs.
"""

from __future__ import annotations

from namegraph_collections_spark.operators.dedup_index import (
    band_index_for,
    maintain_band_index,
    probe_band_index,
)
from namegraph_collections_spark.queries import REGISTRY
from namegraph_collections_spark.queries.dedup import NEW_BATCH_MOD

SF_DIR = "/root/testdata/sf0.001"


def test_two_rotations_then_probe_matches_batch_query(spark, tmp_path):
    base = str(tmp_path / "band_index")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    wave1 = docs.filter(docs.doc_id % 10 <= 4)
    wave2 = docs.filter((docs.doc_id % 10 > 4) & (docs.doc_id % 10 != NEW_BATCH_MOD))
    probe_batch = docs.filter(docs.doc_id % 10 == NEW_BATCH_MOD)

    # Rotation 1: index starts empty; after it, the stored index holds
    # exactly wave1's bands.
    idx1 = maintain_band_index(spark, base, wave1, "t0")
    assert sorted(map(tuple, idx1.collect())) == sorted(
        map(tuple, band_index_for(wave1).collect())
    )

    # Probe between rotations sees ONLY wave-1 docs.
    pairs_after_1 = {
        (r["new_doc"], r["old_doc"])
        for r in probe_band_index(idx1, probe_batch).collect()
    }
    wave1_ids = {r["doc_id"] for r in wave1.select("doc_id").collect()}
    assert {old for _, old in pairs_after_1} <= wave1_ids

    # Rotation 2: the union of both waves — byte-identical to building
    # the index from the union directly.
    idx2 = maintain_band_index(spark, base, wave2, "t1")
    both = wave1.unionByName(wave2)
    assert sorted(map(tuple, idx2.collect())) == sorted(
        map(tuple, band_index_for(both).collect())
    )

    # Probe after rotation 2: candidates equal the driver-checked
    # incremental query's pairs (whose old side is mod != 7), and they
    # strictly grow vs the single-rotation probe — batch N+1 dedups
    # against batch N's docs through the PERSISTED index.
    pairs_after_2 = {
        (r["new_doc"], r["old_doc"])
        for r in probe_band_index(idx2, probe_batch).collect()
    }
    batch_pairs = {
        (r["new_doc"], r["old_doc"])
        for r in REGISTRY["incremental_minhash_dedup"].fn(spark, SF_DIR).collect()
    }
    assert pairs_after_2 == batch_pairs
    assert pairs_after_1 <= pairs_after_2
    assert pairs_after_2  # non-vacuous: the fixture has candidates
