"""Streaming incremental-dedup parity: the stream-static band-index
join must surface exactly the candidate pairs the batch
incremental_minhash_dedup query reports, and the stateless per-row
banding must be byte-identical to the batch explode+groupBy index."""

from __future__ import annotations

import shutil

from namegraph_collections_spark.queries import REGISTRY
from namegraph_collections_spark.queries.dedup import NEW_BATCH_MOD, _minhash_bands
from namegraph_collections_spark.streaming.dedup_index_stream import (
    stateless_minhash_bands,
    streaming_index_dedup,
)
from namegraph_collections_spark.streaming.events import run_available_now

SF_DIR = "/root/testdata/sf0.001"


def test_stateless_bands_match_batch_index(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    batch = sorted(tuple(r) for r in _minhash_bands(docs).collect())
    stateless = sorted(tuple(r) for r in stateless_minhash_bands(docs).collect())
    assert batch == stateless


def test_stream_candidates_match_batch_incremental(spark, tmp_path):
    docs_dir = tmp_path / "docs_stream"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    corpus = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    index = _minhash_bands(corpus.filter(corpus.doc_id % 10 != NEW_BATCH_MOD))

    schema = corpus.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(docs_dir))
        .filter(f"doc_id % 10 = {NEW_BATCH_MOD}")
    )
    out = run_available_now(
        streaming_index_dedup(stream, index), str(tmp_path / "ckpt")
    )
    stream_pairs = {(r["new_doc"], r["old_doc"]) for r in out.collect()}

    batch_pairs = {
        (r["new_doc"], r["old_doc"])
        for r in REGISTRY["incremental_minhash_dedup"].fn(spark, SF_DIR).collect()
    }
    assert stream_pairs == batch_pairs
    assert stream_pairs  # non-vacuous: the fixture has candidates
