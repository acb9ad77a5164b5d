"""Replay contract of the scored-row sink
(streaming/idempotent_sink.py): at-least-once redelivery of a
micro-batch must overwrite its own ``ingest_batch`` partition, never
append a second copy — the stateless-scorer analogue of the additive
maintainers' stamp-keyed snapshot idempotence (round-9 advisor
finding on the old ``mode("append")`` pattern)."""

from __future__ import annotations

from namegraph_collections_spark.streaming.idempotent_sink import (
    INGEST_BATCH_COL,
    write_scored_batch,
)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(map(repr, (r[c] for c in cols))) for r in df.collect())


def test_redelivered_batch_overwrites_instead_of_duplicating(
    spark, tmp_path
):
    out = str(tmp_path / "scored")
    b0 = spark.createDataFrame([(1, 10), (2, 20)], "doc_id long, score long")
    b1 = spark.createDataFrame([(3, 30)], "doc_id long, score long")

    write_scored_batch(b0, out, 0)
    write_scored_batch(b1, out, 1)
    # crash-after-write, checkpoint-uncommitted: batch 1 redelivers
    write_scored_batch(b1, out, 1)

    got = spark.read.parquet(out)
    assert INGEST_BATCH_COL in got.columns
    assert _rows(got.drop(INGEST_BATCH_COL)) == _rows(b0.unionByName(b1))


def test_redelivery_does_not_touch_other_batches(spark, tmp_path):
    out = str(tmp_path / "scored2")
    b0 = spark.createDataFrame([(1, 10)], "doc_id long, score long")
    b1 = spark.createDataFrame([(2, 20)], "doc_id long, score long")
    write_scored_batch(b0, out, 0)
    write_scored_batch(b1, out, 1)
    # redeliver batch 0 with DIFFERENT content (e.g. a re-scored model
    # would still be the same batch id) — batch 1 must survive intact
    b0b = spark.createDataFrame([(1, 11)], "doc_id long, score long")
    write_scored_batch(b0b, out, 0)
    got = spark.read.parquet(out).drop(INGEST_BATCH_COL)
    assert _rows(got) == _rows(b0b.unionByName(b1))
