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


def test_prune_keeps_newest_and_refuses_pruned_replay(spark, tmp_path):
    """Retention mirror of test_snapshot_retention (round-10 VERDICT
    #6): the sink's per-micro-batch partitions grow unboundedly, so
    pruning exists — and a redelivery of a PRUNED batch must be
    REFUSED, never quietly re-materialized."""
    import pytest

    from namegraph_collections_spark.streaming.idempotent_sink import (
        prune_scored_batches,
    )

    out = str(tmp_path / "scored3")
    for i in range(5):
        b = spark.createDataFrame([(i, i * 10)], "doc_id long, score long")
        write_scored_batch(b, out, i)
    victims = prune_scored_batches(spark, out, keep_last=2)
    assert victims == [f"b{i:012d}" for i in range(3)]
    got = spark.read.parquet(out)
    assert sorted(r["doc_id"] for r in got.collect()) == [3, 4]
    # idempotent: nothing further to prune
    assert prune_scored_batches(spark, out, keep_last=2) == []
    # a late at-least-once redelivery of a pruned batch is refused —
    # at ANY padding respelling of the id (shared canonical ledger)
    b0 = spark.createDataFrame([(0, 0)], "doc_id long, score long")
    with pytest.raises(ValueError, match="pruned scored batch"):
        write_scored_batch(b0, out, 0)
    # surviving batches still overwrite their own partition fine
    b4 = spark.createDataFrame([(4, 41)], "doc_id long, score long")
    write_scored_batch(b4, out, 4)
    got = spark.read.parquet(out)
    assert sorted((r["doc_id"], r["score"]) for r in got.collect()) == [
        (3, 30),
        (4, 41),
    ]


def test_sink_prune_orders_batch_stamps_numerically(spark, tmp_path):
    from namegraph_collections_spark.streaming.idempotent_sink import (
        prune_scored_batches,
    )

    out = str(tmp_path / "scored4")
    for i in (999999, 1000000):
        b = spark.createDataFrame([(i, 1)], "doc_id long, score long")
        write_scored_batch(b, out, i)
    # the numerically-older stamp must be the victim
    assert prune_scored_batches(spark, out, keep_last=1) == ["b000000999999"]
    got = spark.read.parquet(out)
    assert [r["doc_id"] for r in got.collect()] == [1000000]
