"""Bloom-filter operator: exactness-after-exact-join, no false
negatives, sizing behavior, and the probe-side plan shape (no shuffle
before the prune)."""

from __future__ import annotations

from pyspark.sql import functions as F

from namegraph_collections_spark.operators.bloom import (
    bloom_build,
    bloom_prune,
)
from namegraph_collections_spark.queries import REGISTRY
from tests.test_plans import formatted_plan

SF = "/root/testdata/sf0.001"


def test_bloom_never_drops_members(spark):
    """Every build-side key must survive the prune (no false negatives
    by construction — a member's bits are all set)."""
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    bloom = bloom_build(keys, "k", num_bits=1 << 12)
    survivors = bloom_prune(keys, "k", bloom, num_bits=1 << 12)
    assert survivors.count() == 500


def test_bloom_prunes_most_non_members(spark):
    """Non-members pass only at the fp rate; with m=2^17, n=500, K=3
    the fp rate is ~1e-5 — of 10k non-members, ~0 should survive
    (allow a loose bound for hash luck)."""
    members = spark.range(0, 500).select(F.col("id").alias("k"))
    others = spark.range(1_000_000, 1_010_000).select(F.col("id").alias("k"))
    bloom = bloom_build(members, "k")
    passed = bloom_prune(others, "k", bloom).count()
    assert passed <= 20


def test_bloom_small_filter_has_false_positives_not_negatives(spark):
    """Undersized filter (m=256 bits, n=500 keys) saturates: false
    positives abound, but members ALL still pass — the exactness
    contract callers rely on."""
    members = spark.range(0, 500).select(F.col("id").alias("k"))
    bloom = bloom_build(members, "k", num_bits=256)
    assert bloom_prune(members, "k", bloom, num_bits=256).count() == 500


def _bnlj_streamed_side_lines(tree: str) -> list[str]:
    """The streamed-side subtree lines of the (single) BNLJ node in a
    formatted-plan tree: its children start at the column where the
    node name starts; streamed-branch lines carry ':' there, the
    build branch starts at the '+' marker."""
    lines = tree.splitlines()
    # children of a node render their ':-'/'+-' marker at the column
    # where the parent's NAME starts
    (i, col), = [
        (i, ln.index("BroadcastNestedLoopJoin"))
        for i, ln in enumerate(lines)
        if "BroadcastNestedLoopJoin" in ln
    ]
    streamed: list[str] = []
    for ln in lines[i + 1 :]:
        if len(ln) <= col or ln[col] == "+":  # build branch begins
            break
        assert ln[col] == ":"
        streamed.append(ln)
    assert streamed, "BNLJ has no streamed-side lines in the tree"
    return streamed


def test_bloom_semi_join_probe_side_not_shuffled(spark):
    """The documented plan order — orders scan → bloom prune → exact
    semi-join — with no Exchange on the probe side before the prune.

    Two real assertions: (1) the exact LeftSemi join sits ABOVE the
    bloom's BroadcastNestedLoopJoin in the tree (Catalyst's left-semi
    pushdown would otherwise reorder the exact join below the bloom
    and make the prune pure overhead — bloom_prune's left-outer
    attach exists to pin this); (2) the BNLJ's streamed side — the
    orders scan subtree — contains no Exchange of any kind."""
    tree = formatted_plan(REGISTRY["bloom_pruned_semi_join"].fn(spark, SF)).split("\n\n")[0]
    assert "BroadcastNestedLoopJoin" in tree
    assert "LeftSemi" in tree
    assert tree.index("LeftSemi") < tree.index("BroadcastNestedLoopJoin"), (
        "exact semi-join was pushed below the bloom prune"
    )
    streamed = _bnlj_streamed_side_lines(tree)
    assert not any("Exchange" in ln for ln in streamed), (
        "probe side shuffled before the bloom prune:\n" + "\n".join(streamed)
    )


def test_bloom_query_matches_plain_semi_join(spark):
    """bloom_pruned_semi_join ≡ the un-bloomed semi-join, row for row
    (the bloom is invisible in results by contract)."""
    got = REGISTRY["bloom_pruned_semi_join"].fn(spark, SF)
    cust = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    want = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(cust, "o_custkey", "left_semi")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
