"""Direct contract tests for registry.bucketed_global_rank — the
two-pass partition-offset rank that replaced heaps_law_curve's
unbounded global row_number (round 11). The heaps oracle pins it
end-to-end on dense doc_ids; these pin the helper itself on the
layouts future callers will bring: sparse keys, negative keys,
single-row/single-bucket degeneracies, and key ranges that stress the
integer bucket-width arithmetic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from namegraph_collections_spark.queries.registry import bucketed_global_rank


def _ranks(spark, keys, buckets=8):
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    out = bucketed_global_rank(df, "k", rk="rk", buckets=buckets).collect()
    return {r["k"]: r["rk"] for r in out}


@pytest.mark.parametrize(
    "keys",
    [
        list(range(1, 101)),  # dense
        [7],  # single row
        [5, -3, 0, 99, -100, 42],  # negative + sparse
        [2**40, -(2**40), 0, 1, 2**33],  # huge range (width arithmetic)
        [10, 20, 30, 40, 50, 60, 70, 80, 90],  # exactly bucket-ish count
    ],
)
def test_rank_equals_sorted_position(spark, keys):
    got = _ranks(spark, keys)
    want = {k: i + 1 for i, k in enumerate(sorted(keys))}
    assert got == want


def test_rank_is_dense_and_total_at_scale(spark):
    # 10k sparse keys across several buckets: every rank 1..n exactly
    # once, and order agrees with the key order
    keys = [i * 977 % 100003 for i in range(10_000)]
    assert len(set(keys)) == len(keys)
    got = _ranks(spark, keys, buckets=64)
    assert sorted(got.values()) == list(range(1, len(keys) + 1))
    ordered = sorted(keys)
    assert all(got[k] == i + 1 for i, k in enumerate(ordered))


def test_empty_input_returns_empty(spark):
    """An empty frame has NULL extents; the key-range guard must let
    it flow through as an empty result, not raise (null-safe assert)."""
    df = spark.createDataFrame([], "k long")
    assert bucketed_global_rank(df, "k").collect() == []


def test_key_range_overflow_raises(spark):
    """Round-11 ADVICE: a key set spanning more than signed-64 wraps
    (_hi - _lo) negative and would silently produce wrong ranks — the
    guard must raise the clear precondition message instead. Keys here
    span 2^64 - 2. The assert fires inside an AQE broadcast-stage
    materialization, so it surfaces as the wrapped Py4J error rather
    than a converted SparkRuntimeException — match on the message."""
    df = spark.createDataFrame(
        [(-(2**63) + 1,), (0,), (2**63 - 1,)], "k long"
    )
    with pytest.raises(Exception, match="key range exceeds signed-64"):
        bucketed_global_rank(df, "k").collect()


def test_plan_has_no_unbounded_global_window(spark):
    """The helper's REASON to exist: its only empty-spec window sits
    above a guard-visible Limit. Reuses the registry-wide guard."""
    from tests.test_plans import unbounded_global_windows

    df = spark.range(0, 5000).select((F.col("id") * 3).alias("k"))
    ranked = bucketed_global_rank(df, "k")
    assert not unbounded_global_windows(ranked)
    assert ranked.count() == 5000
