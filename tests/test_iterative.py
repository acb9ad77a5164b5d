"""Round-state cleanup tests for the iterative operators.

Pins the fix in operators/iterative.py: driver loops must not leave
one checkpointed edge-set per ROUND pinned in executor storage. The
contract is bounded residue per CALL (the returned relation itself
stays persisted — consumers read it), with everything the loop used
internally freed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from namegraph_collections_spark.operators.closure import transitive_closure
from namegraph_collections_spark.operators.components import connected_components
from namegraph_collections_spark.operators.iterative import (
    persistent_rdd_ids,
    unpersist_rdd_ids,
)


def _chain_edges(spark, n):
    # 0→1→…→n: worst case for round count (diameter = n).
    return spark.range(n).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )


def test_transitive_closure_frees_round_state(spark):
    edges = _chain_edges(spark, 40)
    before = persistent_rdd_ids(spark)
    result = transitive_closure(edges, max_iterations=50)
    assert result.count() == 40 * 41 // 2
    residue = persistent_rdd_ids(spark) - before
    # Exactly the compacted result may remain — never the ~40 rounds'
    # frontier checkpoints.
    assert len(residue) <= 1, f"leaked {len(residue)} persisted RDDs"
    unpersist_rdd_ids(spark, residue)


def test_connected_components_frees_round_state(spark):
    edges = _chain_edges(spark, 64)
    before = persistent_rdd_ids(spark)
    stats: dict = {}
    comp = connected_components(edges, stats=stats)
    # One component rooted at 0.
    assert comp.filter(F.col("component") != 0).count() == 0
    assert comp.count() == 65
    residue = persistent_rdd_ids(spark) - before
    # Only the final fixpoint edge-set (which the returned projection
    # reads) may stay; every superseded round must have been freed.
    assert len(residue) <= 1, f"leaked {len(residue)} persisted RDDs"
    assert stats["rounds"] >= 2
    unpersist_rdd_ids(spark, residue)


def test_repeated_calls_do_not_accumulate(spark):
    edges = _chain_edges(spark, 20)
    baseline = persistent_rdd_ids(spark)
    for _ in range(3):
        df = transitive_closure(edges, max_iterations=30)
        df.count()
        # simulate the caller releasing the result
        unpersist_rdd_ids(spark, persistent_rdd_ids(spark) - baseline)
    assert len(persistent_rdd_ids(spark) - baseline) == 0
