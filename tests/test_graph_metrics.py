"""Triangle-enumeration invariants on crafted graphs (the registered
query's value-hash parity runs in test_oracle_parity.py)."""

from __future__ import annotations

from itertools import combinations

from namegraph_collections_spark.queries.graph_metrics import triangles


def _edges_df(spark, edges):
    rows = [(min(a, b), max(a, b)) for a, b in edges]
    return spark.createDataFrame(sorted(set(rows)), "vec_a long, vec_b long")


def _run(spark, edges):
    return sorted(tuple(r) for r in triangles(_edges_df(spark, edges)).collect())


def test_k4_has_exactly_four_triangles(spark):
    k4 = list(combinations(range(4), 2))
    assert _run(spark, k4) == [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]


def test_star_hub_has_none(spark):
    # A hub with 20 leaves: max wedge fan-out lives here, zero triangles.
    star = [(100, i) for i in range(20)]
    assert _run(spark, star) == []


def test_each_triangle_counted_once_with_ties(spark):
    # Two triangles sharing an edge + equal degrees everywhere the
    # orientation must tie-break on id.
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)]
    assert _run(spark, edges) == [(1, 2, 3), (2, 3, 4)]
