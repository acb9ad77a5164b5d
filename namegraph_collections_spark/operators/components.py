"""Connected components over an undirected edge DataFrame.

The dedup pipeline's final step: near-dup candidate PAIRS (MinHash/
SimHash/embedding LSH) must be unioned into duplicate CLUSTERS before
one canonical document per cluster can be kept. Pairs alone
over-delete (A~B, B~C but A kept twice) or under-delete; the industry
pipelines the reference's data model feeds (and every web-scale dedup
paper) close the pairs into components first.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the
shuffle-native formulation that converges in O(log² n) rounds on ANY
graph shape. Plain min-label propagation needs O(diameter) rounds; a
100 TB crawl's duplicate chains (mirror-of-a-mirror) can have long
paths, so the logarithmic bound is the difference between 8 shuffles
and 800.

Each phase is ONE hash shuffle (a window min over the neighbor list,
no self-join): large-star hangs every neighbor v > u off u's minimum
neighbor; small-star re-points every neighbor v <= u (plus u itself)
at the minimum. Both preserve connectivity and monotonically shrink
the potential function, so the fixpoint is a star forest: every node
points directly at its component's minimum id.

Lineage is truncated per round with ``localCheckpoint`` exactly as in
``operators.closure`` — the iterative-join pitfall notes there apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from namegraph_collections_spark.operators.iterative import (
    checkpoint_rdd_id,
    unpersist_rdd_ids,
)


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) both orientations -> for each u: emit (v, min_nbr) for
    strictly larger neighbors v. One shuffle (window over u)."""
    m = F.least(F.col("u"), F.min("v").over(Window.partitionBy("u")))
    return (
        edges.withColumn("m", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient (big, small); for each u re-point its small neighborhood
    (and u itself) at the minimum. One shuffle."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    m = F.least(F.col("u"), F.min("v").over(Window.partitionBy("u")))
    with_min = oriented.withColumn("m", m)
    re_pointed = with_min.select(F.col("v").alias("u"), F.col("m").alias("v"))
    self_edge = with_min.select("u", F.col("m").alias("v"))
    return (
        re_pointed.unionByName(self_edge)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iterations: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """DataFrame[node, component] where component = min node id in the
    connected component.

    ``edges``: DataFrame[src, dst] (undirected; orientation and self
    loops are normalized away). ``vertices``: optional DataFrame whose
    FIRST column lists all node ids — isolated nodes then appear with
    ``component = node``; without it only nodes incident to an edge
    are labeled.

    Convergence is an exact edge-set fixpoint check, kept off the hot
    path: both rounds' edge sets are ``.distinct()`` by construction,
    so set equality is ``count(e2) == count(e)`` (one cheap scan of the
    already-checkpointed partitions — no shuffle) AND, only when the
    counts agree, a single one-direction ``left_anti`` emptiness probe
    (``e2 ⊆ e`` + equal cardinality ⟹ ``e2 = e``). Early rounds
    shrink the edge count, so the join-shaped probe typically runs
    exactly once, at the fixpoint — versus the two full ``exceptAll``
    set-difference jobs per round this replaced.
    """
    spark = edges.sparkSession
    e = (
        edges.select(F.col(edges.columns[0]).alias("u"), F.col(edges.columns[1]).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e_ids = {checkpoint_rdd_id(e)}
    n = e.count()
    rounds = 0
    for _ in range(max_iterations):
        # large-star reads both orientations; build them explicitly.
        # The checkpoint is LAZY: the count() right after is the one
        # action that materializes (and lineage-truncates) the round's
        # edge set — one job per round, not a checkpoint job plus a
        # count job (count is a FULL action, so materialization is
        # complete when it returns).
        both = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        e2 = _small_star(_large_star(both)).localCheckpoint(eager=False)
        # exact id off the plan node (see operators/iterative.py — a
        # persistent-map diff here could capture caller-owned blocks)
        e2_ids = {checkpoint_rdd_id(e2)}
        rounds += 1
        n2 = e2.count()
        # Exact fixpoint: equal counts (cheap) gate the one join probe.
        changed = n2 != n or not e2.join(e, ["u", "v"], "left_anti").isEmpty()
        # The old round's edge set is fully superseded once the probe
        # has read it — free its checkpoint blocks NOW instead of
        # letting O(rounds) edge-sets pin executor storage for the
        # session (operators/iterative.py has the leak writeup). The
        # final round's e stays persisted: the returned component
        # projection reads it.
        unpersist_rdd_ids(spark, e_ids)
        e, n, e_ids = e2, n2, e2_ids
        if not changed:
            break
    if stats is not None:
        # observability for the O(log² n) bound the algorithm buys —
        # scale fixtures assert round counts stay logarithmic on
        # adversarial (long-chain) graphs (tests/test_dedup_scale.py).
        stats["rounds"] = rounds
    # Fixpoint is a star forest: (u, root) with root < u, plus roots
    # themselves appearing only on the right. Components:
    members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
    comp = members.unionByName(roots).distinct()
    if vertices is not None:
        vcol = vertices.columns[0]
        singles = (
            vertices.select(F.col(vcol).alias("node"))
            .distinct()
            .join(comp, "node", "left_anti")
            .select("node", F.col("node").alias("component"))
        )
        comp = comp.unionByName(singles)
    return comp
