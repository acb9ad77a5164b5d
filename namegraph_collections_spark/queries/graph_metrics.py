"""Graph metrics over the near-dup candidate graph (registry 58+,
behind the driver window — locally parity-checked).

Triangle enumeration is the classic quality probe for near-dup
candidate generation: a triangle (a~b, b~c, a~c) is mutual evidence
the three documents form a genuine duplicate cluster, while a high
open-wedge rate (a~b, b~c, no a~c) signals LSH false positives.
``neardup_clusters`` unions candidates transitively; this query
measures how SUPPORTED that union is.

Algorithm: degree-ordered edge orientation (each edge points from its
lower-(degree, id) endpoint to the higher one) then a wedge self-join
closed against the edge set. Orientation is THE scale decision: a
plain edge-edge self-join fans out quadratically on hub nodes, while
orienting by degree bounds every node's out-degree at O(sqrt(m)) —
the MapReduce triangle-counting bound (Suri & Vassilvitskii, WWW'11)
— so the wedge join is skew-safe regardless of how hubby the
candidate graph gets. Three shuffles total: degrees, wedges, closing
equi-join (on the normalized pair, never an OR-join, which Spark
would plan as a nested loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.queries.registry import REGISTRY, register


# The embedding_neardup_pairs oracle, reused as a subquery: the
# candidate graph's definition stays in ONE place (dedup.py) and this
# oracle composes it, exactly like the Spark side calls the registered
# query function. Safe at import time because queries/__init__.py
# imports dedup before this module.
_PAIRS_ORACLE = REGISTRY["embedding_neardup_pairs"].oracle


@register(
    "neardup_triangles",
    oracle=f"""
    WITH pairs AS (SELECT vec_a, vec_b FROM ({_PAIRS_ORACLE})),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT vec_a AS node FROM pairs
        UNION ALL SELECT vec_b AS node FROM pairs
      ) GROUP BY node
    ),
    oriented AS (
      SELECT CASE WHEN (da.d, p.vec_a) < (db.d, p.vec_b) THEN p.vec_a ELSE p.vec_b END AS src,
             CASE WHEN (da.d, p.vec_a) < (db.d, p.vec_b) THEN p.vec_b ELSE p.vec_a END AS dst
      FROM pairs p
      JOIN deg da ON da.node = p.vec_a
      JOIN deg db ON db.node = p.vec_b
    ),
    wedges AS (
      SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
      FROM oriented e1 JOIN oriented e2
        ON e1.src = e2.src AND e1.dst < e2.dst
    ),
    tri AS (
      SELECT wg.u, wg.v, wg.w
      FROM wedges wg
      JOIN pairs p
        ON p.vec_a = LEAST(wg.v, wg.w) AND p.vec_b = GREATEST(wg.v, wg.w)
    )
    SELECT LEAST(u, v, w) AS t1,
           u + v + w - LEAST(u, v, w) - GREATEST(u, v, w) AS t2,
           GREATEST(u, v, w) AS t3
    FROM tri
    """,
)
def neardup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every triangle in the embedding near-dup candidate graph, as
    sorted (t1 < t2 < t3) id triples — each triangle emitted exactly
    once (only its minimum-(degree, id) vertex owns both out-edges, so
    exactly one wedge per triangle survives orientation).

    The candidate edge list is localCheckpointed before the triangle
    program references it FIVE times (degrees twice, orientation,
    both wedge sides via orientation, the closing join): without the
    cut, the multi-band LSH pipeline that produces the edges re-executes
    per reference (measured ~1.5x win, interleaved A/B — raw numbers
    in MEASUREMENTS.md). This is the OPPOSITE
    call from _jaccard_pairs' documented no-checkpoint decision, for
    the stated reason there: that intermediate is a corpus-sized
    shingle stream (~3x the text bytes), while this one is the COMPACT
    candidate output — 42k edges at sf0.1, ~duplication-rate-sized at
    100 TB — which is exactly what you do want to materialize.
    """
    pairs = (
        REGISTRY["embedding_neardup_pairs"].fn(spark, sf_dir)
        .select("vec_a", "vec_b")
        .localCheckpoint(eager=True)
    )
    return triangles(pairs)


def triangles(pairs: DataFrame) -> DataFrame:
    """Degree-ordered triangle enumeration over DataFrame[vec_a, vec_b]
    (undirected, vec_a < vec_b, distinct). Returns sorted id triples
    (t1 < t2 < t3), one row per triangle."""
    deg = (
        pairs.select(F.col("vec_a").alias("node"))
        .unionByName(pairs.select(F.col("vec_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("node").alias("vec_a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("vec_b"), F.col("d").alias("db"))
    a_first = F.struct(F.col("da"), F.col("vec_a")) < F.struct(F.col("db"), F.col("vec_b"))
    oriented = (
        pairs.join(da, "vec_a")
        .join(db, "vec_b")
        .select(
            F.when(a_first, F.col("vec_a")).otherwise(F.col("vec_b")).alias("src"),
            F.when(a_first, F.col("vec_b")).otherwise(F.col("vec_a")).alias("dst"),
        )
    )
    e1 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    wedges = e1.join(e2, "u").filter(F.col("v") < F.col("w"))
    tri = wedges.join(
        pairs,
        (F.col("vec_a") == F.least(F.col("v"), F.col("w")))
        & (F.col("vec_b") == F.greatest(F.col("v"), F.col("w"))),
    )
    t1 = F.least("u", "v", "w")
    t3 = F.greatest("u", "v", "w")
    return tri.select(
        t1.alias("t1"),
        (F.col("u") + F.col("v") + F.col("w") - t1 - t3).alias("t2"),
        t3.alias("t3"),
    )
