"""SemDeDup-style semantic deduplication over the `embeddings` table
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication" — public method; no counterpart in the
reference, whose dedup is name-frequency based, create_merged.py).

The published pipeline: k-means cluster the embedding corpus, then
WITHIN each cluster compute pairwise cosines in a fixed order and drop
any point that has an earlier point above the similarity threshold —
a one-shot triangular max, not an iterative greedy (a dropped point
still blocks later points, exactly as in the paper's sim-matrix
formulation). Our fixed order is ``vec_id`` ascending (the paper
orders by distance-to-centroid; any fixed total order gives the same
dedup guarantee, and vec_id keeps the oracle exact).

Clustering REUSES ivf_topk's deterministic k-means verbatim — one
clustering definition across the ANN index and the dedup pass
(``similarity.kmeans_lists`` / ``similarity.KMEANS_CTES_SQL``), so a
user's IVF lists and their semantic-dedup decisions can share one
codebook build at scale.

Scale shape: the within-cluster pairwise is the paper's own cost
model — SemDeDup keeps cluster size roughly constant by growing k
with n (their web-scale runs use k in the tens of thousands). Here k
is the test-scale {KMEANS_K}; the blocker side is additionally capped
at the first {SEMDEDUP_CAP} members of each cluster (deterministic
vec_id order, the embedding_neardup_pairs bucket-cap convention), so
pair volume is ≤ cap × n regardless of cluster skew — linear, never
quadratic, in corpus size. Pairs are generated as ID PAIRS from a
slim (cluster, vec_id, rnk) table; the 64-float vectors are joined
back by id only for surviving pairs (two hash joins), never carried
through the self-join fan-out.

Determinism: cosines use the shared floor-form rounding
(functions/det_round.py); MAX over identically-rounded doubles and the
count-vs-zero keep flag are engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from namegraph_collections_spark.functions.det_round import round6_det, round6_det_sql
from namegraph_collections_spark.queries.registry import register, spread, tbl
from namegraph_collections_spark.queries.similarity import (
    DIM,
    KMEANS_CTES_SQL,
    _DOT_SQL,
    _dot,
    kmeans_lists,
)

#: Duplicate threshold (cosine). The synthetic embeddings are
#: near-orthogonal, so the bar matches NEARDUP_COSINE in queries/dedup
#: — low enough that clusters actually contain duplicates to drop.
SEMDEDUP_TAU = 0.2

#: Per-cluster blocker cap (first N members by vec_id may block later
#: members). Bounds pair fan-out at cap × n independent of cluster
#: skew; at the driver scales every cluster is far under it, so the
#: output equals uncapped SemDeDup. The production-scale lever is
#: k ∝ n (constant cluster size), not the cap — the cap is the
#: backstop against a degenerate clustering.
SEMDEDUP_CAP = 128

_COS_PAIR_SQL = round6_det_sql(
    f"{_DOT_SQL.format(dim=DIM, a='ne.embedding', b='nb.embedding')}"
    f" / (ne.nrm * nb.nrm)"
)


@register(
    "semdedup_keep_list",
    oracle=f"""
    WITH {KMEANS_CTES_SQL},
    ranked AS (
      SELECT vec_id, cluster,
             ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY vec_id) AS rnk
      FROM a2
    ),
    prs AS (
      SELECT l.cluster, l.vec_id, b.vec_id AS b_id
      FROM ranked l JOIN ranked b
        ON b.cluster = l.cluster AND b.rnk <= {SEMDEDUP_CAP} AND b.vec_id < l.vec_id
    ),
    norms AS (
      SELECT vec_id, embedding,
             sqrt({_DOT_SQL.format(dim=DIM, a="embedding", b="embedding")}) AS nrm
      FROM embeddings
    ),
    scored AS (
      SELECT p.cluster, p.vec_id, {_COS_PAIR_SQL} AS cosine
      FROM prs p
      JOIN norms ne ON ne.vec_id = p.vec_id
      JOIN norms nb ON nb.vec_id = p.b_id
    ),
    agg AS (
      SELECT cluster, vec_id,
             CAST(COUNT(*) FILTER (WHERE cosine >= {SEMDEDUP_TAU}) AS BIGINT) AS n_dups,
             MAX(cosine) AS max_earlier_cosine
      FROM scored GROUP BY cluster, vec_id
    )
    SELECT r.vec_id, r.cluster,
           COALESCE(a.n_dups, 0) AS n_dups,
           a.max_earlier_cosine,
           COALESCE(a.n_dups, 0) = 0 AS keep
    FROM ranked r LEFT JOIN agg a ON a.cluster = r.cluster AND a.vec_id = r.vec_id
    """,
)
def semdedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep/drop decision per vector (module docstring):
    k-means clusters (shared with ivf_topk), within-cluster earlier-
    neighbor cosine max, drop if any earlier neighbor ≥ {SEMDEDUP_TAU}.
    """
    emb = spread(tbl(spark, sf_dir, "embeddings"), "vec_id")
    assigned, _ = kmeans_lists(emb)
    return semdedup_from(emb, assigned)


def semdedup_from(emb: DataFrame, assigned: DataFrame) -> DataFrame:
    """SemDeDup over an ALREADY-BUILT cluster assignment — the sharing
    seam that lets similarity_battery feed IVF search and this pass
    from ONE `kmeans_lists` build (the `recall_eval_from` precedent).
    """
    slim = assigned.select("vec_id", "cluster")
    w = Window.partitionBy("cluster").orderBy("vec_id")
    # persist: `ranked` is referenced three times (blocker side, later
    # side, final left join) and each reference would otherwise replay
    # the whole k-means subtree — ReusedExchange does not dedup the
    # repeated subtrees (the measured battery finding). Three ints per
    # vector. Lifecycle: corpus-grain, so an eager localCheckpoint was
    # A/B'd as the hygiene alternative and measured SLOWER (3.11s vs
    # 2.88s on semdedup_keep_list, round 13) — the checkpoint
    # materializes the window output before the blocker filter can
    # narrow it. The entry stays in the CacheManager until session end
    # or eviction (MEMORY_AND_DISK is evictable); bench runs clear it
    # via clearCache between queries.
    ranked = slim.withColumn("rnk", F.row_number().over(w)).persist()

    blockers = ranked.filter(F.col("rnk") <= SEMDEDUP_CAP).select(
        F.col("cluster").alias("b_cluster"), F.col("vec_id").alias("b_id")
    )
    # id-only pair generation: two longs per candidate ride the
    # self-join, never the vectors
    prs = ranked.join(
        blockers,
        (F.col("b_cluster") == F.col("cluster")) & (F.col("b_id") < F.col("vec_id")),
    ).select("cluster", "vec_id", "b_id")

    norms = emb.select(
        "vec_id",
        "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    scored = (
        prs.join(
            norms.select(
                F.col("vec_id").alias("_l_id"),
                F.col("embedding").alias("l_emb"),
                F.col("nrm").alias("l_nrm"),
            ),
            F.col("_l_id") == F.col("vec_id"),
        )
        .join(
            norms.select(
                F.col("vec_id").alias("_b_id"),
                F.col("embedding").alias("b_emb"),
                F.col("nrm").alias("b_nrm"),
            ),
            F.col("_b_id") == F.col("b_id"),
        )
        .select(
            "cluster",
            "vec_id",
            round6_det(
                _dot(F.col("l_emb"), F.col("b_emb")) / (F.col("l_nrm") * F.col("b_nrm"))
            ).alias("cosine"),
        )
    )
    agg = scored.groupBy("cluster", "vec_id").agg(
        F.count(F.when(F.col("cosine") >= SEMDEDUP_TAU, 1)).alias("n_dups"),
        F.max("cosine").alias("max_earlier_cosine"),
    )
    return (
        ranked.join(agg, ["cluster", "vec_id"], "left")
        .select(
            "vec_id",
            "cluster",
            F.coalesce(F.col("n_dups"), F.lit(0)).cast("long").alias("n_dups"),
            "max_earlier_cosine",
            (F.coalesce(F.col("n_dups"), F.lit(0)) == 0).alias("keep"),
        )
    )
