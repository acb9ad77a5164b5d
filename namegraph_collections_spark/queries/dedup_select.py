"""Representative selection for near-duplicate clusters — the
keep-WHICH-one decision a dedup pipeline actually ships.

``neardup_clusters`` answers "which docs are the same"; this query
answers "which copy survives": for every MinHash-LSH connected
component it keeps the highest-QUALITY member (Gopher composite keep
flag first, then word count, then doc_id as the total-order tie-break)
— the standard pretraining-pipeline policy of resolving duplicate
groups toward the best-quality copy instead of an arbitrary one
(RefinedWeb / Penedo et al. 2023 keep one representative per exact
and fuzzy cluster; no counterpart in the reference, whose dedup is
name-frequency based).

Composition: the component closure is `operators.components`
(large-star/small-star) over the shared `_minhash_pairs` candidates,
and the quality columns are `doc_quality_signals` — both reused
unchanged, so this query's oracle embeds the quality oracle verbatim
(the battery construction rule; importing the quality module first
makes its registered SQL available here).

Scale shape: components is O(log² n) shuffle rounds on the candidate
edges; the quality join is doc_id-keyed; the representative pick is a
per-cluster top-1 window over cluster_size rows (bounded by the
largest cluster — the same key the closure already shuffled on, so
AQE can reuse co-location). One row out per cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from namegraph_collections_spark.queries.dedup import (
    _MINHASH_PAIRS_SQL,
    _SHINGLES_SQL,
    _minhash_pairs,
)
from namegraph_collections_spark.queries.quality_signals import doc_quality_signals
from namegraph_collections_spark.queries.registry import REGISTRY, register, tbl

_QUALITY_ORACLE = REGISTRY["doc_quality_signals"].oracle


@register(
    "neardup_representatives",
    oracle=f"""
    WITH RECURSIVE shingles AS ({_SHINGLES_SQL}),
    {_MINHASH_PAIRS_SQL},
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(u, v) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS (SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u),
    quality AS (
      SELECT doc_id, n_words, keep FROM ({_QUALITY_ORACLE})
    ),
    members AS (
      SELECT c.cluster_id, c.doc_id, q.n_words, q.keep,
             ROW_NUMBER() OVER (
               PARTITION BY c.cluster_id
               ORDER BY q.keep DESC, q.n_words DESC, c.doc_id ASC
             ) AS rn
      FROM comp c JOIN quality q USING (doc_id)
    )
    SELECT cluster_id,
           CAST(COUNT(*) AS BIGINT) AS cluster_size,
           CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS n_quality_keep,
           MAX(CASE WHEN rn = 1 THEN doc_id END) AS rep_doc_id,
           MAX(CASE WHEN rn = 1 THEN n_words END) AS rep_n_words,
           MAX(CASE WHEN rn = 1 THEN keep END) AS rep_keep,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
    FROM members
    GROUP BY cluster_id
    """,
)
def neardup_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One surviving doc per near-dup cluster, chosen by quality
    (module docstring): keep flag DESC, n_words DESC, doc_id ASC.
    """
    docs = tbl(spark, sf_dir, "documents")
    return neardup_representatives_from(
        docs,
        _minhash_pairs(docs),
        doc_quality_signals(spark, sf_dir),
    )


def neardup_representatives_from(
    docs: DataFrame, pairs: DataFrame, quality: DataFrame
) -> DataFrame:
    """Representative selection over ALREADY-BUILT candidate pairs and
    quality signals — the sharing seam lexical_dedup_battery uses to
    feed this leg and the incremental probe from one bands build."""
    from namegraph_collections_spark.operators.components import connected_components

    comp = connected_components(pairs, vertices=docs.select("doc_id")).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    quality = quality.select("doc_id", "n_words", "keep")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("keep").desc(), F.col("n_words").desc(), F.col("doc_id").asc()
    )
    members = comp.join(quality, "doc_id").withColumn("rn", F.row_number().over(w))
    return members.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.count(F.when(F.col("keep"), 1)).alias("n_quality_keep"),
        F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("rep_doc_id"),
        F.max(F.when(F.col("rn") == 1, F.col("n_words"))).alias("rep_n_words"),
        F.max(F.when(F.col("rn") == 1, F.col("keep"))).alias("rep_keep"),
        (F.count(F.lit(1)) - 1).alias("n_dropped"),
    )
