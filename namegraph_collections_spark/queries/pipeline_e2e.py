"""End-to-end training-data pipeline funnel — the integration query
that chains the LLM-data stages a real corpus build runs, in their
standard order (C4/RefinedWeb/GPT-3 appendix conventions, all public):

  input → exact dedup → fuzzy-dedup representative → quality filter
        → decontamination (train-vs-eval n-gram leak) → split manifest

One row per stage with survivor count, total word mass, and a
``doc_id_sum`` membership fingerprint (the deterministic_split
convention) — so the value hash pins WHICH documents survived every
stage, not just how many; plus one row per (split) for the final
manifest.

Stage semantics (each reuses the registered component's definition —
fingerprints, MinHash clusters, representative choice, Gopher keep
flag, shingle leak join, bucket16 split are ALL the same code/SQL the
single-operator queries run):

- exact: keep the min-doc_id copy per md5(lower(trim(text))) group
  (`exact_dedup_groups`).
- fuzzy: keep each MinHash cluster's quality representative
  (`neardup_representatives`; representatives are always exact
  canonicals — identical copies tie on quality and break by doc_id).
- quality: the Gopher composite keep flag (`doc_quality_signals`).
- decontam: drop TRAIN-split docs sharing ≥ MIN_LEAK_SHINGLES distinct
  non-hot word trigrams with a TEST-split doc (the
  `decontamination_overlap` join, grouped by the train side, with the
  eval set defined by the SPLIT's test bucket range so the pipeline is
  self-consistent).
- split: the content-addressed 80/10/10 assignment
  (`deterministic_split`).

Plan shape: ONE per-document flag frame (four boolean columns via a
fingerprint window, two semi-join flags, one quality join), then two
aggregations — a conditional-sum funnel (no re-execution per stage)
and the per-split manifest. At 100 TB every stage input is the same
already-flowing scan; nothing is materialized per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from namegraph_collections_spark.queries.dedup import (
    HOT_SHINGLE_DF_CAP,
    _minhash_pairs,
    _shingles,
    _SHINGLES_SQL,
)
from namegraph_collections_spark.queries.dedup_select import (
    neardup_representatives,  # noqa: F401  (oracle parity; plan uses the _from seam)
    neardup_representatives_from,
)
from namegraph_collections_spark.queries.quality_signals import doc_quality_signals
from namegraph_collections_spark.queries.registry import REGISTRY, register, tbl
from namegraph_collections_spark.queries.training_data import (
    SPLIT_TEST_LO,
    SPLIT_VAL_LO,
    _BUCKET16_SQL,
    _bucket16,
)

_REPS_ORACLE = REGISTRY["neardup_representatives"].oracle
_QUALITY_ORACLE = REGISTRY["doc_quality_signals"].oracle

#: A train doc is contaminated when it shares at least this many
#: DISTINCT word trigrams with some eval-split doc. Real pipelines
#: threshold the leak (GPT-3 App. C uses 13-gram collisions; with
#: 3-grams over a small synthetic vocabulary, a single shared trigram
#: is noise — unthresholded, it disqualified every train doc).
MIN_LEAK_SHINGLES = 5

_SPLIT_CASE_SQL = (
    f"CASE WHEN {_BUCKET16_SQL.format(c='doc_id')} < {SPLIT_VAL_LO} THEN 'train'"
    f" WHEN {_BUCKET16_SQL.format(c='doc_id')} < {SPLIT_TEST_LO} THEN 'val'"
    " ELSE 'test' END"
)

_STAGE_AGG_SQL = """
      SELECT '{stage}' AS stage, '' AS detail,
             CAST(COUNT(*) FILTER (WHERE {cond}) AS BIGINT) AS n_docs,
             CAST(SUM(n_words) FILTER (WHERE {cond}) AS BIGINT) AS n_words_total,
             CAST(SUM(doc_id) FILTER (WHERE {cond}) AS BIGINT) AS doc_id_sum
      FROM flags
"""

_STAGES = [
    ("00_input", "TRUE"),
    ("01_exact_dedup", "p_exact"),
    ("02_fuzzy_rep", "p_exact AND p_rep"),
    ("03_quality", "p_exact AND p_rep AND p_quality"),
    ("04_decontam", "p_exact AND p_rep AND p_quality AND p_clean"),
]


@register(
    "training_pipeline_e2e",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id,
             MIN(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS canon
      FROM documents
    ),
    reps AS (SELECT rep_doc_id FROM ({_REPS_ORACLE})),
    quality AS (SELECT doc_id, n_words, keep FROM ({_QUALITY_ORACLE})),
    shingles_all AS ({_SHINGLES_SQL}),
    sh AS (
      SELECT doc_id, shingle,
             {_BUCKET16_SQL.format(c='doc_id')} >= {SPLIT_TEST_LO} AS is_eval
      FROM shingles_all
      WHERE shingle NOT IN (SELECT shingle FROM shingles_all
                            GROUP BY shingle HAVING COUNT(*) > {HOT_SHINGLE_DF_CAP})
    ),
    contaminated AS (
      SELECT tr.doc_id
      FROM sh t JOIN sh tr ON t.shingle = tr.shingle
      WHERE t.is_eval AND NOT tr.is_eval
      GROUP BY tr.doc_id
      HAVING COUNT(DISTINCT t.shingle) >= {MIN_LEAK_SHINGLES}
    ),
    flags AS (
      SELECT d.doc_id, q.n_words,
             d.doc_id = f.canon AS p_exact,
             r.rep_doc_id IS NOT NULL AS p_rep,
             q.keep AS p_quality,
             NOT ({_SPLIT_CASE_SQL.replace("doc_id", "d.doc_id")} = 'train'
                  AND c.doc_id IS NOT NULL) AS p_clean,
             {_SPLIT_CASE_SQL.replace("doc_id", "d.doc_id")} AS split
      FROM documents d
      JOIN fp f ON f.doc_id = d.doc_id
      JOIN quality q ON q.doc_id = d.doc_id
      LEFT JOIN reps r ON r.rep_doc_id = d.doc_id
      LEFT JOIN contaminated c ON c.doc_id = d.doc_id
    )
    {" UNION ALL ".join(_STAGE_AGG_SQL.format(stage=s, cond=c) for s, c in _STAGES)}
    UNION ALL
    SELECT '05_split' AS stage, split AS detail,
           CAST(COUNT(*) AS BIGINT), CAST(SUM(n_words) AS BIGINT),
           CAST(SUM(doc_id) AS BIGINT)
    FROM flags
    WHERE p_exact AND p_rep AND p_quality AND p_clean
    GROUP BY split
    """,
)
def training_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stage-by-stage pipeline funnel (module docstring): one flag
    frame, one conditional-sum funnel aggregation, one split manifest.
    """
    docs = tbl(spark, sf_dir, "documents")
    quality = doc_quality_signals(spark, sf_dir)
    reps = neardup_representatives_from(docs, _minhash_pairs(docs), quality)
    return training_pipeline_e2e_from(docs, reps, quality)


def training_pipeline_e2e_from(
    docs: DataFrame, reps: DataFrame, quality: DataFrame
) -> DataFrame:
    """The funnel over an ALREADY-BUILT representatives frame and
    quality signals — the sharing seam lexical_dedup_battery uses to
    feed its funnel leg from the battery's one bands build, one
    components closure, and one quality frame (the same `_from`
    pattern as the representatives leg; `reps` is passed post-closure
    because connected_components runs a driver-side convergence loop
    that must not execute twice). ``reps`` needs rep_doc_id;
    ``quality`` needs (doc_id, n_words, keep)."""
    w_fp = Window.partitionBy(F.md5(F.lower(F.trim(F.col("text")))))
    canon = docs.select(
        "doc_id", (F.col("doc_id") == F.min("doc_id").over(w_fp)).alias("p_exact")
    )
    reps = reps.select(
        F.col("rep_doc_id").alias("doc_id"), F.lit(True).alias("p_rep0")
    )
    quality = quality.select(
        "doc_id", "n_words", F.col("keep").alias("p_quality")
    )

    sh_all = _shingles(docs)
    hot = (
        sh_all.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > HOT_SHINGLE_DF_CAP)
        .select("shingle")
    )
    sh = sh_all.join(F.broadcast(hot), "shingle", "left_anti").withColumn(
        "is_eval", _bucket16(F.col("doc_id")) >= SPLIT_TEST_LO
    )
    contaminated = (
        sh.filter(F.col("is_eval"))
        .select("shingle")
        .join(
            sh.filter(~F.col("is_eval")).select("shingle", "doc_id"), "shingle"
        )
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_leak"))
        .filter(F.col("n_leak") >= MIN_LEAK_SHINGLES)
        .select("doc_id")
        .withColumn("p_contam0", F.lit(True))
    )

    b = _bucket16(F.col("doc_id"))
    split_col = (
        F.when(b < SPLIT_VAL_LO, F.lit("train"))
        .when(b < SPLIT_TEST_LO, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    flags = (
        docs.select("doc_id")
        .join(canon, "doc_id")
        .join(quality, "doc_id")
        .join(reps, "doc_id", "left")
        .join(contaminated, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            "p_exact",
            F.coalesce(F.col("p_rep0"), F.lit(False)).alias("p_rep"),
            "p_quality",
            (~((split_col == "train") & F.col("p_contam0").isNotNull())).alias("p_clean"),
            split_col.alias("split"),
        )
    )
    # The flag frame feeds two aggregations; checkpoint it once so the
    # funnel and the manifest don't each re-run the rep/shingle joins.
    flags = flags.localCheckpoint(eager=False)

    conds = {
        "00_input": F.lit(True),
        "01_exact_dedup": F.col("p_exact"),
        "02_fuzzy_rep": F.col("p_exact") & F.col("p_rep"),
        "03_quality": F.col("p_exact") & F.col("p_rep") & F.col("p_quality"),
        "04_decontam": F.col("p_exact")
        & F.col("p_rep")
        & F.col("p_quality")
        & F.col("p_clean"),
    }
    aggs = []
    for stage, cond in conds.items():
        aggs += [
            F.count(F.when(cond, 1)).alias(f"n__{stage}"),
            F.sum(F.when(cond, F.col("n_words"))).cast("long").alias(f"w__{stage}"),
            F.sum(F.when(cond, F.col("doc_id"))).cast("long").alias(f"s__{stage}"),
        ]
    wide = flags.agg(*aggs)
    stack_args = ", ".join(
        f"'{stage}', n__{stage}, w__{stage}, s__{stage}" for stage in conds
    )
    funnel = wide.selectExpr(
        f"stack({len(conds)}, {stack_args}) AS (stage, n_docs, n_words_total, doc_id_sum)"
    ).select("stage", F.lit("").alias("detail"), "n_docs", "n_words_total", "doc_id_sum")

    manifest = (
        flags.filter(conds["04_decontam"])
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words_total"),
            F.sum("doc_id").cast("long").alias("doc_id_sum"),
        )
        .select(
            F.lit("05_split").alias("stage"),
            F.col("split").alias("detail"),
            "n_docs",
            "n_words_total",
            "doc_id_sum",
        )
    )
    return funnel.unionByName(manifest)
