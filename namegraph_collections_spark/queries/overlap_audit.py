"""Corpus overlap audits — the n-gram containment diagnostics a
training-data pipeline reads alongside its dedup reports:

- ``ngram_novelty_audit``: per held-out document, what fraction of
  its word trigrams NEVER appears in the train split — the
  memorization-risk / novelty signal (a test doc with near-zero novel
  n-grams is effectively train data; the doc-level complement of
  ``decontamination_overlap``'s pair report).
- ``source_overlap_matrix``: directional shingle containment between
  every pair of sources — |shingles(a) ∩ shingles(b)| / |shingles(a)|
  — the "who copies whom" matrix that decides which sources are
  redundant in a mixture.

Scale notes: both audits work at DISTINCT-shingle grain, which is
what keeps them safe without the pair-query's hot-shingle df cap —
an existence (semi/inner) join between distinct shingle sets fans out
by set multiplicity, not document frequency: the novelty join is 1:1
per (doc-shingle, vocab-entry), and the source matrix's per-shingle
fan-out is bounded by n_sources², a mixture-level constant (the
operator is for the bounded top-level source set; a per-domain
version at web scale would group domains first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.functions.det_round import micro_spark, micro_sql
from namegraph_collections_spark.queries.dedup import _SHINGLES_SQL, _shingles
from namegraph_collections_spark.queries.registry import register, tbl
from namegraph_collections_spark.queries.training_data import (
    TEST_BUCKET_CUTOFF,
    _bucket16,
)

#: DuckDB mirror of the content-addressed test-split rule (the
#: bucket16 convention shared with decontamination/deterministic
#: split oracles).
_IS_TEST_SQL = (
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT)"
    f" < {TEST_BUCKET_CUTOFF}"
)


@register(
    "ngram_novelty_audit",
    oracle=f"""
    WITH sh AS MATERIALIZED (
      SELECT doc_id, shingle, {_IS_TEST_SQL} AS is_test
      FROM ({_SHINGLES_SQL})
    ),
    train_vocab AS (
      SELECT DISTINCT shingle FROM sh WHERE NOT is_test
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN v.shingle IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_seen,
           CAST({micro_sql(
               "SUM(CASE WHEN v.shingle IS NULL THEN 1 ELSE 0 END)",
               "COUNT(*)")} AS BIGINT) AS novelty_micro
    FROM (SELECT doc_id, shingle FROM sh WHERE is_test) t
    LEFT JOIN train_vocab v USING (shingle)
    GROUP BY t.doc_id
    """,
)
def ngram_novelty_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per held-out document: distinct-trigram count, how many of them
    exist anywhere in the train split, and the novelty ratio in
    round-half-up micro-units. novelty ~ 0 marks a doc the model will
    have effectively seen (the Lee et al. dedup-eval concern);
    novelty ~ 1e6 marks genuinely fresh text.

    Scale shape: exact "appears in train" semantics WITHOUT the
    pair-query's df cap, because the probe is an existence join
    between DISTINCT sets: one shingle-grain shuffle builds the train
    vocabulary, one left join probes each held-out doc's distinct
    shingles against it (1:1 per key — a stop phrase costs one row,
    not df² pairs), one doc-grain rollup. The split flag is the
    engine's standard content-addressed bucket16 rule, so the audit
    is reproducible on any engine.
    """
    docs = tbl(spark, sf_dir, "documents")
    sh = _shingles(docs).withColumn(
        "is_test", _bucket16(F.col("doc_id")) < TEST_BUCKET_CUTOFF
    )
    train_vocab = sh.filter(~F.col("is_test")).select("shingle").distinct()
    test = sh.filter(F.col("is_test")).select("doc_id", "shingle")
    return (
        test.join(
            train_vocab.withColumn("seen", F.lit(1)), "shingle", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.expr("CASE WHEN seen IS NOT NULL THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_seen"),
            F.sum(F.expr("CASE WHEN seen IS NULL THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("_novel"),
        )
        .selectExpr(
            "doc_id",
            "n_shingles",
            "n_seen",
            f"CAST({micro_spark('_novel', 'n_shingles')} AS BIGINT)"
            " AS novelty_micro",
        )
    )


@register(
    "source_overlap_matrix",
    oracle=f"""
    WITH sv AS MATERIALIZED (
      SELECT DISTINCT d.source, s.shingle
      FROM ({_SHINGLES_SQL}) s JOIN documents d USING (doc_id)
    ),
    sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_shingles
              FROM sv GROUP BY source),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM sv a JOIN sv b ON a.shingle = b.shingle AND a.source <> b.source
      GROUP BY a.source, b.source
    )
    SELECT p.src_a, p.src_b, p.n_shared, sa.n_shingles AS n_a,
           CAST({micro_sql("p.n_shared", "sa.n_shingles")} AS BIGINT)
             AS containment_micro
    FROM pairs p JOIN sizes sa ON sa.source = p.src_a
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional shingle containment per source pair: the fraction
    of src_a's distinct trigrams that also occur in src_b (asymmetric
    — a small source fully contained in a big one reads 1e6 one way
    and small the other). The mixture-planning read: rows near 1e6
    mark redundant sources the mix can drop or downweight.

    Scale shape: distinct (source, shingle) is one shingle-grain
    aggregation; the self-join meets on the shingle key and fans out
    by sources-per-shingle² <= n_sources² — a mixture constant, NOT a
    document frequency (the reason no df cap is needed here); sizes
    attach by broadcast at source grain. Emits only pairs that share
    at least one shingle — zero rows are absent, not fabricated.
    """
    docs = tbl(spark, sf_dir, "documents")
    sv = (
        _shingles(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", "shingle")
        .distinct()
        # two consumers: the sizes aggregate and both sides of the
        # pair meet — one shingle build for all three
        .localCheckpoint(eager=False)
    )
    sizes = sv.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles")
    )
    a = sv.alias("a")
    b = sv.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") != F.col("b.source")),
        )
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    return pairs.join(
        F.broadcast(sizes.withColumnRenamed("source", "src_a")), "src_a"
    ).selectExpr(
        "src_a",
        "src_b",
        "n_shared",
        "n_shingles AS n_a",
        f"CAST({micro_spark('n_shared', 'n_shingles')} AS BIGINT)"
        " AS containment_micro",
    )
