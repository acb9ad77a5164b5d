"""Context-window preparation operators (round 11): the two layout
decisions a training/RAG pipeline makes BETWEEN cleaning and
tokenization —

- ``passage_chunking``: overlapping fixed-size window chunking of each
  document's word stream (the retrieval-passage / pretraining-sample
  cut), emitting per-chunk boundaries and a content hash.
- ``padding_waste_eval``: the padding-efficiency comparison behind
  length-bucketed ("sorted") batching — per (length-bucket, batch)
  padding waste for a content-addressed batch assignment, with an
  unbucketed baseline under the same total batch count, so the output
  QUANTIFIES what bucketing saves instead of asserting it.

Registry conventions throughout: every sampling/assignment decision is
the shared ``bucket16`` md5 rule (queries/training_data.py:51), every
ratio is exact-integer micro-units, chunk identity is md5 of the exact
joined words — so the DuckDB oracles reproduce each row bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.functions.det_round import micro_spark, micro_sql
from namegraph_collections_spark.queries.registry import register, spread, tbl
from namegraph_collections_spark.queries.training_data import _bucket16, _BUCKET16_SQL

#: Chunk window (words) and stride — 16-word overlap, the classic
#: retrieval-passage setting (window > stride so no word is orphaned
#: at a boundary).
CHUNK_WORDS = 64
CHUNK_STRIDE = 48


@register(
    "passage_chunking",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(lower(text), ' ') AS words,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n
      FROM documents
    ),
    c AS (
      SELECT doc_id, words, n, CAST(i AS BIGINT) AS chunk_id,
             CAST(1 + i * {CHUNK_STRIDE} AS BIGINT) AS start_word
      FROM d, unnest(range(0, 1 + (greatest(0, n - {CHUNK_WORDS})
                                   + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE}))
             AS u(i)
    )
    SELECT doc_id, chunk_id, start_word,
           CAST(least(start_word + {CHUNK_WORDS} - 1, n) AS BIGINT) AS end_word,
           CAST(least(start_word + {CHUNK_WORDS} - 1, n) - start_word + 1
                AS BIGINT) AS n_words,
           md5(array_to_string(list_slice(words, CAST(start_word AS INT),
                 CAST(least(start_word + {CHUNK_WORDS} - 1, n) AS INT)), ' '))
             AS chunk_hash
    FROM c
    """,
)
def passage_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-window chunking: each document's word stream
    cut into {CHUNK_WORDS}-word passages every {CHUNK_STRIDE} words
    (so consecutive chunks overlap by {CHUNK_WORDS - CHUNK_STRIDE}),
    the last chunk clipped at the document end; per chunk the word
    boundaries and the md5 of the exact passage text — the
    content-addressed chunk id a retrieval index or a pretraining
    sampler keys on (and the handle chunk-level dedup joins against).

    Scale shape: map-only — split, a bounded ``sequence`` explode
    (one row per chunk, ~n_words/{CHUNK_STRIDE} per doc, LINEAR in
    tokens), per-row slice+hash; no shuffle anywhere, so the operator
    is embarrassingly partition-parallel at any corpus size.
    """
    d = spread(tbl(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id",
        F.expr("split(lower(text), ' ')").alias("words"),
        F.expr("CAST(size(split(lower(text), ' ')) AS BIGINT)").alias("n"),
    )
    c = d.select(
        "doc_id",
        "words",
        "n",
        F.explode(
            F.expr(
                f"sequence(0L, (greatest(0L, n - {CHUNK_WORDS})"
                f" + {CHUNK_STRIDE} - 1) div {CHUNK_STRIDE})"
            )
        ).alias("chunk_id"),
    ).withColumn("start_word", F.expr(f"1 + chunk_id * {CHUNK_STRIDE}"))
    return c.selectExpr(
        "doc_id",
        "CAST(chunk_id AS BIGINT) AS chunk_id",
        "CAST(start_word AS BIGINT) AS start_word",
        f"CAST(least(start_word + {CHUNK_WORDS} - 1, n) AS BIGINT) AS end_word",
        f"CAST(least(start_word + {CHUNK_WORDS} - 1, n) - start_word + 1"
        " AS BIGINT) AS n_words",
        f"md5(array_join(slice(words, CAST(start_word AS INT),"
        f" CAST(least(start_word + {CHUNK_WORDS} - 1, n) - start_word + 1"
        " AS INT)), ' ')) AS chunk_hash",
    )


#: Power-of-two word-length bucket thresholds (bucket = index of the
#: first threshold >= n_words; longer docs land in the last bucket).
LEN_BUCKET_THRESHOLDS = (16, 32, 64, 128, 256, 512, 1024)

#: Content-addressed batches per length bucket; the unbucketed
#: baseline uses len(thresholds)+1 times as many so BOTH layouts have
#: the same expected batch population and the waste numbers compare
#: like for like.
BATCHES_PER_BUCKET = 16

_BUCKET_CASE = (
    "CASE "
    + " ".join(
        f"WHEN n_words <= {t} THEN {i}"
        for i, t in enumerate(LEN_BUCKET_THRESHOLDS)
    )
    + f" ELSE {len(LEN_BUCKET_THRESHOLDS)} END"
)

_N_BUCKETS = len(LEN_BUCKET_THRESHOLDS) + 1


@register(
    "padding_waste_eval",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_words,
             {_BUCKET16_SQL.format(c="doc_id")} AS h
      FROM documents
    ),
    assigned AS (
      SELECT CAST({_BUCKET_CASE} AS BIGINT) AS bucket,
             CAST(h % {BATCHES_PER_BUCKET} AS BIGINT) AS batch, n_words
      FROM d
      UNION ALL
      SELECT CAST(-1 AS BIGINT) AS bucket,
             CAST(h % {BATCHES_PER_BUCKET * _N_BUCKETS} AS BIGINT) AS batch,
             n_words
      FROM d
    )
    SELECT bucket, batch, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(n_words) AS BIGINT) AS max_words,
           CAST(SUM(n_words) AS BIGINT) AS sum_words,
           CAST(MAX(n_words) * COUNT(*) - SUM(n_words) AS BIGINT) AS waste,
           CAST({micro_sql("SUM(n_words)", "MAX(n_words) * COUNT(*)")} AS BIGINT)
             AS eff_micro
    FROM assigned GROUP BY bucket, batch
    """,
)
def padding_waste_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste evaluation of length-bucketed batching: documents
    are bucketed by word length at power-of-two thresholds
    {LEN_BUCKET_THRESHOLDS}, assigned to one of {BATCHES_PER_BUCKET}
    content-addressed batches per bucket (the shared bucket16 md5
    rule — deterministic, shuffle-free, infinitely rerunnable), and
    each (bucket, batch) reports the padding a max-length-padded
    batch would burn: ``waste = max*count - sum`` tokens and the
    packing efficiency in micro-units. A second pass with bucket = -1
    assigns the SAME documents to {BATCHES_PER_BUCKET * _N_BUCKETS}
    batches with no length bucketing — the baseline whose higher
    waste is exactly what sorted batching saves. This is the
    measurement behind every "bucket by sequence length before
    batching" recipe.

    Scale shape: one scan, two map-side-combined aggregations at
    (bucket, batch) grain — output bounded at
    {_N_BUCKETS * BATCHES_PER_BUCKET * 2} rows forever, broadcast
    class downstream.
    """
    d = spread(tbl(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id",
        F.expr("CAST(size(split(lower(text), ' ')) AS BIGINT)").alias("n_words"),
        _bucket16(F.col("doc_id")).alias("h"),
    )
    bucketed = d.select(
        F.expr(f"CAST({_BUCKET_CASE} AS BIGINT)").alias("bucket"),
        F.expr(f"CAST(h % {BATCHES_PER_BUCKET} AS BIGINT)").alias("batch"),
        "n_words",
    )
    baseline = d.select(
        F.lit(-1).cast("long").alias("bucket"),
        F.expr(f"CAST(h % {BATCHES_PER_BUCKET * _N_BUCKETS} AS BIGINT)").alias(
            "batch"
        ),
        "n_words",
    )
    return (
        bucketed.unionByName(baseline)
        .groupBy("bucket", "batch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max("n_words").cast("long").alias("max_words"),
            F.sum("n_words").cast("long").alias("sum_words"),
        )
        .selectExpr(
            "bucket",
            "batch",
            "n_docs",
            "max_words",
            "sum_words",
            "CAST(max_words * n_docs - sum_words AS BIGINT) AS waste",
            f"CAST({micro_spark('sum_words', 'max_words * n_docs')} AS BIGINT)"
            " AS eff_micro",
        )
    )
