"""Duplicated-span extraction — the span-level (sub-document) dedup
stage of Lee et al. 2021, "Deduplicating Training Data Makes Language
Models Better" (ExactSubstr), re-expressed for a shuffle engine.

The paper builds a corpus-wide suffix array and reports every maximal
substring (>= 50 tokens) that appears twice anywhere. A suffix array
is a single-machine construction; the distributed equivalent used
here is the standard shingle-anchor approximation: every overlapping
K-word shingle is fingerprinted, a shingle occurring >= 2 times
anywhere in the corpus marks its K-word window as duplicated, and a
document's overlapping/adjacent duplicated windows are merged into
maximal SPANS (gaps-and-islands over shingle start positions — with
fixed-width shingles, a new island starts exactly when the next
duplicated start is more than K positions after the previous one).
Every duplicated substring of length >= K contains a duplicated
shingle, so spans cover a superset of the paper's >= K-token
duplicates; sub-K duplicates are invisible (the same K-grain
resolution trade as passage_dedup's fixed windows, but at
OVERLAPPING grain, so span boundaries land on words, not on passage
edges).

Scale shape: one scan + explode of (doc_id, pos, fp) where fp is a
60-bit md5 fingerprint (the shuffle never carries gram text), one
partial-aggregated fingerprint count, one fp-keyed join back, and a
per-document window over only the DUPLICATED positions (a small
fraction of the corpus; partitioned by doc_id, never global). This is
the profile of every production span-dedup implementation (the
suffix-array step of the paper is replaced by the fingerprint
group-by, which is what its own distributed reimplementations do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.queries.registry import register, spread, tbl

#: Shingle width in words — the span resolution. The paper's 50-token
#: threshold assumes BPE tokens; the synthetic corpus's documents are
#: ~40-60 words, so K=8 keeps every rule observable at test scale
#: (production: set to the dedup policy's minimum span length).
SPAN_K = 8

# 60-bit md5-prefix fingerprint — same portable-hash family as
# training_data._bucket16 (identical hex digests on both engines;
# 60 bits keeps the collision odds negligible at corpus scale while
# staying inside a signed BIGINT). The DuckDB mirror is spelled
# inline in the oracle ('0x' || substr(md5(..), 1, 15)).
_FP_SPARK = "CAST(conv(substr(md5(g), 1, 15), 16, 10) AS BIGINT)"


@register(
    "dup_span_extract",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(replace(text, chr(10), ' '), ' '),
                         x -> x <> '') AS words
      FROM documents
    ),
    flat AS MATERIALIZED (
      SELECT doc_id, CAST(s.pos AS BIGINT) AS pos,
             CAST('0x' || substr(md5(s.g), 1, 15) AS BIGINT) AS fp
      FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(1, greatest(len(words) - {SPAN_K} + 2, 1)),
                 i -> struct_pack(
                   pos := i,
                   g := array_to_string(
                     list_slice(words, i, i + {SPAN_K} - 1), ' ')
                 ))) AS s
        FROM w
      )
    ),
    dupfp AS (
      SELECT fp FROM flat GROUP BY fp HAVING COUNT(*) >= 2
    ),
    d AS (
      SELECT f.doc_id, f.pos FROM flat f JOIN dupfp USING (fp)
    ),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       <= {SPAN_K} THEN 0 ELSE 1 END AS brk
      FROM d
    ),
    sp AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS span_id
      FROM isl
    )
    SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
           MIN(pos) AS start_word,
           MAX(pos) + {SPAN_K} - 1 AS end_word,
           MAX(pos) + {SPAN_K} - MIN(pos) AS span_words,
           CAST(COUNT(*) AS BIGINT) AS n_shingles
    FROM sp GROUP BY doc_id, span_id
    """,
)
def dup_span_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated spans per document (module docstring): every
    {SPAN_K}-word shingle occurring >= 2 times corpus-wide marks its
    window, and overlapping/adjacent marked windows merge into one
    span row — (doc_id, span_id, start_word, end_word, span_words,
    n_shingles), 1-indexed inclusive word positions. Downstream
    policy cuts the spans out (the paper's remediation) or drops
    span-heavy documents; both are plain joins on this table.
    """
    w = spread(tbl(spark, sf_dir, "documents"), "doc_id").selectExpr(
        "doc_id",
        "filter(split(replace(text, chr(10), ' '), ' '), x -> x != '') AS words",
    )
    # IF-guard, not bare sequence: Spark's sequence(1, n) DESCENDS for
    # n < 1 (sequence(1, 0) = [1, 0]), so short documents would grow
    # phantom shingles — the repetition_signals gram-window lesson.
    flat = (
        w.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"IF(size(words) >= {SPAN_K},"
                    f" sequence(1, size(words) - {SPAN_K} + 1),"
                    " array_repeat(1, 0))"
                )
            ).alias("pos"),
            F.col("words"),
        )
        .selectExpr(
            "doc_id",
            "CAST(pos AS BIGINT) AS pos",
            f"array_join(slice(words, pos, {SPAN_K}), ' ') AS g",
        )
        .selectExpr("doc_id", "pos", f"{_FP_SPARK} AS fp")
    ).localCheckpoint(eager=False)  # referenced twice (count + probe);
    # ReusedExchange does not dedup the repeated scan+explode subtree
    dupfp = flat.groupBy("fp").agg(F.count(F.lit(1)).alias("c")).filter(
        "c >= 2"
    ).select("fp")
    d = flat.join(dupfp, "fp").select("doc_id", "pos")
    isl = d.selectExpr(
        "doc_id",
        "pos",
        f"CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)"
        f" <= {SPAN_K} THEN 0 ELSE 1 END AS brk",
    )
    sp = isl.selectExpr(
        "doc_id",
        "pos",
        "SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos"
        " ROWS UNBOUNDED PRECEDING) AS span_id",
    )
    return sp.groupBy("doc_id", "span_id").agg(
        F.min("pos").alias("start_word"),
        (F.max("pos") + SPAN_K - 1).alias("end_word"),
        (F.max("pos") + SPAN_K - F.min("pos")).alias("span_words"),
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
    ).select(
        "doc_id",
        F.col("span_id").cast("long").alias("span_id"),
        "start_word",
        "end_word",
        "span_words",
        "n_shingles",
    )
