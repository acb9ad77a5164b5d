"""Exact grouped percentiles + outlier trimming (registry 58+, behind
the driver window — locally parity-checked).

Corpus-cleaning use-case: "drop documents outside the per-source
[p10, p99] length band" needs percentiles that are EXACT and
engine-independent. Both ``percentile_approx`` (Spark) and
``quantile_disc`` (DuckDB) are out: the first is approximate by
contract, and the two engines' discrete-quantile index conventions
differ at the edges. Instead the percentile is defined once,
explicitly — the value at row ``ceil(q*n)`` of the (value, id)-sorted
group — and BOTH engines compute that same window program, so the
driver's value hash matches bit for bit.

Scale shape: one shuffle on source for the window pass (row_number +
count over the same partition spec share a single sort+exchange),
then a partial-agg rollup per source. The trim decision reuses the
window columns — no second scan, no join back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from namegraph_collections_spark.queries.registry import register, tbl

#: (label, quantile) pairs reported per source.
PCTS = [("p50", "0.50"), ("p90", "0.90"), ("p99", "0.99")]

#: Trim band: docs with length outside [p10, p99] are outliers.
TRIM_LO, TRIM_HI = "0.10", "0.99"


@register(
    "length_percentile_trim",
    oracle=f"""
    WITH ranked AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    )
    SELECT source,
           {",".join(
               f"MAX(CASE WHEN rn = CAST(ceil({q} * n) AS BIGINT) THEN n_chars END)"
               f" AS {label}"
               for label, q in PCTS
           )},
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (
             WHERE rn >= CAST(ceil({TRIM_LO} * n) AS BIGINT)
               AND rn <= CAST(ceil({TRIM_HI} * n) AS BIGINT)
           ) AS n_kept
    FROM ranked
    GROUP BY source
    """,
)
def length_percentile_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact length percentiles (p50/p90/p99) plus the
    document count surviving a [p10, p99] trim — the corpus-cleaning
    summary a 100 TB pipeline computes before dropping outliers.

    The rank-based trim predicate (``rn`` within the quantile index
    band) is equivalent to the value-based band but needs no self-join
    of percentiles back onto documents — the decision happens inside
    the same window pass that computed them.
    """
    docs = tbl(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    w = Window.partitionBy("source")
    ranked = docs.select(
        "source",
        "n_chars",
        F.row_number().over(w.orderBy("n_chars", "doc_id")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    pct_aggs = [
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(float(q)) * F.col("n")).cast("long"),
                F.col("n_chars"),
            )
        ).alias(label)
        for label, q in PCTS
    ]
    kept = (
        F.col("rn") >= F.ceil(F.lit(float(TRIM_LO)) * F.col("n")).cast("long")
    ) & (F.col("rn") <= F.ceil(F.lit(float(TRIM_HI)) * F.col("n")).cast("long"))
    return ranked.groupBy("source").agg(
        *pct_aggs,
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(kept, F.lit(1))).alias("n_kept"),
    )
