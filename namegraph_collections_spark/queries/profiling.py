"""Table statistics profiling — the ANALYZE-TABLE equivalent as a
query (registry, behind the driver window; locally parity-checked).

At 100 TB, column statistics (null fractions, distinct counts,
min/max bounds) are what join ordering, broadcast decisions, and
partition-pruning sanity checks run on; computing them as ONE
aggregation pass over the table — never one pass per column — is the
difference between a profile you run nightly and one you can't
afford. The exact distinct counts here use Spark's multi-distinct
Expand (one shuffle carrying one tagged row per (input row, distinct
column)); a production profile at 100 TB would swap them for
approx_count_distinct/HLL one-for-one — kept exact here so the DuckDB
oracle can value-match bit-for-bit (the same exact-vs-sketch
substitution note as the KMV sketch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.queries.registry import register, tbl

#: (column, kind) pairs profiled on `orders`. Numeric columns report
#: min/max as DECIMAL(18,2) (the sources are int64 keys and
#: 2-decimal-valued prices, so the cast is exact), string columns as
#: VARCHAR — no raw DOUBLE and no cross-type value formatting
#: (engine-specific) ever enters the hash.
PROFILE_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_totalprice", "num"),
    ("o_orderstatus", "str"),
    ("o_orderpriority", "str"),
]


def _oracle() -> str:
    aggs = ["COUNT(*) AS n_rows"]
    for c, kind in PROFILE_COLS:
        aggs.append(f"COUNT(*) - COUNT({c}) AS {c}_nulls")
        aggs.append(f"COUNT(DISTINCT {c}) AS {c}_distinct")
        if kind == "num":
            aggs.append(f"CAST(MIN({c}) AS DECIMAL(18,2)) AS {c}_min_num")
            aggs.append(f"CAST(MAX({c}) AS DECIMAL(18,2)) AS {c}_max_num")
        else:
            aggs.append(f"MIN({c}) AS {c}_min_str")
            aggs.append(f"MAX({c}) AS {c}_max_str")
    rows = []
    for c, kind in PROFILE_COLS:
        mn_num = f"{c}_min_num" if kind == "num" else "CAST(NULL AS DECIMAL(18,2))"
        mx_num = f"{c}_max_num" if kind == "num" else "CAST(NULL AS DECIMAL(18,2))"
        mn_str = f"{c}_min_str" if kind == "str" else "CAST(NULL AS VARCHAR)"
        mx_str = f"{c}_max_str" if kind == "str" else "CAST(NULL AS VARCHAR)"
        rows.append(
            f"SELECT '{c}' AS col, n_rows, {c}_nulls AS n_nulls,"
            f" {c}_distinct AS n_distinct, {mn_num} AS min_num,"
            f" {mx_num} AS max_num, {mn_str} AS min_str, {mx_str} AS max_str"
            " FROM s"
        )
    return (
        "WITH s AS (SELECT " + ", ".join(aggs) + " FROM orders)\n    "
        + "\n    UNION ALL ".join(rows)
    )


@register("table_stats_profile", oracle=_oracle())
def table_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column statistics of `orders` — row count, null count,
    exact distinct count, typed min/max — computed in ONE aggregation
    over the table and unpivoted to one row per column.

    Scale shape: a single global aggregate (partial-aggregated; the
    multi-distinct Expand is the only fan-out, one extra row copy per
    profiled distinct column) followed by a constant-size unpivot of
    the 1-row result. No per-column scans, no driver-side loop.
    """
    orders = tbl(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in PROFILE_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"{c}_nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}_distinct"))
        if kind == "num":
            aggs.append(F.min(c).cast("decimal(18,2)").alias(f"{c}_min_num"))
            aggs.append(F.max(c).cast("decimal(18,2)").alias(f"{c}_max_num"))
        else:
            aggs.append(F.min(c).alias(f"{c}_min_str"))
            aggs.append(F.max(c).alias(f"{c}_max_str"))
    s = orders.agg(*aggs)
    null_d = F.lit(None).cast("decimal(18,2)")
    null_s = F.lit(None).cast("string")
    parts = []
    for c, kind in PROFILE_COLS:
        parts.append(
            s.select(
                F.lit(c).alias("col"),
                "n_rows",
                F.col(f"{c}_nulls").alias("n_nulls"),
                F.col(f"{c}_distinct").alias("n_distinct"),
                (F.col(f"{c}_min_num") if kind == "num" else null_d).alias("min_num"),
                (F.col(f"{c}_max_num") if kind == "num" else null_d).alias("max_num"),
                (F.col(f"{c}_min_str") if kind == "str" else null_s).alias("min_str"),
                (F.col(f"{c}_max_str") if kind == "str" else null_s).alias("max_str"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
