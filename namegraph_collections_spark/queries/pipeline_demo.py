"""Merge-aggregate semantics from the reference pipeline (SURVEY §2.4
A9 ★, §2.6 U3), demonstrated on the synthetic star schema so the
DuckDB oracle can value-check them.

The reference's merge_collections (create_merged.py:549-576) reduces
pairwise in file order; the engine makes every order-dependent choice
explicit (min-key wins, sorted arrays, min_by for first-non-null) —
SURVEY §4's "stateful-looking dedup with encounter order" treatment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.queries.registry import register, tbl


@register(
    "merge_collections_agg",
    oracle="""
    SELECT o_custkey,
      MIN(o_orderkey) AS merged_id,
      COUNT(*) AS n_members,
      array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
      MAX(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS rank_cents,
      min_by(o_orderpriority, o_orderkey) AS first_priority
    FROM orders
    GROUP BY o_custkey
    """,
)
def merge_collections_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge-collections reduce as one groupBy (A9 ★).

    Reference semantics (create_merged.py:549-576): min-numeric id
    wins; member set union; counts summed; rank = max; first-non-null
    by a *defined* encounter order (min o_orderkey here — the engine's
    deterministic replacement for file order).
    """
    orders = tbl(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.min("o_orderkey").alias("merged_id"),
        F.count(F.lit(1)).alias("n_members"),
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("statuses"),
        F.max(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("rank_cents"),
        F.min_by("o_orderpriority", "o_orderkey").alias("first_priority"),
    )


@register(
    "two_level_merge_arrays",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             list_sort(list(DISTINCT o_orderpriority)) AS priorities,
             COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT c_nationkey,
      MIN(c_custkey) AS merged_id,
      array_to_string(list_sort(list_distinct(flatten(list(priorities)))), ',') AS merged_priorities,
      CAST(SUM(n_orders) AS BIGINT) AS total_orders,
      COUNT(*) AS n_collections
    FROM per_cust JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def two_level_merge_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level merge with array flatten + set-union (A9/U3 ★).

    Reference analogue: type set-union on merge
    (create_merged.py:561 — list(set(t1+t2))) and member concat →
    dedup. flatten(collect_list(array)) → array_distinct → array_sort
    keeps it JVM-side and order-insensitive.
    """
    orders = tbl(spark, sf_dir, "orders")
    customer = tbl(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(
        F.array_sort(F.collect_set("o_orderpriority")).alias("priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    j = per_cust.join(customer, per_cust.o_custkey == customer.c_custkey)
    return j.groupBy("c_nationkey").agg(
        F.min("c_custkey").alias("merged_id"),
        F.array_join(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("priorities")))), ","
        ).alias("merged_priorities"),
        F.sum("n_orders").alias("total_orders"),
        F.count(F.lit(1)).alias("n_collections"),
    )
