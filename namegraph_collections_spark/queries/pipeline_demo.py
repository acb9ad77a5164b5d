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
    "merge_collections_two_level",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
        MIN(o_orderkey) AS merged_id,
        COUNT(*) AS n_members,
        list_sort(list(DISTINCT o_orderstatus)) AS statuses,
        list_sort(list(DISTINCT o_orderpriority)) AS priorities,
        MAX(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS rank_cents,
        min_by(o_orderpriority, o_orderkey) AS first_priority
      FROM orders
      GROUP BY o_custkey
    )
    SELECT c_nationkey,
      MIN(c_custkey) AS merged_id,
      array_to_string(list_sort(list_distinct(flatten(list(statuses)))), ',') AS merged_statuses,
      array_to_string(list_sort(list_distinct(flatten(list(priorities)))), ',') AS merged_priorities,
      CAST(SUM(n_members) AS BIGINT) AS total_orders,
      COUNT(*) AS n_collections,
      MAX(rank_cents) AS max_rank_cents,
      min_by(first_priority, o_custkey) AS first_priority
    FROM per_cust JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def merge_collections_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge-collections reduce, applied at two levels (A9 ★, U3).

    Reference semantics (create_merged.py:549-576): min-numeric id
    wins; member/type set union (create_merged.py:561 —
    list(set(t1+t2))); counts summed; rank = max; first-non-null by a
    *defined* encounter order (min key — the engine's deterministic
    replacement for file order). Level 1 merges orders per customer;
    level 2 merges those collections per nation via
    flatten(collect_list(array)) → array_distinct → array_sort — the
    concat→dedup treatment kept JVM-side and order-insensitive, which
    is how a pairwise file-order reduce becomes ONE shuffle per level
    at cluster scale instead of a sequential fold.
    """
    orders = tbl(spark, sf_dir, "orders")
    customer = tbl(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(
        F.min("o_orderkey").alias("merged_id_1"),
        F.count(F.lit(1)).alias("n_members"),
        F.array_sort(F.collect_set("o_orderstatus")).alias("statuses"),
        F.array_sort(F.collect_set("o_orderpriority")).alias("priorities"),
        F.max(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("rank_cents"),
        F.min_by("o_orderpriority", "o_orderkey").alias("first_priority"),
    )
    j = per_cust.join(customer, per_cust.o_custkey == customer.c_custkey)
    return j.groupBy("c_nationkey").agg(
        F.min("c_custkey").alias("merged_id"),
        F.array_join(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("statuses")))), ","
        ).alias("merged_statuses"),
        F.array_join(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("priorities")))), ","
        ).alias("merged_priorities"),
        F.sum("n_members").alias("total_orders"),
        F.count(F.lit(1)).alias("n_collections"),
        F.max("rank_cents").alias("max_rank_cents"),
        F.min_by("first_priority", "o_custkey").alias("first_priority"),
    )
