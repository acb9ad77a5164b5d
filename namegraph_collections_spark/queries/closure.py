"""Transitive-closure query (SURVEY §2.3 J14 ★) checked against DuckDB's
WITH RECURSIVE — the one genuinely iterative algorithm in the engine."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.operators.closure import transitive_closure
from namegraph_collections_spark.queries.registry import register, tbl


def _hierarchy_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic DAG: customer → nation → region, node ids namespaced
    so levels can't collide (mirrors QID subclass_of edges)."""
    customer = tbl(spark, sf_dir, "customer")
    nation = tbl(spark, sf_dir, "nation")
    c_edges = customer.select(
        F.concat(F.lit("c:"), F.col("c_custkey")).alias("src"),
        F.concat(F.lit("n:"), F.col("c_nationkey")).alias("dst"),
    )
    n_edges = nation.select(
        F.concat(F.lit("n:"), F.col("n_nationkey")).alias("src"),
        F.concat(F.lit("r:"), F.col("n_regionkey")).alias("dst"),
    )
    return c_edges.unionByName(n_edges)


@register(
    "transitive_closure_reachability",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT 'c:' || c_custkey AS src, 'n:' || c_nationkey AS dst FROM customer
      UNION ALL
      SELECT 'n:' || n_nationkey AS src, 'r:' || n_regionkey AS dst FROM nation
    ), reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src, dst FROM reach
    """,
)
def transitive_closure_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reachable(node, ancestor) over a customer→nation→region DAG.

    Reference analogue: subclass-of reachability DFS
    (create_collections.py:545-606) — precomputed here as a closure
    table via semi-naive iterated self-joins with lineage
    checkpointing (operators/closure.py), validated against DuckDB's
    WITH RECURSIVE.
    """
    return transitive_closure(_hierarchy_edges(spark, sf_dir))
