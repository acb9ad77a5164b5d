"""Physical-plan regression tests (SURVEY §4): the properties that
make the engine scale — filter/projection pushdown into parquet scans,
broadcast joins for dimension tables, semi-join allowlists, and
JVM-only hot paths — asserted on the actual executed plans so a
refactor can't silently regress them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from namegraph_collections_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def formatted_plan(df) -> str:
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def test_filter_and_projection_pushdown(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    plan = formatted_plan(q)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40" in plan
    # column pruning: the scan reads 2 columns, not the full schema
    assert "l_comment" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_regional_revenue_broadcasts_dimensions(spark):
    plan = formatted_plan(REGISTRY["regional_revenue"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan  # region/nation are dimension-sized


def test_semi_and_anti_join_physical(spark):
    plan = formatted_plan(REGISTRY["customer_key_set_algebra"].fn(spark, SF))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


@pytest.mark.parametrize(
    "name",
    [
        "pricing_summary",
        "regional_revenue",
        "topk_orders_per_customer",
        "bm25_search",
        "minhash_lsh_candidates",
        "simhash_neardup_candidates",
        "session_window_rollup",
        "exact_dedup_groups",
        "hourly_event_rollup",
        "customer_key_set_algebra",
        "text_features",
        "multifield_bm25_variants",
        "search_ltr_rescore",
        "related_collections_precompute",
        "bloom_pruned_semi_join",
        "grouped_deterministic_sample",
        "fuzzy_blocked_pairs",
        "bipartite_pagerank",
        "rollup_regional_revenue",
        "status_priority_pivot",
        "length_percentile_trim",
        "incremental_hourly_rollup",
        "funnel_conversion",
        "cohort_retention",
        "event_transition_matrix",
        "string_ops_battery",
        "ann_recall_eval",
        "cdc_driven_rollup",
        "cms_heavy_hitters",
        "bigram_pmi",
        "weighted_sample_topk",
    ],
)
def test_no_python_in_relational_hot_paths(spark, name):
    """Relational operators must stay JVM-side: no row-at-a-time or
    Arrow Python eval nodes in their plans (UDFs are reserved for the
    genuine library boundaries — normalize/tokenize/keccak/codecs)."""
    plan = formatted_plan(REGISTRY[name].fn(spark, SF))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_partial_aggregation_present(spark):
    """groupBy aggs must partial-aggregate map-side (two HashAggregate
    phases) so the shuffle carries combined state, not raw rows."""
    plan = formatted_plan(REGISTRY["pricing_summary"].fn(spark, SF))
    assert plan.count("HashAggregate") >= 2


def test_whole_stage_codegen(spark):
    """After materialization the AQE final plan must show codegen'd
    spans ('*(n)' operator prefixes) — the agg pipeline runs compiled,
    not interpreted."""
    df = REGISTRY["pricing_summary"].fn(spark, SF)
    df.collect()  # materialize THIS QueryExecution so AQE finalizes
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "*(1)" in plan


def test_segment_metrics_lake_roundtrip_join_is_shuffle_free(spark):
    """The driver-checked segment_order_metrics query routes through
    the lake sinks; its bucketed o_custkey join must plan as a
    SortMergeJoin with NO Exchange on either input (the agg above it
    still shuffles on c_mktsegment, so assert on the join subtree)."""
    df = REGISTRY["segment_order_metrics"].fn(spark, SF)
    plan = formatted_plan(df)
    assert "SortMergeJoin" in plan
    # no exchange may feed the join: bucket scans are pre-partitioned
    assert "Exchange hashpartitioning(o_custkey" not in plan
    assert "Exchange hashpartitioning(c_custkey" not in plan
    assert df.count() > 0


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Bucketing both sides on the join key pre-partitions the data so
    the sort-merge join needs NO Exchange — the co-located-join shape
    for repeated large-large joins at scale (SURVEY §4)."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    (orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
     .option("path", str(tmp_path / "orders_b")).saveAsTable("orders_b"))
    (customer.withColumnRenamed("c_custkey", "o_custkey")
     .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
     .option("path", str(tmp_path / "customer_b")).saveAsTable("customer_b"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
        plan = formatted_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_kmv_bottom_k_gets_window_group_limit(spark):
    """The KMV bottom-k rank must compile to WindowGroupLimit
    (Partial below the exchange): mappers then ship <= k rows per
    source instead of the whole distinct-hash stream. Any non-rank
    window added to the same projection silently blocks this rewrite
    (that is how the regression happened the first time)."""
    df = REGISTRY["kmv_distinct_sketch"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final
