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
        "temporal_join_battery",
        "event_analytics_battery",
        "similarity_battery",
        "unigram_text_battery",
        "deterministic_split",
        "passage_dedup",
        "skew_key_diagnostics",
        "salted_skew_agg",
        "histogram_quantiles",
        "bpe_merge_table",
        "tfidf_cosine_pairs",
        "rollup_battery",
        "sampling_battery",
        "lexical_dedup_battery",
        "incremental_minhash_dedup",
        "cube_status_priority",
        "table_stats_profile",
        "bigram_lm_perplexity",
        "pq_battery",
        "sketch_stats_battery",
        "text_mining_battery",
        "graph_battery",
        "revenue_olap_battery",
        "cdc_battery",
        "set_prune_battery",
        # round 7 additions
        "winnowing_fingerprints",
        "bpe_encode_tokens",
        "semdedup_keep_list",
        "neardup_representatives",
        "pii_scan_redact",
        "training_pipeline_e2e",
        # round 8 additions
        "language_id",
        "epoch_shuffle_plan",
        "repetition_signals",
        "url_canonical_dedup",
        "c4_line_filter",
        "host_quality_rollup",
        "language_id_eval",
        "dedup_cluster_stats",
        "domain_gated_corpus",
        # round 9 additions (the sketch bisect rows + new operators)
        "sketch_probe_battery",
        "skew_salt_trim_battery",
        "dsir_importance_weights",
        "ccnet_ppl_buckets",
        "dup_span_extract",
        # round 9b: supervised NB quality filter family + fuzzy
        # decontamination
        "nb_quality_scores",
        "nb_quality_eval",
        "fuzzy_decontamination",
        "tokenizer_fertility",
        "lsh_tuning_eval",
        # round 11: the lexical bisect + the composited candidates row
        "banded_dedup_battery",
        "neardup_candidates_battery",
        # round 11 new operators
        "passage_chunking",
        "padding_waste_eval",
        "source_unigram_drift",
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


# ---------------------------------------------------------------------------
# Registry-wide unbounded-global-window guard (round-6 verdict ask #2).
# ---------------------------------------------------------------------------

_BOUNDED_NODES = (
    "TakeOrderedAndProjectExec",
    "WindowGroupLimitExec",
    "GlobalLimitExec",
    "LocalLimitExec",
    "CollectLimitExec",
)


def _walk_physical(node):
    """Yield every node of a physical plan, descending through AQE
    wrappers (AdaptiveSparkPlanExec / QueryStageExec are leaf nodes
    whose real subtree hangs off inputPlan()/plan())."""
    yield node
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        yield from _walk_physical(node.inputPlan())
        return
    if cls.endswith("QueryStageExec"):
        yield from _walk_physical(node.plan())
        return
    kids = node.children()
    for i in range(kids.length()):
        yield from _walk_physical(kids.apply(i))


def _is_global_spec(spec) -> bool:
    """True when a window's partition spec is empty OR consists only of
    foldable (literal) expressions — both mean every row lands in ONE
    partition. The bounded-input windows deliberately spell their spec
    as partitionBy(lit(0)) to silence WindowExec's unbounded-case
    warning; this predicate makes sure that spelling can never hide a
    genuinely unbounded global window from the guard."""
    if spec.isEmpty():
        return True
    for i in range(spec.length()):
        if not spec.apply(i).foldable():
            return False
    return True


def unbounded_global_windows(df) -> list:
    """Effectively-global WindowExec nodes (empty or all-literal
    partition spec) whose input subtree has NO k-bounding node
    (TakeOrderedAndProject / WindowGroupLimit / Limit). Such a window
    shuffles its ENTIRE input to one partition and sorts it on one
    task — the canonical 100TB cliff. InferWindowGroupLimit never
    rescues the empty-spec case: that rewrite fires only for windows
    WITH a partition spec."""
    root = df._jdf.queryExecution().executedPlan()
    bad = []
    for node in _walk_physical(root):
        if node.getClass().getSimpleName() != "WindowExec":
            continue
        if not _is_global_spec(node.partitionSpec()):
            continue
        kids = node.children()
        child = kids.apply(0)
        names = {n.getClass().getSimpleName() for n in _walk_physical(child)}
        if not names & set(_BOUNDED_NODES):
            bad.append(node.nodeName())
    return bad


def _capture_checkpoints(monkeypatch) -> list:
    """Patch DataFrame.localCheckpoint so every pre-checkpoint frame a
    query builds is captured for inspection. Round-10 verdict finding:
    ``localCheckpoint`` truncates the visible plan to a ``Scan
    ExistingRDD``, so ANY shape below the checkpoint (a global window,
    a cartesian, an unpartitioned sort) was invisible to the
    executed-plan guards. The captured frames still hold their full
    pre-truncation lineage, so the guard battery can walk them.
    Patched on the CONCRETE class: in PySpark 4 instances are
    ``pyspark.sql.classic.dataframe.DataFrame``, which overrides the
    abstract base's method, so a patch on ``pyspark.sql.DataFrame``
    never intercepts."""
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pre-4.0 layout
        from pyspark.sql import DataFrame

    captured: list = []
    orig = DataFrame.localCheckpoint

    def capturing(self, eager=True):
        captured.append(self)
        return orig(self, eager=eager)

    monkeypatch.setattr(DataFrame, "localCheckpoint", capturing)
    return captured


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_unbounded_global_window(spark, name, monkeypatch):
    """No registry query may ship an empty-partition-spec window over
    unbounded input. The sanctioned global-top-k shape is
    registry.ranked_topk (orderBy().limit(k) -> TakeOrderedAndProject,
    then row_number over the k survivors); bounded-by-construction
    inputs must make that boundedness visible in the plan (a Limit /
    WindowGroupLimit below). This guard exists because round 5 shipped
    three queries whose docstrings claimed WindowGroupLimit pushdown
    that the executed plans did not contain.

    The guard also walks every PRE-checkpoint frame the query builds
    (round-10 verdict: heaps_law_curve's lazy localCheckpoint hid an
    unbounded global row_number from the executed plan — the
    checkpointed subtree showed up as ``Scan ExistingRDD``)."""
    captured = _capture_checkpoints(monkeypatch)
    df = REGISTRY[name].fn(spark, SF)
    bad = unbounded_global_windows(df)
    assert not bad, f"{name}: unbounded global window(s): {bad}"
    for pre in captured:
        bad = unbounded_global_windows(pre)
        assert not bad, (
            f"{name}: unbounded global window(s) HIDDEN behind a "
            f"localCheckpoint: {bad}"
        )


def test_guard_sees_through_local_checkpoint(spark, monkeypatch):
    """Negative control for the checkpoint capture: a global
    sequence-number window buried under ``localCheckpoint(eager=False)``
    is invisible to the executed-plan walk (the round-10 blind spot)
    but MUST be caught via the captured pre-checkpoint frame."""
    from pyspark.sql import Window

    captured = _capture_checkpoints(monkeypatch)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    w = Window.orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey"))
    hidden = (
        li.withColumn("seq", F.row_number().over(w))
        .localCheckpoint(eager=False)
        .select("l_orderkey", "seq")
    )
    # the executed plan is truncated at the checkpoint: blind
    assert not unbounded_global_windows(hidden)
    # ...but the captured pre-checkpoint frame exposes the defect
    assert captured and any(
        unbounded_global_windows(pre) for pre in captured
    ), "capture missed the checkpoint-hidden global window"


def test_unbounded_global_window_guard_detects_bad_shape(spark):
    """Negative control for the guard. Caveat discovered while writing
    it: Spark 4.1's optimizer ALREADY rewrites ``filter(rnk <= k)``
    over an empty-spec row_number window into TakeOrderedAndProject
    below the window (so the round-5 top-k queries were bounded in the
    executed plan after all — just by the optimizer, not by the
    WindowGroupLimit rewrite their docstrings named). The guard's
    remaining job is the shapes the optimizer does NOT rescue: a
    global sequence-number assignment with no rank filter (below), a
    rank filter the rewrite can't see through, or a future regression
    that blocks the rewrite. ranked_topk makes the bound explicit in
    the query text instead of depending on the rewrite firing."""
    from pyspark.sql import Window

    from namegraph_collections_spark.queries.registry import ranked_topk

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    w = Window.orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey"))
    # no rank filter -> nothing bounds the window input: every row
    # shuffles to ONE partition for the global sequence numbering
    bad = li.withColumn("seq", F.row_number().over(w))
    assert unbounded_global_windows(bad), "guard missed the defect shape"
    good = ranked_topk(
        li, 25, F.col("l_extendedprice").desc(), F.col("l_orderkey")
    )
    assert not unbounded_global_windows(good)
    # the optimizer-rescued round-5 shape: bounded in the plan, so the
    # guard must accept it too (TakeOrderedAndProject appears below)
    rescued = (
        li.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 25)
    )
    assert not unbounded_global_windows(rescued)


def test_salted_agg_is_two_stage(spark):
    """The salted aggregate must actually plan two keyed stages —
    an exchange on (event_type, salt) feeding an exchange on
    event_type, each with its own partial/final HashAggregate pair.
    If an optimizer change collapses the salt stage, the query
    silently degrades back into the single-reducer-per-hot-key shape
    it exists to avoid."""
    df = REGISTRY["salted_skew_agg"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") >= 2
    assert plan.count("HashAggregate") >= 4
    # salt must appear in a partitioning, not just a projection
    assert any(
        "salt" in line
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
    )


def test_skew_diagnostics_topk_is_bounded(spark):
    plan = formatted_plan(REGISTRY["skew_key_diagnostics"].fn(spark, SF))
    assert "TakeOrderedAndProject" in plan
