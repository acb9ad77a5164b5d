"""Core relational operators (SURVEY.md §2.2–§2.6) over the synthetic tables.

Each query demonstrates one join/agg/window/set-op family the reference
implements by hand (RocksDB lookups, sorted-file group-adjacent,
two-pass dedup); here they are declarative DataFrame plans so Catalyst
does pushdown, broadcast selection, and AQE re-planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from namegraph_collections_spark.queries.registry import events_tbl, keyed_spread, register, tbl


def _dec(c, scale: int = 2):
    return F.col(c).cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# Aggregation family (A1/A3/A7/A11): grouped sums/means/medians with filter
# pushdown. Reference analogue: streaming group-adjacent over sorted CSV
# (create_collections.py:515-542) + member metrics (create_merged.py:966-977).
# ---------------------------------------------------------------------------
@register(
    "pricing_summary",
    oracle="""
    SELECT
      l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        AS sum_disc_price,
      ((CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 1000000 AS BIGINT) + COUNT(*) // 2)
         // COUNT(*)) / 1000000.0 AS avg_qty,
      ((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 1000000 AS BIGINT) + COUNT(*) // 2)
         // COUNT(*)) / 1000000.0 AS avg_price,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style grouped aggregation with predicate pushdown.

    Covers SURVEY §2.4 A1/A7/A11 semantics (grouped counts, exact-sum
    means). The shipdate filter reaches the parquet scan as a
    PushedFilter; sums run through DECIMAL so the DuckDB oracle hashes
    identically.
    """
    li = tbl(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(18,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(_dec("l_extendedprice") * (one - _dec("l_discount"))).cast("double").alias("sum_disc_price"),
        # Means in exact integer micro-units (text_analysis.py convention):
        # DECIMAL-sum / COUNT can land exactly on a 6-decimal half
        # (13911.3/320-class), where engines' ROUND half-way rules differ.
        (
            F.expr(
                "(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 1000000 AS BIGINT)"
                " + COUNT(1) div 2) div COUNT(1)"
            )
            / F.lit(1000000.0)
        ).alias("avg_qty"),
        (
            F.expr(
                "(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 1000000 AS BIGINT)"
                " + COUNT(1) div 2) div COUNT(1)"
            )
            / F.lit(1000000.0)
        ).alias("avg_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# Join family J1/J2/J9 (equi joins, broadcast dims). Reference analogue:
# RocksDB db-lookup joins (create_collections.py:41-73, 352-393).
# ---------------------------------------------------------------------------
@register(
    "regional_revenue",
    oracle="""
    SELECT n_name,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        AS revenue,
      COUNT(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style star join: big fact ⋈ broadcast dims.

    Covers SURVEY §2.3 J1/J2/J9. region/nation/supplier are broadcast
    (small dims); customer⋈orders⋈lineitem shuffle on their keys.
    The reference does this with RocksDB point lookups per row
    (create_collections.py:352-393); declaratively Catalyst picks
    broadcast-hash for every dim.
    """
    customer = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders")
    lineitem = tbl(spark, sf_dir, "lineitem")
    supplier = tbl(spark, sf_dir, "supplier")
    nation = tbl(spark, sf_dir, "nation")
    region = tbl(spark, sf_dir, "region")
    one = F.lit(1).cast("decimal(18,2)")
    joined = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
    )
    return joined.groupBy("n_name").agg(
        F.sum(_dec("l_extendedprice") * (one - _dec("l_discount"))).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Semi / anti joins + set ops (S5/F5 allowlist filter; J13 archive sweep;
# U1-U4 union/except) — one tagged query so every family keeps a
# driver-visible value check inside the 50-query window.
# ---------------------------------------------------------------------------
@register(
    "customer_key_set_algebra",
    oracle="""
    SELECT 'semi' AS op, c_custkey, c_name, CAST(NULL AS VARCHAR) AS c_mktsegment
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    UNION ALL
    SELECT 'anti' AS op, c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    UNION ALL
    SELECT 'setop' AS op, c_custkey, CAST(NULL AS VARCHAR) AS c_name,
           CAST(NULL AS VARCHAR) AS c_mktsegment
    FROM (
      (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
       UNION
       SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      EXCEPT
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    )
    """,
)
def customer_key_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join + anti-join + union/except in one tagged result
    (SURVEY §2.1 S5, §2.2 F5, §2.3 J13, §2.6 U1-U4).

    - ``semi``: LEFT SEMI join — the allowlist-filter idiom: keep rows
      whose key is in an allowlist (reference: in-RAM set membership,
      create_collections.py:160-188; here a broadcast semi-join, which
      scales past RAM).
    - ``anti``: LEFT ANTI join — the archive-sweep idiom: ES ids not
      covered by the current input get archived (update_es.py:306-311).
      The right side is filtered (urgent orders only) so the anti-join
      is non-vacuous at every scale factor.
    - ``setop``: UNION-distinct then EXCEPT (merged stream = categories
      ∪ lists, create_merged.py:624-706; unknown articles = input −
      validated, scripts/functions.py:221-226).
    """
    customer = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    null_str = F.lit(None).cast("string")
    semi = (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_semi")
        .select(F.lit("semi").alias("op"), "c_custkey", "c_name", null_str.alias("c_mktsegment"))
    )
    anti = (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_anti")
        .select(F.lit("anti").alias("op"), "c_custkey", "c_name", "c_mktsegment")
    )
    auto = customer.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("c_custkey")
    )
    setop = (
        auto.union(building)
        .distinct()
        .exceptAll(low.distinct())
        .select(
            F.lit("setop").alias("op"),
            "c_custkey",
            null_str.alias("c_name"),
            null_str.alias("c_mktsegment"),
        )
    )
    return semi.unionByName(anti).unionByName(setop)


# ---------------------------------------------------------------------------
# J4: lookup with fallback — two left joins + coalesce.
# ---------------------------------------------------------------------------
@register(
    "fallback_coalesce_join",
    oracle="""
    WITH primary_map AS (
      SELECT c_custkey, 'P:' || c_name AS resolved FROM customer WHERE c_custkey % 3 <> 0
    ), fallback_map AS (
      SELECT c_custkey, 'F:' || c_mktsegment AS resolved FROM customer
    )
    SELECT o.o_orderkey,
           COALESCE(p.resolved, f.resolved) AS resolved_name
    FROM orders o
    LEFT JOIN primary_map p ON o.o_custkey = p.c_custkey
    LEFT JOIN fallback_map f ON o.o_custkey = f.c_custkey
    WHERE COALESCE(p.resolved, f.resolved) IS NOT NULL
    """,
)
def fallback_coalesce_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-then-fallback lookup (SURVEY §2.3 J4 ★).

    Reference analogue: member title → QID via db1, falling back to
    wikimapper on miss, dropping rows that miss both
    (create_collections.py:671-676). Expressed as two left joins +
    COALESCE + null filter; both lookup sides broadcast when small.
    """
    customer = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders")
    primary = customer.filter(F.col("c_custkey") % 3 != 0).select(
        F.col("c_custkey").alias("p_key"), F.concat(F.lit("P:"), F.col("c_name")).alias("p_resolved")
    )
    fallback = customer.select(
        F.col("c_custkey").alias("f_key"), F.concat(F.lit("F:"), F.col("c_mktsegment")).alias("f_resolved")
    )
    return (
        orders.join(F.broadcast(primary), orders.o_custkey == primary.p_key, "left")
        .join(F.broadcast(fallback), orders.o_custkey == fallback.f_key, "left")
        .withColumn("resolved_name", F.coalesce("p_resolved", "f_resolved"))
        .filter(F.col("resolved_name").isNotNull())
        .select("o_orderkey", "resolved_name")
    )


# ---------------------------------------------------------------------------
# A4 ★: ordered dedup — first occurrence wins under an explicit sort order.
# ---------------------------------------------------------------------------
@register(
    "ordered_dedup_lineitems",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
      FROM lineitem
    ) t WHERE rn = 1
    """,
)
def ordered_dedup_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first-under-sort-order dedup (SURVEY §2.4 A4 ★).

    Reference analogue: uniq_members keeps the first occurrence in
    rank-descending order (create_merged.py:365-370, 553-555). The
    Spark idiom is ROW_NUMBER over an explicit total order (price
    desc, linenumber asc tiebreak) = 1 — order-dependence made
    deterministic.

    keyed_spread: round 4's bench regression (0.99s→1.56s, plan
    unchanged) attributed to the regenerated testdata arriving as ONE
    parquet row group — the WindowGroupLimit partial then sorts the
    whole table in a single task. See registry.keyed_spread for the
    measurements; with a parallel scan it is a no-op.
    """
    li = keyed_spread(tbl(spark, sf_dir, "lineitem"), "l_orderkey")
    w = Window.partitionBy("l_orderkey").orderBy(F.col("l_extendedprice").desc(), F.col("l_linenumber").asc())
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


# ---------------------------------------------------------------------------
# W2/W4 ★: top-k per group.
# ---------------------------------------------------------------------------
@register(
    "topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rnk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      FROM orders
    ) t WHERE rnk <= 3
    """,
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group via ranked window (SURVEY §2.5 W2/W4 ★).

    Reference analogue: members sorted by log2(rank+1)/max(len,10)
    then sliced top10/top25 (create_merged.py:478-480, 962-963).

    keyed_spread for the same reason as ordered_dedup_lineitems: the
    rank-limit partial otherwise sorts the single-split scan in one
    task (measured 0.77s → 0.60s at sf0.1).
    """
    orders = keyed_spread(tbl(spark, sf_dir, "orders"), "o_custkey")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


# ---------------------------------------------------------------------------
# A7 ★: mean/median metrics floored at MIN_VALUE.
# ---------------------------------------------------------------------------
@register(
    "segment_order_metrics",
    oracle="""
    SELECT c_mktsegment,
      COUNT(*) AS n_orders,
      ROUND(GREATEST(
        ((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 1000000 AS BIGINT) + COUNT(*) // 2)
           // COUNT(*)) / 1000000.0, 1e-8), 6)
        AS price_mean,
      ROUND(GREATEST(MEDIAN(o_totalprice), 1e-8), 6) AS price_median,
      ((SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) * 1000000 + COUNT(*) // 2)
         // COUNT(*)) / 1000000.0
        AS finished_ratio
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def segment_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean + exact median + ratio metrics (SURVEY §2.4 A7 ★) — with
    the inputs round-tripped through the LAKE SINKS, so the driver's
    value hash also certifies the storage layout (S7 writer family).

    Reference analogue: members_rank_mean/median floored at 1e-8 and
    valid/nonavailable ratios (create_merged.py:966-977, MIN_VALUE
    :41). Exact MEDIAN (not percentile_approx) for oracle parity.

    Lake round-trip: orders is written as Hive-partitioned parquet
    (partitioned by o_orderpriority, sorted by o_custkey within
    files) and read back; both join sides are then written as
    8-bucket tables on the customer key and joined from storage with
    a merge hint — bucketing makes the sort-merge join plan with NO
    Exchange on either side (pre-shuffled co-location, the layout a
    100 TB deployment pays for once at write). The oracle is the
    same aggregate over the ORIGINAL tables: round-trip changes
    nothing or the row goes red.
    """
    import os

    from namegraph_collections_spark.sinks import (
        write_bucketed_table,
        write_partitioned_parquet,
    )

    # per-session-unique path + table names: concurrent sessions
    # (bench alongside pytest, CI shards) must never overwrite each
    # other's lake mid-read
    sf_tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    app_tag = spark.sparkContext.applicationId.replace("-", "_")
    base = f"/tmp/ngcs_lake/{app_tag}/{sf_tag}"
    orders_tbl_name = f"ngcs_orders_bkt_{sf_tag.replace('.', '_')}_{app_tag}"
    customer_tbl_name = f"ngcs_customer_bkt_{sf_tag.replace('.', '_')}_{app_tag}"
    orders = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority"
    )
    write_partitioned_parquet(
        orders, f"{base}/orders_part", ["o_orderpriority"], sort_by=["o_custkey"]
    )
    orders_rt = spark.read.parquet(f"{base}/orders_part")
    write_bucketed_table(
        orders_rt,
        orders_tbl_name,
        f"{base}/orders_bkt",
        ["o_custkey"],
        8,
        sort_by=["o_custkey"],
    )
    customer = tbl(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    write_bucketed_table(
        customer,
        customer_tbl_name,
        f"{base}/customer_bkt",
        ["c_custkey"],
        8,
        sort_by=["c_custkey"],
    )
    o_b = spark.table(orders_tbl_name)
    c_b = spark.table(customer_tbl_name)
    # merge hint: pin the sort-merge strategy so the bucketed layout
    # (not a size-based broadcast) carries the join — the no-Exchange
    # plan is asserted in tests/test_plans.py and visible in PLANS.md.
    j = o_b.join(c_b.hint("merge"), o_b.o_custkey == c_b.c_custkey)
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        # Mean/ratio in exact integer micro-units before the (now no-op-
        # deterministic) round: the DECIMAL-sum/COUNT quotient can land
        # exactly on a 6-decimal half where engine ROUND rules differ.
        F.round(
            F.greatest(
                F.expr(
                    "(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 1000000 AS BIGINT)"
                    " + COUNT(1) div 2) div COUNT(1)"
                )
                / F.lit(1000000.0),
                F.lit(1e-8),
            ),
            6,
        ).alias("price_mean"),
        F.round(F.greatest(F.median("o_totalprice"), F.lit(1e-8)), 6).alias("price_median"),
        (
            F.expr(
                "(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) * 1000000"
                " + COUNT(1) div 2) div COUNT(1)"
            )
            / F.lit(1000000.0)
        ).alias("finished_ratio"),
    )


# ---------------------------------------------------------------------------
# A2 ★: entity assembly — group a (subject, predicate, value)-ish stream into
# one wide row per subject. Reference: entity_generator (create_kv.py:84-125).
# ---------------------------------------------------------------------------
@register(
    "entity_assembly_users",
    oracle="""
    SELECT user_id,
      COUNT(*) AS n_events,
      epoch_us(MIN(ts)) AS first_ts_us,
      epoch_us(MAX(ts)) AS last_ts_us,
      array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
      CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY user_id
    """,
)  # events_tbl normalizes ts to BIGINT epoch-micros (ts_us) matching DuckDB epoch_us
def entity_assembly_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity assembly: triples/events → one wide row per subject (A2 ★).

    Reference analogue: entity_generator groups the subject-sorted
    triple stream into {predicate: value-or-list} dicts
    (create_kv.py:84-125) — single-valued predicates via min/max/first,
    multi-valued via collected (sorted) sets. JSON props are extracted
    JVM-side with get_json_object (no Python UDF).
    """
    ev = events_tbl(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("first_ts_us"),
        F.max("ts_us").alias("last_ts_us"),
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("event_types"),
        F.sum(_dec("value", 6)).cast("double").alias("total_value"),
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
    )


# ---------------------------------------------------------------------------
# A6 ★: conditional aggregation — status histogram.
# ---------------------------------------------------------------------------
@register(
    "status_histogram",
    oracle="""
    SELECT o_orderpriority,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_count,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_count,
      CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS pending_count,
      CAST(SUM(CASE WHEN o_orderstatus IN ('F','P') THEN 1 ELSE 0 END) AS BIGINT) AS closed_or_pending
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def status_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-count histogram (SURVEY §2.4 A6 ★).

    Reference analogue: per-status member counts {available, taken,
    on_sale, recently_released, never_registered} + derived
    nonavailable (create_merged.py:873-881).
    """
    orders = tbl(spark, sf_dir, "orders")

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    return orders.groupBy("o_orderpriority").agg(
        cnt(F.col("o_orderstatus") == "O").alias("open_count"),
        cnt(F.col("o_orderstatus") == "F").alias("finished_count"),
        cnt(F.col("o_orderstatus") == "P").alias("pending_count"),
        cnt(F.col("o_orderstatus").isin("F", "P")).alias("closed_or_pending"),
    )


# ---------------------------------------------------------------------------
# Event-time bucketing (batch analogue of the streaming window).
# ---------------------------------------------------------------------------
@register(
    "hourly_event_rollup",
    oracle="""
    SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS hour_us,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time rollup, batch form.

    The streaming form (streaming/cdc_stream.py) uses window()+
    watermark; the batch form is date_trunc + groupBy and is what the
    oracle can check. Emits epoch micros so both engines hash alike.
    """
    ev = events_tbl(spark, sf_dir)
    return ev.groupBy(
        F.expr("(ts_us div 3600000000) * 3600000000").alias("hour_us"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("value", 6)).cast("double").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Session windows (batch twin of streaming/events.py::sessionize).
# ---------------------------------------------------------------------------
SESSION_GAP_US = 30 * 60 * 1_000_000


@register(
    "session_window_rollup",
    oracle=f"""
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
    lagged AS (
      SELECT *, LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev_us FROM e
    ),
    marked AS (
      SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us >= {SESSION_GAP_US}
                     THEN 1 ELSE 0 END AS new_s
      FROM lagged
    ),
    sess AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id, MIN(ts_us) AS session_start_us,
           MAX(ts_us) + {SESSION_GAP_US} AS session_end_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
    FROM sess GROUP BY user_id, sid
    """,
)
def session_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows per user, batch form (the streaming
    twin is streaming/events.py::sessionize).

    Spark's native session_window merges events closer than the gap;
    the oracle derives identical sessions with the gaps-and-islands
    idiom (lag → new-session marker → running sum → group), pinning
    the boundary semantics: a gap of exactly 30min starts a NEW
    session, and session_end = last event + gap.
    """
    ev = events_tbl(spark, sf_dir)
    e = ev.withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
    return (
        e.groupBy(F.session_window("event_time", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value", 6)).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
            "session_value",
        )
    )
