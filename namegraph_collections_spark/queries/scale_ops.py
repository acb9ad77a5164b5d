"""Shuffle-volume-reduction operators: bloom-pruned semi-join,
deterministic grouped sampling, and blocked fuzzy (edit-distance)
matching.

Three patterns every 100 TB pipeline leans on that the smaller-scale
reference never needed (its largest single join fit one node):

- **Bloom-pruned semi-join** — drop fact-table rows *map-side* before
  the exact join's shuffle (``operators/bloom.py`` has the design
  note). The exact join still runs, so results are exact; the bloom
  only cuts the rows that reach it.
- **Deterministic grouped sampling** — "give me k docs per source,
  reproducibly" is the first step of every corpus-quality audit.
  Hash-order sampling (md5 of the id, not RNG) means the same rows
  come back on every engine and every run — the property the
  training-data split rule (``training_data._bucket16``) already
  relies on.
- **Blocked fuzzy matching** — entity-resolution by edit distance is
  O(n²) done naively; blocking on a cheap key (first name token) plus
  a length-difference band plus a per-block membership cap bounds
  every block, and the banded ``levenshtein(a, b, threshold)`` form
  stops the DP early — the standard ER pipeline shape (cf. the
  reference's name-matching needs in its collection merge,
  airflow/dags/create_merged.py, solved there by exact
  normalized-name equality only).

All three are UDF-free column programs with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from namegraph_collections_spark.operators.bloom import bloom_build, bloom_prune
from namegraph_collections_spark.queries.registry import events_tbl, ranked_topk, register, tbl

#: Build-side predicate for the bloom semi-join demo.
BLOOM_SEGMENT = "BUILDING"

#: Docs kept per source by the deterministic sampler.
SAMPLE_PER_GROUP = 5

#: Max members considered per fuzzy block (deterministic by key order).
FUZZY_BLOCK_CAP = 1024

#: Edit-distance threshold for a fuzzy match.
FUZZY_MAX_DIST = 3


@register(
    "bloom_pruned_semi_join",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = '{BLOOM_SEGMENT}')
    """,
)
def bloom_pruned_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders placed by '{segment}' customers — semi-join with a bloom
    pre-filter on the fact side.

    The bloom is built from the filtered customer keys (two narrow
    aggregations), broadcast as one map row, and applied to ``orders``
    as a pure column filter — the fact table is never shuffled before
    the prune. The exact ``left_semi`` join then runs on the
    survivors only, so bloom false positives cannot leak into the
    result: the oracle is the plain semi-join. At 100 TB this is the
    difference between shuffling every order and shuffling ~the
    matching fraction (+fp rate).
    """
    cust_keys = (
        tbl(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == BLOOM_SEGMENT)
        .select("c_custkey")
    )
    bloom = bloom_build(cust_keys, "c_custkey")
    orders = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    pruned = bloom_prune(orders, "o_custkey", bloom)
    return pruned.join(
        cust_keys.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "left_semi"
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")


@register(
    "grouped_deterministic_sample",
    oracle=f"""
    SELECT source, doc_id, rk FROM (
      SELECT source, doc_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rk
      FROM documents
    ) WHERE rk <= {SAMPLE_PER_GROUP}
    """,
)
def grouped_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-per-group corpus sample, reproducible across engines/runs:
    rank docs within each source by md5(doc_id) (doc_id tiebreak) and
    keep the first {k}.

    Hash order is the RNG substitute — uniform-ish, engine-agnostic,
    and stable under re-partitioning, unlike ``rand(seed)`` whose
    draw depends on row-to-partition placement. The rank-≤-k filter
    compiles to WindowGroupLimit, so each map task keeps at most k
    rows per group BEFORE the window shuffle — per-group sampling of
    a 100 TB corpus moves ~k rows per (source, input-partition), not
    the corpus.
    """
    docs = tbl(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("source", "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SAMPLE_PER_GROUP)
    )


@register(
    "fuzzy_blocked_pairs",
    oracle=f"""
    WITH names AS (
      SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY p_name
    ),
    capped AS (
      SELECT * FROM (
        SELECT p_name, n,
               string_split(p_name, ' ')[1] AS blk,
               ROW_NUMBER() OVER (
                 PARTITION BY string_split(p_name, ' ')[1]
                 ORDER BY p_name) AS _rn
        FROM names
      ) WHERE _rn <= {FUZZY_BLOCK_CAP}
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           a.n AS n_a, b.n AS n_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
    FROM capped a JOIN capped b
      ON a.blk = b.blk AND a.p_name < b.p_name
     AND abs(len(a.p_name) - len(b.p_name)) <= {FUZZY_MAX_DIST}
    WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND {FUZZY_MAX_DIST}
    """,
)
def fuzzy_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part names by edit distance over the DISTINCT
    name dictionary, with ER-style blocking.

    Matching the value dictionary, not row instances, is the scale
    move: the groupBy collapses the fact table to its distinct names
    (instance-support counts carried along), and only the dictionary
    enters the pair join — at 100 TB the dictionary is typically
    orders of magnitude smaller than the table. Candidates must share
    their first name token, differ in length by <= the threshold (a
    necessary condition for a match, checked IN the join condition so
    it prunes before any DP runs), and each block is capped
    (deterministic by name order) so no block can go quadratic. The
    surviving pairs use the banded ``levenshtein(a, b, threshold)``
    form, which abandons the DP as soon as the distance exceeds the
    threshold — O(d*min(|a|,|b|)) instead of O(|a|*|b|).
    """
    names = (
        tbl(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("blk", F.split("p_name", " ").getItem(0))
    )
    w_cap = Window.partitionBy("blk").orderBy("p_name")
    capped = (
        names.withColumn("_rn", F.row_number().over(w_cap))
        .filter(F.col("_rn") <= FUZZY_BLOCK_CAP)
        .drop("_rn")
    )
    a, b = capped.alias("a"), capped.alias("b")
    lev = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), FUZZY_MAX_DIST)
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name"))
            & (
                F.abs(F.length("a.p_name") - F.length("b.p_name")) <= FUZZY_MAX_DIST
            ),
        )
        .withColumn("edit_dist", lev)
        .filter(F.col("edit_dist").between(1, FUZZY_MAX_DIST))
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            "edit_dist",
        )
    )


# ---------------------------------------------------------------------------
# Skew diagnostics + salted aggregation: the measure-then-mitigate
# pair for hot keys. At 100 TB a skewed shuffle key is the single most
# common cause of a stuck stage; the diagnostic query quantifies the
# skew BEFORE you pay for the job, and the salted aggregate is the
# mitigation when the key really is hot (AQE's skew-join handles
# joins, but a skewed *aggregation* needs pre-aggregation over a salt
# or a decomposable two-stage plan like this one).
# ---------------------------------------------------------------------------
SKEW_TOP = 20

#: salt fan-out for the two-stage aggregate — at 100 TB pick ~2-4x
#: the executor count so every hot key's partials spread.
SALT_N = 16


@register(
    "skew_key_diagnostics",
    oracle=f"""
    WITH kc AS (SELECT o_custkey AS key, COUNT(*) AS cnt FROM orders GROUP BY 1),
    stats AS (
      SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows,
             MAX(cnt) AS max_cnt
      FROM kc
    ),
    top AS (
      SELECT key, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, key ASC) AS rnk
      FROM kc QUALIFY rnk <= {SKEW_TOP}
    )
    SELECT 'key' AS op, key, cnt, rnk,
           CAST(NULL AS BIGINT) AS n_keys, CAST(NULL AS BIGINT) AS n_rows,
           CAST(NULL AS BIGINT) AS skew_ratio_micro
    FROM top
    UNION ALL
    SELECT 'summary', CAST(NULL AS BIGINT), max_cnt, CAST(NULL AS BIGINT),
           n_keys, n_rows,
           CAST((max_cnt * n_keys * 1000000 + n_rows // 2) // n_rows AS BIGINT)
    FROM stats
    """,
)
def skew_key_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew profile for orders.o_custkey: the {SKEW_TOP}
    heaviest keys (exact counts, total-ordered rank) plus one summary
    row — key count, row count, max key frequency, and
    skew_ratio_micro = round(max/mean * 1e6) (1000000 = perfectly
    uniform; the number you check before keying a 100 TB shuffle on
    this column). The ratio is emitted DIRECTLY as the exact
    micro-unit BIGINT — no double or decimal ever touches the output
    surface (round-9 hash-hygiene rule; the /1e6 display division is
    the caller's).

    Scale shape: one partial-aggregated groupBy builds the per-key
    counts; the top slice is ranked_topk (TakeOrderedAndProject, never
    a global window over the distinct-key table) and the summary is a
    1-row total aggregate. Swap the table/key args mentally — the
    query is the template for profiling any candidate shuffle key.
    """
    kc = (
        tbl(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    null_l = F.lit(None).cast("long")
    top = ranked_topk(kc, SKEW_TOP, F.col("cnt").desc(), F.col("key").asc()).select(
        F.lit("key").alias("op"),
        "key",
        "cnt",
        "rnk",
        null_l.alias("n_keys"),
        null_l.alias("n_rows"),
        null_l.alias("skew_ratio_micro"),
    )
    summary = kc.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
    ).select(
        F.lit("summary").alias("op"),
        null_l.alias("key"),
        F.col("max_cnt").alias("cnt"),
        F.lit(None).cast("int").alias("rnk"),
        "n_keys",
        "n_rows",
        # skew_ratio_micro = round(max_cnt * n_keys / n_rows * 1e6)
        # computed in exact integer micro-units (the bigram-LM NLL
        # convention): ROUND(double, 6) has engine-specific half-way
        # rules, and doubles/decimals are banned from driver-hashed
        # surfaces, so the micro BIGINT itself IS the output — no
        # round-trip through DOUBLE or DECIMAL(18,6) (round 9: that
        # round-trip was one of two type asymmetries left on the red
        # sketch row). All inputs are non-negative counts, so Spark's
        # truncating `div` and DuckDB's flooring `//` agree.
        # (long overflow bound: max_cnt * n_keys * 1e6 < 2^63 holds for
        # any table where max_cnt * n_keys < 9.2e12 — beyond that,
        # compute in DECIMAL(38,0).)
        F.expr(
            "(max_cnt * n_keys * 1000000L + n_rows div 2) div n_rows"
        ).cast("long").alias("skew_ratio_micro"),
    )
    return top.unionByName(summary)


@register(
    "salted_skew_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS total_value,
           CAST(MIN(value) AS DECIMAL(18,2)) AS min_value,
           CAST(MAX(value) AS DECIMAL(18,2)) AS max_value
    FROM events GROUP BY event_type
    """,
)
def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate events by event_type — a pathologically hot key
    (a handful of distinct values over the whole stream) — via an
    explicit two-stage SALTED plan: stage 1 groups by (event_type,
    salt) where salt = user_id % {SALT_N} (deterministic, no RNG),
    stage 2 merges the decomposable partials (count→sum, sum→sum,
    min→min, max→max) per key.

    The oracle is the PLAIN one-stage GROUP BY: the value hash proves
    the salted plan is result-identical. Why bother when Spark already
    partial-aggregates map-side? Partial agg collapses rows within
    each TASK; with a handful of key values the final exchange still
    lands each key's partials on ONE reducer — fine for 5 keys x
    n_tasks partials, but when the per-key merge state itself is big
    (large collect-style or sketch state) or combiner efficiency is
    poor (high task count, wide rows), the salt spreads each key over
    {SALT_N} reducers and the second (tiny) stage merges {SALT_N}
    rows per key. This query is the template; the decimal-exact sum
    keeps the rewrite hash-checkable.
    """
    ev = events_tbl(spark, sf_dir)
    salted = (
        ev.select(
            "event_type",
            (F.col("user_id") % SALT_N).alias("salt"),
            F.col("value").cast("decimal(18,6)").alias("v"),
            "value",
        )
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum("v").alias("psum"),
            F.min("value").alias("pmin"),
            F.max("value").alias("pmax"),
        )
    )
    # The sum stays DECIMAL end-to-end (no double cast ever), and the
    # min/max picks — exact selections of 2-decimal-valued doubles —
    # are emitted as DECIMAL(18,2): no raw DOUBLE reaches the hash.
    return salted.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        F.sum("psum").cast("decimal(28,6)").alias("total_value"),
        F.min("pmin").cast("decimal(18,2)").alias("min_value"),
        F.max("pmax").cast("decimal(18,2)").alias("max_value"),
    )
