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
from namegraph_collections_spark.queries.registry import register, tbl

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
