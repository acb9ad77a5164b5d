"""Collection-name operators on the synthetic tables: letter-range
normalization merge (create_merged.py:745-804), suffix mining
(research/collection-name-normalization/most-popular-suffixes.py:16-41,
A12), and command-driven array sorts
(load_custom_collections.py:324-333, W5) — each with an exact DuckDB
oracle.

The regex set is shared with plans/letter_merge.py; here the patterns
run over names synthesized from `part` columns so the oracle can
value-check group/merge/rename decisions at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from namegraph_collections_spark.functions.det_round import round6_det
from namegraph_collections_spark.plans.letter_merge import (
    ALPHABET_RANGE_PATTERN,
    M1_PATTERN,
    M2_PATTERN,
)
from namegraph_collections_spark.queries.registry import register, tbl

# Name synthesis: four shapes — a merging letter-range family, a
# renamable parenthetical, a kept range suffix, a renamable single
# letter — plus unmatched passthrough.
_NAME_SQL = """
    CASE WHEN p_partkey % 50 = 0 THEN p_type || ', ' || chr(65 + CAST(p_partkey % 26 AS INT))
         WHEN p_partkey % 50 = 1 THEN 'Set ' || CAST(p_partkey AS VARCHAR) || ' (list)'
         WHEN p_partkey % 50 = 2 THEN 'Group ' || CAST(p_partkey AS VARCHAR) || ': A to Z'
         WHEN p_partkey % 50 = 3 THEN 'Row ' || CAST(p_partkey AS VARCHAR) || ', B'
         ELSE p_type END
"""


def _synth_names(part: DataFrame) -> DataFrame:
    pk = F.col("p_partkey")
    letter = F.expr("char(65 + pmod(p_partkey, 26))")
    return part.withColumn(
        "name",
        F.when(pk % 50 == 0, F.concat("p_type", F.lit(", "), letter))
        .when(pk % 50 == 1, F.concat(F.lit("Set "), pk.cast("string"), F.lit(" (list)")))
        .when(pk % 50 == 2, F.concat(F.lit("Group "), pk.cast("string"), F.lit(": A to Z")))
        .when(pk % 50 == 3, F.concat(F.lit("Row "), pk.cast("string"), F.lit(", B")))
        .otherwise(F.col("p_type")),
    )


@register(
    "letter_range_normalize",
    oracle=f"""
    WITH named AS (
      SELECT p_partkey, p_size, {_NAME_SQL} AS name FROM part
    ),
    m AS (
      SELECT *,
        regexp_matches(name, '{M1_PATTERN}') AS m1,
        regexp_matches(name, '{M2_PATTERN}') AS m2
      FROM named
    ),
    extracted AS (
      SELECT *,
        upper(substr(norm_raw, 1, 1)) || substr(norm_raw, 2) AS norm,
        CASE WHEN m1 THEN regexp_extract(name, '{M1_PATTERN}', 2)
             ELSE regexp_extract(name, '{M2_PATTERN}', 2) END AS stripped
      FROM (SELECT *, trim(CASE WHEN m1 THEN regexp_extract(name, '{M1_PATTERN}', 1)
                                ELSE regexp_extract(name, '{M2_PATTERN}', 1) END) AS norm_raw
            FROM m) WHERE m1 OR m2
    ),
    grouped AS (
      SELECT norm, COUNT(*) AS n_collections, MIN(p_partkey) AS merged_id,
             MAX(p_size) AS max_size, bool_or(m2) AS any_m2,
             min_by(stripped, p_partkey) AS first_stripped,
             min_by(name, p_partkey) AS orig_name
      FROM extracted GROUP BY norm
    )
    SELECT CASE WHEN n_collections > 1 OR any_m2
                     OR regexp_matches(first_stripped, '{ALPHABET_RANGE_PATTERN}')
                THEN norm ELSE orig_name END AS final_name,
           merged_id, n_collections, max_size
    FROM grouped
    UNION ALL
    SELECT name AS final_name, p_partkey AS merged_id, 1 AS n_collections,
           p_size AS max_size
    FROM m WHERE NOT (m1 OR m2)
    """,
)
def letter_range_normalize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Letter-range normalization merge over synthesized names
    (create_merged.py:745-804 on `part`).

    Names collapsing to one normalized form merge (min id wins, n
    counted); lone matches rename only on explicit-pattern or
    alphabet-range hits; everything else passes through. One regex
    projection + one groupBy — no shuffle beyond the merge itself.
    """
    named = _synth_names(tbl(spark, sf_dir, "part"))
    m1 = F.col("name").rlike(M1_PATTERN)
    m2 = F.col("name").rlike(M2_PATTERN)
    norm_raw = F.trim(
        F.when(m1, F.regexp_extract("name", M1_PATTERN, 1)).otherwise(
            F.regexp_extract("name", M2_PATTERN, 1)
        )
    )
    m = named.withColumn("m1", m1).withColumn("m2", m2)
    extracted = (
        m.filter(F.col("m1") | F.col("m2"))
        .withColumn(
            "norm",
            F.concat(F.upper(F.substring(norm_raw, 1, 1)), F.substring(norm_raw, 2, 1 << 30)),
        )
        .withColumn(
            "stripped",
            F.when(F.col("m1"), F.regexp_extract("name", M1_PATTERN, 2)).otherwise(
                F.regexp_extract("name", M2_PATTERN, 2)
            ),
        )
    )
    grouped = extracted.groupBy("norm").agg(
        F.count(F.lit(1)).alias("n_collections"),
        F.min("p_partkey").alias("merged_id"),
        F.max("p_size").alias("max_size"),
        F.bool_or("m2").alias("any_m2"),
        F.min_by("stripped", "p_partkey").alias("first_stripped"),
        F.min_by("name", "p_partkey").alias("orig_name"),
    )
    merged = grouped.select(
        F.when(
            (F.col("n_collections") > 1)
            | F.col("any_m2")
            | F.col("first_stripped").rlike(ALPHABET_RANGE_PATTERN),
            F.col("norm"),
        )
        .otherwise(F.col("orig_name"))
        .alias("final_name"),
        "merged_id",
        "n_collections",
        "max_size",
    )
    passthrough = m.filter(~(F.col("m1") | F.col("m2"))).select(
        F.col("name").alias("final_name"),
        F.col("p_partkey").alias("merged_id"),
        F.lit(1).cast("long").alias("n_collections"),
        F.col("p_size").alias("max_size"),
    )
    return merged.unionByName(passthrough)


MIN_SUFFIX_COUNT = 5


@register(
    "suffix_mining",
    oracle=f"""
    WITH toks AS (SELECT p_partkey, p_name, string_split(p_name, ' ') AS t FROM part),
    sufs AS (
      SELECT p_partkey, p_name, t[-1] AS suffix FROM toks
      UNION ALL
      SELECT p_partkey, p_name, t[-2] || ' ' || t[-1] AS suffix FROM toks WHERE len(t) >= 2
    )
    SELECT suffix, COUNT(*) AS n_names,
           array_to_string(list_sort(list(DISTINCT p_name))[1:3], ',') AS examples
    FROM sufs GROUP BY suffix HAVING COUNT(*) >= {MIN_SUFFIX_COUNT}
    """,
)
def suffix_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Name-suffix mining (most-popular-suffixes.py:16-41, A12):
    count trailing 1- and 2-token phrases, threshold, keep 3 sorted
    examples.

    explode of ≤2 suffixes per name → one partial-aggregated groupBy;
    the examples list is bounded (slice 3) so the agg state stays
    small at any corpus size.
    """
    part = tbl(spark, sf_dir, "part")
    t = F.split("p_name", " ")
    sufs = part.select(
        "p_partkey",
        "p_name",
        F.explode(
            F.when(
                F.size(t) >= 2,
                F.array(
                    F.element_at(t, -1),
                    F.concat_ws(" ", F.element_at(t, -2), F.element_at(t, -1)),
                ),
            ).otherwise(F.array(F.element_at(t, -1)))
        ).alias("suffix"),
    )
    return (
        sufs.groupBy("suffix")
        .agg(
            F.count(F.lit(1)).alias("n_names"),
            F.array_join(F.slice(F.array_sort(F.collect_set("p_name")), 1, 3), ",").alias(
                "examples"
            ),
        )
        .filter(F.col("n_names") >= MIN_SUFFIX_COUNT)
    )


# W5: the reference's per-collection sort commands
# (load_custom_collections.py:324-333).
_SORT_COMMANDS = ["a-z", "z-a", "shortest-first", "longest-first"]


@register(
    "command_driven_sorts",
    oracle="""
    WITH d AS (
      SELECT doc_id,
        CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'a-z' WHEN 1 THEN 'z-a'
             WHEN 2 THEN 'shortest-first' ELSE 'longest-first' END AS command,
        list_distinct(string_split(lower(text), ' ')) AS toks
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, command, toks,
        list_sort(list_transform(toks,
          t -> lpad(CAST(len(t) AS VARCHAR), 3, '0') || '|' || t)) AS by_len
      FROM d
    )
    SELECT doc_id, command,
      array_to_string(CASE command
        WHEN 'a-z' THEN list_sort(toks)
        WHEN 'z-a' THEN list_reverse_sort(toks)
        WHEN 'shortest-first' THEN list_transform(by_len, s -> string_split(s, '|')[2])
        ELSE list_transform(list_reverse(by_len), s -> string_split(s, '|')[2])
      END, ',') AS sorted_tokens
    FROM keyed
    """,
)
def command_driven_sorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Command-driven member sorts (W5,
    load_custom_collections.py:324-333): each row carries its own sort
    command ∈ {a-z, z-a, shortest-first, longest-first}.

    Length sorts use a zero-padded length|value key so both engines
    order identically (incl. ties) without a comparator lambda the
    oracle lacks.
    """
    docs = tbl(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split(F.lower("text"), " "))
    d = docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(c) for c in _SORT_COMMANDS]), (F.col("doc_id") % 4 + 1).cast("int")
        ).alias("command"),
        toks.alias("toks"),
    )
    by_len = F.array_sort(
        F.transform(
            "toks", lambda t: F.concat(F.lpad(F.length(t).cast("string"), 3, "0"), F.lit("|"), t)
        )
    )
    keyed = d.withColumn("by_len", by_len)
    strip_key = lambda arr: F.transform(arr, lambda s: F.element_at(F.split(s, "\\|"), 2))  # noqa: E731
    return keyed.select(
        "doc_id",
        "command",
        F.array_join(
            F.when(F.col("command") == "a-z", F.array_sort("toks"))
            .when(F.col("command") == "z-a", F.reverse(F.array_sort("toks")))
            .when(F.col("command") == "shortest-first", strip_key(F.col("by_len")))
            .otherwise(strip_key(F.reverse(F.col("by_len")))),
            ",",
        ).alias("sorted_tokens"),
    )


# Related-collections precompute (precompute_related.py:110-156): for
# every collection, ≤ RELATED_NUM related collections with at most
# MAX_PER_TYPE sharing the same type ("so that first 3 will not be of
# the same type") and deterministic ordering. The generator's
# name-diversity step is service-internal; the structural semantics —
# shared-type candidate generation, per-type cap, global top-k — are
# restated on `part`, whose composite attributes act as the type set.
RELATED_NUM = 10
MAX_PER_TYPE = 2
#: Types shared by more than this many collections are dropped before
#: the type self-join — the stop-shingle treatment from the Jaccard
#: path (HOT_SHINGLE_DF_CAP): one mega-type ("human" has ~10⁸ members
#: in the reference predicate table) would otherwise fan out
#: quadratically, and membership in a type that large carries no
#: relatedness signal anyway. Bounds per-type join fan-out at cap².
HOT_TYPE_DF_CAP = 200


@register(
    "related_collections_precompute",
    oracle=f"""
    WITH types_all AS (
      SELECT p_partkey AS cid, p_type || '|' || CAST(p_size AS VARCHAR) AS ctype FROM part
      UNION ALL
      SELECT p_partkey AS cid, p_brand || '|' || CAST(p_size AS VARCHAR) AS ctype FROM part
    ),
    hot AS (
      SELECT ctype FROM types_all GROUP BY ctype HAVING COUNT(*) > {HOT_TYPE_DF_CAP}
    ),
    types AS (
      SELECT * FROM types_all WHERE ctype NOT IN (SELECT ctype FROM hot)
    ),
    shared AS (
      SELECT a.cid, b.cid AS rid, COUNT(*) AS n_shared, MIN(a.ctype) AS primary_type
      FROM types a JOIN types b ON a.ctype = b.ctype AND a.cid <> b.cid
      GROUP BY a.cid, b.cid
    ),
    per_type AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY cid, primary_type
                                   ORDER BY n_shared DESC, rid ASC) AS type_rnk
      FROM shared
    ),
    capped AS (SELECT * FROM per_type WHERE type_rnk <= {MAX_PER_TYPE})
    SELECT cid, rid, n_shared, primary_type, rel_rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY cid
                                   ORDER BY n_shared DESC, rid ASC) AS rel_rank
      FROM capped
    ) WHERE rel_rank <= {RELATED_NUM}
    """,
)
def related_collections_precompute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-collection related-collections list (precompute_related.py:
    110-156): candidates share ≥1 type, at most {MAX_PER_TYPE} per
    primary type, top-{RELATED_NUM} overall, all tiebreaks explicit.

    Plan shape: the type table is an inverted index (collection →
    type); candidates meet in ONE shuffle on the type value — never
    collection×collection. Types hotter than {HOT_TYPE_DF_CAP}
    members are dropped by a broadcast anti-join before the self-join
    (the HOT_SHINGLE_DF_CAP treatment), so one mega-type can never go
    quadratic; both windows partition by collection AND compile to
    WindowGroupLimit (partial top-k below the exchange), so ranking
    never funnels through a single reducer at any corpus size.

    Round-11 scale fix (the sweep's worst sf0.1→sf1 ratio, 10.26×):
    pairs are generated once per UNORDERED pair (cid < rid) and
    mirrored AFTER the count aggregation with a 2-element array
    explode — n_shared and primary_type are symmetric in the pair —
    so the d²-per-type join fan-out and the (cid, rid) count shuffle
    run at half the rows for the identical output. The remaining
    growth is the honest transition regime of per-type membership d
    rising toward the cap (pair volume ~ Σ d²); it is ABSOLUTELY
    bounded by n_types × {HOT_TYPE_DF_CAP}² because every type's
    fan-out is capped, so the cost plateaus rather than compounds at
    100× scale.
    """
    part = tbl(spark, sf_dir, "part")
    t1 = part.select(
        F.col("p_partkey").alias("cid"),
        F.concat(F.col("p_type"), F.lit("|"), F.col("p_size").cast("string")).alias("ctype"),
    )
    t2 = part.select(
        F.col("p_partkey").alias("cid"),
        F.concat(F.col("p_brand"), F.lit("|"), F.col("p_size").cast("string")).alias("ctype"),
    )
    types_all = t1.unionByName(t2)
    # The hot side is tiny by construction (only types with membership
    # above the cap), so the anti-join broadcasts.
    hot = (
        types_all.groupBy("ctype")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > HOT_TYPE_DF_CAP)
        .select("ctype")
    )
    types = types_all.join(F.broadcast(hot), "ctype", "left_anti")
    a = types.alias("a")
    b = types.alias("b")
    # Generate each UNORDERED pair once (cid < rid) and mirror after
    # aggregation: n_shared (count of shared types) and primary_type
    # (min shared type) are symmetric in the pair, so the ordered
    # candidate table is exactly the half-table plus its flip — but
    # the d²-per-type join fan-out and the (cid, rid) count shuffle
    # run at HALF the rows (round-11 fix for the sweep's worst
    # sf0.1→sf1 ratio). The mirror is a 2-element array explode on
    # the AGGREGATED rows — one map pass, no self-union, no second
    # read of the join.
    shared_half = (
        a.join(b, (F.col("a.ctype") == F.col("b.ctype")) & (F.col("a.cid") < F.col("b.cid")))
        .groupBy(F.col("a.cid").alias("cid"), F.col("b.cid").alias("rid"))
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.min(F.col("a.ctype")).alias("primary_type"),
        )
    )
    shared = shared_half.select(
        F.explode(
            F.array(
                F.struct(F.col("cid").alias("cid"), F.col("rid").alias("rid")),
                F.struct(F.col("rid").alias("cid"), F.col("cid").alias("rid")),
            )
        ).alias("p"),
        "n_shared",
        "primary_type",
    ).select("p.cid", "p.rid", "n_shared", "primary_type")
    w_type = Window.partitionBy("cid", "primary_type").orderBy(
        F.col("n_shared").desc(), F.col("rid").asc()
    )
    capped = (
        shared.withColumn("type_rnk", F.row_number().over(w_type))
        .filter(F.col("type_rnk") <= MAX_PER_TYPE)
        .drop("type_rnk")
    )
    w_rel = Window.partitionBy("cid").orderBy(F.col("n_shared").desc(), F.col("rid").asc())
    return (
        capped.withColumn("rel_rank", F.row_number().over(w_rel))
        .filter(F.col("rel_rank") <= RELATED_NUM)
        .select("cid", "rid", "n_shared", "primary_type", "rel_rank")
    )


@register(
    "sqldump_extract",
    oracle="""
    SELECT CAST(c_custkey AS VARCHAR) AS ck,
           'Cust '' No' || c_custkey || ', ok' AS payload,
           CAST(c_nationkey AS VARCHAR) AS nk
    FROM customer
    """,
)
def sqldump_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 end to end under the value hash: MySQL-dump INSERT lines are
    synthesized from the customer table (multi-tuple lines, quoted
    strings with commas and backslash-escaped quotes, plus non-INSERT
    noise lines), parsed back by the mapInPandas DFA
    (sources/sqldump.py; reference airflow/sql_parser.c:32-2105), and
    compared against the directly-derived rows.
    """
    from namegraph_collections_spark.sources.sqldump import extract_sqldump_columns

    cust = tbl(spark, sf_dir, "customer")
    piece = F.concat(
        F.lit("("),
        F.col("c_custkey").cast("string"),
        F.lit(",'Cust \\' No"),
        F.col("c_custkey").cast("string"),
        F.lit(", ok',"),
        F.col("c_nationkey").cast("string"),
        F.lit(")"),
    )
    lines = (
        cust.groupBy("c_nationkey")
        .agg(F.concat_ws(",", F.collect_list(piece)).alias("tuples"))
        .select(
            F.concat(
                F.lit("INSERT INTO `customer` VALUES "), F.col("tuples"), F.lit(";")
            ).alias("value")
        )
        .unionByName(
            spark.createDataFrame(
                [("-- MySQL dump 10.13",), ("/*!40101 SET NAMES utf8 */;",)], "value string"
            )
        )
    )
    return extract_sqldump_columns(lines, [0, 1, 2], ["ck", "payload", "nk"])


_CUSTOM_ORACLE = """
WITH surv AS (
  -- members surviving curation (non-Latin titles drop; W5 pos keeps
  -- input order, which is ascending custkey here)
  SELECT c_custkey AS k, c_nationkey AS n, n_name,
    CASE WHEN c_custkey % 5 = 0 THEN 'customerno' || c_custkey
         ELSE 'customer' || c_custkey END AS nm,
    CASE WHEN c_custkey % 5 = 0 THEN 3 ELSE 2 END AS ntok,
    CASE WHEN c_custkey % 6 = 0 THEN 0.25e0 * ((c_custkey % 8) + 1) ELSE 0.0e0 END AS iscore,
    CASE WHEN c_custkey % 20 = 3 THEN 'recently_released'
         WHEN c_custkey % 4 = 0 THEN 'available'
         WHEN c_custkey % 4 = 1 THEN 'taken'
         WHEN c_custkey % 4 = 2 THEN 'on_sale' END AS status
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  WHERE c_custkey % 13 <> 0
),
meta AS (
  SELECT n_nationkey AS n,
    CASE n_nationkey % 6 WHEN 0 THEN 'none' WHEN 1 THEN 'a-z' WHEN 2 THEN 'z-a'
      WHEN 3 THEN 'shortest' WHEN 4 THEN 'longest' ELSE 'interesting_score' END AS cmd
  FROM nation
),
ordd AS (
  SELECT s.*, m.cmd,
    row_number() OVER (PARTITION BY s.n ORDER BY
      CASE m.cmd WHEN 'interesting_score' THEN -s.iscore
                 WHEN 'shortest' THEN CAST(s.ntok AS DOUBLE)
                 WHEN 'longest' THEN -CAST(s.ntok AS DOUBLE)
                 ELSE 0.0e0 END ASC,
      CASE WHEN m.cmd = 'z-a' THEN s.nm ELSE '' END DESC,
      CASE WHEN m.cmd = 'a-z' THEN s.nm ELSE '' END ASC,
      s.k ASC) AS ord
  FROM surv s JOIN meta m ON m.n = s.n
),
agg AS (
  SELECT n, COUNT(*) AS cnt,
    floor(greatest(SUM(iscore) / COUNT(*), 1e-8) * 1000000 + 0.5) / 1000000.0 AS score_mean,
    CAST(COUNT(*) FILTER (WHERE status = 'available') AS BIGINT) AS available_count,
    CAST(COUNT(*) FILTER (WHERE status = 'taken') AS BIGINT) AS taken_count,
    CAST(COUNT(*) FILTER (WHERE status = 'on_sale') AS BIGINT) AS on_sale_count,
    CAST(COUNT(*) FILTER (WHERE status = 'recently_released') AS BIGINT)
      AS recently_released_count,
    CAST(COUNT(*) FILTER (WHERE status IS NULL) AS BIGINT) AS never_registered_count,
    array_to_string(list_slice(list(nm ORDER BY ord), 1, 10), ',') AS top10_csv,
    array_to_string(list_slice(list(nm || '@' || coalesce(status, '-') ORDER BY ord), 1, 25),
      '|') AS names25_csv
  FROM ordd GROUP BY n
)
SELECT 'custom-' || a.n AS id,
  'Custom ' || n.n_name AS collection_name,
  a.cnt AS members_count,
  a.available_count, a.taken_count, a.on_sale_count, a.recently_released_count,
  a.never_registered_count,
  a.taken_count + a.on_sale_count + a.recently_released_count
    AS nonavailable_members_count,
  a.score_mean,
  CAST(CASE WHEN a.n % 2 = 0 THEN 100 + a.n ELSE 10000000 END AS BIGINT) AS member_rank,
  a.top10_csv, a.names25_csv,
  CASE WHEN a.n % 4 = 0 THEN 'Desc ' || n.n_name
       ELSE 'Manually created custom collection' END AS description,
  CASE WHEN a.n % 3 = 0 THEN 'kw' || a.n || ',common' ELSE '' END AS keywords_csv
FROM agg a JOIN nation n ON n.n_nationkey = a.n
"""


@register("custom_collections_docs", oracle=_CUSTOM_ORACLE)
def custom_collections_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §3.3 fourth ingest path under the value hash: user-style
    custom collections (per-collection sort commands, default ranks,
    curation drops, status histogram) synthesized from customer/nation,
    run through plans/custom_collections.py, flattened to scalars.
    One all-non-Latin collection verifies the drop-empty path
    (load_custom_collections.py:300-303)."""
    from namegraph_collections_spark.plans.custom_collections import (
        process_custom_collections,
    )

    cust = tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    k = F.col("c_custkey")
    title = (
        F.when(k % 13 == 0, F.concat(F.lit("Πελάτης "), k.cast("string")))
        .when(k % 5 == 0, F.concat(F.lit("Customer No "), k.cast("string")))
        .otherwise(F.concat(F.lit("Customer "), k.cast("string")))
    )
    curated = F.when(k % 5 == 0, F.concat(F.lit("customerno"), k.cast("string"))).otherwise(
        F.concat(F.lit("customer"), k.cast("string"))
    )
    n = F.col("c_nationkey")
    raw = (
        cust.groupBy(n.alias("n"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(k.alias("k"), title.alias("t")))),
                lambda s: s["t"],
            ).alias("members")
        )
        .join(nat, F.col("n") == nat.n_nationkey)
        .select(
            F.concat(F.lit("custom-"), F.col("n").cast("string")).alias("collection_id"),
            F.concat(F.lit("Custom "), F.col("n_name")).alias("collection_name"),
            "members",
            F.element_at(
                F.array(
                    F.lit("none"), F.lit("a-z"), F.lit("z-a"),
                    F.lit("shortest"), F.lit("longest"), F.lit("interesting_score"),
                ),
                (F.col("n") % 6 + 1).cast("int"),
            ).alias("sort_labels"),
            F.when(F.col("n") % 2 == 0, (100 + F.col("n")).cast("long")).alias("member_rank"),
            F.when(F.col("n") % 4 == 0, F.concat(F.lit("Desc "), F.col("n_name"))).alias(
                "description"
            ),
            F.when(
                F.col("n") % 3 == 0,
                F.array(F.concat(F.lit("kw"), F.col("n").cast("string")), F.lit("common")),
            ).alias("keywords"),
            F.lit("🎨").alias("avatar_emoji"),
        )
        .unionByName(
            spark.createDataFrame(
                [("custom-empty", "Dropped", ["ιοσρβυνγ", "αβγ"], "none", None, None, None, "x")],
                "collection_id string, collection_name string, members array<string>,"
                " sort_labels string, member_rank long, description string,"
                " keywords array<string>, avatar_emoji string",
            )
        )
    )
    domains = cust.select(
        curated.alias("name"),
        F.when(k % 20 == 3, F.lit("recently_released"))
        .when(k % 4 == 0, F.lit("available"))
        .when(k % 4 == 1, F.lit("taken"))
        .when(k % 4 == 2, F.lit("on_sale"))
        .alias("status"),
    ).filter(F.col("status").isNotNull())
    scores = cust.filter(k % 6 == 0).select(
        curated.alias("label"), (0.25 * ((k % 8) + 1)).cast("double").alias("interesting_score")
    )
    docs = process_custom_collections(raw, domains=domains, scores=scores, current_time_ms=0.0)
    c = F.col
    return docs.select(
        c("metadata.id").alias("id"),
        c("data.collection_name").alias("collection_name"),
        c("metadata.members_count").cast("long").alias("members_count"),
        c("template.available_count").cast("long").alias("available_count"),
        c("template.taken_count").cast("long").alias("taken_count"),
        c("template.on_sale_count").cast("long").alias("on_sale_count"),
        c("template.recently_released_count").cast("long").alias("recently_released_count"),
        c("template.never_registered_count").cast("long").alias("never_registered_count"),
        c("template.nonavailable_members_count").cast("long").alias(
            "nonavailable_members_count"
        ),
        round6_det(c("template.members_system_interesting_score_mean")).alias("score_mean"),
        F.try_element_at(c("template.names"), F.lit(1))["rank"].alias("member_rank"),
        F.array_join(
            F.transform(c("template.top10_names"), lambda t: t["normalized_name"]), ","
        ).alias("top10_csv"),
        F.array_join(
            F.transform(
                c("template.top25_names"),
                lambda t: F.concat(
                    t["normalized_name"], F.lit("@"), F.coalesce(t["cached_status"], F.lit("-"))
                ),
            ),
            "|",
        ).alias("names25_csv"),
        c("data.collection_description").alias("description"),
        F.array_join(c("data.collection_keywords"), ",").alias("keywords_csv"),
    )
