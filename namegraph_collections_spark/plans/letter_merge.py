"""Merge-trilogy tail: letter-range normalization merge and exact-name
dedup (SURVEY §3.1; create_merged.py:717-804 and :992-1017 — A8/A9).

The reference streams collections through Python dicts keyed by
normalized name; group encounter order decides merge winners. The
engine re-expresses both passes as groupBy aggregations with a
documented deterministic encounter order (ascending numeric QID —
SURVEY §4 item 3), so results are stable under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# create_merged.py:718-741 — parenthetical qualifiers stripped wholesale.
EXPLICIT_PARENTHESES_PATTERNS = [
    r"[Ll]isted [Aa]lphabetically",
    r"[Ll]ist",
    r"[Cc]urrent",
    r"[Cc]hronological",
    r"[Cc]ategorised",
    r"by .*?",
    r"[Aa]lphabetical",
    r"[Aa]lphabetic",
    r"[Ss]eat .*?",
    r"[Pp]art .*?",
    r"MONA .*?",
    r"[Cc]onstituencies .*?",
    r"!\$@",
    r"[A-Z][a-z]",
]

# create_merged.py:757 (m1): trailing letter/number-range qualifiers
# ("…, A–C", "…: F", "… starting with Q").
M1_PATTERN = (
    r"(.*)(([,:–(] ?[A-Z0-9]+[a-z]* ?([–-]| to ) ?[^ ]+$)"
    r"|((: |, |– |starting with |\()[A-Z]\)?$))"
)
# create_merged.py:758 (m2): explicit parenthetical qualifier list.
M2_PATTERN = r"(.*\S)(\s*\((" + "|".join(EXPLICIT_PARENTHESES_PATTERNS) + r")\))$"
# create_merged.py:737-740 (m3): the two normalization patterns; the
# reference uses one alternation with duplicate named groups (regex
# module); Java/RE2 forbid that, so they are applied as two patterns.
M3A_PATTERN = r"(.* lists? of )(\w.*)"  # stripped, normalized
M3B_PATTERN = (
    r"(.*(?<!and )(?<!are )\b[Ll]isted )"
    r"(.*?(buildings|churches|lighthouses|memorials).*)"
)
# create_merged.py:744: the stripped part is a pure alphabet range.
ALPHABET_RANGE_PATTERN = r"^[^A-Za-z]*?\b[A-Za-z]( ?[-–] ?[A-Za-z])?\b[^A-Za-z]*$"

_COLS = [
    "item", "types", "article", "kind", "name", "members",
    "valid_members_count", "invalid_members_count", "keywords",
    "description", "images", "page_banners", "rank", "is_merged",
]


def _ucfirst(col):
    return F.concat(F.upper(F.substring(col, 1, 1)), F.substring(col, 2, 1 << 30))


def merge_groups(tagged: DataFrame, key: str) -> DataFrame:
    """A9 ★ merge of every multi-collection group keyed by ``key``
    (merge_collections, create_merged.py:549-576), as one groupBy.

    Encounter order (the reference reduces in file-read order) is the
    ascending numeric QID; members re-sort rank-desc with dedup
    keep-first per curated name (W3 + A4). The group key becomes the
    merged collection's name. Caller must pass only groups that need
    merging (singletons keep their member order untouched).
    """
    qn = F.substring("item", 2, 1 << 30).cast("long")
    t = tagged.withColumn("qid_num", qn)

    m = t.select(key, "qid_num", F.posexplode_outer("members").alias("pos", "member"))
    mw = Window.partitionBy(key, F.col("member.curated")).orderBy(
        F.col("member.rank").desc(), F.col("qid_num").asc(), F.col("pos").asc()
    )
    members = (
        m.filter(F.col("member").isNotNull())
        .withColumn("rn", F.row_number().over(mw))
        .filter(F.col("rn") == 1)
        .groupBy(key)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("member.rank")).alias("neg_rank"),
                        "qid_num",
                        "pos",
                        F.col("member").alias("m"),
                    )
                )
            ).alias("mm")
        )
        .select(key, F.transform("mm", lambda s: s["m"]).alias("members"))
    )

    def first_nonempty(col, cond):
        return F.min(F.when(cond, F.struct(F.col("qid_num").alias("o"), col.alias("v"))))["v"]

    agg = t.groupBy(key).agg(
        F.concat(F.lit("Q"), F.min("qid_num").cast("string")).alias("item"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("types")))).alias("types"),
        F.min_by("article", "qid_num").alias("article"),
        F.min_by("kind", "qid_num").alias("kind"),
        F.sum("valid_members_count").alias("valid_members_count"),
        F.sum("invalid_members_count").alias("invalid_members_count"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("keywords")))).alias("keywords"),
        first_nonempty(F.col("description"), F.col("description").isNotNull()).alias("description"),
        first_nonempty(F.col("images"), F.size("images") > 0).alias("images"),
        first_nonempty(F.col("page_banners"), F.size("page_banners") > 0).alias("page_banners"),
        F.max("rank").alias("rank"),
        F.lit(True).alias("is_merged"),
    )
    out = (
        agg.join(members, key, "left")
        .withColumn("members", F.coalesce("members", F.array()))
        .withColumn("images", F.coalesce("images", F.array().cast("array<string>")))
        .withColumn("page_banners", F.coalesce("page_banners", F.array().cast("array<string>")))
        .withColumn("name", F.col(key))
    )
    return out.select(*_COLS)


def letter_range_normalize(coll: DataFrame) -> DataFrame:
    """remove_collections_with_letters (create_merged.py:745-804).

    Names carrying a letter-range / qualifier suffix are normalized;
    collections collapsing to the same normalized name merge (A9).
    A lone match is renamed only when an explicit pattern (m2/m3)
    fired or the stripped suffix is a pure alphabet range — a bare m1
    suffix on a unique name is left intact (the reference's guard
    against over-normalizing "Band: X" style names).
    """
    m1 = F.col("name").rlike(M1_PATTERN)
    m2 = F.col("name").rlike(M2_PATTERN)
    m3a = F.col("name").rlike(M3A_PATTERN)
    m3b = F.col("name").rlike(M3B_PATTERN)

    normalized = F.trim(
        F.when(m1, F.regexp_extract("name", M1_PATTERN, 1))
        .when(m2, F.regexp_extract("name", M2_PATTERN, 1))
        .when(m3a, F.regexp_extract("name", M3A_PATTERN, 2))
        .when(m3b, F.regexp_extract("name", M3B_PATTERN, 2))
    )
    stripped = (
        F.when(m1, F.regexp_extract("name", M1_PATTERN, 2))
        .when(m2, F.regexp_extract("name", M2_PATTERN, 2))
        .when(m3a, F.regexp_extract("name", M3A_PATTERN, 1))
        .when(m3b, F.regexp_extract("name", M3B_PATTERN, 1))
    )
    tagged = (
        coll.withColumn("_matched", m1 | m2 | m3a | m3b)
        .withColumn("_normalized", _ucfirst(normalized))
        .withColumn("_m2_or_m3", m2 | m3a | m3b)
        .withColumn("_stripped", stripped)
    )
    unmatched = tagged.filter(~F.col("_matched")).select(*_COLS)
    matched = tagged.filter(F.col("_matched"))

    gw = Window.partitionBy("_normalized")
    qid_num = F.substring("item", 2, 1 << 30).cast("long")
    matched = (
        matched.withColumn("_n", F.count(F.lit(1)).over(gw))
        .withColumn("_any_m2m3", F.max(F.col("_m2_or_m3").cast("int")).over(gw) == 1)
        .withColumn("_qid_num", qid_num)
        .withColumn(
            "_first_stripped",
            F.min_by("_stripped", "_qid_num").over(gw),
        )
    )

    to_merge = matched.filter(F.col("_n") > 1)
    merged = merge_groups(to_merge.withColumnRenamed("_normalized", "merge_key"), "merge_key")

    single = matched.filter(F.col("_n") == 1)
    renamed = single.withColumn(
        "name",
        F.when(
            F.col("_any_m2m3") | F.col("_first_stripped").rlike(ALPHABET_RANGE_PATTERN),
            F.col("_normalized"),
        ).otherwise(F.col("name")),
    ).select(*_COLS)

    return unmatched.unionByName(renamed).unionByName(merged)


def remove_duplicate_names(coll: DataFrame) -> DataFrame:
    """remove_duplicates (create_merged.py:992-1017; A8 ★): collections
    sharing an exact name merge (A9); unique names pass through."""
    gw = Window.partitionBy("name")
    tagged = coll.withColumn("_n", F.count(F.lit(1)).over(gw))
    single = tagged.filter(F.col("_n") == 1).select(*_COLS)
    multi = tagged.filter(F.col("_n") > 1).withColumn("merge_key", F.col("name"))
    return single.unionByName(merge_groups(multi, "merge_key"))
