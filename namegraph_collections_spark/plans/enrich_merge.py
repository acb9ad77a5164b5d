"""All-info enrichment + list/category merge — the middle of the
reference pipeline (SURVEY §3.1; create_merged.py:383-706), Spark-first.

Member-level UDF work (curation) follows the distinct→compute→join
idiom; every RocksDB probe is a join; the reference's dict-driven
first-match merge becomes a ranked-candidate window. Order-dependent
reference semantics (file order) are replaced by documented
deterministic keys (SURVEY §4 item 3): min-qid wins where the
reference takes last-read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from namegraph_collections_spark.functions.curation import curate_member_udf, curate_name_col

# F8 ★: collection-type blocklist (create_merged.py:579-592).
FILTER_TYPES = [
    "Q11266439",  # Wikimedia template
    "Q4663261",  # Wikipedia:Stub
    "Q13406463",  # Wikimedia list article
    "Q11753321",  # Wikimedia navigational template
    "Q20769160",  # Wikimedia userbox template
    "Q30432511",  # Wikimedia meta category
    "Q4167836",  # Wikimedia category
    "Q33532284",  # Wikimedia list of lists
]

# F9 ★: name-filter regexes (create_merged.py:595-604).
FILTER_NAME_REGEXES = [
    "Wikipedia:.*",
    "Highways numbered .*",
    "Lists (of|that) .*",
    "Incomplete lists? from .*",
]


def member_sort_key():
    """W2 ★: log2(rank+1) / max(len(curated), 10)
    (create_merged.py:478-480, 884-886)."""
    return F.log2(F.col("rank") + 1) / F.greatest(F.length("curated"), F.lit(10))


def _curate_via_distinct_join(df: DataFrame, col: str, prefix: str) -> DataFrame:
    """Apply curate_member_udf over distinct values of ``col`` and join
    back (<prefix>_curated / <prefix>_tokenized)."""
    distinct = df.select(col).where(F.col(col).isNotNull()).distinct()
    computed = distinct.withColumn("_c", curate_member_udf(F.col(col))).select(
        col,
        F.col("_c.curated").alias(f"{prefix}_curated"),
        F.col("_c.tokenized").alias(f"{prefix}_tokenized"),
    )
    return df.join(computed, col, "left")


def enrich_all_info(
    validated: DataFrame,
    entities: DataFrame,
    wikimapper: DataFrame,
    qrank: DataFrame,
    domains: DataFrame,
    scores: DataFrame,
) -> DataFrame:
    """compute_all_info (create_merged.py:383-482) as one plan.

    J5 type labels, J6 aux description/images/banners, J7 keyword
    titles, J8 member label fallback, J9 qrank default-0, J10 status,
    C3/C5 curation, W2 ordering, A4 ordered dedup.
    """
    aux = entities.select(
        F.col("subject").alias("aux_qid"), "label", "description", "image", "page_banner"
    )

    # --- collection-level enrichment -----------------------------------
    coll = validated.withColumn("name", curate_name_col(F.col("article")))
    # J5: type labels in type-array order.
    t = coll.select("item", F.posexplode_outer("type").alias("tpos", "type_qid"))
    t = t.join(
        aux.select(F.col("aux_qid").alias("type_qid"), F.col("label").alias("type_label")),
        "type_qid",
        "left",
    )
    types = (
        t.groupBy("item")
        .agg(F.array_sort(F.collect_list(F.struct("tpos", "type_qid", "type_label"))).alias("tt"))
        .select(
            "item",
            F.transform(
                "tt", lambda s: F.struct(s["type_qid"].alias("qid"), s["type_label"].alias("label"))
            ).alias("types"),
        )
    )
    coll = coll.join(types, "item", "left")

    # J6: description (drop Wikimedia stock strings, strip leading
    # 'Wikimedia '), unquoted images / page banners.
    coll = coll.join(aux.withColumnRenamed("aux_qid", "item"), "item", "left")
    coll = coll.withColumn(
        "description",
        F.when(
            F.col("description").isin("Wikimedia list article", "Wikimedia category"), F.lit(None)
        ).otherwise(F.regexp_replace("description", "^[Ww]ikimedia ", "")),
    ).withColumn("images", F.transform(F.coalesce("image", F.array()), F.url_decode)).withColumn(
        "page_banners", F.transform(F.coalesce("page_banner", F.array()), F.url_decode)
    )

    # J7: keywords = curated titles of the item (incl. redirect rows —
    # the full wikimapper, not just primary) minus the collection name.
    kw = wikimapper.filter(F.col("wikidata_id").isNotNull()).select(
        F.col("wikidata_id").alias("item"), curate_name_col(F.col("wikipedia_title")).alias("kw")
    )
    keywords = kw.groupBy("item").agg(F.array_sort(F.collect_set("kw")).alias("keywords"))
    coll = coll.join(keywords, "item", "left").withColumn(
        "keywords", F.array_remove(F.coalesce("keywords", F.array()), "")
    )
    coll = coll.withColumn("keywords", F.array_except("keywords", F.array(F.col("name"))))

    # J9: collection rank.
    qr = qrank.select(F.col("id").alias("item"), F.col("rank").alias("collection_rank"))
    coll = coll.join(qr, "item", "left").withColumn(
        "collection_rank", F.coalesce("collection_rank", F.lit(0))
    )

    # --- member-level enrichment ---------------------------------------
    m = validated.select("item", F.posexplode("members").alias("pos", "member"))
    m = m.select(
        "item", "pos", F.col("member.qid").alias("member_qid"), F.col("member.title").alias("title")
    )
    m = _curate_via_distinct_join(m, "title", "t")
    # J8: label fallback when title curation failed.
    m = m.join(
        aux.select(F.col("aux_qid").alias("member_qid"), F.col("label").alias("member_label")),
        "member_qid",
        "left",
    )
    m = _curate_via_distinct_join(m, "member_label", "l")
    m = (
        m.withColumn("curated", F.coalesce("t_curated", "l_curated"))
        .withColumn("tokenized", F.coalesce("t_tokenized", "l_tokenized"))
        .filter(F.col("curated").isNotNull())
    )
    # interesting_score joins from a PRECOMPUTED score table — the
    # engine's treatment for the reference's NameRank interesting-score
    # model (create_merged.py:82-97), an external-service call per
    # member. SURVEY's stance on external-model UDFs: the model runs
    # out-of-engine and its outputs arrive as a table; the fixture
    # scores used in tests are NOT a model, just deterministic stand-in
    # rows. Swap in a real scored table (same (label, score) contract)
    # to run with NameRank.
    m = (
        m.join(
            scores.select(
                F.col("label").alias("curated"), F.col("interesting_score")
            ),
            "curated",
            "left",
        )
        .withColumn("interesting_score", F.coalesce("interesting_score", F.lit(0.0)))
        .join(qrank.select(F.col("id").alias("member_qid"), "rank"), "member_qid", "left")
        .withColumn("rank", F.coalesce("rank", F.lit(0)))
        .join(domains.select(F.col("name").alias("curated"), "status"), "curated", "left")
    )
    # W2 sort key + A4 ordered dedup (first occurrence under the sort
    # wins per curated, within a collection).
    m = m.withColumn("sort_key", member_sort_key())
    w = Window.partitionBy("item", "curated").orderBy(F.col("sort_key").desc(), F.col("pos").asc())
    m = m.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    members = (
        m.groupBy("item")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("sort_key")).alias("neg_key"),
                        "pos",
                        "curated",
                        "tokenized",
                        "interesting_score",
                        "rank",
                        "status",
                    )
                )
            ).alias("mm")
        )
        .select(
            "item",
            F.transform(
                "mm",
                lambda s: F.struct(
                    s["curated"].alias("curated"),
                    s["tokenized"].alias("tokenized"),
                    s["interesting_score"].alias("interesting_score"),
                    s["rank"].alias("rank"),
                    s["status"].alias("status"),
                ),
            ).alias("members"),
        )
    )
    coll = coll.drop("members").join(members, "item", "left").withColumn(
        "members", F.coalesce("members", F.array())
    )
    return coll.select(
        "item",
        "types",
        "article",
        "kind",
        "name",
        "members",
        "valid_members_count",
        "invalid_members_count",
        "keywords",
        "description",
        "images",
        "page_banners",
        F.col("collection_rank").alias("rank"),
    )


def apply_merge_filters(coll: DataFrame) -> DataFrame:
    """F8 ★ type blocklist + F9 ★ name regexes + F10 ★ ' by <lower>'
    (create_merged.py:579-611)."""
    type_block = F.array(*[F.lit(t) for t in FILTER_TYPES])
    keep = F.size(F.array_intersect(F.transform("types", lambda t: t["qid"]), type_block)) == 0
    name_cond = F.lit(False)
    for pat in FILTER_NAME_REGEXES:
        name_cond = name_cond | F.col("name").rlike("^" + pat)
    by_lower = F.regexp_extract("name", " by ([^ ]*)", 1).rlike("^[a-z]")
    return coll.filter(keep & ~name_cond & ~by_lower)


def merge_lists_and_categories(all_info: DataFrame, entities: DataFrame) -> DataFrame:
    """J11 ★ + A9 ★: merge categories into related lists, first match
    wins (create_merged.py:614-706).

    Candidate edges, in reference priority order:
      (a) a list's category_related_to_list edge naming the category
      (b) the category's own list_related_to_category edges, in order
      (c) exact-name match against a surviving list
    The reference's dict builds make the *last-read* list win on
    collision; the engine deterministically takes the minimum list qid
    (documented deviation, SURVEY §4 item 3).
    """
    # Stage-boundary materialization: the merge consumes the filtered
    # all-info from SIX subplans (lists x3, cats x3); left lazy, each
    # one re-derives the whole enrichment — including both curation
    # Arrow stages — per reference (observed: a 7.5k-line physical
    # plan with 320 exchanges and zero reuse). The reference
    # materializes exactly this boundary too (compute_all_info writes
    # the JSONL that merge_collections reads back,
    # create_merged.py:482/549). At scale this is a persisted
    # intermediate dataset; locally, localCheckpoint.
    filtered = apply_merge_filters(all_info).localCheckpoint(eager=True)
    lists = filtered.filter(F.col("kind") == "list")
    cats = filtered.filter(F.col("kind") == "category")

    db4 = entities.select("subject", "list_related_to_category", "category_related_to_list")

    # (a) list → category edges.
    a = (
        lists.select("item")
        .join(db4, lists.item == db4.subject)
        .select(
            F.col("item").alias("target_list"),
            F.explode("category_related_to_list").alias("cat_item"),
        )
        .withColumn("priority", F.lit(0))
        .withColumn("edge_pos", F.lit(0))
    )
    # (b) category → list edges (edge order preserved), kept only when
    # the list survived the filters.
    b = (
        cats.select(F.col("item").alias("cat_item"))
        .join(db4, F.col("cat_item") == db4.subject)
        .select(
            "cat_item", F.posexplode("list_related_to_category").alias("edge_pos", "target_list")
        )
        .join(lists.select(F.col("item").alias("target_list")), "target_list", "left_semi")
        .withColumn("priority", F.lit(1))
    )
    # (c) name match.
    c = (
        cats.select(F.col("item").alias("cat_item"), "name")
        .join(lists.select(F.col("item").alias("target_list"), "name"), "name")
        .select("cat_item", "target_list")
        .withColumn("priority", F.lit(2))
        .withColumn("edge_pos", F.lit(0))
    )
    candidates = a.select("cat_item", "target_list", "priority", "edge_pos").unionByName(
        b.select("cat_item", "target_list", "priority", "edge_pos")
    ).unionByName(c.select("cat_item", "target_list", "priority", "edge_pos"))
    w = Window.partitionBy("cat_item").orderBy("priority", "edge_pos", "target_list")
    assignment = (
        candidates.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
        .select("cat_item", "target_list")
    )

    # Categories with no assignment pass through unmerged.
    unmerged_cats = cats.join(
        assignment, cats.item == assignment.cat_item, "left_anti"
    ).withColumn("is_merged", F.lit(False))

    # A9 ★: each list absorbs its assigned categories.
    merged_cats = cats.join(assignment, cats.item == assignment.cat_item).drop("item")
    lists_tagged = lists.withColumn("target_list", F.col("item")).withColumn(
        "src_order", F.lit(0)
    )
    cats_tagged = merged_cats.withColumn("item", F.col("cat_item")).withColumn(
        "src_order", F.lit(1)
    )
    union = lists_tagged.unionByName(cats_tagged.select(*lists_tagged.columns))

    members_exploded = union.select(
        "target_list", "src_order", F.posexplode_outer("members").alias("pos", "member")
    )
    # merge-time member order: rank desc (W3), list-before-category on
    # ties, then original position; dedup keep-first per curated (A4).
    mw = Window.partitionBy("target_list", F.col("member.curated")).orderBy(
        F.col("member.rank").desc(), F.col("src_order").asc(), F.col("pos").asc()
    )
    members_merged = (
        members_exploded.filter(F.col("member").isNotNull())
        .withColumn("rn", F.row_number().over(mw))
        .filter(F.col("rn") == 1)
        .groupBy("target_list")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("member.rank")).alias("neg_rank"),
                        "src_order",
                        "pos",
                        F.col("member").alias("m"),
                    )
                )
            ).alias("mm")
        )
        .select("target_list", F.transform("mm", lambda s: s["m"]).alias("members"))
    )

    merged_lists = (
        union.groupBy("target_list")
        .agg(
            F.min(F.when(F.col("src_order") == 0, F.col("item"))).alias("list_item"),
            # min-numeric-qid wins as the stable id (create_merged.py:550-551)
            F.min(F.substring("item", 2, 1 << 30).cast("long")).alias("min_qid_num"),
            F.sum("valid_members_count").alias("valid_members_count"),
            F.sum("invalid_members_count").alias("invalid_members_count"),
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("keywords")))).alias("keywords"),
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("types")))).alias("types"),
            F.min_by("article", "src_order").alias("article"),
            F.min_by("name", "src_order").alias("name"),
            F.min_by("kind", "src_order").alias("kind"),
            # first-non-null/non-empty in list-then-category order — the
            # deterministic stand-in for the reference's file order
            # (`if not collection1.description: take collection2's`):
            F.min(
                F.when(
                    F.col("description").isNotNull(),
                    F.struct(F.col("src_order").alias("o"), F.col("item").alias("i"), F.col("description").alias("v")),
                )
            )["v"].alias("description"),
            F.min(
                F.when(
                    F.size("images") > 0,
                    F.struct(F.col("src_order").alias("o"), F.col("item").alias("i"), F.col("images").alias("v")),
                )
            )["v"].alias("images"),
            F.min(
                F.when(
                    F.size("page_banners") > 0,
                    F.struct(F.col("src_order").alias("o"), F.col("item").alias("i"), F.col("page_banners").alias("v")),
                )
            )["v"].alias("page_banners"),
            F.max("rank").alias("rank"),
            (F.count(F.lit(1)) > 1).alias("is_merged"),
        )
        .withColumn("item", F.concat(F.lit("Q"), F.col("min_qid_num")))
        .withColumn("images", F.coalesce("images", F.array().cast("array<string>")))
        .withColumn("page_banners", F.coalesce("page_banners", F.array().cast("array<string>")))
        .drop("min_qid_num", "list_item")
    )
    merged_lists = merged_lists.join(members_merged, "target_list", "left").withColumn(
        "members", F.coalesce("members", F.array())
    ).drop("target_list")

    out_cols = [
        "item", "types", "article", "kind", "name", "members",
        "valid_members_count", "invalid_members_count", "keywords",
        "description", "images", "page_banners", "rank", "is_merged",
    ]
    return merged_lists.select(*out_cols).unionByName(unmerged_cats.select(*out_cols))
