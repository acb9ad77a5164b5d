"""Collections extraction + membership + type validation — the first
half of the reference pipeline (SURVEY §3.1), Spark-first.

Stage contracts mirror /root/reference/airflow/dags/
create_collections.py; every RocksDB lookup is a join, the external
sort + streaming group-adjacent is a groupBy, and the per-member DFS
is a precomputed transitive-closure join (operators/closure.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from namegraph_collections_spark.operators.closure import transitive_closure

# F7: types removed before validation (create_collections.py:633-636).
FILTER_MEMBER_TYPES = ["Q13406463"]  # Wikimedia list article


def id_to_title(wikimapper: DataFrame) -> DataFrame:
    """db1_rev equivalent: qid→title from the wikimapper table
    (create_kv.py:165-180; S8/S10 as a projection)."""
    return (
        wikimapper.filter(F.col("primary_mapping") & ~F.col("redirect"))
        .filter(F.col("wikidata_id").isNotNull())
        .select(F.col("wikidata_id").alias("item"), F.col("wikipedia_title").alias("article"))
    )


def extract_collections(entities: DataFrame, wikimapper: DataFrame, mode: str) -> DataFrame:
    """J1 + F4: entities with list/category predicates ⋈ titles.

    Reference: extract_collections (create_collections.py:41-73) —
    categories keep only 'Category:'-prefixed articles; lists drop
    'Lists_of:'-prefixed ones. Returns [item, type, article, kind].
    """
    predicate = "category_contains" if mode == "category" else "is_a_list_of"
    base = entities.filter(F.size(F.col(predicate)) > 0).select(
        F.col("subject").alias("item"), F.col(predicate).alias("type")
    )
    joined = base.join(id_to_title(wikimapper), "item", "inner")
    if mode == "category":
        joined = joined.filter(F.col("article").startswith("Category:"))
    else:
        joined = joined.filter(~F.col("article").startswith("Lists_of:"))
    return joined.withColumn("kind", F.lit(mode))


def build_allowlists(collections: DataFrame, wikimapper: DataFrame, mode: str) -> DataFrame:
    """F5: allowed categories = their titles (sans prefix, matching
    cl_to); allowed lists = their page ids via wikimapper
    (create_collections.py:76-101)."""
    if mode == "category":
        return collections.select(
            F.regexp_replace("article", "^Category:", "").alias("allowed_title")
        ).distinct()
    return (
        collections.join(
            wikimapper.filter(F.col("primary_mapping") & ~F.col("redirect")),
            collections.article == wikimapper.wikipedia_title,
            "inner",
        )
        .select(F.col("wikipedia_id").alias("allowed_page_id"))
        .distinct()
    )


def link_members(
    categorylinks: DataFrame | None,
    pagelinks: DataFrame | None,
    allowed: DataFrame,
    wikimapper: DataFrame,
    mode: str,
) -> DataFrame:
    """S5 + J2 + F6: link tables → (collection_key, member_title).

    Category edges carry member page-ids (cl_from) that must map to
    titles via wikimapper (J2 — inner join; unmapped rows are the
    reference's `skipped` counter, create_collections.py:391-393).
    List edges (pagelinks) already carry target titles. 'Category:*'
    members are dropped (F6, :388). The allowlist filter is a
    broadcast semi-join — the reference's in-RAM set
    (create_collections.py:160-188) that scales past RAM.
    """
    mapper = wikimapper.filter(F.col("primary_mapping") & ~F.col("redirect")).select(
        "wikipedia_id", "wikipedia_title"
    )
    if mode == "category":
        edges = categorylinks.join(
            F.broadcast(allowed),
            categorylinks.cl_to == allowed.allowed_title,
            "left_semi",
        )
        members = edges.join(mapper, edges.cl_from == mapper.wikipedia_id, "inner").select(
            F.col("cl_to").alias("collection_key"),
            F.col("wikipedia_title").alias("member_title"),
        )
    else:
        edges = pagelinks.join(
            F.broadcast(allowed),
            pagelinks.pl_from == allowed.allowed_page_id,
            "left_semi",
        )
        # list page id → its own title = the collection key
        members = edges.join(mapper, edges.pl_from == mapper.wikipedia_id, "inner").select(
            F.col("wikipedia_title").alias("collection_key"),
            F.col("pl_title").alias("member_title"),
        )
    return members.filter(~F.col("member_title").startswith("Category:"))


def group_members(members: DataFrame, collections: DataFrame, mode: str) -> DataFrame:
    """A1 + J3: group members per collection and attach meta.

    The reference needs LC_ALL=C sort + streaming group-adjacent
    (create_collections.py:430-434, 515-542; W1) — in Spark the sort
    disappears into the shuffle. Members are kept in title-sorted
    array order (the byte-sort order the reference's pipeline
    produces).
    """
    grouped = members.groupBy("collection_key").agg(
        F.array_sort(F.collect_list("member_title")).alias("members")
    )
    if mode == "category":
        key = F.regexp_replace(collections.article, "^Category:", "")
    else:
        key = collections.article
    meta = collections.select("item", "type", "article", "kind", key.alias("collection_key"))
    return meta.join(grouped, "collection_key", "inner").drop("collection_key")


def subclass_reachability(entities: DataFrame, max_depth: int = 25) -> DataFrame:
    """J14 ★ precompute: reachable(src,dst) over subclass_of edges with
    the same_as redirect fallback folded in as an edge rewrite
    (SURVEY §2.3 J14; reference DFS at create_collections.py:545-606).
    """
    edges = entities.select(
        F.col("subject").alias("src"), F.explode_outer("subclass_of").alias("dst")
    ).filter(F.col("dst").isNotNull())
    same_as = entities.filter(F.col("same_as").isNotNull()).select(
        F.col("subject").alias("alias_id"), F.col("same_as").alias("canonical")
    )
    # An alias inherits its canonical's outgoing edges (ParentFinder
    # fallback: db2[X] missing → db2[same_as[X]]); edges pointing at an
    # alias also reach the canonical node.
    via_alias = (
        same_as.join(edges, same_as.canonical == edges.src)
        .select(F.col("alias_id").alias("src"), F.col("dst"))
    )
    to_canonical = (
        edges.join(same_as, edges.dst == same_as.alias_id)
        .select(F.col("src"), F.col("canonical").alias("dst"))
    )
    all_edges = edges.unionByName(via_alias).unionByName(to_canonical).distinct()
    return transitive_closure(all_edges, max_iterations=max_depth)


def validate_members(
    grouped: DataFrame,
    entities: DataFrame,
    wikimapper: DataFrame,
    reachable: DataFrame,
) -> DataFrame:
    """J4 + J14 + F7 + A3: type-validate every member.

    - collection types lose Q13406463; empty → collection dropped (F7)
    - member title → qid: triples' about-mapping first, wikimapper
      fallback, drop if both miss (J4 ★ — two left joins + coalesce)
    - member valid iff any of its instance_of/subclass_of entries (with
      same_as fallback) equals or reaches any collection type (J14 via
      the precomputed closure — the per-row DFS becomes one join)
    - valid/invalid counts per collection (A3)
    """
    cleaned = grouped.withColumn(
        "type_ids", F.array_except("type", F.array(*[F.lit(t) for t in FILTER_MEMBER_TYPES]))
    ).filter(F.size("type_ids") > 0)

    m = cleaned.select(
        "item", "type_ids", F.posexplode("members").alias("pos", "member_title")
    )

    # J4: primary mapping via `about` triples (db1), fallback wikimapper.
    about = entities.filter(F.col("about").isNotNull()).select(
        F.col("subject").alias("about_title"), F.col("about").alias("about_qid")
    )
    wm = wikimapper.filter(F.col("primary_mapping") & ~F.col("redirect")).select(
        F.col("wikipedia_title").alias("wm_title"), F.col("wikidata_id").alias("wm_qid")
    )
    m = (
        m.join(about, m.member_title == about.about_title, "left")
        .join(wm, m.member_title == wm.wm_title, "left")
        .withColumn("member_qid", F.coalesce("about_qid", "wm_qid"))
        .filter(F.col("member_qid").isNotNull())
        .select("item", "type_ids", "pos", "member_title", "member_qid")
    )

    # Member type entries: instance_of ∪ subclass_of, with same_as
    # fallback when the member qid has no entry (ParentFinder,
    # create_collections.py:566-575).
    ent = entities.select(
        F.col("subject").alias("e_qid"),
        F.array_union("instance_of", "subclass_of").alias("entries"),
        F.col("same_as").alias("e_same_as"),
    )
    m = m.join(ent, m.member_qid == ent.e_qid, "left")
    redirected = ent.select(
        F.col("e_qid").alias("r_qid"), F.col("entries").alias("r_entries")
    )
    # The fallback fires when the member's own entry list is EMPTY, not
    # just missing: assemble_entities yields [] (never NULL) for a
    # subject with no instance_of/subclass_of triples, and the
    # reference's ParentFinder falls back on falsy ([] included) —
    # create_collections.py:566-575.
    m = (
        m.join(redirected, m.e_same_as == redirected.r_qid, "left")
        .withColumn(
            "type_entries",
            F.when(F.size(F.coalesce("entries", F.array())) > 0, F.col("entries")).otherwise(
                F.coalesce("r_entries", F.array())
            ),
        )
        .select("item", "type_ids", "pos", "member_title", "member_qid", "type_entries")
    )

    # J14: entry reaches type (or equals it).
    pairs = m.select(
        "item", "type_ids", "pos", "member_title", "member_qid",
        F.explode_outer("type_entries").alias("entry"),
    )
    hit_direct = F.array_contains(F.col("type_ids"), F.col("entry"))
    reach = reachable.select(F.col("src").alias("entry"), F.col("dst").alias("anc"))
    pairs = (
        pairs.join(reach, "entry", "left")
        .withColumn("hit", hit_direct | F.array_contains(F.col("type_ids"), F.col("anc")))
    )
    verdicts = pairs.groupBy("item", "pos", "member_title", "member_qid").agg(
        F.max(F.coalesce("hit", F.lit(False))).alias("is_valid")
    )

    valid = (
        verdicts.filter("is_valid")
        .groupBy("item")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "member_qid", "member_title"))).alias("vm")
        )
        .select(
            "item",
            F.transform(
                "vm", lambda s: F.struct(s["member_qid"].alias("qid"), s["member_title"].alias("title"))
            ).alias("valid_members"),
        )
    )

    out = (
        cleaned.join(valid, "item", "left")
        .withColumn("valid_members", F.coalesce("valid_members", F.array()))
        .select(
            "item",
            F.col("type_ids").alias("type"),
            "article",
            "kind",
            F.col("valid_members").alias("members"),
            F.size("valid_members").alias("valid_members_count"),
            (F.size("members") - F.size("valid_members")).alias("invalid_members_count"),
        )
    )
    return out
