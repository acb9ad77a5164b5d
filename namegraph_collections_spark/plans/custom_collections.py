"""Custom-collections ingest (SURVEY §3.3 fourth path / §7 step 10;
load_custom_collections.py:265-486).

User-authored collections arrive as JSONL rows with per-collection
commands; members normalize/tokenize through the same UDF layer as
the Wikipedia path, get default ranks (the reference's
DEFAULT_*_RANK constants, load_custom_collections.py:116-117), sort
by the command (W5), and emit as the 5-namespace document plus
create/full-update operations against the live index state
(:461-486 — customs are few, so updates are whole-document).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from namegraph_collections_spark.functions.curation import curate_member_udf
from namegraph_collections_spark.functions.namehash import ens_namehash_udf
from namegraph_collections_spark.functions.seeded import seeded_banner_udf

MIN_VALUE = 1e-8  # load_custom_collections.py:115
DEFAULT_COLLECTION_RANK = 1_000_000  # :116
DEFAULT_MEMBER_RANK = 10_000_000  # :117
DESCRIPTION_DEFAULT = "Manually created custom collection"  # :308


def process_custom_collections(
    raw: DataFrame,
    domains: DataFrame | None = None,
    scores: DataFrame | None = None,
    current_time_ms: float = 0.0,
) -> DataFrame:
    """raw[collection_id, collection_name, members array<string>,
    sort_labels, member_rank, description?, keywords?, avatar_emoji?]
    → the nested custom-collection document.

    Members failing normalization drop; collections left with no
    valid members drop entirely (:300-303). Sorts are stable on the
    input member order (Python list.sort parity) via a pos tiebreak.
    """
    spark = raw.sparkSession
    m = raw.select(
        "collection_id", F.posexplode("members").alias("pos", "member")
    ).withColumn("_c", curate_member_udf(F.col("member")))
    m = m.select(
        "collection_id",
        "pos",
        F.col("_c.curated").alias("normalized_name"),
        F.col("_c.tokenized").alias("tokenized_name"),
    ).filter(F.col("normalized_name").isNotNull())

    scores = scores if scores is not None else spark.createDataFrame(
        [], "label string, interesting_score double"
    )
    domains = domains if domains is not None else spark.createDataFrame(
        [], "name string, status string"
    )
    m = (
        m.join(
            F.broadcast(scores.select(F.col("label").alias("normalized_name"), "interesting_score")),
            "normalized_name",
            "left",
        )
        .withColumn("system_interesting_score", F.coalesce("interesting_score", F.lit(0.0)))
        .join(
            F.broadcast(domains.select(F.col("name").alias("normalized_name"), "status")),
            "normalized_name",
            "left",
        )
        .withColumn("namehash", ens_namehash_udf(F.concat("normalized_name", F.lit(".eth"))))
    )

    meta = raw.select(
        "collection_id",
        "collection_name",
        F.coalesce("sort_labels", F.lit("none")).alias("sort_labels"),
        F.coalesce("member_rank", F.lit(DEFAULT_MEMBER_RANK)).alias("member_rank"),
        F.coalesce("description", F.lit(DESCRIPTION_DEFAULT)).alias("description"),
        F.coalesce("keywords", F.array().cast("array<string>")).alias("keywords"),
        "avatar_emoji",
    )
    m = m.join(F.broadcast(meta.select("collection_id", "sort_labels", "member_rank")), "collection_id")

    # W5: command-driven sort key; ties keep input order (stable-sort
    # parity with the reference's list.sort).
    sort_key = (
        F.when(F.col("sort_labels") == "interesting_score", -F.col("system_interesting_score"))
        .when(F.col("sort_labels") == "shortest", F.size("tokenized_name").cast("double"))
        .when(F.col("sort_labels") == "longest", -F.size("tokenized_name").cast("double"))
        .otherwise(F.lit(0.0))
    )
    # a-z sorts the name ascending (_k2); z-a descending (_zrank);
    # numeric commands use _k1; 'none' leaves only the pos tiebreak.
    m = (
        m.withColumn("_k1", sort_key)
        .withColumn(
            "_k2",
            F.when(F.col("sort_labels") == "a-z", F.col("normalized_name")).otherwise(F.lit("")),
        )
        .withColumn(
            "_zrank",
            F.when(F.col("sort_labels") == "z-a", F.col("normalized_name")).otherwise(F.lit("")),
        )
    )
    wz = Window.partitionBy("collection_id").orderBy(
        F.col("_k1").asc(), F.col("_zrank").desc(), F.col("_k2").asc(), F.col("pos").asc()
    )
    m = m.withColumn("ord", F.row_number().over(wz))

    names = m.groupBy("collection_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "ord",
                        F.struct(
                            "normalized_name",
                            "tokenized_name",
                            "system_interesting_score",
                            F.col("member_rank").alias("rank"),
                            F.col("status").alias("cached_status"),
                            "namehash",
                        ).alias("tn"),
                    )
                )
            ),
            lambda s: s["tn"],
        ).alias("template_names")
    )

    def cnt(status_val):
        return F.size(
            F.filter("template_names", lambda t: t["cached_status"].eqNullSafe(F.lit(status_val)))
        )

    doc = meta.join(names, "collection_id")  # inner: drops empty collections
    doc = (
        doc.withColumn("available_count", cnt("available"))
        .withColumn("taken_count", cnt("taken"))
        .withColumn("on_sale_count", cnt("on_sale"))
        .withColumn("recently_released_count", cnt("recently_released"))
        .withColumn(
            "never_registered_count",
            F.size(F.filter("template_names", lambda t: t["cached_status"].isNull())),
        )
        .withColumn(
            "nonavailable_count",
            F.col("taken_count") + F.col("on_sale_count") + F.col("recently_released_count"),
        )
        .withColumn("banner_image", seeded_banner_udf(F.col("collection_id")))
    )
    iscores = F.transform("template_names", lambda t: t["system_interesting_score"])
    n = F.size("template_names")
    doc = doc.withColumn(
        "score_mean",
        F.greatest(F.aggregate(iscores, F.lit(0.0), lambda a, x: a + x) / n, F.lit(MIN_VALUE)),
    )
    return doc.select(
        F.struct(
            F.col("collection_name").alias("collection_name"),
            F.transform(
                "template_names",
                lambda t: F.struct(
                    t["normalized_name"].alias("normalized_name"),
                    F.lit("").alias("avatar_override"),
                    t["tokenized_name"].alias("tokenized_name"),
                ),
            ).alias("names"),
            F.col("description").alias("collection_description"),
            F.col("keywords").alias("collection_keywords"),
            F.lit(None).cast("string").alias("collection_image"),
            F.lit(True).alias("public"),
            F.col("banner_image").alias("banner_image"),
            F.col("avatar_emoji").alias("avatar_emoji"),
            F.lit(False).alias("archived"),
        ).alias("data"),
        F.struct(
            F.lit(True).alias("curated"),  # custom = manually curated
            F.lit("custom").alias("datasource"),
        ).alias("curation"),
        F.struct(
            F.col("collection_id").alias("id"),
            F.size("template_names").alias("members_count"),
            F.lit(current_time_ms).alias("created"),
            F.lit(current_time_ms).alias("modified"),
        ).alias("metadata"),
        F.struct(
            F.lit(DEFAULT_COLLECTION_RANK).alias("collection_rank"),
            F.col("template_names").alias("names"),
            F.slice("template_names", 1, 10).alias("top10_names"),
            F.slice("template_names", 1, 25).alias("top25_names"),
            F.col("score_mean").alias("members_system_interesting_score_mean"),
            F.col("nonavailable_count").alias("nonavailable_members_count"),
            F.col("available_count").alias("available_count"),
            F.col("taken_count").alias("taken_count"),
            F.col("on_sale_count").alias("on_sale_count"),
            F.col("recently_released_count").alias("recently_released_count"),
            F.col("never_registered_count").alias("never_registered_count"),
        ).alias("template"),
    )


def custom_update_operations(docs: DataFrame, index_state: DataFrame) -> DataFrame:
    """Create/full-update ops for custom docs (:461-486): id in the
    live index → full 'update'; else → 'create'. Customs are few, so
    whole-document updates (no minimal diff) — the index-state side
    broadcasts."""
    state = F.broadcast(index_state.select(F.col("id").alias("_es_id")))
    j = docs.join(state, docs["metadata.id"] == F.col("_es_id"), "left")
    return j.select(
        F.when(F.col("_es_id").isNotNull(), F.lit("update")).otherwise(F.lit("create")).alias(
            "op"
        ),
        F.col("metadata.id").alias("doc_id"),
        F.struct("data", "curation", "metadata", "template").alias("doc"),
    )
