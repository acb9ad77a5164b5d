"""Final document factory (SURVEY §3.1 last stage; create_merged.py:
859-989 ★) — merged collections → the 5-namespace nested ES document.

Everything except namehash/banner/emoji (library-free pure-Python
UDFs, functions/) is column math: A6 status histogram, A7 floored
mean/median metrics, W2 member ordering, W4 top-k slices, C13
unigram log-probability via an explode+join (no model binary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from namegraph_collections_spark.functions.det_round import round6_det
from namegraph_collections_spark.functions.namehash import ens_namehash_udf
from namegraph_collections_spark.functions.seeded import make_seeded_emoji_udf, seeded_banner_udf

MIN_VALUE = 1e-8  # create_merged.py:41
DESCRIPTION_DEFAULT = (
    "A collection of names auto-generated from Wikipedia and Wikidata using AI"
)


def _exact_median(arr):
    """Exact median of a numeric array column (A7 — the oracle-exact
    replacement for percentile_approx)."""
    s = F.array_sort(arr)
    n = F.size(s)
    mid = (n / 2).cast("int")
    odd = F.try_element_at(s, mid + 1).cast("double")
    even = (F.try_element_at(s, mid) + F.try_element_at(s, mid + 1)).cast("double") / 2
    return F.when(n == 0, F.lit(None)).when(n % 2 == 1, odd).otherwise(even)


def build_documents(
    merged: DataFrame,
    avatar_emojis: dict[str, list[str]] | None = None,
    avatar_counts: dict[str, int] | None = None,
    other_emojis: list[str] | None = None,
    unigram_probs: DataFrame | None = None,
    current_time_ms: float = 0.0,
) -> DataFrame:
    """collection_factory (create_merged.py:859-989) as one plan.

    ``current_time_ms`` is injected (the reference stamps
    time.time()*1000 once per run — :863); avatar tables are the
    broadcast-small CSV (C11); ``unigram_probs`` is
    DataFrame[token, log_prob] for C13 (explode name tokens → join →
    sum; OOV tokens contribute the table's minimum).
    """
    avatar_emojis = avatar_emojis or {}
    avatar_counts = avatar_counts or {}
    other_emojis = other_emojis or ["❓"]

    doc = merged.withColumn("rank", F.greatest(F.col("rank"), F.lit(1)))  # rank_feature ≥ 1

    # A6 ★ status histogram (+ nonavailable) over the members array.
    def _count_status(status_val):
        return F.size(F.filter("members", lambda m: m["status"].eqNullSafe(F.lit(status_val))))

    doc = (
        doc.withColumn("available_count", _count_status("available"))
        .withColumn("taken_count", _count_status("taken"))
        .withColumn("on_sale_count", _count_status("on_sale"))
        .withColumn("recently_released_count", _count_status("recently_released"))
        .withColumn(
            "never_registered_count", F.size(F.filter("members", lambda m: m["status"].isNull()))
        )
        .withColumn(
            "nonavailable_count",
            F.col("taken_count") + F.col("on_sale_count") + F.col("recently_released_count"),
        )
    )

    # W2 ★ re-sort members by log2(rank+1)/max(len,10) desc (stable:
    # curated asc tiebreak — documented deterministic key).
    doc = doc.withColumn(
        "members",
        F.transform(
            F.array_sort(
                F.transform(
                    "members",
                    lambda m: F.struct(
                        (-(F.log2(m["rank"] + 1) / F.greatest(F.length(m["curated"]), F.lit(10)))).alias(
                            "neg_key"
                        ),
                        m["curated"].alias("tie"),
                        m.alias("m"),
                    ),
                )
            ),
            lambda s: s["m"],
        ),
    )

    # template.names with C7 namehash over distinct curated names
    # (distinct→compute→join happens naturally: the UDF runs once per
    # member row here; at reference scale, pre-compute over
    # distinct curated via functions.curation idiom).
    m_exploded = doc.select("item", F.posexplode_outer("members").alias("pos", "m"))
    m_exploded = m_exploded.withColumn(
        "namehash",
        F.when(
            F.col("m").isNotNull(), ens_namehash_udf(F.concat(F.col("m.curated"), F.lit(".eth")))
        ),
    )
    template_names = (
        m_exploded.filter(F.col("m").isNotNull())
        .groupBy("item")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "pos",
                        F.struct(
                            F.col("m.curated").alias("normalized_name"),
                            F.col("m.tokenized").alias("tokenized_name"),
                            F.col("m.interesting_score").alias("system_interesting_score"),
                            F.col("m.rank").alias("rank"),
                            F.col("m.status").alias("cached_status"),
                            F.col("namehash").alias("namehash"),
                        ).alias("tn"),
                    )
                )
            ).alias("tns")
        )
        .select("item", F.transform("tns", lambda s: s["tn"]).alias("template_names"))
    )
    doc = doc.join(template_names, "item", "left").withColumn(
        "template_names", F.coalesce("template_names", F.array())
    )

    # C10 banner + C11 emoji (seeded by item — bit-parity with the
    # reference's random.seed since both run CPython's MT).
    emoji_udf = make_seeded_emoji_udf(avatar_emojis, avatar_counts, other_emojis)
    doc = doc.withColumn("banner_image", seeded_banner_udf(F.col("item"))).withColumn(
        "avatar_emoji",
        emoji_udf(F.col("item"), F.transform("types", lambda t: t["label"])),
    )

    # C13: unigram log-probability of the collection name. The OOV
    # floor (the table's min log_prob) joins in as a broadcast 1-row
    # aggregate — no .collect() during plan construction, so building
    # the plan stays lazy (text_analysis.py uses the same idiom).
    if unigram_probs is not None:
        toks = doc.select(
            "item", F.explode(F.split(F.lower("name"), " ")).alias("token")
        )
        min_lp = unigram_probs.agg(F.min("log_prob").alias("min_lp"))
        lp = (
            toks.join(F.broadcast(unigram_probs), "token", "left")
            .crossJoin(F.broadcast(min_lp))
            .withColumn("log_prob", F.coalesce("log_prob", F.col("min_lp")))
            .groupBy("item")
            .agg(round6_det(F.sum("log_prob")).alias("name_log_probability"))
        )
        doc = doc.join(lp, "item", "left")
    else:
        doc = doc.withColumn("name_log_probability", F.lit(None).cast("double"))

    # A7 ★ metrics: floored means; exact medians.
    ranks = F.transform("members", lambda m: m["rank"])
    iscores = F.transform("members", lambda m: m["interesting_score"])
    n_members = F.size("members")
    doc = (
        doc.withColumn(
            "members_rank_mean",
            F.when(n_members > 0, F.greatest(
                F.aggregate(ranks, F.lit(0.0), lambda a, x: a + x) / n_members, F.lit(MIN_VALUE)
            )).otherwise(F.lit(MIN_VALUE)),
        )
        .withColumn(
            "members_rank_median",
            F.greatest(F.coalesce(_exact_median(ranks), F.lit(0.0)), F.lit(MIN_VALUE)),
        )
        .withColumn(
            "members_score_mean",
            F.when(n_members > 0, F.greatest(
                F.aggregate(iscores, F.lit(0.0), lambda a, x: a + x) / n_members, F.lit(MIN_VALUE)
            )).otherwise(F.lit(MIN_VALUE)),
        )
        .withColumn(
            "members_score_median",
            F.greatest(F.coalesce(_exact_median(iscores), F.lit(0.0)), F.lit(MIN_VALUE)),
        )
        .withColumn(
            "valid_members_ratio",
            F.when(
                (F.col("valid_members_count") + F.col("invalid_members_count")) > 0,
                F.col("valid_members_count").cast("double")
                / (F.col("valid_members_count") + F.col("invalid_members_count")),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "nonavailable_members_ratio",
            F.when(
                n_members > 0,
                F.greatest(
                    F.col("nonavailable_count").cast("double") / n_members, F.lit(MIN_VALUE)
                ),
            ).otherwise(F.lit(MIN_VALUE)),
        )
    )

    # Assemble the 5-namespace nested document (create_merged.py:901-989).
    data_names = F.transform(
        "template_names",
        lambda t: F.struct(
            t["normalized_name"].alias("normalized_name"),
            F.lit("").alias("avatar_override"),
            t["tokenized_name"].alias("tokenized_name"),
        ),
    )
    return doc.select(
        F.struct(
            F.col("name").alias("collection_name"),
            data_names.alias("names"),
            F.lit(DESCRIPTION_DEFAULT).alias("collection_description"),
            F.col("keywords").alias("collection_keywords"),
            F.try_element_at("images", F.lit(1)).alias("collection_image"),
            F.lit(True).alias("public"),
            F.col("banner_image").alias("banner_image"),
            F.col("avatar_emoji").alias("avatar_emoji"),
            F.lit(False).alias("archived"),
        ).alias("data"),
        F.struct(
            F.lit(False).alias("curated"),
            F.lit("Wikipedia").alias("datasource"),
        ).alias("curation"),
        F.struct(
            F.col("item").alias("id"),
            F.size("template_names").alias("members_count"),
            F.col("name_log_probability").alias("collection_name_log_probability"),
            F.lit(current_time_ms).alias("created"),
            F.lit(current_time_ms).alias("modified"),
        ).alias("metadata"),
        F.struct(
            F.col("rank").alias("collection_rank"),
            F.col("types").alias("collection_types"),
            F.col("template_names").alias("names"),
            F.slice("template_names", 1, 10).alias("top10_names"),
            F.slice("template_names", 1, 25).alias("top25_names"),
            F.col("members_rank_mean").alias("members_rank_mean"),
            F.col("members_rank_median").alias("members_rank_median"),
            F.col("members_score_mean").alias("members_system_interesting_score_mean"),
            F.col("members_score_median").alias("members_system_interesting_score_median"),
            F.col("valid_members_count").alias("valid_members_count"),
            F.col("invalid_members_count").alias("invalid_members_count"),
            F.col("valid_members_ratio").alias("valid_members_ratio"),
            F.col("nonavailable_count").alias("nonavailable_members_count"),
            F.col("nonavailable_members_ratio").alias("nonavailable_members_ratio"),
            F.col("available_count").alias("available_count"),
            F.col("taken_count").alias("taken_count"),
            F.col("on_sale_count").alias("on_sale_count"),
            F.col("recently_released_count").alias("recently_released_count"),
            F.col("never_registered_count").alias("never_registered_count"),
            F.col("is_merged").alias("is_merged"),
        ).alias("template"),
    )
