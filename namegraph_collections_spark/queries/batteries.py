"""Driver-window composites (round-6 widening of driver coverage).

The external driver value-hashes only the first 50 registry rows, but
the registry holds more operators than slots. Following the
``string_ops_battery``/``customer_key_set_algebra`` precedent, each
battery here unions SEVERAL unchanged single-operator queries into one
tagged result — null-padded to a common schema — so one driver row
hash-pins every component's FULL output. The single-operator forms
stay registered (after the window) for the local parity sweep and for
users who want one operator's plain result.

Construction rule: a battery calls the registered component functions
and wraps the component ORACLES verbatim (read from the registry at
import time), so the battery can never drift from the singles — any
edit to a component changes both sides of the battery identically.

Scale note: a union of k independent plans executes each branch with
its own (already audited) shuffle structure; the union itself is a
zero-shuffle concatenation of partition lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.queries.event_analytics import (
    cohort_retention,
    event_transition_matrix,
    funnel_conversion,
)
from namegraph_collections_spark.queries.registry import REGISTRY, register
from namegraph_collections_spark.queries.similarity import (
    cosine_topk_bruteforce,
    ivf_topk,
    lsh_bucket_neighbors,
)
from namegraph_collections_spark.queries.temporal import (
    asof_join_chunked_events,
    asof_join_events,
    interval_range_join,
)
from namegraph_collections_spark.queries.text_analysis import (
    token_frequencies,
    unigram_logprob,
)

# Typed null pads must be built lazily: F.lit() needs an active
# SparkContext, and this module imports at registry-population time
# (before any session exists).
def _NULL_I():
    return F.lit(None).cast("int")


def _NULL_L():
    return F.lit(None).cast("long")


def _NULL_D():
    return F.lit(None).cast("double")


def _NULL_S():
    return F.lit(None).cast("string")


def _oracle(name: str) -> str:
    return REGISTRY[name].oracle  # type: ignore[return-value]


# ---------------------------------------------------------------------------
# Temporal battery: plain as-of + chunked as-of + binned interval join.
# The as-of pair shares one oracle by contract (output-identical
# formulations); hashing BOTH under different tags makes the driver
# itself witness that the skew-proof chunked plan equals the one-window
# plan, not just our local tests.
# ---------------------------------------------------------------------------
@register(
    "temporal_join_battery",
    oracle=f"""
    SELECT 'asof' AS op, click_event_id AS event_id, user_id,
           click_ts_us AS ts_us, purchase_event_id AS match_event_id,
           purchase_ts_us AS match_ts_us, staleness_us,
           purchase_value AS val,
           CAST(NULL AS BIGINT) AS n_clicks, CAST(NULL AS BIGINT) AS first_click_us
    FROM ({_oracle("asof_join_events")})
    UNION ALL
    SELECT 'asof_chunked' AS op, click_event_id, user_id, click_ts_us,
           purchase_event_id, purchase_ts_us, staleness_us, purchase_value,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM ({_oracle("asof_join_chunked_events")})
    UNION ALL
    SELECT 'interval' AS op, purchase_event_id, user_id, start_us,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           total_click_value, n_clicks, first_click_us
    FROM ({_oracle("interval_range_join")})
    """,
)
def temporal_join_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join + chunked as-of + binned interval range join in one
    tagged result (see module docstring). Components unchanged:
    queries/temporal.py; operator design notes in operators/temporal.py.
    """
    asof = asof_join_events(spark, sf_dir).select(
        F.lit("asof").alias("op"),
        F.col("click_event_id").alias("event_id"),
        "user_id",
        F.col("click_ts_us").alias("ts_us"),
        F.col("purchase_event_id").alias("match_event_id"),
        F.col("purchase_ts_us").alias("match_ts_us"),
        "staleness_us",
        F.col("purchase_value").alias("val"),
        _NULL_L().alias("n_clicks"),
        _NULL_L().alias("first_click_us"),
    )
    chunked = asof_join_chunked_events(spark, sf_dir).select(
        F.lit("asof_chunked").alias("op"),
        F.col("click_event_id").alias("event_id"),
        "user_id",
        F.col("click_ts_us").alias("ts_us"),
        F.col("purchase_event_id").alias("match_event_id"),
        F.col("purchase_ts_us").alias("match_ts_us"),
        "staleness_us",
        F.col("purchase_value").alias("val"),
        _NULL_L().alias("n_clicks"),
        _NULL_L().alias("first_click_us"),
    )
    interval = interval_range_join(spark, sf_dir).select(
        F.lit("interval").alias("op"),
        F.col("purchase_event_id").alias("event_id"),
        "user_id",
        F.col("start_us").alias("ts_us"),
        _NULL_L().alias("match_event_id"),
        _NULL_L().alias("match_ts_us"),
        _NULL_L().alias("staleness_us"),
        F.col("total_click_value").alias("val"),
        "n_clicks",
        "first_click_us",
    )
    return asof.unionByName(chunked).unionByName(interval)


# ---------------------------------------------------------------------------
# Event-analytics battery: ordered funnel + cohort retention +
# transition matrix — all over `events`, disjoint output schemas.
# ---------------------------------------------------------------------------
@register(
    "event_analytics_battery",
    oracle=f"""
    SELECT 'funnel' AS op, stage, CAST(NULL AS BIGINT) AS cohort_day,
           CAST(NULL AS BIGINT) AS offset_days,
           CAST(NULL AS VARCHAR) AS prev_type, CAST(NULL AS VARCHAR) AS next_type,
           n_users AS n
    FROM ({_oracle("funnel_conversion")})
    UNION ALL
    SELECT 'cohort' AS op, CAST(NULL AS INTEGER), cohort_day, offset_days,
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), n_active
    FROM ({_oracle("cohort_retention")})
    UNION ALL
    SELECT 'transition' AS op, CAST(NULL AS INTEGER), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), prev_type, next_type, n
    FROM ({_oracle("event_transition_matrix")})
    """,
)
def event_analytics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel + cohort-retention triangle + event transition
    matrix in one tagged result. Components unchanged:
    queries/event_analytics.py (single shuffle key end-to-end each).
    """
    funnel = funnel_conversion(spark, sf_dir).select(
        F.lit("funnel").alias("op"),
        "stage",
        _NULL_L().alias("cohort_day"),
        _NULL_L().alias("offset_days"),
        _NULL_S().alias("prev_type"),
        _NULL_S().alias("next_type"),
        F.col("n_users").alias("n"),
    )
    cohort = cohort_retention(spark, sf_dir).select(
        F.lit("cohort").alias("op"),
        _NULL_I().alias("stage"),
        "cohort_day",
        "offset_days",
        _NULL_S().alias("prev_type"),
        _NULL_S().alias("next_type"),
        F.col("n_active").alias("n"),
    )
    trans = event_transition_matrix(spark, sf_dir).select(
        F.lit("transition").alias("op"),
        _NULL_I().alias("stage"),
        _NULL_L().alias("cohort_day"),
        _NULL_L().alias("offset_days"),
        "prev_type",
        "next_type",
        "n",
    )
    return funnel.unionByName(cohort).unionByName(trans)


# ---------------------------------------------------------------------------
# Similarity battery: brute-force cosine baseline + learned-IVF ANN +
# LSH sign bucketing — the three ANN strategies over `embeddings`.
# ---------------------------------------------------------------------------
@register(
    "similarity_battery",
    oracle=f"""
    SELECT 'cos' AS op, q_id, c_id, CAST(c_label AS BIGINT) AS c_label,
           CAST(NULL AS VARCHAR) AS labels,
           CAST(NULL AS INTEGER) AS grp, cosine, rnk,
           CAST(NULL AS BIGINT) AS n_vecs
    FROM ({_oracle("cosine_topk_bruteforce")})
    UNION ALL
    SELECT 'ivf' AS op, q_id, c_id, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           c_cluster, cosine, rnk, CAST(NULL AS BIGINT)
    FROM ({_oracle("ivf_topk")})
    UNION ALL
    SELECT 'lsh' AS op, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), labels,
           bucket, CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT), n_vecs
    FROM ({_oracle("lsh_bucket_neighbors")})
    """,
)
def similarity_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k + IVF (learned lists) top-k + LSH
    bucket census in one tagged result. Components unchanged:
    queries/similarity.py.
    """
    cos = cosine_topk_bruteforce(spark, sf_dir).select(
        F.lit("cos").alias("op"),
        "q_id",
        "c_id",
        F.col("c_label").cast("long").alias("c_label"),
        _NULL_S().alias("labels"),
        _NULL_I().alias("grp"),
        "cosine",
        "rnk",
        _NULL_L().alias("n_vecs"),
    )
    ivf = ivf_topk(spark, sf_dir).select(
        F.lit("ivf").alias("op"),
        "q_id",
        "c_id",
        _NULL_L().alias("c_label"),
        _NULL_S().alias("labels"),
        F.col("c_cluster").cast("int").alias("grp"),
        "cosine",
        "rnk",
        _NULL_L().alias("n_vecs"),
    )
    lsh = lsh_bucket_neighbors(spark, sf_dir).select(
        F.lit("lsh").alias("op"),
        _NULL_L().alias("q_id"),
        _NULL_L().alias("c_id"),
        _NULL_L().alias("c_label"),
        "labels",
        F.col("bucket").cast("int").alias("grp"),
        _NULL_D().alias("cosine"),
        _NULL_I().alias("rnk"),
        "n_vecs",
    )
    return cos.unionByName(ivf).unionByName(lsh)


# ---------------------------------------------------------------------------
# Unigram text battery: corpus token/document frequencies + per-doc
# unigram-LM log-probability.
# ---------------------------------------------------------------------------
@register(
    "unigram_text_battery",
    oracle=f"""
    SELECT 'freq' AS op, token, CAST(NULL AS BIGINT) AS doc_id, n, df,
           CAST(NULL AS DOUBLE) AS logp
    FROM ({_oracle("token_frequencies")})
    UNION ALL
    SELECT 'logprob' AS op, CAST(NULL AS VARCHAR), doc_id,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), name_log_probability
    FROM ({_oracle("unigram_logprob")})
    """,
)
def unigram_text_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token/document frequencies + unigram-LM per-doc log-probability
    in one tagged result. Components unchanged: queries/text_analysis.py.
    """
    freq = token_frequencies(spark, sf_dir).select(
        F.lit("freq").alias("op"),
        "token",
        _NULL_L().alias("doc_id"),
        "n",
        "df",
        _NULL_D().alias("logp"),
    )
    lp = unigram_logprob(spark, sf_dir).select(
        F.lit("logprob").alias("op"),
        _NULL_S().alias("token"),
        "doc_id",
        _NULL_L().alias("n"),
        _NULL_L().alias("df"),
        F.col("name_log_probability").alias("logp"),
    )
    return freq.unionByName(lp)


# ---------------------------------------------------------------------------
# Round-6 second wave (same construction rules as above).
# ---------------------------------------------------------------------------
from namegraph_collections_spark.queries.dedup import (  # noqa: E402
    exact_dedup_groups,
    passage_dedup,
    tfidf_cosine_pairs,
)
from namegraph_collections_spark.queries.relational import (  # noqa: E402
    hourly_event_rollup,
)
from namegraph_collections_spark.queries.rollups import (  # noqa: E402
    cascading_time_rollup,
    incremental_hourly_rollup,
)
from namegraph_collections_spark.queries.scale_ops import (  # noqa: E402
    grouped_deterministic_sample,
)
from namegraph_collections_spark.queries.training_data import (  # noqa: E402
    deterministic_mix_sample,
    deterministic_split,
    weighted_sample_topk,
)


@register(
    "rollup_battery",
    oracle=f"""
    SELECT 'hourly' AS op, CAST(NULL AS VARCHAR) AS grain, hour_us AS bucket_us,
           event_type, n, total_value, CAST(NULL AS DOUBLE) AS mean_value
    FROM ({_oracle("hourly_event_rollup")})
    UNION ALL
    SELECT 'cascading' AS op, grain, bucket_us, event_type, n, total_value,
           CAST(NULL AS DOUBLE)
    FROM ({_oracle("cascading_time_rollup")})
    UNION ALL
    SELECT 'incremental' AS op, CAST(NULL AS VARCHAR), bucket_us, event_type,
           n_events, total_value, mean_value
    FROM ({_oracle("incremental_hourly_rollup")})
    """,
)
def rollup_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup + minute→hour→day cascade + split-and-merge
    incremental rollup in one tagged result. Components unchanged:
    queries/relational.py, queries/rollups.py.
    """
    hourly = hourly_event_rollup(spark, sf_dir).select(
        F.lit("hourly").alias("op"),
        _NULL_S().alias("grain"),
        F.col("hour_us").alias("bucket_us"),
        "event_type",
        "n",
        "total_value",
        _NULL_D().alias("mean_value"),
    )
    casc = cascading_time_rollup(spark, sf_dir).select(
        F.lit("cascading").alias("op"),
        "grain",
        "bucket_us",
        "event_type",
        "n",
        "total_value",
        _NULL_D().alias("mean_value"),
    )
    inc = incremental_hourly_rollup(spark, sf_dir).select(
        F.lit("incremental").alias("op"),
        _NULL_S().alias("grain"),
        "bucket_us",
        "event_type",
        F.col("n_events").alias("n"),
        "total_value",
        "mean_value",
    )
    return hourly.unionByName(casc).unionByName(inc)


@register(
    "sampling_battery",
    oracle=f"""
    SELECT 'mix' AS op, doc_id, source, CAST(NULL AS VARCHAR) AS split,
           CAST(NULL AS INTEGER) AS rk, CAST(NULL AS BIGINT) AS w,
           CAST(NULL AS DOUBLE) AS skey, CAST(NULL AS INTEGER) AS rnk,
           CAST(NULL AS BIGINT) AS n_docs, CAST(NULL AS BIGINT) AS min_doc_id,
           CAST(NULL AS BIGINT) AS max_doc_id, CAST(NULL AS BIGINT) AS doc_id_sum
    FROM ({_oracle("deterministic_mix_sample")})
    UNION ALL
    SELECT 'grouped' AS op, doc_id, source, CAST(NULL AS VARCHAR), rk,
           CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS INTEGER),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT)
    FROM ({_oracle("grouped_deterministic_sample")})
    UNION ALL
    SELECT 'weighted' AS op, doc_id, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS INTEGER), w, skey, rnk,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT)
    FROM ({_oracle("weighted_sample_topk")})
    UNION ALL
    SELECT 'split' AS op, CAST(NULL AS BIGINT), source, split,
           CAST(NULL AS INTEGER), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
           CAST(NULL AS INTEGER), n_docs, min_doc_id, max_doc_id, doc_id_sum
    FROM ({_oracle("deterministic_split")})
    """,
)
def sampling_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four deterministic selection policies in one tagged result:
    temperature-mix sampling, per-group hash-order sampling, weighted
    reservoir (A-Res) top-k, and the content-addressed train/val/test
    split. Components unchanged: queries/training_data.py,
    queries/scale_ops.py.
    """
    mix = deterministic_mix_sample(spark, sf_dir).select(
        F.lit("mix").alias("op"),
        "doc_id",
        "source",
        _NULL_S().alias("split"),
        _NULL_I().alias("rk"),
        _NULL_L().alias("w"),
        _NULL_D().alias("skey"),
        _NULL_I().alias("rnk"),
        _NULL_L().alias("n_docs"),
        _NULL_L().alias("min_doc_id"),
        _NULL_L().alias("max_doc_id"),
        _NULL_L().alias("doc_id_sum"),
    )
    grouped = grouped_deterministic_sample(spark, sf_dir).select(
        F.lit("grouped").alias("op"),
        "doc_id",
        "source",
        _NULL_S().alias("split"),
        "rk",
        _NULL_L().alias("w"),
        _NULL_D().alias("skey"),
        _NULL_I().alias("rnk"),
        _NULL_L().alias("n_docs"),
        _NULL_L().alias("min_doc_id"),
        _NULL_L().alias("max_doc_id"),
        _NULL_L().alias("doc_id_sum"),
    )
    weighted = weighted_sample_topk(spark, sf_dir).select(
        F.lit("weighted").alias("op"),
        "doc_id",
        _NULL_S().alias("source"),
        _NULL_S().alias("split"),
        _NULL_I().alias("rk"),
        "w",
        "skey",
        "rnk",
        _NULL_L().alias("n_docs"),
        _NULL_L().alias("min_doc_id"),
        _NULL_L().alias("max_doc_id"),
        _NULL_L().alias("doc_id_sum"),
    )
    split = deterministic_split(spark, sf_dir).select(
        F.lit("split").alias("op"),
        _NULL_L().alias("doc_id"),
        "source",
        "split",
        _NULL_I().alias("rk"),
        _NULL_L().alias("w"),
        _NULL_D().alias("skey"),
        _NULL_I().alias("rnk"),
        "n_docs",
        "min_doc_id",
        "max_doc_id",
        "doc_id_sum",
    )
    return mix.unionByName(grouped).unionByName(weighted).unionByName(split)


@register(
    "lexical_dedup_battery",
    oracle=f"""
    SELECT 'exact' AS op, fingerprint AS fp, CAST(NULL AS VARCHAR) AS s,
           canonical_doc_id AS id_a, CAST(NULL AS BIGINT) AS id_b,
           dup_count AS cnt, CAST(NULL AS BIGINT) AS nd,
           CAST(NULL AS DOUBLE) AS cosine
    FROM ({_oracle("exact_dedup_groups")})
    UNION ALL
    SELECT 'passage' AS op, passage_hash, passage, first_doc_id,
           CAST(NULL AS BIGINT), n_occurrences, n_docs, CAST(NULL AS DOUBLE)
    FROM ({_oracle("passage_dedup")})
    UNION ALL
    SELECT 'tfidf' AS op, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           doc_a, doc_b, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), cosine
    FROM ({_oracle("tfidf_cosine_pairs")})
    """,
)
def lexical_dedup_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fingerprint groups + cross-document passage dedup +
    idf-weighted cosine pairs in one tagged result. Components
    unchanged: queries/dedup.py.
    """
    exact = exact_dedup_groups(spark, sf_dir).select(
        F.lit("exact").alias("op"),
        F.col("fingerprint").alias("fp"),
        _NULL_S().alias("s"),
        F.col("canonical_doc_id").alias("id_a"),
        _NULL_L().alias("id_b"),
        F.col("dup_count").alias("cnt"),
        _NULL_L().alias("nd"),
        _NULL_D().alias("cosine"),
    )
    passage = passage_dedup(spark, sf_dir).select(
        F.lit("passage").alias("op"),
        F.col("passage_hash").alias("fp"),
        F.col("passage").alias("s"),
        F.col("first_doc_id").alias("id_a"),
        _NULL_L().alias("id_b"),
        F.col("n_occurrences").alias("cnt"),
        F.col("n_docs").alias("nd"),
        _NULL_D().alias("cosine"),
    )
    tfidf = tfidf_cosine_pairs(spark, sf_dir).select(
        F.lit("tfidf").alias("op"),
        _NULL_S().alias("fp"),
        _NULL_S().alias("s"),
        F.col("doc_a").alias("id_a"),
        F.col("doc_b").alias("id_b"),
        _NULL_L().alias("cnt"),
        _NULL_L().alias("nd"),
        "cosine",
    )
    return exact.unionByName(passage).unionByName(tfidf)
