"""Targeted data selection for LLM pretraining — two published
methods the reference's curation pipeline has no analogue for but a
100 TB training-data engine needs as first-class operators:

- **DSIR importance weights** (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling"): score every raw
  document by how target-like its hashed n-gram feature counts are —
  ``w(x) = sum_f c_f(x) * (log p_target(f) - log p_raw(f))`` over B
  hash buckets with add-1 smoothing — and keep raw documents whose
  weight clears the scale-free threshold 0 (more target-like than
  raw-like). The paper resamples with Gumbel noise; the engine's
  deterministic variant thresholds the exact integer micro-nat weight
  so the result is oracle-checkable and reproducible across runs.

- **CCNet perplexity bucketing** (Wenzek et al. 2020, "CCNet:
  Extracting High Quality Monolingual Datasets from Web Crawl
  Data" §4.3): per predicted language, split the corpus into
  head/middle/tail by LM perplexity terciles — the standard
  quality-stratification stage CC-derived corpora (CCNet, RedPajama,
  &c.) apply before mixing. Composes two existing operators: the
  language_id classifier picks each document's language, the
  bigram-LM NLL is the perplexity score (monotone-identical, same
  convention as bigram_lm_perplexity's docstring).

Both stay entirely JVM-side (no Python in the plan) and keep every
hash-surface column integer/string/boolean per the round-8 rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.queries.registry import (
    REGISTRY,
    register,
    spread,
    tbl,
)
from namegraph_collections_spark.queries.text_analysis import (
    bigram_lm_perplexity,
    language_id,
)

# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------

#: Hash-bucket count for the n-gram feature space (the paper uses 10k;
#: the bucket table must stay broadcast-sized — B rows — at any corpus
#: size, so B is a constant, not data-dependent).
DSIR_B = 1024

#: The target distribution's documents: a source allowlist (in
#: production: the high-quality corpus you want more of — Wikipedia,
#: books; here: four of the twenty synthetic sources, so target and
#: raw are both non-trivial at every scale).
DSIR_TARGET_SRCS = ("src0", "src1", "src2", "src3")

_DSIR_TARGET_PRED = "source IN ('" + "', '".join(DSIR_TARGET_SRCS) + "')"

#: 16-bit md5 prefix → bucket id in [0, B): the engine's standard
#: portable hash (same family as training_data._bucket16 /
#: text_analysis._LM_IS_TRAIN_SQL — identical hex on both engines).
_DSIR_BUCKET_DUCK = (
    "CAST('0x' || substr(md5(gram), 1, 4) AS BIGINT) % " + str(DSIR_B)
)
_DSIR_BUCKET_SPARK = (
    f"CAST(conv(substr(md5(gram), 1, 4), 16, 10) AS BIGINT) % {DSIR_B}"
)

#: Integer micro-nat log-probability of a smoothed bucket: floor-form
#: micro rounding of ln((c + 1) / (tot + B)) — the det_round
#: convention for double-computed logs, landed directly as BIGINT so
#: no double survives to the hash surface. Same IEEE op sequence on
#: both engines for the same integer inputs.
def _lp_micro_sql(c: str, tot: str) -> str:
    return (
        f"CAST(floor(ln((({c}) + 1.0) / (({tot}) + {DSIR_B}.0))"
        " * 1000000 + 0.5) AS BIGINT)"
    )


def dsir_hashed_grams_of(docs: DataFrame) -> DataFrame:
    """The feature program as a pure transformation — (doc_id,
    is_target, bucket), one row per unigram/bigram occurrence. Shared
    by the one-shot query, the incremental bucket-state maintenance
    (operators/dsir_maintain.py), and its streaming twin, so the
    three can never drift."""
    toked = docs.selectExpr(
        "doc_id",
        f"{_DSIR_TARGET_PRED} AS is_target",
        "filter(split(replace(text, chr(10), ' '), ' '), x -> x != '') AS words",
    )
    grams = toked.select(
        "doc_id",
        "is_target",
        F.explode(
            F.expr(
                "concat(words, transform("
                "  slice(sequence(1, size(words)), 1,"
                "        greatest(size(words) - 1, 0)),"
                "  i -> concat(element_at(words, i), ' ',"
                "              element_at(words, i + 1))))"
            )
        ).alias("gram"),
    )
    return grams.select(
        "doc_id", "is_target", F.expr(_DSIR_BUCKET_SPARK).alias("bucket")
    )


def dsir_bucket_weights_of(hashed: DataFrame) -> DataFrame:
    """(bucket, lw_micro) from a hashed-gram frame: the two smoothed
    log-distributions' difference in exact integer micro-nats. Bucket
    tables are <= {DSIR_B} rows regardless of corpus size (broadcast
    class)."""
    tgt = hashed.filter("is_target").groupBy("bucket").agg(
        F.count(F.lit(1)).alias("ct")
    )
    raw = hashed.filter("NOT is_target").groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cr")
    )
    tot = hashed.agg(
        F.sum(F.col("is_target").cast("long")).alias("t_tot"),
        F.sum((~F.col("is_target")).cast("long")).alias("r_tot"),
    )
    return (
        hashed.select("bucket")
        .distinct()
        .join(F.broadcast(tgt), "bucket", "left")
        .join(F.broadcast(raw), "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "bucket",
            f"{_lp_micro_sql('COALESCE(ct, 0)', 't_tot')}"
            f" - {_lp_micro_sql('COALESCE(cr, 0)', 'r_tot')} AS lw_micro",
        )
    )


def dsir_score_against(docs: DataFrame, bw: DataFrame) -> DataFrame:
    """Score documents against an ALREADY-BUILT (bucket, lw_micro)
    weight table — the ingest-time path: a stream of new documents
    broadcast-joins the (tiny) weight snapshot, no state touched.
    Buckets absent from the table contribute 0 (they carried no
    evidence either way when the table was fitted)."""
    db = dsir_hashed_grams_of(docs).groupBy(
        "doc_id", "is_target", "bucket"
    ).agg(F.count(F.lit(1)).alias("c"))
    return (
        db.join(F.broadcast(bw), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            (F.max(F.col("is_target").cast("int")) == 1).alias("is_target"),
            F.sum("c").cast("long").alias("n_grams"),
            F.sum(F.col("c") * F.coalesce(F.col("lw_micro"), F.lit(0)))
            .cast("long")
            .alias("weight_micro"),
        )
        .select(
            "doc_id",
            "is_target",
            "n_grams",
            "weight_micro",
            (~F.col("is_target") & (F.col("weight_micro") >= 0)).alias(
                "selected"
            ),
        )
    )



@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH toked AS MATERIALIZED (
      SELECT doc_id, {_DSIR_TARGET_PRED} AS is_target,
             list_filter(string_split(replace(text, chr(10), ' '), ' '),
                         x -> x <> '') AS words
      FROM documents
    ),
    grams AS MATERIALIZED (
      SELECT doc_id, is_target,
             unnest(words || list_transform(range(1, len(words)),
                    i -> words[i] || ' ' || words[i+1])) AS gram
      FROM toked
    ),
    hashed AS MATERIALIZED (
      SELECT doc_id, is_target, {_DSIR_BUCKET_DUCK} AS bucket FROM grams
    ),
    tgt AS (
      SELECT bucket, COUNT(*) AS ct FROM hashed WHERE is_target GROUP BY 1
    ),
    raw AS (
      SELECT bucket, COUNT(*) AS cr FROM hashed WHERE NOT is_target GROUP BY 1
    ),
    tot AS (
      SELECT (SELECT COUNT(*) FROM hashed WHERE is_target) AS t_tot,
             (SELECT COUNT(*) FROM hashed WHERE NOT is_target) AS r_tot
    ),
    bw AS (
      SELECT b.bucket,
             {_lp_micro_sql("COALESCE(t.ct, 0)", "tot.t_tot")}
             - {_lp_micro_sql("COALESCE(r.cr, 0)", "tot.r_tot")} AS lw_micro
      FROM (SELECT DISTINCT bucket FROM hashed) b
      LEFT JOIN tgt t USING (bucket)
      LEFT JOIN raw r USING (bucket)
      CROSS JOIN tot
    ),
    db AS (
      SELECT doc_id, is_target, bucket, COUNT(*) AS c
      FROM hashed GROUP BY 1, 2, 3
    )
    SELECT db.doc_id,
           CAST(MAX(CAST(db.is_target AS INTEGER)) AS INTEGER) = 1 AS is_target,
           CAST(SUM(db.c) AS BIGINT) AS n_grams,
           CAST(SUM(db.c * bw.lw_micro) AS BIGINT) AS weight_micro,
           NOT (CAST(MAX(CAST(db.is_target AS INTEGER)) AS INTEGER) = 1)
             AND CAST(SUM(db.c * bw.lw_micro) AS BIGINT) >= 0 AS selected
    FROM db JOIN bw USING (bucket)
    GROUP BY db.doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) importance weight per document over
    hashed unigram+bigram features ({DSIR_B} md5 buckets, add-1
    smoothing): ``weight_micro = sum_b c_b * (log p_target(b) -
    log p_raw(b))`` in exact integer micro-nats, plus the scale-free
    deterministic selection flag (``selected`` = raw document with
    weight >= 0, i.e. its features are likelier under the target
    distribution than under the raw one; the paper's Gumbel-noise
    resampling trades determinism for diversity — the threshold form
    keeps the operator oracle-checkable, and a caller wanting the
    paper's variant adds seeded noise to ``weight_micro`` upstream of
    the flag).

    Scale shape: ONE gram explode feeds (a) the per-(doc, bucket)
    count — a partial-aggregated shuffle whose key count per doc is
    capped by B — and (b) the two bucket tables, which are ≤ {DSIR_B}
    rows each REGARDLESS of corpus size and broadcast back onto the
    per-doc counts; totals are a 1-row broadcast cross join. The
    per-doc reduce is one groupBy(doc_id). No global sort, no window,
    no Python anywhere.
    """
    docs = spread(tbl(spark, sf_dir, "documents"), "doc_id")
    hashed = dsir_hashed_grams_of(docs).localCheckpoint(eager=False)
    # localCheckpoint: the hashed-gram frame feeds four aggregations
    # (tgt/raw/tot/per-doc counts); without the cut each one replays
    # the scan+explode (ReusedExchange does not dedup across the
    # join/union boundaries — the battery-wide finding).
    bw = dsir_bucket_weights_of(hashed)
    db = hashed.groupBy("doc_id", "is_target", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        db.join(F.broadcast(bw), "bucket")
        .groupBy("doc_id")
        .agg(
            (F.max(F.col("is_target").cast("int")) == 1).alias("is_target"),
            F.sum("c").cast("long").alias("n_grams"),
            F.sum(F.col("c") * F.col("lw_micro")).cast("long").alias("weight_micro"),
        )
        .select(
            "doc_id",
            "is_target",
            "n_grams",
            "weight_micro",
            (~F.col("is_target") & (F.col("weight_micro") >= 0)).alias("selected"),
        )
    )


# ---------------------------------------------------------------------------
# CCNet perplexity bucketing
# ---------------------------------------------------------------------------


@register(
    "ccnet_ppl_buckets",
    # Embeds both component oracles verbatim (battery construction
    # rule): the bucketing can never drift from the classifier or the
    # LM it composes.
    oracle=f"""
    WITH ppl AS ({REGISTRY["bigram_lm_perplexity"].oracle}),
    lid AS ({REGISTRY["language_id"].oracle}),
    pred AS (SELECT doc_id, lang FROM lid WHERE rnk = 1),
    j AS (
      SELECT p.doc_id, l.lang,
             CAST(floor(p.nll * 1000000 + 0.5) AS BIGINT) AS nll_micro
      FROM ppl p JOIN pred l USING (doc_id)
    ),
    r AS (
      SELECT doc_id, lang, nll_micro,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang
                  ORDER BY nll_micro, doc_id) AS INTEGER) AS rnk,
             CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS lang_n
      FROM j
    )
    SELECT doc_id, lang, nll_micro, lang_n, rnk,
           CASE WHEN rnk * 3 <= lang_n THEN 'head'
                WHEN rnk * 3 <= lang_n * 2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM r
    """,
)
def ccnet_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet §4.3 quality stratification: per PREDICTED language
    (language_id's rnk=1 row), rank documents by bigram-LM NLL (exact
    integer micro-nats — the monotone stand-in for perplexity) and
    split into head/middle/tail terciles with a pure integer rule
    (head: rnk*3 <= n; middle: rnk*3 <= 2n; ties broken by doc_id, so
    the cut is total-ordered and engine-independent).

    Scale shape: composes two scan-shaped operators, then ONE window
    partitioned by language over a slim (doc_id, lang, nll_micro)
    frame. With few languages the per-language sort is the honest
    exact-tercile cost; the 100 TB production path replaces it with
    the histogram_quantiles machinery per language (fixed NLL grid →
    two threshold rows per language → broadcast join back), trading
    exact tercile edges for a bounded-merge plan — the same
    exact-vs-histogram trade documented on length_percentile_trim.
    The exact form is kept registered because it is the
    oracle-checkable one.
    """
    return ccnet_ppl_buckets_from(
        bigram_lm_perplexity(spark, sf_dir), language_id(spark, sf_dir)
    )


def ccnet_ppl_buckets_from(ppl: DataFrame, lid: DataFrame) -> DataFrame:
    """The bucketing over ALREADY-BUILT component frames — the sharing
    seam for battery use (unigram_text_battery feeds its own
    checkpointed bigram-LM frame so the LM trains once)."""
    pred = lid.filter(F.col("rnk") == 1).select("doc_id", "lang")
    j = ppl.join(pred, "doc_id").select(
        "doc_id",
        "lang",
        F.expr("CAST(floor(nll * 1000000 + 0.5) AS BIGINT)").alias("nll_micro"),
    )
    r = j.select(
        "doc_id",
        "lang",
        "nll_micro",
        F.expr(
            "CAST(ROW_NUMBER() OVER (PARTITION BY lang"
            " ORDER BY nll_micro, doc_id) AS INTEGER)"
        ).alias("rnk"),
        F.expr(
            "CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT)"
        ).alias("lang_n"),
    )
    return r.select(
        "doc_id",
        "lang",
        "nll_micro",
        "lang_n",
        "rnk",
        F.expr(
            "CASE WHEN rnk * 3 <= lang_n THEN 'head'"
            " WHEN rnk * 3 <= lang_n * 2 THEN 'middle'"
            " ELSE 'tail' END"
        ).alias("bucket"),
    )
