"""Supervised model-based quality filtering — the classifier stage of
the GPT-3 / LLaMA / RedPajama data recipes (Brown et al. 2020,
Appendix A; Touvron et al. 2023 §2.1): train a cheap linear classifier
to separate a high-quality reference corpus from raw crawl text, score
every raw document, and keep the documents the model thinks look like
the reference.

The engine's instance is a multinomial Naive Bayes over hashed
unigram+bigram features — the same hashing-trick bag the fastText
filters in those papers use, and the exactly-aggregable choice: the
entire "training" step is two bucket-count aggregations (one per
class), so the model fits in one distributed pass with no iterative
optimizer, and every parameter is an exact integer micro-nat that a
SQL oracle can reproduce bit-for-bit. Discriminatively that is the
same family as the papers' logistic regression (a linear score over
the same features with a different fitting rule); NB is the
deterministic member of the family.

Relationship to the neighbouring operators:

- ``dsir_importance_weights`` (data_selection.py) is the UNSUPERVISED
  cousin: same hashed features, but it contrasts two corpora's
  distributions with no train/test split and no priors. This module
  is the supervised loop: labels, a held-out split, class priors, a
  prediction, and an evaluation — the parts a production gate needs
  before anyone trusts the filter.
- The train/test split is the content-addressed bucket16 rule shared
  with ``deterministic_split`` and the bigram LM, so "held out" is
  reproducible on any engine and genuinely unseen by the counts.

Everything stays JVM-side (no Python in the plan) and every
hash-surface column is BIGINT/VARCHAR/BOOLEAN per the round-8 rule.

Precondition (documented, holds for the testdata at every scale): the
train split must contain at least one document and one feature
occurrence of EACH class — priors and smoothed likelihoods take
``ln`` of class counts. A production caller gating on a new label
column checks that once before fitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.functions.det_round import micro_spark, micro_sql
from namegraph_collections_spark.queries.data_selection import DSIR_TARGET_SRCS
from namegraph_collections_spark.queries.registry import (
    REGISTRY,
    register,
    spread,
    tbl,
)

#: Feature-space size for the hashing trick. Like DSIR's B the bucket
#: table must stay broadcast-sized at ANY corpus size, so it is a
#: constant; 2048 doubles DSIR's resolution because the supervised
#: weights feed a hard keep/drop decision rather than a soft weight.
NBQ_B = 2048

#: Content-addressed train cutoff — identical to deterministic_split's
#: and the bigram LM's 80% rule (bucket16(doc_id) < 52429 ~ 0.8*65536).
#: Duplicated constant, pinned equal by the shared SQL literal in all
#: three oracles (the _bucket16_col precedent: one definition per
#: module to avoid circular imports).
NBQ_TRAIN_LO = 52429

_NBQ_IS_TRAIN_SQL = (
    "CAST('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 4) AS BIGINT)"
    f" < {NBQ_TRAIN_LO}"
)
#: Spark mirror of the split rule (conv() in place of the hex cast —
#: identical md5 digest, identical integer, pinned by the oracles).
_NBQ_IS_TRAIN_SPARK = (
    "CAST(conv(substr(md5(CAST({c} AS STRING)), 1, 4), 16, 10) AS BIGINT)"
    f" < {NBQ_TRAIN_LO}"
)

#: The positive class: the SAME high-quality reference sources DSIR
#: targets, deliberately — one notion of "the corpus we want more
#: of", two selection methods over it (importance resampling there,
#: a supervised classifier here), so their outputs are comparable.
_NBQ_POS_PRED = "source IN ('" + "', '".join(DSIR_TARGET_SRCS) + "')"

#: 16-bit md5 prefix -> bucket in [0, NBQ_B): the engine's standard
#: portable hash (identical hex digest on both engines).
_NBQ_BUCKET_DUCK = (
    "CAST('0x' || substr(md5(gram), 1, 4) AS BIGINT) % " + str(NBQ_B)
)
_NBQ_BUCKET_SPARK = (
    f"CAST(conv(substr(md5(gram), 1, 4), 16, 10) AS BIGINT) % {NBQ_B}"
)


def _lp_micro_sql(c: str, tot: str) -> str:
    """Integer micro-nat add-1-smoothed log-likelihood of a bucket:
    floor-form micro rounding of ln((c + 1) / (tot + B)) — det_round's
    double-log convention, landed directly as BIGINT."""
    return (
        f"CAST(floor(ln((({c}) + 1.0) / (({tot}) + {NBQ_B}.0))"
        " * 1000000 + 0.5) AS BIGINT)"
    )


def _lnr_micro_sql(num: str, den: str) -> str:
    """Integer micro-nat log of an exact count ratio (class priors):
    floor(ln(num/den)*1e6 + 0.5) as BIGINT — negative-safe (both
    engines round half-way toward +inf identically, det_round note)."""
    return (
        f"CAST(floor(ln(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE))"
        " * 1000000 + 0.5) AS BIGINT)"
    )


def nbq_hashed_grams_of(
    docs: DataFrame,
    positive_pred: str = _NBQ_POS_PRED,
    extra: str | None = None,
) -> DataFrame:
    """The feature program as a pure transformation — (doc_id,
    label_hq, is_train, bucket), one row per lowercased unigram/bigram
    occurrence. Shared by the one-shot query and any incremental
    maintenance so the paths can never drift (the DSIR seam shape).
    ``positive_pred`` parameterizes the label column for callers
    fitting against a different reference corpus (and the closed-form
    tests); ``extra`` names one pass-through column (the single-pass
    fold fixture's batch tag — queries/maintainer_reads.py)."""
    grp = [extra] if extra is not None else []
    toked = docs.selectExpr(
        "doc_id",
        *grp,
        f"{positive_pred} AS label_hq",
        _NBQ_IS_TRAIN_SPARK.format(c="doc_id") + " AS is_train",
        "filter(split(lower(replace(text, chr(10), ' ')), ' '),"
        " x -> x != '') AS words",
    )
    grams = toked.select(
        "doc_id",
        *grp,
        "label_hq",
        "is_train",
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
        "doc_id",
        *grp,
        "label_hq",
        "is_train",
        F.expr(_NBQ_BUCKET_SPARK).alias("bucket"),
    )


def nbq_weights_of(hashed: DataFrame) -> DataFrame:
    """(bucket, w_micro) for ALL NBQ_B buckets from a hashed-gram
    frame's TRAIN rows: w_micro = lp_hq(bucket) - lp_lq(bucket) in
    exact integer micro-nats, with add-1 smoothing giving unseen
    buckets their nonzero prior weight too (which is why the table
    enumerates range(B) instead of only observed buckets). Always
    <= NBQ_B rows — broadcast class at any corpus size."""
    spark = hashed.sparkSession
    tr = hashed.filter("is_train")
    cpos = tr.filter("label_hq").groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cp")
    )
    cneg = tr.filter("NOT label_hq").groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cn")
    )
    tots = tr.agg(
        F.sum(F.col("label_hq").cast("long")).alias("t_pos"),
        F.sum((~F.col("label_hq")).cast("long")).alias("t_neg"),
    )
    return (
        spark.range(NBQ_B)
        .select(F.col("id").alias("bucket"))
        .join(F.broadcast(cpos), "bucket", "left")
        .join(F.broadcast(cneg), "bucket", "left")
        .crossJoin(F.broadcast(tots))
        .selectExpr(
            "bucket",
            f"{_lp_micro_sql('COALESCE(cp, 0)', 't_pos')}"
            f" - {_lp_micro_sql('COALESCE(cn, 0)', 't_neg')} AS w_micro",
        )
    )


def nbq_model_of(docs: DataFrame, positive_pred: str = _NBQ_POS_PRED):
    """Fit only: returns (weights, prior) — the <= {NBQ_B}-row
    (bucket, w_micro) table and the 1-row prior_micro frame. This is
    the artifact a production gate persists once and applies at the
    door (the deployment split the papers imply: train on the
    standing corpus, filter new crawl as it arrives)."""
    hashed = nbq_hashed_grams_of(docs, positive_pred).localCheckpoint(
        eager=False
    )
    w = nbq_weights_of(hashed)
    prior = (
        docs.selectExpr(
            f"{positive_pred} AS label_hq",
            _NBQ_IS_TRAIN_SPARK.format(c="doc_id") + " AS is_train",
        )
        .filter("is_train")
        .agg(
            F.sum(F.col("label_hq").cast("long")).alias("np"),
            F.sum((~F.col("label_hq")).cast("long")).alias("nn"),
        )
        .selectExpr(
            f"{_lnr_micro_sql('np', 'np + nn')}"
            f" - {_lnr_micro_sql('nn', 'np + nn')} AS prior_micro"
        )
    )
    return w, prior


def nbq_score_against(
    docs: DataFrame,
    w: DataFrame,
    prior: DataFrame,
    positive_pred: str = _NBQ_POS_PRED,
) -> DataFrame:
    """Score documents against an ALREADY-FITTED (weights, prior)
    model — the ingest-time path: new documents broadcast-join the
    tiny weight table, no training state touched. Emits the same
    (doc_id, label_hq, n_grams, margin_micro, pred_hq) surface as the
    one-shot query minus the split flag (arriving crawl has no split).
    Scores are batching-invariant because the model is fixed — the
    property the streaming parity test pins."""
    db = (
        nbq_hashed_grams_of(docs, positive_pred)
        .groupBy("doc_id", "label_hq", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        db.join(F.broadcast(w), "bucket")
        .crossJoin(F.broadcast(prior))
        .groupBy("doc_id", "label_hq", "prior_micro")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.sum(F.col("c") * F.col("w_micro")).alias("dot_micro"),
        )
        .selectExpr(
            "doc_id",
            "label_hq",
            "n_grams",
            "CAST(prior_micro + dot_micro AS BIGINT) AS margin_micro",
            "(prior_micro + dot_micro) >= 0 AS pred_hq",
        )
    )


#: The fit's CTE chain (feature program -> bucket counts -> smoothed
#: weight table -> prior), shared VERBATIM by the scores oracle below
#: and by maintainer_reads' state-derived model legs (the battery
#: construction rule: one SQL definition, zero drift).
_NBQ_FIT_CTES = f"""toked AS MATERIALIZED (
      SELECT doc_id, {_NBQ_POS_PRED} AS label_hq,
             {_NBQ_IS_TRAIN_SQL.format(c="doc_id")} AS is_train,
             list_filter(string_split(lower(replace(text, chr(10), ' ')), ' '),
                         x -> x <> '') AS words
      FROM documents
    ),
    grams AS MATERIALIZED (
      SELECT doc_id, label_hq, is_train,
             unnest(words || list_transform(range(1, len(words)),
                    i -> words[i] || ' ' || words[i+1])) AS gram
      FROM toked
    ),
    hashed AS MATERIALIZED (
      SELECT doc_id, label_hq, is_train, {_NBQ_BUCKET_DUCK} AS bucket
      FROM grams
    ),
    cpos AS (
      SELECT bucket, COUNT(*) AS cp FROM hashed
      WHERE is_train AND label_hq GROUP BY 1
    ),
    cneg AS (
      SELECT bucket, COUNT(*) AS cn FROM hashed
      WHERE is_train AND NOT label_hq GROUP BY 1
    ),
    tots AS (
      SELECT (SELECT COUNT(*) FROM hashed WHERE is_train AND label_hq) AS t_pos,
             (SELECT COUNT(*) FROM hashed WHERE is_train AND NOT label_hq) AS t_neg
    ),
    w AS (
      SELECT b.range AS bucket,
             {_lp_micro_sql("COALESCE(p.cp, 0)", "tots.t_pos")}
             - {_lp_micro_sql("COALESCE(n.cn, 0)", "tots.t_neg")} AS w_micro
      FROM range({NBQ_B}) b
      LEFT JOIN cpos p ON p.bucket = b.range
      LEFT JOIN cneg n ON n.bucket = b.range
      CROSS JOIN tots
    ),
    prior AS (
      SELECT {_lnr_micro_sql("np", "np + nn")}
             - {_lnr_micro_sql("nn", "np + nn")} AS prior_micro
      FROM (
        SELECT SUM(CASE WHEN label_hq THEN 1 ELSE 0 END) AS np,
               SUM(CASE WHEN label_hq THEN 0 ELSE 1 END) AS nn
        FROM toked WHERE is_train
      )
    )"""

_NBQ_SCORES_ORACLE = f"""
    WITH {_NBQ_FIT_CTES},
    db AS (
      SELECT doc_id, label_hq, is_train, bucket, COUNT(*) AS c
      FROM hashed GROUP BY 1, 2, 3, 4
    ),
    scored AS (
      SELECT db.doc_id, db.label_hq, db.is_train,
             CAST(SUM(db.c) AS BIGINT) AS n_grams,
             CAST(p.prior_micro + SUM(db.c * w.w_micro) AS BIGINT)
               AS margin_micro
      FROM db JOIN w USING (bucket) CROSS JOIN prior p
      GROUP BY db.doc_id, db.label_hq, db.is_train, p.prior_micro
    )
    SELECT doc_id, label_hq, is_train, n_grams, margin_micro,
           margin_micro >= 0 AS pred_hq,
           (margin_micro >= 0) = label_hq AS correct
    FROM scored
"""


@register("nb_quality_scores", oracle=_NBQ_SCORES_ORACLE)
def nb_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter, fit + scored in one plan: a
    multinomial Naive Bayes over {NBQ_B} hashed unigram+bigram buckets
    (add-1 smoothing), trained on the content-addressed 80% split with
    ``label_hq`` = membership in the DSIR target sources, then applied
    to EVERY document (train and held-out, flagged apart).

    ``margin_micro`` is the exact integer micro-nat log-odds
    ``ln p(hq|x) - ln p(lq|x)`` = prior difference + sum of per-bucket
    weight times count; ``pred_hq`` (margin >= 0) is the keep decision
    a production gate would apply to unlabeled crawl, and ``correct``
    makes the held-out rows directly consumable by the eval.

    Scale shape (the DSIR audit carries over): ONE gram explode feeds
    (a) the per-(doc, bucket) counts — a partial-aggregated shuffle
    with at most {NBQ_B} keys per doc — and (b) the two class bucket
    tables, which are <= {NBQ_B} rows REGARDLESS of corpus size and
    broadcast back; totals and priors are 1-row broadcast cross
    joins. The per-doc reduce is one groupBy. Fitting is exactly two
    aggregations — no optimizer iterations, no driver-side state —
    which is the reason NB is the family member chosen for the
    distributed gate. No global sort, no window, no Python anywhere.
    """
    return nb_quality_scores_of(spread(tbl(spark, sf_dir, "documents"), "doc_id"))


def nb_quality_scores_of(
    docs: DataFrame, positive_pred: str = _NBQ_POS_PRED
) -> DataFrame:
    """The fit+score pipeline over any (doc_id, source, text) frame —
    the seam the closed-form property tests drive with handcrafted
    corpora (and a caller would point at a different reference
    corpus via ``positive_pred``)."""
    hashed = nbq_hashed_grams_of(docs, positive_pred).localCheckpoint(eager=False)
    # localCheckpoint: the hashed-gram frame feeds four aggregations
    # (class counts x2, totals, per-doc counts); without the cut each
    # replays the scan+explode (the battery-wide ReusedExchange
    # finding).
    w = nbq_weights_of(hashed)
    base = docs.selectExpr(
        "doc_id",
        f"{positive_pred} AS label_hq",
        _NBQ_IS_TRAIN_SPARK.format(c="doc_id") + " AS is_train",
    )
    prior = (
        base.filter("is_train")
        .agg(
            F.sum(F.col("label_hq").cast("long")).alias("np"),
            F.sum((~F.col("label_hq")).cast("long")).alias("nn"),
        )
        .selectExpr(
            f"{_lnr_micro_sql('np', 'np + nn')}"
            f" - {_lnr_micro_sql('nn', 'np + nn')} AS prior_micro"
        )
    )
    db = hashed.groupBy("doc_id", "label_hq", "is_train", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        db.join(F.broadcast(w), "bucket")
        .crossJoin(F.broadcast(prior))
        .groupBy("doc_id", "label_hq", "is_train", "prior_micro")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.sum(F.col("c") * F.col("w_micro")).alias("dot_micro"),
        )
        .selectExpr(
            "doc_id",
            "label_hq",
            "is_train",
            "n_grams",
            "CAST(prior_micro + dot_micro AS BIGINT) AS margin_micro",
            "(prior_micro + dot_micro) >= 0 AS pred_hq",
            "((prior_micro + dot_micro) >= 0) = label_hq AS correct",
        )
    )


#: metric -> (numerator SQL over the confusion counts, denominator).
#: One definition drives the melt on BOTH engines so the eval surface
#: cannot drift between them. f1 = 2PR/(P+R) simplified to the exact
#: rational 2tp / (2tp + fp + fn) — no double anywhere.
_NBQ_EVAL_METRICS: list[tuple[str, str, str]] = [
    ("tp", "tp", "n"),
    ("fp", "fp", "n"),
    ("fn", "fn", "n"),
    ("tn", "tn", "n"),
    ("accuracy", "tp + tn", "n"),
    ("precision", "tp", "tp + fp"),
    ("recall", "tp", "tp + fn"),
    ("f1", "2 * tp", "2 * tp + fp + fn"),
]


def _eval_rows_sql(micro) -> str:
    """The 8-row melt as a UNION ALL, parameterized by the engine's
    micro-ratio helper (micro_sql / micro_spark). A zero denominator
    (e.g. precision when nothing was predicted positive) yields NULL,
    identically on both engines — micro's den > 0 precondition."""
    parts = []
    for metric, num, den in _NBQ_EVAL_METRICS:
        parts.append(
            f"SELECT '{metric}' AS metric, CAST({num} AS BIGINT) AS num,"
            f" CAST({den} AS BIGINT) AS den,"
            f" CASE WHEN ({den}) > 0 THEN CAST({micro(num, den)} AS BIGINT)"
            " ELSE CAST(NULL AS BIGINT) END AS value_micro FROM c"
        )
    return "\nUNION ALL\n".join(parts)


@register(
    "nb_quality_eval",
    # Embeds the scores oracle verbatim (battery construction rule):
    # the eval can never drift from the classifier it measures.
    oracle=f"""
    WITH s AS MATERIALIZED ({_NBQ_SCORES_ORACLE}),
    c AS MATERIALIZED (
      SELECT
        SUM(CASE WHEN label_hq AND pred_hq THEN 1 ELSE 0 END) AS tp,
        SUM(CASE WHEN NOT label_hq AND pred_hq THEN 1 ELSE 0 END) AS fp,
        SUM(CASE WHEN label_hq AND NOT pred_hq THEN 1 ELSE 0 END) AS fn,
        SUM(CASE WHEN NOT label_hq AND NOT pred_hq THEN 1 ELSE 0 END) AS tn,
        COUNT(*) AS n
      FROM s WHERE NOT is_train
    )
    {_eval_rows_sql(micro_sql)}
    """,
)
def nb_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out evaluation of the NB quality filter: the four
    confusion cells plus accuracy / precision / recall / F1, each as
    (metric, num, den, value_micro) with the ratio in exact round-half-
    up integer micro-units (micro_sql/micro_spark — counts are
    non-negative, satisfying the helpers' precondition; a zero
    denominator yields NULL on both engines).

    This is the go/no-go artifact for a filter gate: the papers ship a
    classifier only with its held-out precision/recall, and at 100 TB
    the eval is the cheap side — one aggregate over the already-scored
    held-out rows (a 1-row frame melted to 8), nothing rescanned.
    """
    return nb_quality_eval_from(nb_quality_scores(spark, sf_dir))


def nb_quality_eval_from(scores: DataFrame) -> DataFrame:
    """The eval over an ALREADY-BUILT scores frame — the sharing seam
    for battery use (one classifier fit feeds both legs)."""
    c = scores.filter("NOT is_train").agg(
        F.sum(F.expr("CASE WHEN label_hq AND pred_hq THEN 1 ELSE 0 END")).alias("tp"),
        F.sum(F.expr("CASE WHEN NOT label_hq AND pred_hq THEN 1 ELSE 0 END")).alias("fp"),
        F.sum(F.expr("CASE WHEN label_hq AND NOT pred_hq THEN 1 ELSE 0 END")).alias("fn"),
        F.sum(F.expr("CASE WHEN NOT label_hq AND NOT pred_hq THEN 1 ELSE 0 END")).alias("tn"),
        F.count(F.lit(1)).alias("n"),
    )
    # stack() melts the ONE aggregate row into the 8 metric rows in a
    # single plan — a union of 8 selects would replay the aggregate
    # (and, uncheckpointed, the whole classifier) 8 times.
    tuples = ", ".join(
        f"'{metric}', CAST({num} AS BIGINT), CAST({den} AS BIGINT),"
        f" CASE WHEN ({den}) > 0 THEN CAST({micro_spark(num, den)} AS BIGINT)"
        " ELSE CAST(NULL AS BIGINT) END"
        for metric, num, den in _NBQ_EVAL_METRICS
    )
    return c.selectExpr(
        f"stack({len(_NBQ_EVAL_METRICS)}, {tuples})"
        " AS (metric, num, den, value_micro)"
    )


# ---------------------------------------------------------------------------
# Calibration curve — the threshold sweep a production filter gate
# actually ships (VERDICT r9 #3). The GPT-3 Appendix A keep rule is
# exactly a threshold choice on this curve: score every document, then
# pick the operating point trading keep-rate against held-out
# precision/recall. The curve reports K operating points at exact
# margin-quantile thresholds plus the threshold-free ranking summary
# (tie-aware Mann-Whitney AUC) — all integer micro-units, no doubles.
# ---------------------------------------------------------------------------

#: Number of operating points on the calibration curve: threshold k
#: keeps (approximately) the top k/K of held-out documents by margin.
NBQ_CAL_K = 8

#: Deterministic cap on the evaluation sample: the curve is computed
#: over the first NBQ_CAL_MAX_EVAL held-out documents by doc_id
#: (content-addressed, so the sample is reproducible on any engine).
#: This makes the sample's boundedness PLAN-VISIBLE — the global rank
#: windows sit above a TakeOrderedAndProject, satisfying the
#: registry-wide no-unbounded-global-window guard — and is also the
#: honest 100 TB design: a gate is calibrated on a bounded eval set,
#: not on billions of held-out documents.
NBQ_CAL_MAX_EVAL = 100_000

_NBQ_CAL_ORACLE = f"""
    WITH s AS MATERIALIZED ({_NBQ_SCORES_ORACLE}),
    h AS MATERIALIZED (
      SELECT doc_id, label_hq, margin_micro FROM s WHERE NOT is_train
      ORDER BY doc_id LIMIT {NBQ_CAL_MAX_EVAL}
    ),
    tot AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_tot,
             CAST(SUM(CASE WHEN label_hq THEN 1 ELSE 0 END) AS BIGINT) AS p_tot
      FROM h
    ),
    ranked AS (
      SELECT margin_micro,
             ROW_NUMBER() OVER (ORDER BY margin_micro DESC, doc_id) AS rn
      FROM h
    ),
    ks AS (SELECT unnest(ARRAY{list(range(1, NBQ_CAL_K + 1))}) AS k),
    thr AS (
      SELECT ks.k, r.margin_micro AS thr_micro
      FROM ks CROSS JOIN tot
      JOIN ranked r
        ON r.rn = ((ks.k * tot.n_tot + {NBQ_CAL_K - 1}) // {NBQ_CAL_K})
    ),
    kept AS (
      SELECT t.k, t.thr_micro,
             CAST(COUNT(*) AS BIGINT) AS n_keep,
             CAST(SUM(CASE WHEN h.label_hq THEN 1 ELSE 0 END) AS BIGINT) AS tp
      FROM thr t JOIN h ON h.margin_micro >= t.thr_micro
      GROUP BY t.k, t.thr_micro
    ),
    curve AS (
      SELECT 'keep_rate' AS metric, k, thr_micro, n_keep AS num, n_tot AS den
      FROM kept CROSS JOIN tot
      UNION ALL
      SELECT 'precision' AS metric, k, thr_micro, tp, n_keep FROM kept
      UNION ALL
      SELECT 'recall' AS metric, k, thr_micro, tp, p_tot
      FROM kept CROSS JOIN tot
    ),
    mr AS (
      SELECT label_hq,
             2 * RANK() OVER (ORDER BY margin_micro ASC)
               + COUNT(*) OVER (PARTITION BY margin_micro) - 1 AS mr2
      FROM h
    ),
    auc AS (
      SELECT 'auc' AS metric, 0 AS k, CAST(NULL AS BIGINT) AS thr_micro,
             CAST(SUM(CASE WHEN label_hq THEN mr2 ELSE 0 END)
                  - p_tot * (p_tot + 1) AS BIGINT) AS num,
             CAST(2 * p_tot * (n_tot - p_tot) AS BIGINT) AS den
      FROM mr CROSS JOIN tot
      GROUP BY p_tot, n_tot
    )
    SELECT metric, CAST(k AS BIGINT) AS k, thr_micro, num, den,
           CASE WHEN den > 0 THEN CAST({micro_sql("num", "den")} AS BIGINT)
                ELSE CAST(NULL AS BIGINT) END AS value_micro
    FROM (SELECT * FROM curve UNION ALL SELECT * FROM auc)
"""


@register("nb_quality_calibration", oracle=_NBQ_CAL_ORACLE)
def nb_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-sweep calibration of the NB quality gate over the
    held-out split: {NBQ_CAL_K} operating points — threshold k is the
    exact margin at held-out rank ceil(k*N/{NBQ_CAL_K}) (descending,
    doc_id tiebreak) — each reporting keep_rate / precision / recall
    as (metric, k, thr_micro, num, den, value_micro) in exact
    round-half-up micro-units, plus one threshold-free 'auc' row
    (tie-aware Mann-Whitney: midranks via 2*rank + n_eq - 1, so the
    numerator 2*R_pos - P*(P+1) and denominator 2*P*N_neg stay exact
    integers). This is the artifact the GPT-3 App. A Pareto-keep rule
    reads: pick the threshold, get the promised keep-rate and
    precision.

    Scale shape: the curve is computed on the HELD-OUT sample, which
    is bounded by construction at deployment (the gate's eval set,
    not the corpus) — the one global window (rank over margins) runs
    over that sample only; the K-threshold fan-out is a broadcast of
    {NBQ_CAL_K} rows against the sample; everything upstream is the
    already-audited classifier plan. Nothing touches corpus grain.
    """
    return nb_quality_calibration_from(nb_quality_scores(spark, sf_dir))


def nb_quality_calibration_from(scores: DataFrame) -> DataFrame:
    """The calibration sweep over an ALREADY-BUILT scores frame — the
    sharing seam text_mining_battery uses so one classifier fit feeds
    the scores, eval, and calibration legs."""
    from pyspark.sql import Window

    from namegraph_collections_spark.queries.registry import ranked_topk

    spark = scores.sparkSession
    # localCheckpoint the SCORES (not the sample): the held-out slice
    # feeds FIVE consumers (total counts, the rank window, the
    # threshold join, the kept join, the AUC midranks) — each replays
    # only the cheap filter + TakeOrdered from the checkpointed
    # scores. The sample itself stays UNcheckpointed so its
    # TakeOrderedAndProject bound remains visible below the two global
    # rank windows (the plan guard's requirement).
    scores = scores.localCheckpoint(eager=False)
    h = ranked_topk(
        scores.filter("NOT is_train").select(
            "doc_id", "label_hq", "margin_micro"
        ),
        NBQ_CAL_MAX_EVAL,
        F.asc("doc_id"),
    ).drop("rnk")
    tot = h.agg(
        F.count(F.lit(1)).cast("long").alias("n_tot"),
        F.sum(F.col("label_hq").cast("long")).cast("long").alias("p_tot"),
    )
    ranked = h.select(
        "margin_micro",
        F.row_number()
        .over(Window.orderBy(F.desc("margin_micro"), F.asc("doc_id")))
        .cast("long")
        .alias("rn"),
    )
    ks = spark.range(1, NBQ_CAL_K + 1).select(F.col("id").alias("k"))
    thr = (
        ks.crossJoin(F.broadcast(tot))
        .withColumn(
            "rn",
            F.expr(f"(k * n_tot + {NBQ_CAL_K - 1}) div {NBQ_CAL_K}"),
        )
        .join(ranked, "rn")
        .select("k", F.col("margin_micro").alias("thr_micro"))
    )
    kept = (
        h.join(F.broadcast(thr), F.col("margin_micro") >= F.col("thr_micro"))
        .groupBy("k", "thr_micro")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keep"),
            F.sum(F.col("label_hq").cast("long")).cast("long").alias("tp"),
        )
        .crossJoin(F.broadcast(tot))
    )
    curve = kept.selectExpr(
        "k",
        "thr_micro",
        "stack(3,"
        " 'keep_rate', CAST(n_keep AS BIGINT), CAST(n_tot AS BIGINT),"
        " 'precision', CAST(tp AS BIGINT), CAST(n_keep AS BIGINT),"
        " 'recall', CAST(tp AS BIGINT), CAST(p_tot AS BIGINT))"
        " AS (metric, num, den)",
    ).select("metric", "k", "thr_micro", "num", "den")
    mr = h.select(
        "label_hq",
        (
            F.lit(2) * F.rank().over(Window.orderBy(F.asc("margin_micro")))
            + F.count(F.lit(1)).over(Window.partitionBy("margin_micro"))
            - F.lit(1)
        )
        .cast("long")
        .alias("mr2"),
    )
    auc = (
        mr.agg(
            F.sum(F.expr("CASE WHEN label_hq THEN mr2 ELSE 0 END")).alias(
                "rpos2"
            )
        )
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "'auc' AS metric",
            "CAST(0 AS BIGINT) AS k",
            "CAST(NULL AS BIGINT) AS thr_micro",
            "CAST(rpos2 - p_tot * (p_tot + 1) AS BIGINT) AS num",
            "CAST(2 * p_tot * (n_tot - p_tot) AS BIGINT) AS den",
        )
    )
    return curve.unionByName(auc).selectExpr(
        "metric",
        "k",
        "thr_micro",
        "num",
        "den",
        "CASE WHEN den > 0"
        f" THEN CAST({micro_spark('num', 'den')} AS BIGINT)"
        " ELSE CAST(NULL AS BIGINT) END AS value_micro",
    )
