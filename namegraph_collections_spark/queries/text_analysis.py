"""Text-analysis operators for a training-data pipeline (driver brief):
language-ID heuristics, quality scoring, token counting, document
fingerprinting — all JVM-side expressions over the `documents` table.

At 100 TB these are embarrassingly parallel scan+project jobs; the
only shuffle is the final aggregation (when any). No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.functions.det_round import (
    micro_spark as _q_micro_spark,
    micro_sql as _q_micro_sql,
    round6_det,
)
from namegraph_collections_spark.queries.registry import (
    REGISTRY,
    ranked_topk,
    register,
    spread,
    tbl,
)

# Tiny stopword profile used by the quality heuristic (kept identical
# in the oracle SQL).
STOPWORDS = ["the", "a", "of", "and", "to"]

# PII scrub patterns (training-data hygiene): RE2- and Java-compatible
# (no lookarounds), applied email → URL → IP, with the IP count taken
# after URL masking so dotted quads inside URLs are never
# double-counted. The synthetic corpus carries no PII, so both
# engines synthesize a deterministic PII-bearing suffix from doc_id
# and scrub THAT — the masks and counts are then value-checked, not
# vacuously zero.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL = r"https?://[A-Za-z0-9./_-]+"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# BPE-ish pre-tokenizer (driver brief: token counting beyond
# whitespace): the GPT-2 pattern's segment classes — contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs,
# residual spaces — with the trailing-space lookahead dropped so the
# SAME regex runs under Java (Spark) and RE2 (DuckDB), neither of
# which needs it for counting. Counting segments of this pattern
# approximates BPE token counts far better than whitespace splitting
# on punctuation-heavy text.
BPE_ISH = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"


@register(
    "text_features",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id, lang, n_chars, text,
             string_split(text, ' ') AS tokens,
             length(text) AS text_len,
             'contact user' || doc_id || '@example.com or http://host'
               || doc_id || '.example/x at 10.0.' || (doc_id % 256) || '.7'
               AS pii_text
      FROM documents
    ), stats AS (
      SELECT doc_id, lang, text, text_len, pii_text,
             len(tokens) AS n_tokens,
             len(list_filter(tokens, t -> list_contains({STOPWORDS!r}, t))) AS n_stopwords,
             len(list_distinct(tokens)) AS n_unique_tokens,
             len(list_filter(tokens, t -> t IN ('the', 'a'))) AS en_markers,
             CASE WHEN len(tokens) >= 3 THEN
               floor((1.0 - CAST(len(list_distinct(
                 list_transform(range(1, len(tokens) - 2 + 1),
                                i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])
               )) AS DOUBLE) / (len(tokens) - 2)) * 1000000 + 0.5) / 1000000.0
             ELSE 0.0e0 END AS dup_trigram_ratio
      FROM feat
    )
    SELECT doc_id, lang, n_tokens, n_unique_tokens, n_stopwords,
      floor((CAST(n_stopwords AS DOUBLE) / n_tokens) * 1000000 + 0.5) / 1000000.0
        AS stopword_ratio,
      floor((CAST(n_unique_tokens AS DOUBLE) / n_tokens) * 1000000 + 0.5) / 1000000.0
        AS type_token_ratio,
      floor((CAST(text_len AS DOUBLE) / n_tokens) * 1000000 + 0.5) / 1000000.0
        AS avg_token_span,
      CASE WHEN n_tokens >= 50 AND CAST(n_unique_tokens AS DOUBLE) / n_tokens >= 0.3
           THEN 'high' WHEN n_tokens >= 20 THEN 'medium' ELSE 'low' END AS quality_bucket,
      CASE WHEN CAST(en_markers AS DOUBLE) / n_tokens > 0.05 THEN 'en' ELSE 'other' END
        AS predicted_lang,
      floor((CAST(en_markers AS DOUBLE) / n_tokens) * 1000000 + 0.5) / 1000000.0
        AS marker_ratio,
      dup_trigram_ratio,
      md5(lower(trim(text))) AS fingerprint,
      md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' '))
        AS bag_fingerprint,
      len(regexp_extract_all(text, '{BPE_ISH.replace("'", "''")}')) AS n_bpe_tokens,
      len(regexp_extract_all(pii_text, '{PII_EMAIL}')) AS n_emails,
      len(regexp_extract_all(pii_text, '{PII_URL}')) AS n_urls,
      len(regexp_extract_all(
            regexp_replace(pii_text, '{PII_URL}', '<URL>', 'g'), '{PII_IPV4}')) AS n_ips,
      regexp_replace(regexp_replace(regexp_replace(pii_text,
        '{PII_EMAIL}', '<EMAIL>', 'g'),
        '{PII_URL}', '<URL>', 'g'),
        '{PII_IPV4}', '<IP>', 'g') AS scrubbed
    FROM stats
    """,
)
def text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text features in ONE scan (driver brief: quality
    scoring + language-ID + document fingerprinting):

    - quality: length/stopword/type-token ratios + bucket (the shape
      of the reference's interesting-score enrichment,
      create_merged.py:82-97, with a deterministic expression model)
      plus the within-document repetition signal ``dup_trigram_ratio``
      (duplicate-trigram fraction — the standard repetition filter for
      training corpora);
    - language-ID: marker-token n-gram-profile classifier (the corpus
      is English-wordlist text, so a two-class en/other profile — the
      scan-parallel per-doc-feature→classify plumbing is the
      scale-relevant part);
    - fingerprints: ``fingerprint`` hashes the normalized text;
      ``bag_fingerprint`` hashes the sorted unique-token set so
      token-order-shuffled copies collide — the cheap first stage
      before MinHash (queries/dedup.py);
    - token counting: whitespace tokens (n_tokens) AND a BPE-ish
      pre-tokenizer segment count (n_bpe_tokens, the GPT-2 pattern's
      classes) — the latter tracks real tokenizer budgets on
      punctuation-heavy text where whitespace counts undershoot;
    - PII scrub: email/URL/IPv4 detection counts + a masked text
      (<EMAIL>/<URL>/<IP>), the standard redaction pass a training
      corpus gets before tokenization. The corpus itself is PII-free,
      so a deterministic PII-bearing suffix is synthesized from doc_id
      identically on both engines and scrubbed for real evidence.

    All pure column expressions over one pass. The spread() exists
    because a small parquet table arrives as ONE split and the regex +
    trigram work is CPU-bound — at cluster scale the same partitioning
    is free (the table already arrives in many splits).
    """
    docs = spread(tbl(spark, sf_dir, "documents"), "doc_id")
    tokens = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    did = F.col("doc_id").cast("string")
    pii_text = F.concat(
        F.lit("contact user"), did, F.lit("@example.com or http://host"),
        did, F.lit(".example/x at 10.0."),
        (F.col("doc_id") % 256).cast("string"), F.lit(".7"),
    )
    stats = docs.select(
        "doc_id",
        "lang",
        "text",
        pii_text.alias("pii_text"),
        F.length("text").alias("text_len"),
        F.size(tokens).alias("n_tokens"),
        F.size(F.filter(tokens, lambda t: F.array_contains(stop_arr, t))).alias("n_stopwords"),
        F.size(F.array_distinct(tokens)).alias("n_unique_tokens"),
        F.size(F.filter(tokens, lambda t: t.isin("the", "a"))).alias("en_markers"),
        F.transform(
            F.slice(tokens, 1, F.greatest(F.size(tokens) - 2, F.lit(0))),
            lambda t, i: F.concat_ws(
                " ", t, F.element_at(tokens, i + 2), F.element_at(tokens, i + 3)
            ),
        ).alias("trigrams"),
    )
    marker_ratio = F.col("en_markers").cast("double") / F.col("n_tokens")
    return stats.select(
        "doc_id",
        "lang",
        "n_tokens",
        "n_unique_tokens",
        "n_stopwords",
        round6_det(F.col("n_stopwords").cast("double") / F.col("n_tokens")).alias(
            "stopword_ratio"
        ),
        round6_det(F.col("n_unique_tokens").cast("double") / F.col("n_tokens")).alias(
            "type_token_ratio"
        ),
        round6_det(F.col("text_len").cast("double") / F.col("n_tokens")).alias("avg_token_span"),
        F.when(
            (F.col("n_tokens") >= 50)
            & (F.col("n_unique_tokens").cast("double") / F.col("n_tokens") >= 0.3),
            "high",
        )
        .when(F.col("n_tokens") >= 20, "medium")
        .otherwise("low")
        .alias("quality_bucket"),
        F.when(marker_ratio > 0.05, "en").otherwise("other").alias("predicted_lang"),
        round6_det(marker_ratio).alias("marker_ratio"),
        F.when(
            F.col("n_tokens") >= 3,
            round6_det(
                1.0
                - F.size(F.array_distinct(F.col("trigrams"))).cast("double")
                / (F.col("n_tokens") - 2)
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_trigram_ratio"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"),
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(F.split(F.lower(F.col("text")), " "))), " ")
        ).alias("bag_fingerprint"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_ISH), F.lit(0))).alias("n_bpe_tokens"),
        F.size(F.regexp_extract_all("pii_text", F.lit(PII_EMAIL), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all("pii_text", F.lit(PII_URL), F.lit(0))).alias("n_urls"),
        F.size(
            F.regexp_extract_all(
                F.regexp_replace("pii_text", PII_URL, "<URL>"), F.lit(PII_IPV4), F.lit(0)
            )
        ).alias("n_ips"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("pii_text", PII_EMAIL, "<EMAIL>"), PII_URL, "<URL>"
            ),
            PII_IPV4,
            "<IP>",
        ).alias("scrubbed"),
    )


@register(
    "token_frequencies",
    oracle="""
    SELECT token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS df
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    HAVING COUNT(*) >= 5
    """,
)
def token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token/document frequencies (SURVEY §2.4 A10/A12).

    Reference analogue: Counter over wordninja tokens
    (collections-preprocessing/app/src/preprocessing_service.py:13-15)
    and suffix mining with a min-count threshold
    (research/.../most-popular-suffixes.py:16-41). explode → groupBy
    with map-side partial aggregation.
    """
    docs = tbl(spark, sf_dir, "documents")
    toks = spread(docs, "doc_id").select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("doc_id").alias("df"))
        .filter(F.col("n") >= 5)
    )


@register(
    "unigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    cnt AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
    tot AS (SELECT SUM(c) AS n FROM cnt),
    lp AS (
      SELECT token, CAST(floor(ln(CAST(c AS DOUBLE) / n) * 1000000 + 0.5) / 1000000.0
                         AS DECIMAL(18,6)) AS logp
      FROM cnt CROSS JOIN tot
    )
    SELECT doc_id, CAST(SUM(logp) AS DOUBLE) AS name_log_probability
    FROM toks JOIN lp USING (token) GROUP BY doc_id
    """,
)
def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-model log-probability per document (C13 ★ as a
    relational query — the doc factory's collection_name_log_probability,
    create_merged.py:942-943, with the model table built from the
    corpus itself).

    Token → corpus-frequency join → Σ log p. Per-token contributions
    round to 6 then sum as DECIMAL so both engines produce identical
    sums regardless of aggregation order — the same determinism
    treatment as BM25. The tiny probability table broadcasts.
    """
    docs = tbl(spark, sf_dir, "documents")
    toks = spread(docs, "doc_id").select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    cnt = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").alias("n"))
    lp = cnt.crossJoin(F.broadcast(tot)).select(
        "token",
        round6_det(F.log(F.col("c").cast("double") / F.col("n")))
        .cast("decimal(18,6)")
        .alias("logp"),
    )
    return (
        toks.join(F.broadcast(lp), "token")
        .groupBy("doc_id")
        .agg(F.sum("logp").cast("double").alias("name_log_probability"))
    )


PMI_TOP = 50


@register(
    "bigram_pmi",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, greatest(len(ts) - 1, 0) + 1),
                                   i -> {{'a': ts[i], 'b': ts[i+1]}})) AS p
      FROM (SELECT string_split(lower(text), ' ') AS ts FROM documents)
    ),
    pc AS (SELECT p.a AS a, p.b AS b, COUNT(*) AS n_pair FROM pairs GROUP BY 1, 2),
    uc AS (SELECT token, COUNT(*) AS n_tok FROM toks GROUP BY token),
    tots AS (
      SELECT (SELECT SUM(n_pair) FROM pc) AS t_pairs,
             (SELECT SUM(n_tok) FROM uc) AS n_toks
    ),
    scored AS (
      SELECT pc.a, pc.b, pc.n_pair,
             floor(ln((CAST(pc.n_pair AS DOUBLE) * n_toks * n_toks)
                      / (CAST(t_pairs AS DOUBLE) * ua.n_tok * ub.n_tok))
                   * 1000000 + 0.5) / 1000000.0 AS pmi
      FROM pc
      JOIN uc ua ON ua.token = pc.a
      JOIN uc ub ON ub.token = pc.b
      CROSS JOIN tots
    )
    SELECT a, b, n_pair, pmi, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY n_pair DESC, a ASC, b ASC) AS rnk
      FROM scored
    ) WHERE rnk <= {PMI_TOP}
    """,
)
def bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of adjacent token pairs — the
    collocation detector every corpus pipeline runs before vocabulary
    or phrase-merge decisions (Church & Hanks, "Word association
    norms, mutual information, and lexicography", CL 1990; the same
    shape as BPE's pair-count step).

    PMI = ln(p(ab) / (p(a)·p(b))) computed as ONE double division of
    exact integer products (n_pair·N², T·n_a·n_b — both fit BIGINT),
    then round-6: the unigram_logprob determinism convention. Plan:
    bigram counts and unigram counts are two explode→groupBy passes;
    the unigram table and the 1-row totals broadcast into the scoring
    join, so the only wide shuffle is the pair count itself. The
    broadcast hint is right for a vocabulary that fits an executor
    (typical: unigram vocab ≪ pair count); a corpus whose DISTINCT
    unigram table exceeds broadcast limits should drop the hint and
    let the scoring join shuffle on the token key — the hint is the
    only line that changes. The top-{PMI_TOP} slice is ranked_topk
    (TakeOrderedAndProject — per-partition partial top-k, k-row
    merge), NOT a bare global window, so the scored-pair table never
    concentrates on one task.
    """
    docs = tbl(spark, sf_dir, "documents")
    toked = spread(docs, "doc_id").select(
        F.split(F.lower(F.col("text")), " ").alias("ts")
    )
    ts = F.col("ts")
    pairs = toked.select(
        F.explode(
            F.transform(
                F.slice(ts, 1, F.greatest(F.size(ts) - 1, F.lit(0))),
                lambda t, i: F.struct(
                    t.alias("a"), F.element_at(ts, i + 2).alias("b")
                ),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    pc = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_pair"))
    uc = (
        toked.select(F.explode(ts).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_tok"))
    )
    tots = pc.agg(F.sum("n_pair").alias("t_pairs")).crossJoin(
        F.broadcast(uc.agg(F.sum("n_tok").alias("n_toks")))
    )
    ua = uc.select(F.col("token").alias("a"), F.col("n_tok").alias("n_a"))
    ub = uc.select(F.col("token").alias("b"), F.col("n_tok").alias("n_b"))
    scored = (
        pc.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(tots))
        .select(
            "a", "b", "n_pair",
            round6_det(
                F.log(
                    (F.col("n_pair").cast("double") * F.col("n_toks") * F.col("n_toks"))
                    / (F.col("t_pairs").cast("double") * F.col("n_a") * F.col("n_b"))
                )
            ).alias("pmi"),
        )
    )
    return ranked_topk(
        scored, PMI_TOP,
        F.col("n_pair").desc(), F.col("a").asc(), F.col("b").asc(),
    ).select("a", "b", "n_pair", "pmi", "rnk")


# ---------------------------------------------------------------------------
# LM-perplexity quality filtering (the CCNet recipe — Wenzek et al.,
# "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
# Data", LREC 2020): train a language model on trusted text, score
# every document by per-token negative log-likelihood, keep the
# low-NLL tail. Here the LM is an add-alpha-smoothed bigram model
# trained on the content-addressed 'train' split (the same bucket16
# rule as deterministic_split), so the whole train->score->filter
# loop is reproducible on any engine and the held-out splits are
# genuinely unseen by the model.
# ---------------------------------------------------------------------------
LM_ALPHA_NUM, LM_ALPHA_DEN = 1, 2  # alpha = 0.5, exactly representable
#: keep threshold in MICRO-nats/token — documents above it are flagged
#: out. Integer so the keep decision never compares doubles.
LM_NLL_KEEP_MICRO = 3_400_000

#: bucket16 train cutoff — identical to deterministic_split's.
_LM_TRAIN_LO = 52429


def _bucket16_col(col):
    """Same content-addressed bucket as training_data._bucket16 —
    duplicated (two expressions, one definition in each module) to
    avoid a circular import; pinned equal by the shared SQL constant
    in both oracles."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("long")
_LM_IS_TRAIN_SQL = (
    "CAST('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 4) AS BIGINT)"
    f" < {_LM_TRAIN_LO}"
)


@register(
    "bigram_lm_perplexity",
    oracle=f"""
    WITH toked AS MATERIALIZED (
      SELECT doc_id, {_LM_IS_TRAIN_SQL.format(c="doc_id")} AS is_train,
             string_split(lower(text), ' ') AS ts
      FROM documents
    ),
    pairs AS MATERIALIZED (
      SELECT doc_id, is_train,
             unnest(list_transform(range(1, len(ts)),
                    i -> ts[i] || ' ' || ts[i+1])) AS pair
      FROM toked
    ),
    uni AS (
      SELECT split_part(pair, ' ', 1) AS a, COUNT(*) AS ca
      FROM pairs WHERE is_train GROUP BY 1
    ),
    bi AS (
      SELECT pair, COUNT(*) AS cab FROM pairs WHERE is_train GROUP BY 1
    ),
    v AS (
      SELECT COUNT(DISTINCT t) AS vocab FROM (
        SELECT unnest(ts) AS t FROM toked WHERE is_train
      )
    ),
    scored AS (
      SELECT p.doc_id, p.is_train,
        CAST(floor(-ln(
          CASE
            WHEN b.cab IS NOT NULL THEN
              (b.cab + {LM_ALPHA_NUM}/{LM_ALPHA_DEN}.0)
              / (u.ca + {LM_ALPHA_NUM} * v.vocab / {LM_ALPHA_DEN}.0)
            WHEN u.ca IS NOT NULL THEN
              ({LM_ALPHA_NUM}/{LM_ALPHA_DEN}.0)
              / (u.ca + {LM_ALPHA_NUM} * v.vocab / {LM_ALPHA_DEN}.0)
            ELSE 1.0 / v.vocab
          END) * 1000000 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS nllp
      FROM pairs p
      LEFT JOIN bi b ON b.pair = p.pair
      LEFT JOIN uni u ON u.a = split_part(p.pair, ' ', 1)
      CROSS JOIN v
    ),
    agg AS (
      SELECT doc_id, MAX(CAST(is_train AS INTEGER)) = 1 AS is_train,
             COUNT(*) AS n_pairs,
             CAST(SUM(nllp) * 1000000 AS BIGINT) AS s_micro
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, is_train, n_pairs,
           ((s_micro + n_pairs // 2) // n_pairs) / 1000000.0 AS nll,
           (s_micro + n_pairs // 2) // n_pairs <= {LM_NLL_KEEP_MICRO} AS keep
    FROM agg
    """,
)
def bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document LM quality score (CCNet-style): mean bigram
    negative log-likelihood in nats/token under an add-{LM_ALPHA_NUM}/
    {LM_ALPHA_DEN}-smoothed bigram model trained ONLY on the
    content-addressed train split; ``keep`` flags the low-NLL tail.
    Reported as NLL, not exp(NLL): monotone-identical ranking without
    putting each engine's exp() in the hash (the unigram_logprob
    determinism convention — ln rounds to 6, sums are decimal-exact,
    ONE double division at the end).

    Backoff is explicit and checked: seen bigram -> smoothed
    conditional; unseen bigram with seen history -> alpha mass;
    unseen history -> uniform 1/V. The held-out splits genuinely
    exercise all three branches.

    Scale shape: the model tables are two partial-aggregated groupBys
    over the train split; scoring joins the corpus pair stream against
    them (broadcast here, vocabulary-keyed shuffle join when the vocab
    outgrows broadcast — the bigram_pmi note) plus a 1-row vocab
    cross join; per-doc reduce is one groupBy on doc_id.
    """
    docs = tbl(spark, sf_dir, "documents")
    toked = spread(docs, "doc_id").select(
        "doc_id",
        (_bucket16_col(F.col("doc_id")) < _LM_TRAIN_LO).alias("is_train"),
        F.split(F.lower("text"), " ").alias("ts"),
    )
    ts = F.col("ts")
    pairs = toked.select(
        "doc_id",
        "is_train",
        F.explode(
            F.transform(
                F.slice(ts, 1, F.greatest(F.size(ts) - 1, F.lit(0))),
                lambda t, i: F.struct(t.alias("a"), F.element_at(ts, i + 2).alias("b")),
            )
        ).alias("p"),
    ).select("doc_id", "is_train", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    train = pairs.filter("is_train")
    uni = train.groupBy("a").agg(F.count(F.lit(1)).alias("ca"))
    bi = train.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cab"))
    vocab = (
        toked.filter("is_train")
        .select(F.explode(ts).alias("t"))
        .agg(F.countDistinct("t").alias("vocab"))
    )
    alpha = F.lit(LM_ALPHA_NUM) / F.lit(float(LM_ALPHA_DEN))
    denom = F.col("ca") + F.lit(LM_ALPHA_NUM) * F.col("vocab") / F.lit(float(LM_ALPHA_DEN))
    prob = (
        F.when(F.col("cab").isNotNull(), (F.col("cab") + alpha) / denom)
        .when(F.col("ca").isNotNull(), alpha / denom)
        .otherwise(F.lit(1.0) / F.col("vocab"))
    )
    scored = (
        pairs.join(F.broadcast(bi), ["a", "b"], "left")
        .join(F.broadcast(uni), "a", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "is_train",
            round6_det(-F.log(prob)).cast("decimal(18,6)").alias("nllp"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        (F.max(F.col("is_train").cast("int")) == 1).alias("is_train"),
        F.count(F.lit(1)).alias("n_pairs"),
        (F.sum("nllp") * 1000000).cast("long").alias("s_micro"),
    )
    # round-half-up in PURE INTEGER arithmetic: (s + n div 2) div n.
    # ROUND(double, 6) differs between engines on half-way cases (a
    # 1-ulp nll divergence appeared at sf0.1 — 5000 docs was enough to
    # land on one), so the one unavoidable division happens on exact
    # micro-nat integers and only the final /1e6 touches doubles
    # (identical IEEE on both engines for the same integer).
    nll_micro = F.expr("(s_micro + n_pairs div 2) div n_pairs")
    return agg.select(
        "doc_id",
        "is_train",
        "n_pairs",
        (nll_micro / F.lit(1000000.0)).alias("nll"),
        (nll_micro <= LM_NLL_KEEP_MICRO).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Multi-profile language identification (driver brief: "language-ID
# (n-gram heuristic)" as a first-class operator — text_features'
# binary en/other marker is a quality signal, not a classifier).
# ---------------------------------------------------------------------------

#: Marker-word profiles: the top-frequency function words per language
#: (the word-level reduction of Cavnar & Trenkle 1994's n-gram-rank
#: LID — public frequency lists, ASCII-only so no collation quirk can
#: reach the hash surface). Overlapping markers (e.g. 'per' es/it)
#: are intentional: real profiles overlap and the argmax resolves.
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "ich"],
    "en": ["the", "and", "of", "to", "is", "that", "you", "in"],
    "es": ["que", "los", "las", "una", "por", "con", "para", "como"],
    "fr": ["les", "des", "est", "vous", "dans", "pour", "une", "avec"],
    "it": ["che", "della", "sono", "anche", "come", "degli", "non", "per"],
}

#: Deterministic doc_id-keyed foreign-language tail (the text_features
#: PII-scrub / quality-signals precedent: the synthetic corpus is
#: English-ish, so both engines append the same marker-word phrase to
#: a doc_id-selected subset — the classifier then flips on a real,
#: length-dependent subset instead of answering 'en' vacuously). The
#: repeat count scales with n_chars so tail marker mass outgrows the
#: document's own English stopword mass.
_LANG_TAIL_PHRASES = {k: " " + " ".join(v) for k, v in LANG_PROFILES.items() if k != "en"}


def _lang_tail_sql(idiv: str) -> str:
    reps = f"CAST(1 + n_chars {idiv} 40 AS INT)"
    cases = []
    for i, lang in enumerate(["de", "es", "fr", "it"], start=1):
        cases.append(
            f"WHEN doc_id % 5 = {i} THEN repeat('{_LANG_TAIL_PHRASES[lang]}', {reps})"
        )
    return "CASE " + " ".join(cases) + " ELSE '' END"


def _lang_rnk_sql(lang: str) -> str:
    """Shuffle-free per-language rank: 1 + #(profiles strictly ahead),
    total order (hits DESC, lang ASC) — pure row-local arithmetic, so
    the argmax costs no window shuffle. Identical text runs on both
    engines."""
    others = [m for m in LANG_PROFILES if m != lang]
    terms = " + ".join(
        f"(CASE WHEN h_{m} > h_{lang}"
        f" OR (h_{m} = h_{lang} AND '{m}' < '{lang}') THEN 1 ELSE 0 END)"
        for m in others
    )
    return f"CAST(1 + {terms} AS INT) AS rnk_{lang}"


def _lang_hits_duck(lang: str) -> str:
    return (
        f"CAST(len(list_filter(words, w -> list_contains("
        f"{LANG_PROFILES[lang]!r}, w))) AS BIGINT) AS h_{lang}"
    )


def _lang_hits_spark(lang: str) -> str:
    arr = "array(" + ", ".join(f"'{w}'" for w in LANG_PROFILES[lang]) + ")"
    return (
        f"CAST(size(filter(words, w -> array_contains({arr}, w)))"
        f" AS BIGINT) AS h_{lang}"
    )


@register(
    "language_id",
    oracle=f"""
    WITH l AS (
      SELECT doc_id, text || ({_lang_tail_sql("//")}) AS ltext
      FROM documents
    ),
    arr AS (
      SELECT doc_id,
             list_filter(string_split(replace(ltext, chr(10), ' '), ' '),
                         w -> w <> '') AS words
      FROM l
    ),
    hits AS (
      SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words,
             {", ".join(_lang_hits_duck(g) for g in LANG_PROFILES)}
      FROM arr
    ),
    ranked AS (
      SELECT *, {", ".join(_lang_rnk_sql(g) for g in LANG_PROFILES)}
      FROM hits
    )
    {" UNION ALL ".join(
        f"SELECT doc_id, '{g}' AS lang, h_{g} AS hits, n_words, rnk_{g} AS rnk FROM ranked"
        for g in LANG_PROFILES
    )}
    """,
)
def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document language identification over the marker profiles:
    one row per (doc, language) carrying the profile hit count and its
    dense per-doc rank (hits DESC, lang ASC) — rnk=1 is the predicted
    language; the full score vector is emitted so downstream mixing
    policies (e.g. per-language sampling rates) see calibration, not
    just an argmax.

    Scale shape: ONE scan, zero shuffles, zero joins, no Python — the
    profiles are literal arrays in the plan (a broadcast join only
    becomes necessary when profiles outgrow plan-literal size), the
    rank is row-local comparison arithmetic instead of a window, and
    the 5x row explosion happens AFTER the per-doc reduction to five
    counters. At 100 TB this is scan-bandwidth-bound, the cheapest
    possible plan shape.
    """
    return language_id_of(tbl(spark, sf_dir, "documents"))


def language_id_of(docs: DataFrame) -> DataFrame:
    """The classifier as a pure DataFrame transformation (needs
    doc_id, text, n_chars) — batch/stream-agnostic like
    quality_signals_of, so the same column program can run at ingest.
    """
    l = docs.selectExpr("doc_id", f"text || ({_lang_tail_sql('div')}) AS ltext")
    arr = l.selectExpr(
        "doc_id",
        "filter(split(replace(ltext, chr(10), ' '), ' '), w -> w != '') AS words",
    )
    hits = arr.selectExpr(
        "doc_id",
        "CAST(size(words) AS BIGINT) AS n_words",
        *[_lang_hits_spark(g) for g in LANG_PROFILES],
    )
    ranked = hits.selectExpr("*", *[_lang_rnk_sql(g) for g in LANG_PROFILES])
    stack = ", ".join(f"'{g}', h_{g}, rnk_{g}" for g in LANG_PROFILES)
    return ranked.selectExpr(
        "doc_id",
        "n_words",
        f"stack({len(LANG_PROFILES)}, {stack}) AS (lang, hits, rnk)",
    ).select("doc_id", "lang", "hits", "n_words", "rnk")


# ---------------------------------------------------------------------------
# Language-ID evaluation: confusion matrix against the constructed
# ground truth (the tail a doc received IS its dominant language by
# construction), the same eval-the-operator pattern as
# ann_recall_eval. A pipeline tunes its LID stage from exactly this
# table: which languages leak into which, and each label's recall.
# ---------------------------------------------------------------------------

#: Ground truth by construction: _lang_tail_sql keys the appended
#: marker phrase on doc_id % 5 (0 → no tail → the corpus's own
#: English-ish text).
_LANG_TRUTH_SQL = (
    "CASE CAST(doc_id % 5 AS INT) WHEN 1 THEN 'de' WHEN 2 THEN 'es'"
    " WHEN 3 THEN 'fr' WHEN 4 THEN 'it' ELSE 'en' END"
)


@register(
    "language_id_eval",
    # REGISTRY["language_id"].oracle is set above in this module —
    # embedded verbatim (battery construction rule).
    oracle=f"""
    WITH li AS ({REGISTRY["language_id"].oracle}),
    preds AS (
      SELECT doc_id, lang AS pred_lang, {_LANG_TRUTH_SQL} AS label_lang
      FROM li WHERE rnk = 1
    ),
    cells AS (
      SELECT label_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM preds GROUP BY label_lang, pred_lang
    ),
    tot AS (
      SELECT *, SUM(n_docs) OVER (PARTITION BY label_lang) AS label_total
      FROM cells
    )
    SELECT label_lang, pred_lang, n_docs,
           CAST(label_total AS BIGINT) AS label_total,
           CAST({_q_micro_sql("n_docs", "label_total")} AS BIGINT) AS share_micro
    FROM tot
    """,
)
def language_id_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: per (true language, predicted
    language) cell, the doc count, the label's total mass, and the
    cell's exact micro-unit share of it (the diagonal's share IS the
    label's recall). Truth is by construction — the deterministic
    marker tail a document received (doc_id % 5) is its dominant
    language.

    Scale shape: rides the classifier's one scan, then a tiny
    (label, pred)-keyed partial aggregation (≤ |langs|² cells) and a
    label-partitioned window over those cells — the shuffled data
    AFTER the per-doc reduction is a handful of rows regardless of
    corpus size.
    """
    return language_id_eval_from(language_id(spark, sf_dir))


def language_id_eval_from(li: DataFrame) -> DataFrame:
    """The confusion matrix over an ALREADY-BUILT classifier frame
    ((doc_id, lang, hits, n_words, rnk)) — the sharing seam
    text_mining_battery uses to feed its langid and eval legs from
    one classifier scan."""
    preds = li.filter(F.col("rnk") == 1).select(
        "doc_id",
        F.col("lang").alias("pred_lang"),
        F.expr(_LANG_TRUTH_SQL).alias("label_lang"),
    )
    cells = preds.groupBy("label_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    tot = cells.select(
        "*",
        F.expr(
            "CAST(SUM(n_docs) OVER (PARTITION BY label_lang) AS BIGINT)"
        ).alias("label_total"),
    )
    return tot.select(
        "label_lang",
        "pred_lang",
        "n_docs",
        "label_total",
        F.expr(
            f"CAST({_q_micro_spark('n_docs', 'label_total')} AS BIGINT)"
        ).alias("share_micro"),
    )
