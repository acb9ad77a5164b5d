"""Batch BM25 search scoring (SURVEY §2.9 ★) — "search as a Spark query".

The reference serves ranked full-text search from Elasticsearch
(bool{multi_match + rank_feature} — research/learning-to-rank/
measure-times.py:12-105). BM25 is fully expressible relationally:
token stats (df, tf, doc length) via explode+groupBy, then the Lucene
BM25 formula as column math, then a ranked window for top-k.

Determinism: per-term contributions are rounded then summed as
DECIMAL(18,6) so the cross-engine sum is exact; ranking orders by the
rounded score with id tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from namegraph_collections_spark.functions.det_round import round6_det, round6_det_sql
from namegraph_collections_spark.functions.porter_sql import porter_ctes
from namegraph_collections_spark.functions.stemmer import porter_stem
from namegraph_collections_spark.queries.registry import register, spread, tbl

QUERY_TERMS = ["spark", "join", "merge", "window"]
#: Query terms after the analyzer: what stemmed_bm25 actually matches.
STEMMED_TERMS = [porter_stem(t) for t in QUERY_TERMS]
K1 = 1.2
B = 0.75
TOP_K = 10


RESCORE_WINDOW = 50
FINAL_K = 10
RANK_FEATURE_PIVOT = 500  # ES rank_feature saturation default shape
RANK_FEATURE_BOOST = 100  # collection_rank boost in the reference query

# F13: the public-only filter every reference search carries
# (research/learning-to-rank/measure-times.py:15 — filter
# {'term': {'data.public': True}}). documents has no public column, so
# the flag is a deterministic derivation both engines compute alike.
PUBLIC_SQL = "doc_id % 7 <> 0"


def _public(docs: DataFrame) -> DataFrame:
    return docs.filter(F.col("doc_id") % 7 != 0)


def _ranked_topk(df: DataFrame, k: int, *order, rnk: str = "rnk") -> DataFrame:
    """Alias of registry.ranked_topk (the shared TakeOrderedAndProject
    top-k; see its docstring) — kept so the search queries' call sites
    read locally."""
    from namegraph_collections_spark.queries.registry import ranked_topk

    return ranked_topk(df, k, *order, rnk=rnk)


# --- LTR feature set (configure-ltr.py:92-121) ------------------------------
# The reference's RankLib feature set: 6 keyword-match features, 10
# rank_feature saturations x/(x+pivot), 5 log-scaled variants
# ln(1+x), and names.size() — 22 features total. Restated over
# `documents`: match scores against derived fields, saturation/log
# features over deterministic document statistics, token count as the
# size feature. Spark columns and the DuckDB oracle are generated
# from ONE spec table so the two engines cannot drift.
_LTR_TITLE_TOKENS = 5
_MATCH_FEATURES = ["text", "title", "body", "distinct", "lang", "source"]
_SAT_FEATURES = [  # (name, stat column, saturation pivot)
    ("chars", "s_chars", 500),
    ("tokens", "s_tokens", 100),
    ("distinct", "s_distinct", 80),
    ("avglen", "s_avglen", 8),
    ("maxlen", "s_maxlen", 12),
    ("title_chars", "s_title_chars", 30),
    ("body_chars", "s_body_chars", 400),
    ("digits", "s_digits", 10),
    ("vowels", "s_vowels", 150),
    ("uniq", "s_uniq", 800),
]
_LOG_FEATURES = [  # (name, stat column)
    ("chars", "s_chars"),
    ("tokens", "s_tokens"),
    ("distinct", "s_distinct"),
    ("digits", "s_digits"),
    ("vowels", "s_vowels"),
]
LTR_FEATURE_NAMES = [
    "f_match_text",
    "f_match_title",
    "f_match_body",
    "f_match_distinct",
    "f_match_lang",
    "f_match_source",
    "f_sat_chars",
    "f_sat_tokens",
    "f_sat_distinct",
    "f_sat_avglen",
    "f_sat_maxlen",
    "f_sat_title_chars",
    "f_sat_body_chars",
    "f_sat_digits",
    "f_sat_vowels",
    "f_sat_uniq",
    "f_log_chars",
    "f_log_tokens",
    "f_log_distinct",
    "f_log_digits",
    "f_log_vowels",
    "f_size_names",
]

#: Tree-ensemble rescore model in the trained RankLib LambdaMART's
#: output form (an sltr stored model,
#: research/learning-to-rank/search.py:78-94; LambdaMART emits an
#: additive ensemble of small regression trees). The constants are
#: FIT, not hand-set: tools/fit_ltr.py derives them by deterministic
#: L2 gradient boosting over this query's own 22-feature extraction
#: against graded term-coverage qrels (the configure-ltr.py:92-121
#: role), and writes queries/ltr_model.py, which pytest pins to the
#: refit output. Each entry is one depth-2 tree:
#:   (root_feat, root_thr,
#:    (left_feat, left_thr, leafLL, leafLR),
#:    (right_feat, right_thr, leafRL, leafRR))
#: meaning: if root_feat <= root_thr descend left, else right; each
#: child splits once more and emits a leaf value. The ensemble score
#: is the plain sum of leaf outputs — both engines compile the SAME
#: nested conditionals from this one spec and the float sum is
#: evaluated in the same order.
from namegraph_collections_spark.queries.ltr_model import LTR_TREES  # noqa: E402


def _tree_sql(tree) -> str:
    rf, rt, (lf, lt, ll, lr), (gf, gt, gl, gr) = tree
    return (
        f"(CASE WHEN {rf} <= {rt} "
        f"THEN (CASE WHEN {lf} <= {lt} THEN {ll} ELSE {lr} END) "
        f"ELSE (CASE WHEN {gf} <= {gt} THEN {gl} ELSE {gr} END) END)"
    )


def _tree_col(tree):
    rf, rt, (lf, lt, ll, lr), (gf, gt, gl, gr) = tree
    return F.when(
        F.col(rf) <= rt,
        F.when(F.col(lf) <= lt, F.lit(ll)).otherwise(F.lit(lr)),
    ).otherwise(F.when(F.col(gf) <= gt, F.lit(gl)).otherwise(F.lit(gr)))


def _ltr_feats_cte() -> str:
    """The shared WITH-body producing `feats` (doc_id, base_score, 22
    feature columns) for the rescore window — used by the LTR oracle
    AND by tools/fit_ltr.py, so the model is fit on EXACTLY the
    features the query computes."""
    terms = ", ".join(f"'{t}'" for t in QUERY_TERMS)
    t = _LTR_TITLE_TOKENS
    stats = f"""
      SELECT w.doc_id, w.base_score, w.base_rnk,
        len(list_filter(toks, x -> x IN ({terms}))) AS m_text,
        len(list_filter(toks[1:{t}], x -> x IN ({terms}))) AS m_title,
        len(list_filter(toks[{t} + 1:], x -> x IN ({terms}))) AS m_body,
        {" + ".join(f"(CASE WHEN list_contains(toks, '{q}') THEN 1 ELSE 0 END)" for q in QUERY_TERMS)} AS m_distinct,
        {" + ".join(f"(CASE WHEN lang = '{q}' THEN 1 ELSE 0 END)" for q in QUERY_TERMS)} AS m_lang,
        {" + ".join(f"(CASE WHEN contains(source, '{q}') THEN 1 ELSE 0 END)" for q in QUERY_TERMS)} AS m_source,
        n_chars AS s_chars,
        len(toks) AS s_tokens,
        len(list_distinct(toks)) AS s_distinct,
        CAST(n_chars AS DOUBLE) / len(toks) AS s_avglen,
        list_max(list_transform(toks, x -> len(x))) AS s_maxlen,
        len(array_to_string(toks[1:{t}], ' ')) AS s_title_chars,
        len(array_to_string(toks[{t} + 1:], ' ')) AS s_body_chars,
        len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS s_digits,
        len(lower(text)) - len(regexp_replace(lower(text), '[aeiou]', '', 'g')) AS s_vowels,
        1000.0 * len(list_distinct(toks)) / len(toks) AS s_uniq
      FROM top_window w
      JOIN (SELECT doc_id, text, n_chars, lang, source,
                   string_split(lower(text), ' ') AS toks
            FROM documents WHERE {PUBLIC_SQL}) USING (doc_id)
    """
    feats = (
        [f"CAST(m_{n} AS DOUBLE) AS f_match_{n}" for n in _MATCH_FEATURES]
        + [
            f"{round6_det_sql(f'CAST({s} AS DOUBLE) / ({s} + {p})')} AS f_sat_{n}"
            for n, s, p in _SAT_FEATURES
        ]
        + [f"{round6_det_sql(f'ln(1 + {s})')} AS f_log_{n}" for n, s in _LOG_FEATURES]
        + ["CAST(s_tokens AS DOUBLE) AS f_size_names"]
    )
    return f"""
    toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents WHERE {PUBLIC_SQL}
    ),
    base AS (
      SELECT doc_id, COUNT(*) AS base_score FROM toks
      WHERE token IN ({terms})
      GROUP BY doc_id
    ),
    top_window AS (
      SELECT doc_id, base_score,
             ROW_NUMBER() OVER (ORDER BY base_score DESC, doc_id ASC) AS base_rnk
      FROM base
      QUALIFY base_rnk <= {RESCORE_WINDOW}
    ),
    stats AS ({stats}),
    feats AS (
      SELECT doc_id, base_score, {", ".join(feats)}
      FROM stats
    )"""


def _ltr_oracle_sql() -> str:
    # Leaf values are ≤3-decimal constants, so the ensemble sum is
    # exact in DECIMAL(18,6) — the usual cross-engine determinism
    # treatment (DuckDB parses numeric literals as DECIMAL, Spark as
    # DOUBLE; summing decimals on both sides removes the mismatch).
    model = " + ".join(f"CAST({_tree_sql(t)} AS DECIMAL(18,6))" for t in LTR_TREES)
    feat_cols = ", ".join(LTR_FEATURE_NAMES)
    return f"""
    WITH {_ltr_feats_cte()},
    rescored AS (
      SELECT doc_id, base_score, {feat_cols},
             CAST({model} AS DOUBLE) AS ltr_score
      FROM feats
    )
    SELECT doc_id, base_score, {feat_cols}, ltr_score, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY ltr_score DESC, doc_id ASC) AS rnk
      FROM rescored
    ) WHERE rnk <= {FINAL_K}
    """


@register("search_ltr_rescore", oracle=_ltr_oracle_sql())
def search_ltr_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase LTR search: cheap match score → top-50 rescore window
    → 22-feature model → top-10 (W7 ★; the rescore-window shape of
    measure-times.py:86-105 with the feature families of
    configure-ltr.py:92-121 and F13's public filter).

    Phase 1 scores every public matching doc with a term-frequency
    count; only the top ``RESCORE_WINDOW`` rows get feature extraction
    (6 match + 10 saturation + 5 log + size) and the deterministic
    depth-2 tree ensemble standing in for the trained RankLib
    LambdaMART (LTR_TREES — same additive-trees shape, fixed splits).
    At scale the feature pipeline runs on 50 rows regardless of corpus
    size — exactly why the reference extracts features at rescore
    time, not index time.
    """
    docs = _public(tbl(spark, sf_dir, "documents"))
    toks = spread(docs, "doc_id").select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    base = (
        toks.filter(F.col("token").isin(QUERY_TERMS))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("base_score"))
    )
    window = _ranked_topk(
        base, RESCORE_WINDOW, F.col("base_score").desc(), F.col("doc_id").asc(), rnk="base_rnk"
    )

    t = _LTR_TITLE_TOKENS
    arr = F.split(F.lower("text"), " ")
    enriched = window.join(
        docs.select("doc_id", "text", "n_chars", "lang", "source"), "doc_id"
    ).withColumn("toks", arr)
    toks_c = F.col("toks")
    title = F.slice(toks_c, 1, t)
    body = F.slice(toks_c, t + 1, F.greatest(F.size(toks_c) - t, F.lit(0)))
    in_terms = lambda x: x.isin(QUERY_TERMS)  # noqa: E731
    stats = enriched.select(
        "doc_id",
        "base_score",
        F.size(F.filter(toks_c, in_terms)).alias("m_text"),
        F.size(F.filter(title, in_terms)).alias("m_title"),
        F.size(F.filter(body, in_terms)).alias("m_body"),
        sum(
            (F.array_contains(toks_c, q).cast("int") for q in QUERY_TERMS[1:]),
            F.array_contains(toks_c, QUERY_TERMS[0]).cast("int"),
        ).alias("m_distinct"),
        sum(
            ((F.col("lang") == q).cast("int") for q in QUERY_TERMS[1:]),
            (F.col("lang") == QUERY_TERMS[0]).cast("int"),
        ).alias("m_lang"),
        sum(
            (F.col("source").contains(q).cast("int") for q in QUERY_TERMS[1:]),
            F.col("source").contains(QUERY_TERMS[0]).cast("int"),
        ).alias("m_source"),
        F.col("n_chars").alias("s_chars"),
        F.size(toks_c).alias("s_tokens"),
        F.size(F.array_distinct(toks_c)).alias("s_distinct"),
        (F.col("n_chars").cast("double") / F.size(toks_c)).alias("s_avglen"),
        F.array_max(F.transform(toks_c, F.length)).alias("s_maxlen"),
        F.length(F.array_join(title, " ")).alias("s_title_chars"),
        F.length(F.array_join(body, " ")).alias("s_body_chars"),
        (F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))).alias("s_digits"),
        (
            F.length(F.lower("text"))
            - F.length(F.regexp_replace(F.lower("text"), "[aeiou]", ""))
        ).alias("s_vowels"),
        (1000.0 * F.size(F.array_distinct(toks_c)) / F.size(toks_c)).alias("s_uniq"),
    )
    feat_cols = (
        [F.col(f"m_{n}").cast("double").alias(f"f_match_{n}") for n in _MATCH_FEATURES]
        + [
            round6_det(F.col(s).cast("double") / (F.col(s) + F.lit(p))).alias(f"f_sat_{n}")
            for n, s, p in _SAT_FEATURES
        ]
        + [round6_det(F.log(1 + F.col(s))).alias(f"f_log_{n}") for n, s in _LOG_FEATURES]
        + [F.col("s_tokens").cast("double").alias("f_size_names")]
    )
    feats = stats.select("doc_id", "base_score", *feat_cols)
    # left-associative fold over the tree outputs — the exact addition
    # order of the oracle's `tree1 + tree2 + …`, so the float sum is
    # bit-identical across engines. The base score carries weight 0 in
    # the rescore, matching the reference's `"query_weight": 0`
    # (research/learning-to-rank/search.py:88) — inside the window the
    # model alone ranks.
    acc = _tree_col(LTR_TREES[0]).cast("decimal(18,6)")
    for t in LTR_TREES[1:]:
        acc = acc + _tree_col(t).cast("decimal(18,6)")
    rescored = feats.withColumn("ltr_score", acc.cast("double"))
    return _ranked_topk(
        rescored, FINAL_K, F.col("ltr_score").desc(), F.col("doc_id").asc()
    ).select("doc_id", "base_score", *LTR_FEATURE_NAMES, "ltr_score", "rnk")


@register(
    "bm25_search",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents WHERE {PUBLIC_SQL}
    ),
    doclen AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    corpus AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM doclen),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM toks
      WHERE token IN ({", ".join(f"'{t}'" for t in QUERY_TERMS)})
      GROUP BY doc_id, token
    ),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY token),
    contrib AS (
      SELECT tf.doc_id,
        CAST({round6_det_sql(f'''
          ln(1 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
          * (tf.tf * ({K1} + 1))
          / (tf.tf + {K1} * (1 - {B} + {B} * doclen.dl / corpus.avgdl))''')}
        AS DECIMAL(18,6)) AS c
      FROM tf
      JOIN df ON tf.token = df.token
      JOIN doclen ON tf.doc_id = doclen.doc_id
      CROSS JOIN corpus
    ),
    scored AS (
      SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, score, rnk FROM (
      SELECT doc_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    """,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene-style BM25 top-k over `documents` (SURVEY §2.9 ★).

    idf = ln(1 + (N−df+0.5)/(df+0.5)); score = Σ idf·tf·(k1+1)/(tf +
    k1·(1−b+b·dl/avgdl)).

    Plan shape: with a fixed small term set, per-doc stats (dl + one
    tf per term) are row-wise ARRAY expressions over the materialized
    token column — no explode, no token-stream shuffle at all. One
    tiny global agg produces corpus stats AND every per-term df
    together and broadcasts back; the score is then a single rounded-
    decimal row expression (terms with tf=0 contribute exact 0), and
    the only shuffle in the whole query is the final top-k window over
    matched docs. Mirrors the ES query at
    research/learning-to-rank/measure-times.py:86-105 with b/k1 from
    populate.py:106-112; F13's public filter applied like every
    reference search (measure-times.py:15).
    """
    docs = _public(tbl(spark, sf_dir, "documents"))
    toked = spread(docs, "doc_id").select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    per_doc = toked.select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[
            F.size(F.filter("toks", lambda x: x == F.lit(t))).alias(f"tf_{i}")  # noqa: B023 — filter() invokes the lambda at build time, inside this iteration
            for i, t in enumerate(QUERY_TERMS)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(QUERY_TERMS))
        ],
    )
    with_stats = per_doc.crossJoin(F.broadcast(stats))

    def term_contrib(i: int):
        tf, df = F.col(f"tf_{i}"), F.col(f"df_{i}")
        c = round6_det(
            F.log(1 + (F.col("n_docs") - df + 0.5) / (df + 0.5))
            * (tf * (K1 + 1))
            / (tf + K1 * (1 - B + B * F.col("dl") / F.col("avgdl")))
        ).cast("decimal(18,6)")
        return F.when(tf > 0, c).otherwise(F.lit(0).cast("decimal(18,6)"))

    score = term_contrib(0)
    for i in range(1, len(QUERY_TERMS)):
        score = score + term_contrib(i)
    matched = sum(
        (F.col(f"tf_{i}") for i in range(1, len(QUERY_TERMS))), F.col("tf_0")
    )
    scored = (
        with_stats.filter(matched > 0)
        .select("doc_id", score.cast("double").alias("score"))
    )
    return _ranked_topk(scored, TOP_K, F.col("score").desc(), F.col("doc_id").asc())


NDCG_K = 10


@register(
    "search_eval_metrics",
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id, CAST(n_chars % 4 AS INT) AS rel,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC) AS rnk
      FROM documents WHERE {PUBLIC_SQL}
    ),
    topk AS (SELECT * FROM ranked WHERE rnk <= {NDCG_K}),
    ideal AS (
      SELECT source, rel,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY rel DESC, doc_id ASC) AS irnk
      FROM topk
    ),
    dcg AS (
      SELECT source,
        SUM(CAST({round6_det_sql('(pow(2, rel) - 1) / log2(rnk + 1)')} AS DECIMAL(18,6))) AS dcg
      FROM topk GROUP BY source
    ),
    idcg AS (
      SELECT source,
        SUM(CAST({round6_det_sql('(pow(2, rel) - 1) / log2(irnk + 1)')} AS DECIMAL(18,6))) AS idcg
      FROM ideal GROUP BY source
    ),
    per_source AS (
      SELECT source,
        CAST(COUNT(*) FILTER (WHERE rel >= 2) AS BIGINT) AS n_relevant,
        CAST(COUNT(*) FILTER (WHERE rel >= 2 AND rnk <= {NDCG_K}) AS BIGINT) AS hits
      FROM ranked GROUP BY source
    )
    SELECT dcg.source,
           CAST(dcg.dcg AS DOUBLE) AS dcg,
           CAST(idcg.idcg AS DOUBLE) AS idcg,
           ((CAST(dcg.dcg * 1000000 AS BIGINT) * 1000000
               + CAST(idcg.idcg * 1000000 AS BIGINT) // 2)
              // nullif(CAST(idcg.idcg * 1000000 AS BIGINT), 0)) / 1000000.0 AS ndcg,
           n_relevant, hits,
           ((hits * 1000000 + n_relevant // 2) // nullif(n_relevant, 0)) / 1000000.0 AS recall
    FROM dcg JOIN idcg USING (source) JOIN per_source USING (source)
    """,
)
def search_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{NDCG_K} + Recall@{NDCG_K} ranking evaluation (SURVEY §2.9;
    compare_window_sizes.py:191-211, evaluate_endpoints.py:450-473 and
    :580-598) — both metrics over one shared ranking fixture.

    Per query group (source): DCG over the ranked top-k with graded
    relevance, IDCG over the ideal reordering of the same k, NDCG =
    DCG/IDCG; recall = share of all relevant docs (rel ≥ 2) the top-k
    retrieves. Per-position contributions round-then-decimal-sum so the
    metric is reproducible under any partitioning — an eval you can
    trust across cluster sizes. Evaluated over public docs only (F13).
    """
    docs = _public(tbl(spark, sf_dir, "documents"))
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    ranked = docs.select(
        "source",
        "doc_id",
        (F.col("n_chars") % 4).cast("int").alias("rel"),
        F.row_number().over(w).alias("rnk"),
    )
    topk = ranked.filter(F.col("rnk") <= NDCG_K)
    wi = Window.partitionBy("source").orderBy(F.col("rel").desc(), F.col("doc_id").asc())
    ideal = topk.select("source", "rel", F.row_number().over(wi).alias("irnk"))

    def contrib(rel, pos):
        return round6_det(
            (F.pow(F.lit(2.0), rel) - 1) / F.log2(pos + 1)
        ).cast("decimal(18,6)")

    dcg = topk.groupBy("source").agg(F.sum(contrib(F.col("rel"), F.col("rnk"))).alias("dcg"))
    idcg = ideal.groupBy("source").agg(F.sum(contrib(F.col("rel"), F.col("irnk"))).alias("idcg"))
    rel = F.col("rel") >= 2
    per_source = ranked.groupBy("source").agg(
        F.count(F.when(rel, 1)).alias("n_relevant"),
        F.count(F.when(rel & (F.col("rnk") <= NDCG_K), 1)).alias("hits"),
    )
    return (
        dcg.join(idcg, "source")
        .join(per_source, "source")
        .select(
            "source",
            F.col("dcg").cast("double").alias("dcg"),
            F.col("idcg").cast("double").alias("idcg"),
            # NDCG/recall in exact integer micro-units: both quotients
            # have exact inputs (DECIMAL sums, integer counts) and can
            # land on 6-decimal halves where engine ROUND rules differ.
            (
                F.expr(
                    "(CAST(dcg * 1000000 AS BIGINT) * 1000000"
                    " + CAST(idcg * 1000000 AS BIGINT) div 2)"
                    " div nullif(CAST(idcg * 1000000 AS BIGINT), 0)"
                )
                / F.lit(1000000.0)
            ).alias("ndcg"),
            "n_relevant",
            "hits",
            (
                F.expr("(hits * 1000000 + n_relevant div 2) div nullif(n_relevant, 0)")
                / F.lit(1000000.0)
            ).alias("recall"),
        )
    )


# Field boosts from the reference's multi_match most_fields query
# (measure-times.py:86-105: collection_name^3, keywords^2, description)
# and per-field BM25 b (populate.py:106-112: b=0 for name fields —
# length-neutral).
FIELD_SPECS = {
    "title": {"boost": 3.0, "b": 0.0},
    "body": {"boost": 1.0, "b": 0.75},
}
TITLE_TOKENS = 5


_FIELD_CONTRIB_SQL = f"""
    fields AS (
      SELECT doc_id, 'title' AS field,
             list_slice(string_split(lower(text), ' '), 1, {TITLE_TOKENS}) AS toks
      FROM documents WHERE {PUBLIC_SQL}
      UNION ALL
      SELECT doc_id, 'body' AS field,
             list_slice(string_split(lower(text), ' '), {TITLE_TOKENS} + 1,
                        len(string_split(text, ' '))) AS toks
      FROM documents WHERE {PUBLIC_SQL}
    ),
    toks AS (SELECT doc_id, field, unnest(toks) AS token FROM fields),
    doclen AS (SELECT doc_id, field, COUNT(*) AS dl FROM toks GROUP BY doc_id, field),
    corpus AS (SELECT field, COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl
               FROM doclen GROUP BY field),
    tf AS (
      SELECT doc_id, field, token, COUNT(*) AS tf FROM toks
      WHERE token IN ({", ".join(f"'{t}'" for t in QUERY_TERMS)})
      GROUP BY doc_id, field, token
    ),
    df AS (SELECT field, token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY field, token),
    contrib AS (
      SELECT tf.doc_id, tf.token,
        CAST({round6_det_sql(f'''
          (CASE tf.field WHEN 'title' THEN {FIELD_SPECS["title"]["boost"]}
                         ELSE {FIELD_SPECS["body"]["boost"]} END)
          * ln(1 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
          * (tf.tf * ({K1} + 1))
          / (tf.tf + {K1} * (1 - (CASE tf.field WHEN 'title' THEN {FIELD_SPECS["title"]["b"]}
                                                ELSE {FIELD_SPECS["body"]["b"]} END)
                             + (CASE tf.field WHEN 'title' THEN {FIELD_SPECS["title"]["b"]}
                                              ELSE {FIELD_SPECS["body"]["b"]} END)
                               * doclen.dl / corpus.avgdl))''')}
        AS DECIMAL(18,6)) AS c
      FROM tf
      JOIN df ON tf.field = df.field AND tf.token = df.token
      JOIN doclen ON tf.doc_id = doclen.doc_id AND tf.field = doclen.field
      JOIN corpus ON corpus.field = tf.field
    )
"""


def _field_contribs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc, field, term) boosted BM25 contributions — the shared
    stats pipeline of both multi-field variants: one explode, per-field
    token stats, per-field BM25 with the field's boost and b."""
    docs = spread(_public(tbl(spark, sf_dir, "documents")), "doc_id")
    all_toks = F.split(F.lower("text"), " ")
    fields = docs.select(
        "doc_id", F.lit("title").alias("field"), F.slice(all_toks, 1, TITLE_TOKENS).alias("toks")
    ).unionByName(
        docs.select(
            "doc_id",
            F.lit("body").alias("field"),
            F.slice(
                all_toks, TITLE_TOKENS + 1, F.greatest(F.size(all_toks) - TITLE_TOKENS, F.lit(0))
            ).alias("toks"),
        )
    )
    toks = fields.select("doc_id", "field", F.explode("toks").alias("token"))
    doclen = toks.groupBy("doc_id", "field").agg(F.count(F.lit(1)).alias("dl"))
    corpus = doclen.groupBy("field").agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.col("dl").cast("double")).alias("avgdl")
    )
    tf = (
        toks.filter(F.col("token").isin(QUERY_TERMS))
        .groupBy("doc_id", "field", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("field", "token").agg(F.countDistinct("doc_id").alias("df"))
    boost = F.when(F.col("field") == "title", F.lit(FIELD_SPECS["title"]["boost"])).otherwise(
        F.lit(FIELD_SPECS["body"]["boost"])
    )
    b = F.when(F.col("field") == "title", F.lit(FIELD_SPECS["title"]["b"])).otherwise(
        F.lit(FIELD_SPECS["body"]["b"])
    )
    return (
        tf.join(F.broadcast(df), ["field", "token"])
        .join(doclen, ["doc_id", "field"])
        .join(F.broadcast(corpus), "field")
        .select(
            "doc_id",
            "token",
            round6_det(
                boost
                * F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * (K1 + 1))
                / (F.col("tf") + K1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
            )
            .cast("decimal(18,6)")
            .alias("c"),
        )
    )


@register(
    "multifield_bm25_variants",
    oracle=f"""
    WITH {_FIELD_CONTRIB_SQL},
    most_scored AS (SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score FROM contrib GROUP BY doc_id),
    per_term AS (SELECT doc_id, token, MAX(c) AS c FROM contrib GROUP BY doc_id, token),
    cross_scored AS (SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score FROM per_term GROUP BY doc_id)
    SELECT 'most_fields' AS variant, doc_id, score, rnk FROM (
      SELECT doc_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
      FROM most_scored
    ) WHERE rnk <= {TOP_K}
    UNION ALL
    SELECT 'cross_fields' AS variant, doc_id, score, rnk FROM (
      SELECT doc_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
      FROM cross_scored
    ) WHERE rnk <= {TOP_K}
    """,
)
def multifield_bm25_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-field boosted BM25, both ES variants in one tagged result
    (§2.9 ★: multi_match with collection_name^3-style boosts and
    per-field b — b=0 name fields are length-neutral;
    measure-times.py:86-143, populate.py:106-112).

    Documents split into a title field (first {TITLE_TOKENS} tokens)
    and a body; per-field token stats feed per-field BM25 with the
    field's boost and b. ``most_fields`` SUMS a term's per-field
    scores per doc; ``cross_fields`` treats the fields as one blended
    field — per term the BEST field contribution counts (ES's blended
    term query with tie_breaker=0), then terms sum. The expensive
    stats pipeline (one explode + per-field aggs) is computed once and
    shared; only the final aggregation differs, so the variant
    dimension costs one extra tiny agg, not another pass over the
    corpus. Public docs only (F13).
    """
    contrib = _field_contribs(spark, sf_dir)
    per_term = contrib.groupBy("doc_id", "token").agg(
        F.sum("c").alias("sum_c"), F.max("c").alias("max_c")
    )
    # Both variants from ONE aggregation pass: most_fields = Σ all
    # field contribs, cross_fields = Σ per-term best-field contrib.
    # localCheckpoint is load-bearing twice over: (a) it materializes
    # the expensive stats pipeline once instead of once per variant,
    # and (b) it cuts the lineage so the two top-k branches below do
    # not share an agg+window subtree — Spark's plan deduplication
    # mis-rewrites the second occurrence of an identical aggregate
    # chain under a union (observed: the second branch's groupBy
    # silently drops terms), and a checkpointed leaf sidesteps the
    # rewrite entirely. The checkpointed set is one row of two doubles
    # per MATCHED doc — small at any corpus size.
    scores = per_term.groupBy("doc_id").agg(
        F.sum("sum_c").cast("double").alias("most_score"),
        F.sum("max_c").cast("double").alias("cross_score"),
    ).localCheckpoint()

    def tag(col: str, v: str) -> DataFrame:
        return _ranked_topk(
            scores.select("doc_id", F.col(col).alias("score")),
            TOP_K,
            F.col("score").desc(),
            F.col("doc_id").asc(),
        ).select(F.lit(v).alias("variant"), "doc_id", "score", "rnk")

    return tag("most_score", "most_fields").unionByName(tag("cross_score", "cross_fields"))


@register(
    "stemmed_bm25",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents WHERE {PUBLIC_SQL}
    ),
    -- doclen counts RAW tokens: the analyzer is 1:1, so stemming
    -- cannot change document length or the corpus averages.
    doclen AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    corpus AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM doclen),
    -- Exact pre-filter before the (large) SQL stemmer: Porter never
    -- alters the first 3 characters of a word whose stem is >= 4
    -- chars (it only strips/replaces suffixes and appends 'e'/'i';
    -- no replacement string can fabricate these terms), so only
    -- tokens sharing a query term's 3-char prefix can match.
    cand AS MATERIALIZED (
      SELECT doc_id, token AS w FROM toks
      WHERE substring(token, 1, 3) IN ({", ".join(f"'{t[:3]}'" for t in STEMMED_TERMS)})
    ),
    {porter_ctes("cand")},
    tf AS (
      SELECT doc_id, w AS token, COUNT(*) AS tf FROM p_done
      WHERE w IN ({", ".join(f"'{t}'" for t in STEMMED_TERMS)})
      GROUP BY doc_id, w
    ),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY token),
    contrib AS (
      SELECT tf.doc_id,
        CAST({round6_det_sql(f'''
          ln(1 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
          * (tf.tf * ({K1} + 1))
          / (tf.tf + {K1} * (1 - {B} + {B} * doclen.dl / corpus.avgdl))''')}
        AS DECIMAL(18,6)) AS c
      FROM tf
      JOIN df ON tf.token = df.token
      JOIN doclen ON tf.doc_id = doclen.doc_id
      CROSS JOIN corpus
    ),
    scored AS (
      SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, score, rnk FROM (
      SELECT doc_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    """,
)
def stemmed_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 over the porter-stemmed analyzer (§2.9 — the index's
    analyzed text fields, populate.py:97-105). The analyzer is a
    pandas UDF on the Spark side; the oracle runs a generated
    SQL twin of the stemmer (functions/porter_sql.py, parity-tested
    on 28k adversarial words) so this path gets a full value check.

    Analyzer shape at scale: stemming runs ONCE per document over the
    token array (Arrow-batched, after spread()), not per token row —
    then the stats pipeline is the plain JVM BM25.
    """
    from namegraph_collections_spark.functions.stemmer import porter_stem, porter_stem_tokens_udf

    docs = spread(_public(tbl(spark, sf_dir, "documents")), "doc_id")
    stemmed = docs.select(
        "doc_id", porter_stem_tokens_udf(F.split(F.lower("text"), " ")).alias("toks")
    )
    toks = stemmed.select("doc_id", F.explode("toks").alias("token"))
    terms = [porter_stem(t) for t in QUERY_TERMS]
    doclen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.col("dl").cast("double")).alias("avgdl")
    )
    tf = toks.filter(F.col("token").isin(terms)).groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    contrib = (
        tf.join(F.broadcast(df), "token")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            round6_det(
                F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * (K1 + 1))
                / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl")))
            )
            .cast("decimal(18,6)")
            .alias("c"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(F.sum("c").cast("double").alias("score"))
    return _ranked_topk(scored, TOP_K, F.col("score").desc(), F.col("doc_id").asc())


