"""BPE vocabulary induction as iterative DataFrame ops.

The byte-pair-encoding merge loop (Sennrich, Haddow & Birch, "Neural
Machine Translation of Rare Words with Subword Units", ACL 2016 — a
textbook public algorithm; nothing like it exists in the reference) is
the canonical tokenizer-training step of an LLM data pipeline. Its
production shape is exactly the one this query plans:

1. ONE pass over the corpus builds the word-frequency dictionary —
   the only big-data shuffle (at 100 TB: explode → partial-aggregated
   groupBy, the token_frequencies shape).
2. The merge loop then runs on the BOUNDED dictionary (vocabulary,
   not corpus, cardinality): each round counts adjacent symbol pairs
   weighted by word frequency, picks the most frequent pair with a
   total-order tiebreak, and merges it greedily left-to-right in
   every word. The corpus is never touched again.

Representation: a word's current segmentation is a marker string
``<s1><s2>...<sk>`` (symbols are [a-z0-9]+, so the ASCII markers can
never collide). Merging pair (a, b) is then one literal
``replace('<a><b>' -> '<ab>')`` — and because replace() substitutes
non-overlapping occurrences left-to-right in BOTH engines, the marker
trick IS the greedy BPE merge semantics, checkable value-for-value.
The pair tiebreak (count desc, a asc, b asc) makes every round's
winner unique, so the whole training loop is deterministic and the
DuckDB oracle replays it round by round as a CTE chain (MATERIALIZED:
each d_{r-1} is referenced twice per round, so DuckDB's default CTE
inlining would expand the chain 2^rounds-fold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.functions.det_round import micro_spark, micro_sql
from namegraph_collections_spark.queries.registry import register, spread, tbl

BPE_ROUNDS = 8


def _oracle_ctes() -> str:
    """The shared WITH-chain replaying word counts + {BPE_ROUNDS} merge
    rounds; both registered queries' oracles finish it with their own
    final SELECT (w1..wN for the merge table, d{BPE_ROUNDS} for the
    encoded dictionary)."""
    ctes = [
        """words AS MATERIALIZED (
      SELECT t AS word, COUNT(*) AS n
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents)
      WHERE regexp_matches(t, '^[a-z0-9]+$')
      GROUP BY 1
    ),
    d0 AS MATERIALIZED (
      SELECT word, n,
             '<' || array_to_string(regexp_extract_all(word, '.'), '><') || '>' AS repr
      FROM words
    )"""
    ]
    for r in range(1, BPE_ROUNDS + 1):
        ctes.append(f"""p{r} AS MATERIALIZED (
      SELECT split_part(pair, ' ', 1) AS a, split_part(pair, ' ', 2) AS b,
             CAST(SUM(n) AS BIGINT) AS cnt
      FROM (
        SELECT n, unnest(list_transform(range(1, len(ss)),
                         i -> ss[i] || ' ' || ss[i+1])) AS pair
        FROM (SELECT n, string_split(trim(repr, '<>'), '><') AS ss FROM d{r-1})
      )
      GROUP BY 1, 2
    ),
    w{r} AS MATERIALIZED (
      SELECT {r} AS round, a, b, a || b AS merged, cnt
      FROM p{r} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
    ),
    d{r} AS MATERIALIZED (
      SELECT word, n,
             replace(repr,
                     '<' || (SELECT a FROM w{r}) || '><' || (SELECT b FROM w{r}) || '>',
                     '<' || (SELECT merged FROM w{r}) || '>') AS repr
      FROM d{r-1}
    )""")
    return "WITH " + ",\n    ".join(ctes)


def _oracle() -> str:
    unions = " UNION ALL ".join(
        f"SELECT round, a, b, merged, cnt FROM w{r}" for r in range(1, BPE_ROUNDS + 1)
    )
    return _oracle_ctes() + "\n    " + unions


def _learn(spark: SparkSession, sf_dir: str) -> tuple[list[DataFrame], DataFrame]:
    """Run the merge loop; return (per-round winner frames, the final
    encoded dictionary ``(word, n, repr)``). Shared by the merge-table
    and encode queries so the two can never disagree on the merges."""
    docs = spread(tbl(spark, sf_dir, "documents"), "doc_id")
    words = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        # The marker encoding below is only collision-free for tokens in
        # [a-z0-9]+ (module docstring); enforce that alphabet rather than
        # assume it, so a '<'/'>' in the corpus can't silently corrupt
        # the merge semantics identically on both engines.
        .filter(F.col("word").rlike("^[a-z0-9]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    d = words.select(
        "word",
        "n",
        F.concat(
            F.lit("<"),
            F.array_join(F.regexp_extract_all(F.col("word"), F.lit("."), 0), "><"),
            F.lit(">"),
        ).alias("repr"),
    ).localCheckpoint(eager=True)
    winners: list[DataFrame] = []
    for r in range(1, BPE_ROUNDS + 1):
        ss = F.split(F.expr("trim(BOTH '<>' FROM repr)"), "><")
        pairs = d.select(
            "n",
            F.explode(
                F.transform(
                    F.slice(ss, 1, F.greatest(F.size(ss) - 1, F.lit(0))),
                    lambda t, i: F.struct(
                        t.alias("a"), F.element_at(ss, i + 2).alias("b")
                    ),
                )
            ).alias("p"),
        ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "n")
        pc = pairs.groupBy("a", "b").agg(F.sum("n").cast("long").alias("cnt"))
        w = (
            pc.orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .select(
                F.lit(r).alias("round"),
                "a",
                "b",
                F.concat("a", "b").alias("merged"),
                "cnt",
            )
            .localCheckpoint(eager=True)
        )
        winners.append(w)
        d = (
            d.crossJoin(F.broadcast(w.select("a", "b", "merged")))
            .select(
                "word",
                "n",
                F.replace(
                    F.col("repr"),
                    F.concat(F.lit("<"), "a", F.lit("><"), "b", F.lit(">")),
                    F.concat(F.lit("<"), "merged", F.lit(">")),
                ).alias("repr"),
            )
            .localCheckpoint(eager=True)
        )
    return winners, d


@register("bpe_merge_table", oracle=_oracle())
def bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{BPE_ROUNDS} rounds of BPE merge learning over the corpus word
    dictionary: (round, a, b, merged, frequency-weighted count) — the
    merge table a BPE tokenizer ships.

    Scale shape (see module docstring): round-0 word counts are the
    only corpus-sized shuffle; every later stage operates on the
    bounded dictionary, each round's winning pair is a 1-row broadcast
    into the merge projection, and the pair argmax is
    ``orderBy().limit(1)`` (TakeOrderedAndProject — never a global
    window). The loop materializes the dictionary per round with
    localCheckpoint, the same lineage-cut treatment as the semi-naive
    closure and PageRank iterations (operators/closure.py,
    queries/centrality.py): without it round r's plan re-derives
    rounds 1..r-1 and planning cost grows quadratically.
    """
    return _merge_union(_learn(spark, sf_dir)[0])


def _merge_union(winners: list[DataFrame]) -> DataFrame:
    """The merge-table projection over the loop's winner frames (shared
    with text_mining_battery, which runs _learn ONCE for both legs)."""
    out = winners[0]
    for w in winners[1:]:
        out = out.unionByName(w)
    return out


@register(
    "bpe_encode_tokens",
    oracle=_oracle_ctes()
    + f"""
    SELECT token, CAST(length(token) AS INTEGER) AS token_len,
           COUNT(DISTINCT word) AS n_words,
           CAST(SUM(n) AS BIGINT) AS total_count
    FROM (SELECT word, n,
                 unnest(string_split(trim(repr, '<>'), '><')) AS token
          FROM d{BPE_ROUNDS})
    GROUP BY token
    """,
)
def bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE with the learned merges: the token vocabulary after
    applying all {BPE_ROUNDS} merge rounds to the corpus dictionary —
    (token, token_len, n_words containing it, frequency-weighted
    total_count). This is the apply half of BPE (the tokenizer a
    pipeline actually runs over the corpus), complementing
    ``bpe_merge_table``'s training half.

    Scale shape: the final dictionary after the merge loop already IS
    the encoded corpus vocabulary (segmenting a word replays exactly
    the greedy merges the loop applied), so encoding costs one explode
    + one partial-aggregated groupBy over the BOUNDED dictionary — the
    corpus itself is never re-scanned. At 100 TB, encoding raw text
    would join each word against this (broadcastable,
    vocabulary-sized) segmentation table.
    """
    return _encode_from(_learn(spark, sf_dir)[1])


def _encode_from(d: DataFrame) -> DataFrame:
    """The vocabulary projection over the final encoded dictionary
    (shared with text_mining_battery, same reason as _merge_union)."""
    tok = d.select(
        "word",
        "n",
        F.explode(F.split(F.expr("trim(BOTH '<>' FROM repr)"), "><")).alias("token"),
    )
    return tok.groupBy("token").agg(
        F.countDistinct("word").alias("n_words"),
        F.sum("n").cast("long").alias("total_count"),
    ).select(
        "token",
        F.length("token").cast("int").alias("token_len"),
        "n_words",
        "total_count",
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility by language — the health metric a multilingual
# pipeline reads off its tokenizer before training (fertility =
# subword tokens per word; high-fertility languages pay more compute
# per byte of content and get silently down-weighted in a fixed token
# budget — the imbalance the XLM-R/NLLB tokenizer analyses measure).
# Computable exactly from artifacts the engine already builds: the
# learned BPE dictionary maps every word to its segment count, and the
# corpus provides per-language word counts.
# ---------------------------------------------------------------------------

#: Same word filter as the BPE dictionary build — every counted word
#: is guaranteed present in the dictionary, so the join below is total.
_WORD_RE = "^[a-z0-9]+$"


@register(
    "tokenizer_fertility",
    oracle=_oracle_ctes()
    + f"""
    , lw AS (
      SELECT lang, t AS word, COUNT(*) AS c
      FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS t
            FROM documents)
      WHERE regexp_matches(t, '{_WORD_RE}')
      GROUP BY 1, 2
    ),
    seg AS (
      SELECT word, len(string_split(trim(repr, '<>'), '><')) AS n_tokens
      FROM d{BPE_ROUNDS}
    ),
    agg AS (
      SELECT lw.lang,
             CAST(SUM(lw.c) AS BIGINT) AS n_word_occ,
             CAST(SUM(lw.c * seg.n_tokens) AS BIGINT) AS n_token_occ,
             CAST(SUM(lw.c * length(lw.word)) AS BIGINT) AS n_chars
      FROM lw JOIN seg USING (word)
      GROUP BY lw.lang
    )
    SELECT lang, n_word_occ, n_token_occ, n_chars,
           {micro_sql('n_token_occ', 'n_word_occ')} AS fertility_micro,
           {micro_sql('n_chars', 'n_token_occ')} AS chars_per_token_micro
    FROM agg
    """,
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility under the learned BPE merges:
    subword tokens per word (micro-units, exact round-half-up integer
    ratio) and characters per token — the multilingual-balance
    diagnostic the XLM-R/NLLB tokenizer studies report. A language
    whose fertility is 2x another's consumes 2x the context window for
    the same word count.

    Scale shape: per-(lang, word) counts are one explode + one
    partial-aggregated groupBy (the token_frequencies shape, keyed a
    language wider); the segment table is the BOUNDED final BPE
    dictionary (vocabulary cardinality — broadcast), so the join never
    shuffles the corpus side again; the rollup collapses to |langs|
    rows. The merge loop itself is shared when run inside
    text_mining_battery (ONE _learn feeds all BPE legs).
    """
    return tokenizer_fertility_from(
        spread(tbl(spark, sf_dir, "documents"), "doc_id"),
        _learn(spark, sf_dir)[1],
    )


def tokenizer_fertility_from(docs: DataFrame, d_final: DataFrame) -> DataFrame:
    """The fertility rollup over an ALREADY-TRAINED final dictionary —
    the sharing seam for battery use."""
    lw = (
        docs.select(
            "lang",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"),
        )
        .filter(F.col("word").rlike(_WORD_RE))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    seg = d_final.select(
        "word",
        F.size(F.split(F.expr("trim(BOTH '<>' FROM repr)"), "><")).alias("n_tokens"),
    )
    agg = (
        lw.join(F.broadcast(seg), "word")
        .groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("n_word_occ"),
            F.sum(F.col("c") * F.col("n_tokens")).cast("long").alias("n_token_occ"),
            F.sum(F.col("c") * F.length("word")).cast("long").alias("n_chars"),
        )
    )
    return agg.selectExpr(
        "lang",
        "n_word_occ",
        "n_token_occ",
        "n_chars",
        f"CAST({micro_spark('n_token_occ', 'n_word_occ')} AS BIGINT) AS fertility_micro",
        f"CAST({micro_spark('n_chars', 'n_token_occ')} AS BIGINT) AS chars_per_token_micro",
    )
