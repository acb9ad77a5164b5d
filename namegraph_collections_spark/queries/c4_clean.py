"""C4 line-level cleaning (Raffel et al. 2020 §2.2) — the published
rule set every C4-derived corpus is built with, as a TRANSFORMATION
(kept-lines reconstruction), not just a score:

line rules (in precedence order — each line gets exactly one bucket):
- drop lines not ending in a terminal punctuation mark (. ! ? ");
- drop lines with fewer than 3 words;
- drop lines containing the word "javascript";
- otherwise keep.

page rules:
- keep a page only if ≥ 5 lines survive, and the raw page contains
  neither "lorem ipsum" nor a curly brace.

The synthetic corpus is single-line, so (the quality-signals tail
precedent) both engines deterministically rebuild the SAME multi-line
page from (text, doc_id): six 8-word sentence lines sliced from the
document's words (each ending in '.'), then rule-triggering tail
lines on doc_id residues — a no-terminal-punctuation line (%3), a
2-word line (%2), a javascript line (%9), a "lorem ipsum" line (%11),
a curly-brace line (%13) — so every rule fires on a real,
overlapping subset instead of matching vacuously.

Determinism: counts are BIGINT, the cleaned page is pinned by its
md5 hex digest (string) + kept-char count rather than the full text
(compact hash surface, same value evidence); booleans for the two
keep flags. No doubles anywhere.

Scale shape: embarrassingly parallel scan+project — zero shuffles,
zero joins, no Python; line classification runs in JVM higher-order
array functions inside whole-stage codegen. At 100 TB this is the
same scan-bandwidth shape as the quality-signals and PII stages it
runs beside.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.queries.registry import register, tbl

#: Page-level minimum surviving-line count (C4's "at least 5
#: sentences", with kept lines as the sentence proxy).
MIN_KEPT_LINES = 5

# --- deterministic multi-line page reconstruction ---------------------------
# Spark: slice(arr, start, LENGTH); DuckDB: list_slice(arr, start,
# STOP-inclusive) — the six 8-word sentence windows below are the same
# word ranges [1..8], [9..16], ... [41..48] on both engines. Each
# window is explicitly NULLed when it starts past the document's word
# count (concat_ws then skips it on both engines): the engines
# DISAGREE on the unguarded case — DuckDB's out-of-range list_slice
# yields NULL while Spark's slice yields an empty array — so short
# documents would otherwise grow phantom '.' lines on one side only.
_SENT_STARTS = [1 + 8 * i for i in range(6)]

_TAIL_LINES_SQL = (
    " || CASE WHEN doc_id % 3 = 0 THEN chr(10) ||"
    " 'this line has no terminal punctuation marker' ELSE '' END"
    " || CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'short line.' ELSE '' END"
    " || CASE WHEN doc_id % 9 = 0 THEN chr(10) ||"
    " 'beware this javascript enabled line breaks pages.' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN chr(10) ||"
    " 'filler lorem ipsum filler line here.' ELSE '' END"
    " || CASE WHEN doc_id % 13 = 0 THEN chr(10) ||"
    " 'config block option curly brace here. {' ELSE '' END"
)

_PAGE_SQL_SPARK = (
    "concat_ws(chr(10), "
    + ", ".join(
        f"IF(size(words) >= {s},"
        f" array_join(slice(words, {s}, 8), ' ') || '.', NULL)"
        for s in _SENT_STARTS
    )
    + f") {_TAIL_LINES_SQL}"
)

_PAGE_SQL_DUCK = (
    "concat_ws(chr(10), "
    + ", ".join(
        f"CASE WHEN len(words) >= {s} THEN"
        f" array_to_string(list_slice(words, {s}, {s + 7}), ' ') || '.'"
        " ELSE NULL END"
        for s in _SENT_STARTS
    )
    + f") {_TAIL_LINES_SQL}"
)

# --- per-line classification (precedence: punct → short → js → keep) --------
_TERMINAL_SQL = "right(l, 1) IN ('.', '!', '?', '\"')"

_WC3_SPARK = "size(filter(split(l, ' '), w -> w != '')) >= 3"
_WC3_DUCK = "len(list_filter(string_split(l, ' '), w -> w <> '')) >= 3"

_JS_SQL = "contains(lower(l), 'javascript')"

_KEEP_SPARK = f"l -> {_TERMINAL_SQL} AND {_WC3_SPARK} AND NOT {_JS_SQL}"
_KEEP_DUCK = f"l -> {_TERMINAL_SQL} AND {_WC3_DUCK} AND NOT {_JS_SQL}"

_PAGE_KEEP_SQL = (
    f"n_kept >= {MIN_KEPT_LINES}"
    " AND NOT contains(lower(page), 'lorem ipsum')"
    " AND NOT contains(page, '{')"
)


@register(
    "c4_line_filter",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS words
      FROM documents
    ),
    p AS (
      SELECT doc_id, {_PAGE_SQL_DUCK} AS page FROM w
    ),
    l AS (
      SELECT doc_id, page, string_split(page, chr(10)) AS lines FROM p
    ),
    c AS (
      SELECT doc_id, page,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(list_filter(lines, l -> NOT ({_TERMINAL_SQL})))
                  AS BIGINT) AS n_drop_punct,
             CAST(len(list_filter(lines, l -> ({_TERMINAL_SQL})
                  AND NOT ({_WC3_DUCK}))) AS BIGINT) AS n_drop_short,
             CAST(len(list_filter(lines, l -> ({_TERMINAL_SQL})
                  AND ({_WC3_DUCK}) AND ({_JS_SQL}))) AS BIGINT) AS n_drop_js,
             array_to_string(list_filter(lines, {_KEEP_DUCK}), chr(10))
               AS cleaned
      FROM l
    ),
    m AS (
      SELECT doc_id, page, n_lines, n_drop_punct, n_drop_short, n_drop_js,
             n_lines - n_drop_punct - n_drop_short - n_drop_js AS n_kept,
             CAST(length(cleaned) AS BIGINT) AS kept_chars,
             md5(cleaned) AS cleaned_hash
      FROM c
    )
    SELECT doc_id, n_lines, n_kept, n_drop_punct, n_drop_short, n_drop_js,
           kept_chars, cleaned_hash, {_PAGE_KEEP_SQL} AS page_keep
    FROM m
    """,
)
def c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 §2.2 line filters + page gates over the reconstructed
    multi-line page (module docstring): per-doc bucket counts, the
    cleaned page's md5 + char count, and the composite page flag.
    """
    return c4_clean_of(tbl(spark, sf_dir, "documents"))


def c4_clean_of(docs: DataFrame) -> DataFrame:
    """The cleaning as a pure DataFrame transformation — zero shuffle,
    zero state, so the SAME column program runs at ingest on a
    streaming ``documents`` source (streaming/filter_stream.py) and in
    the batch query above. ``docs`` needs (doc_id, text)."""
    w = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> x != '')").alias("words"),
    )
    p = w.select("doc_id", F.expr(_PAGE_SQL_SPARK).alias("page"))
    l = p.select("doc_id", "page", F.expr("split(page, chr(10))").alias("lines"))
    c = l.select(
        "doc_id",
        "page",
        F.expr("CAST(size(lines) AS BIGINT)").alias("n_lines"),
        F.expr(
            f"CAST(size(filter(lines, l -> NOT ({_TERMINAL_SQL}))) AS BIGINT)"
        ).alias("n_drop_punct"),
        F.expr(
            f"CAST(size(filter(lines, l -> ({_TERMINAL_SQL})"
            f" AND NOT ({_WC3_SPARK}))) AS BIGINT)"
        ).alias("n_drop_short"),
        F.expr(
            f"CAST(size(filter(lines, l -> ({_TERMINAL_SQL})"
            f" AND ({_WC3_SPARK}) AND ({_JS_SQL}))) AS BIGINT)"
        ).alias("n_drop_js"),
        F.expr(f"array_join(filter(lines, {_KEEP_SPARK}), chr(10))").alias(
            "cleaned"
        ),
    )
    m = c.select(
        "doc_id",
        "page",
        "n_lines",
        "n_drop_punct",
        "n_drop_short",
        "n_drop_js",
        F.expr("n_lines - n_drop_punct - n_drop_short - n_drop_js").alias(
            "n_kept"
        ),
        F.expr("CAST(length(cleaned) AS BIGINT)").alias("kept_chars"),
        F.expr("md5(cleaned)").alias("cleaned_hash"),
    )
    return m.select(
        "doc_id",
        "n_lines",
        "n_kept",
        "n_drop_punct",
        "n_drop_short",
        "n_drop_js",
        "kept_chars",
        "cleaned_hash",
        F.expr(_PAGE_KEEP_SQL).alias("page_keep"),
    )
