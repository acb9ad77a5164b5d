"""DuckDB-SQL twin of the Porter stemmer in ``functions/stemmer.py``.

Generates a chain of CTE stages that stem a token column with plain
SQL — no UDFs — so the analyzer-backed search path gets a REAL oracle
instead of a rows-only check. Each stage mirrors one step of Porter's
1980 algorithm; the consonant/vowel classification (including the
context-dependent ``y``) is a ``list_reduce`` left fold over the
word's characters, and the m-measure counts ``vc`` transitions in the
resulting class string.

The generated SQL is large (the m-measure is inlined per branch), so
callers should pre-filter the token stream to candidates — Porter
never alters the first three characters of a word it shortens, so
``substring(token, 1, 3)`` membership against the query terms' own
prefixes is an exact pre-filter for term matching.

Every stage is ``AS MATERIALIZED``: DuckDB inlines plain CTEs at each
reference, and every stage refers to the previous stage's ``w`` dozens
of times, so un-materialized chaining duplicates the upstream plan
exponentially (the un-hinted query never finishes even on 500 docs).
"""

from __future__ import annotations

# Suffix tables copied from functions/stemmer.py — order is load-bearing
# (the Python loop breaks on FIRST match, not longest).
STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _cv(e: str) -> str:
    """Class string of ``e``: one 'c'/'v' per character; y is a
    consonant at position 0 or after a vowel (stemmer.py:_is_cons)."""
    return (
        f"list_reduce(list_prepend('', string_split_regex({e}, '')),"
        " (acc, c) -> acc || CASE WHEN c = '' THEN ''"
        " WHEN c IN ('a','e','i','o','u') THEN 'v'"
        " WHEN c = 'y' THEN (CASE WHEN acc = '' OR right(acc, 1) = 'v' THEN 'c' ELSE 'v' END)"
        " ELSE 'c' END)"
    )


def _m(e: str) -> str:
    """m-measure: number of 'vc' transitions in the class string."""
    cv = _cv(e)
    return f"CAST((length({cv}) - length(replace({cv}, 'vc', ''))) / 2 AS INT)"


def _has_vowel(e: str) -> str:
    return f"contains({_cv(e)}, 'v')"


def _double_cons(e: str) -> str:
    return (
        f"(length({e}) >= 2 AND right({e}, 1) = substring({e}, length({e}) - 1, 1)"
        f" AND right({_cv(e)}, 1) = 'c')"
    )


def _cvc(e: str) -> str:
    return (
        f"(length({e}) >= 3 AND right({_cv(e)}, 3) = 'cvc'"
        f" AND right({e}, 1) NOT IN ('w','x','y'))"
    )


def _strip(e: str, n: int) -> str:
    return f"substring({e}, 1, length({e}) - {n})"


def _rule_case(branches: list[tuple[str, str, int]], min_m: int) -> str:
    """First-match suffix table (steps 2/3): on match, replace only if
    m(stem) >= min_m; either way the scan stops (Python's break)."""
    arms = []
    for suf, repl in branches:
        stem = _strip("w", len(suf))
        arms.append(
            f"WHEN ends_with(w, '{suf}') THEN"
            f" (CASE WHEN {_m(stem)} >= {min_m} THEN {stem} || '{repl}' ELSE w END)"
        )
    return "CASE " + " ".join(arms) + " ELSE w END"


def porter_ctes(source_cte: str) -> str:
    """CTE chain stemming column ``w`` of ``{source_cte}(.., w)``;
    the final stage is ``p_done`` with the stem in ``w`` (all other
    columns are carried through untouched)."""
    s1a = (
        "CASE WHEN ends_with(w, 'sses') THEN " + _strip("w", 2) +
        " WHEN ends_with(w, 'ies') THEN " + _strip("w", 2) +
        " WHEN ends_with(w, 'ss') THEN w"
        " WHEN ends_with(w, 's') THEN " + _strip("w", 1) +
        " ELSE w END"
    )
    # 1b phase 1: resolve 'eed'; emit the ed/ing candidate t (NULL = no hit)
    s1b_w = (
        "CASE WHEN ends_with(w, 'eed') THEN"
        f" (CASE WHEN {_m(_strip('w', 3))} > 0 THEN {_strip('w', 1)} ELSE w END)"
        " ELSE w END"
    )
    s1b_t = (
        "CASE WHEN ends_with(w, 'eed') THEN NULL"
        f" WHEN ends_with(w, 'ed') AND {_has_vowel(_strip('w', 2))} THEN {_strip('w', 2)}"
        f" WHEN ends_with(w, 'ing') AND {_has_vowel(_strip('w', 3))} THEN {_strip('w', 3)}"
        " ELSE NULL END"
    )
    # 1b phase 2: fix up the candidate
    s1b2 = (
        "CASE WHEN t IS NULL THEN w"
        " WHEN ends_with(t, 'at') OR ends_with(t, 'bl') OR ends_with(t, 'iz') THEN t || 'e'"
        f" WHEN {_double_cons('t')} AND right(t, 1) NOT IN ('l','s','z') THEN {_strip('t', 1)}"
        f" WHEN {_m('t')} = 1 AND {_cvc('t')} THEN t || 'e'"
        " ELSE t END"
    )
    s1c = (
        f"CASE WHEN ends_with(w, 'y') AND {_has_vowel(_strip('w', 1))}"
        f" THEN {_strip('w', 1)} || 'i' ELSE w END"
    )
    s2 = _rule_case(STEP2, 1)
    s3 = _rule_case(STEP3, 1)
    s4_arms = []
    for suf in STEP4:
        stem = _strip("w", len(suf))
        s4_arms.append(
            f"WHEN ends_with(w, '{suf}') THEN"
            f" (CASE WHEN {_m(stem)} > 1 THEN {stem} ELSE w END)"
        )
    s4 = (
        "CASE " + " ".join(s4_arms) +
        " WHEN ends_with(w, 'ion') AND length(w) > 3"
        " AND substring(w, length(w) - 3, 1) IN ('s','t')"
        f" AND {_m(_strip('w', 3))} > 1 THEN {_strip('w', 3)}"
        " ELSE w END"
    )
    e1 = _strip("w", 1)
    s5a = (
        f"CASE WHEN ends_with(w, 'e') AND ({_m(e1)} > 1 OR ({_m(e1)} = 1 AND NOT {_cvc(e1)}))"
        f" THEN {e1} ELSE w END"
    )
    s5b = (
        f"CASE WHEN {_m('w')} > 1 AND {_double_cons('w')} AND ends_with(w, 'l')"
        f" THEN {_strip('w', 1)} ELSE w END"
    )
    # words of length <= 2 skip every step (stemmer.py:71-72)
    return f"""
    p_0 AS MATERIALIZED (SELECT * EXCLUDE (w), lower(w) AS w0, lower(w) AS w FROM {source_cte}),
    p_1a AS MATERIALIZED (SELECT * EXCLUDE (w), {s1a} AS w FROM p_0),
    p_1b1 AS MATERIALIZED (SELECT * EXCLUDE (w), {s1b_w} AS w, {s1b_t} AS t FROM p_1a),
    p_1b2 AS MATERIALIZED (SELECT * EXCLUDE (w, t), {s1b2} AS w FROM p_1b1),
    p_1c AS MATERIALIZED (SELECT * EXCLUDE (w), {s1c} AS w FROM p_1b2),
    p_2 AS MATERIALIZED (SELECT * EXCLUDE (w), {s2} AS w FROM p_1c),
    p_3 AS MATERIALIZED (SELECT * EXCLUDE (w), {s3} AS w FROM p_2),
    p_4 AS MATERIALIZED (SELECT * EXCLUDE (w), {s4} AS w FROM p_3),
    p_5a AS MATERIALIZED (SELECT * EXCLUDE (w), {s5a} AS w FROM p_4),
    p_5b AS MATERIALIZED (SELECT * EXCLUDE (w), {s5b} AS w FROM p_5a),
    p_done AS MATERIALIZED (SELECT * EXCLUDE (w, w0),
                      CASE WHEN length(w0) <= 2 THEN w0 ELSE w END AS w
               FROM p_5b)
    """
