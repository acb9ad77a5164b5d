"""The generated DuckDB Porter stemmer must agree with the Python
stemmer on every word — suffix-grafted fuzz plus guard-edge strings."""

from __future__ import annotations

import itertools
import random

import duckdb

from namegraph_collections_spark.functions.porter_sql import (
    STEP2,
    STEP3,
    STEP4,
    porter_ctes,
)
from namegraph_collections_spark.functions.stemmer import porter_stem


def _vocab() -> list[str]:
    random.seed(7)
    words = set()
    # exhaustive short strings over letters that hit the y/guard edges
    for n in (1, 2, 3, 4):
        for t in itertools.product("aeysti", repeat=n):
            words.add("".join(t))
    sufs = (
        ["", "s", "es", "sses", "ies", "ss", "eed", "ed", "ing", "y",
         "sion", "tion", "ion", "e", "l", "ll", "bl", "at", "iz"]
        + [s for s, _ in STEP2] + [s for s, _ in STEP3] + list(STEP4)
    )
    alpha = "abcdefgilmnoprstuvwyz"
    for _ in range(8000):
        stem = "".join(random.choice(alpha) for _ in range(random.randint(1, 7)))
        words.add(stem + random.choice(sufs))
    return sorted(words)


def test_sql_stemmer_matches_python():
    words = _vocab()
    con = duckdb.connect()
    con.sql("CREATE TABLE vocab (w VARCHAR)")
    con.executemany("INSERT INTO vocab VALUES (?)", [(w,) for w in words])
    q = (
        "WITH raw AS (SELECT w AS orig, w FROM vocab),"
        + porter_ctes("raw")
        + " SELECT orig, w FROM p_done"
    )
    rows = con.sql(q).fetchall()
    assert len(rows) == len(words)
    bad = [(o, s, porter_stem(o)) for o, s in rows if s != porter_stem(o)]
    assert bad == []
