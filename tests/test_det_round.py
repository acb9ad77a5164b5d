"""Cross-engine property test for functions/det_round.py — the one
rounding convention every hash surface now rides.

The claim: for the same input double, Spark's ``round6_det`` and
DuckDB's ``round6_det_sql`` produce the SAME double, bit for bit —
including exact 6-decimal halves, the class where engine ``ROUND``
half-way rules diverged three times (bigram-LM sf0.1, sketch battery
r06, incremental-rollup mean sf1). Inputs cover random magnitudes in
the documented validity range and a constructed grid of exact halves.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from namegraph_collections_spark.functions.det_round import round6_det, round6_det_sql


def _spark_round(spark, values):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(v,) for v in values], "x double")
    return [r[0] for r in df.select(round6_det(F.col("x")).alias("y")).collect()]


def _duck_round(values):
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t(x DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
        return [r[0] for r in con.sql(f"SELECT {round6_det_sql('x')} FROM t").fetchall()]
    finally:
        con.close()


#: exact 6-decimal halves (k + 0.5 in micro-units) across magnitudes,
#: plus the three historical divergence values.
HALVES = (
    [(k * 10 + 5) / 10_000_000.0 for k in range(0, 50, 7)]
    + [1.0000005, 43.4728125, 13911.3 / 320, 127 / 128, -0.0000005, -43.4728125]
)


def test_halves_grid_bit_identical(spark):
    got_s = _spark_round(spark, HALVES)
    got_d = _duck_round(HALVES)
    assert [repr(a) for a in got_s] == [repr(b) for b in got_d]


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=50,
    )
)
def test_random_doubles_bit_identical(spark, xs):
    got_s = _spark_round(spark, xs)
    got_d = _duck_round(xs)
    assert [repr(a) for a in got_s] == [repr(b) for b in got_d]
