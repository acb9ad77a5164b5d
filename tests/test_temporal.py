"""Edge-semantics tests for the temporal join operators.

The registry queries (asof_join_events, interval_range_join) get full
value-hash parity against DuckDB in test_oracle_parity.py; these tests
pin the operator-level corner cases a bulk comparison can sail past:
tie-breaking at equal timestamps, probes with no preceding quote, and
half-open containment exactly at bin and interval boundaries.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from namegraph_collections_spark.operators.temporal import (
    asof_join,
    asof_join_chunked,
    binned_range_join,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def asof_result(spark):
    probe = _df(
        spark,
        [
            (1, 100, 10),   # after two quotes at ts=10 → tie broken by max id
            (1, 101, 5),    # between quotes → earlier quote only
            (1, 102, 1),    # before every quote → no match
            (1, 103, 20),   # exactly AT a quote ts → that quote is visible
            (2, 200, 50),   # other key: must not see key 1's quotes
        ],
        "user_id long, event_id long, ts long",
    )
    quote = _df(
        spark,
        [
            (1, 900, 10, 1.0),
            (1, 901, 10, 2.0),  # same instant, higher id → wins ties
            (1, 902, 3, 3.0),
            (1, 903, 20, 4.0),
            (2, 904, 49, 5.0),
        ],
        "user_id long, event_id long, ts long, value double",
    )
    out = asof_join(
        probe, quote, on="user_id", ts="ts",
        payload=["event_id", "value"], tiebreak="event_id",
    )
    return {r["event_id"]: (r["q_event_id"], r["q_value"]) for r in out.collect()}


def test_asof_tie_at_equal_quote_ts_takes_max_tiebreak(asof_result):
    assert asof_result[100] == (901, 2.0)


def test_asof_between_quotes_takes_earlier(asof_result):
    assert asof_result[101] == (902, 3.0)


def test_asof_no_preceding_quote_yields_nulls(asof_result):
    assert asof_result[102] == (None, None)


def test_asof_same_instant_quote_is_visible(asof_result):
    assert asof_result[103] == (903, 4.0)


def test_asof_keys_do_not_leak(asof_result):
    assert asof_result[200] == (904, 5.0)


def test_asof_probe_columns_pass_through(spark):
    probe = _df(spark, [(1, 7, 10, "keep")], "user_id long, event_id long, ts long, extra string")
    quote = _df(spark, [(1, 8, 9, 1.5)], "user_id long, event_id long, ts long, value double")
    row = asof_join(
        probe, quote, on="user_id", ts="ts", payload=["value"], tiebreak="event_id"
    ).collect()[0]
    assert (row["extra"], row["q_value"]) == ("keep", 1.5)


@pytest.fixture(scope="module")
def range_result(spark):
    # bin_width 100; interval [95, 195) straddles bins 0 and 1.
    intervals = _df(spark, [(1, 11, 95, 195), (1, 12, 300, 400), (2, 13, 95, 195)],
                    "k long, iv_id long, s long, e long")
    probes = _df(
        spark,
        [
            (1, 95),    # at start → contained
            (1, 194),   # last in-window point, other bin than start
            (1, 195),   # exactly at end → excluded (half-open)
            (1, 94),    # just before start, same bin → excluded
            (1, 300),   # second interval's start
            (2, 400),   # other key, matches nothing
        ],
        "k long, p long",
    )
    out = binned_range_join(
        intervals, probes, on="k", start="s", end="e", probe_ts="p", bin_width=100
    )
    return sorted((r["iv_id"], r["p"]) for r in out.collect())


def test_range_join_half_open_containment(range_result):
    assert range_result == [(11, 95), (11, 194), (12, 300)]


def test_range_join_no_duplicate_matches_across_bins(spark):
    # An interval exploded into 2 bins must match an in-window probe once.
    intervals = _df(spark, [(1, 21, 50, 150)], "k long, iv_id long, s long, e long")
    probes = _df(spark, [(1, 99), (1, 100)], "k long, p long")  # one per bin
    out = binned_range_join(
        intervals, probes, on="k", start="s", end="e", probe_ts="p", bin_width=100
    ).collect()
    assert sorted(r["p"] for r in out) == [99, 100]
    assert len(out) == 2


def test_asof_null_payload_field_is_not_backfilled(spark):
    """A NULL payload field on the WINNING quote must stay NULL — the
    sweep must never splice that one field in from an older quote
    (whole-row semantics, matching the oracle's LEFT JOIN + QUALIFY).
    Covers plain, chunked (whose carry-in crosses a chunk boundary
    here), and the per-column-coalesce regression in both."""
    probe = _df(spark, [(1, 7, 250)], "user_id long, event_id long, ts long")
    quote = spark.createDataFrame(
        [(1, 9, 10, 4.0), (1, 11, 150, None)],
        "user_id long, event_id long, ts long, value double",
    )
    args = dict(on="user_id", ts="ts", payload=["event_id", "value"], tiebreak="event_id")
    for impl in (
        asof_join(probe, quote, **args),
        asof_join_chunked(probe, quote, chunk_width=100, **args),
        asof_join_chunked(probe, quote, chunk_width=10**9, **args),
    ):
        row = impl.collect()[0]
        assert (row["q_event_id"], row["q_value"]) == (11, None)


def test_asof_chunked_equals_plain_at_any_width(spark):
    """The chunked form must be output-identical to the plain sweep for
    any chunk width — including width 1 (every row its own chunk, all
    matches via carry-in) and a width swallowing the whole range (all
    matches in-chunk, carry-in never fires)."""
    probe = spark.range(600).select(
        (F.col("id") % 5).alias("user_id"),
        F.col("id").alias("event_id"),
        ((F.col("id") * 2654435761) % 997).alias("ts"),
    )
    quote = spark.range(300).select(
        (F.col("id") % 4).alias("user_id"),
        (F.col("id") + 100000).alias("event_id"),
        ((F.col("id") * 40503) % 997).alias("ts"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    args = dict(on="user_id", ts="ts", payload=["event_id", "ts", "value"], tiebreak="event_id")
    plain = asof_join(probe, quote, **args)
    for width in (1, 13, 997, 10**9):
        chunked = asof_join_chunked(probe, quote, chunk_width=width, **args)
        assert plain.exceptAll(chunked).count() == 0
        assert chunked.exceptAll(plain).count() == 0


def test_asof_chunked_carry_in_crosses_empty_chunks(spark):
    # Quote in chunk 0, probes in chunks 3 and 5 (chunks 1-4 empty on
    # the quote side): carry-in must propagate across the gap.
    probe = _df(spark, [(1, 7, 350), (1, 8, 550)], "user_id long, event_id long, ts long")
    quote = _df(spark, [(1, 9, 10, 2.5)], "user_id long, event_id long, ts long, value double")
    out = asof_join_chunked(
        probe, quote, on="user_id", ts="ts", payload=["event_id", "value"],
        tiebreak="event_id", chunk_width=100,
    )
    got = {r["event_id"]: (r["q_event_id"], r["q_value"]) for r in out.collect()}
    assert got == {7: (9, 2.5), 8: (9, 2.5)}


# ---------------------------------------------------------------------------
# Property tests: random event sets vs a per-row Python brute force.
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),    # key
        st.integers(min_value=0, max_value=30),   # ts (collisions likely)
        st.booleans(),                            # is_quote
    ),
    min_size=1,
    max_size=25,
)


def _brute_asof(probes, quotes):
    # probes/quotes: (key, event_id, ts)[, value]; pick per spec.
    out = {}
    for k, pid, pts in probes:
        best = None
        for qk, qid, qts, qv in quotes:
            if qk == k and qts <= pts and (best is None or (qts, qid) > (best[0], best[1])):
                best = (qts, qid, qv)
        out[pid] = (best[1], best[2]) if best else (None, None)
    return out


@given(_events)
@settings(**_SETTINGS)
def test_asof_matches_bruteforce(spark, events):
    probes = [(k, i, ts) for i, (k, ts, q) in enumerate(events) if not q]
    # every 3rd quote carries a NULL payload value — whole-row pick
    # semantics must preserve it (no per-column backfill)
    quotes = [
        (k, i + 1000, ts, None if i % 3 == 0 else float(i))
        for i, (k, ts, q) in enumerate(events)
        if q
    ]
    if not probes:
        return
    probe = _df(spark, probes, "user_id long, event_id long, ts long")
    quote = (
        _df(spark, quotes, "user_id long, event_id long, ts long, value double")
        if quotes
        else spark.createDataFrame([], "user_id long, event_id long, ts long, value double")
    )
    want = _brute_asof(probes, quotes)
    for impl in (
        lambda: asof_join(probe, quote, on="user_id", ts="ts",
                          payload=["event_id", "value"], tiebreak="event_id"),
        lambda: asof_join_chunked(probe, quote, on="user_id", ts="ts",
                                  payload=["event_id", "value"], tiebreak="event_id",
                                  chunk_width=7),
    ):
        got = {r["event_id"]: (r["q_event_id"], r["q_value"]) for r in impl().collect()}
        assert got == want


@given(_events, st.integers(min_value=1, max_value=40))
@settings(**_SETTINGS)
def test_range_join_matches_bruteforce(spark, events, width):
    intervals = [(k, i, ts, ts + width) for i, (k, ts, q) in enumerate(events) if q]
    probes = [(k, i + 1000, ts) for i, (k, ts, q) in enumerate(events) if not q]
    if not intervals or not probes:
        return
    iv = _df(spark, intervals, "k long, iv_id long, s long, e long")
    pr = _df(spark, probes, "k long, p_id long, p long")
    got = sorted(
        (r["iv_id"], r["p_id"])
        for r in binned_range_join(
            iv, pr, on="k", start="s", end="e", probe_ts="p", bin_width=width
        ).collect()
    )
    want = sorted(
        (ivid, pid)
        for (ik, ivid, s, e) in intervals
        for (pk, pid, p) in probes
        if pk == ik and s <= p < e
    )
    assert got == want


def test_asof_plan_has_no_join(spark):
    """The as-of sweep must compile to window-over-union — any Join node
    means the inequality-join formulation snuck back in."""
    probe = _df(spark, [(1, 7, 10)], "user_id long, event_id long, ts long")
    quote = _df(spark, [(1, 8, 9, 1.0)], "user_id long, event_id long, ts long, value double")
    df = asof_join(probe, quote, on="user_id", ts="ts", payload=["value"], tiebreak="event_id")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan
