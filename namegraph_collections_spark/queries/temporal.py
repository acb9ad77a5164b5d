"""Temporal join queries: as-of (point-in-time) and interval range join.

Registry entries 51+: they sit BEHIND the driver's 50-row correctness
window on purpose (every earlier row keeps its driver check); parity
is enforced locally by tests/test_oracle_parity.py, which sweeps the
whole registry against the same DuckDB oracles.

Neither operator exists in the reference (its pipelines are snapshot
batch jobs — SURVEY.md §2 has no temporal-join row), but both are
core to event-keyed training-data assembly: "attach the latest
feature-snapshot at-or-before each example's timestamp" is the
point-in-time-correctness join every feature store needs, and
"aggregate events inside each interval" is its windowed sibling.
Implementations are pure DataFrame compositions in
operators/temporal.py; see that module for the 100 TB design notes
(one keyed window sweep instead of an inequality join; bounded-fanout
bin explode instead of a nested loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.operators.temporal import (
    asof_join,
    asof_join_chunked,
    binned_range_join,
)
from namegraph_collections_spark.queries.registry import events_tbl, register

#: Interval length and bin width for the range join: one hour, in the
#: epoch-microseconds unit every event-time query here uses. Bin width
#: equals the max interval length, so each interval covers <= 2 bins.
HOUR_US = 3_600_000_000

#: Shared by the plain and chunked as-of registrations — the operator
#: contract is output-identical plans, so they answer to ONE oracle.
_ASOF_ORACLE = """
    WITH probe AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
      FROM events WHERE event_type = 'click'
    ),
    quote AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id AS click_event_id,
           p.user_id AS user_id,
           p.ts_us AS click_ts_us,
           q.event_id AS purchase_event_id,
           q.ts_us AS purchase_ts_us,
           p.ts_us - q.ts_us AS staleness_us,
           q.value AS purchase_value
    FROM probe p LEFT JOIN quote q
      ON q.user_id = p.user_id AND q.ts_us <= p.ts_us
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY p.event_id
      ORDER BY q.ts_us DESC NULLS LAST, q.event_id DESC
    ) = 1
    """


def _asof_sides(spark: SparkSession, sf_dir: str):
    ev = events_tbl(spark, sf_dir)
    probe = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.col("ts_us").alias("click_ts_us"),
    )
    quote = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts_us").alias("click_ts_us"), "value"
    )
    return probe, quote


def _asof_project(out: DataFrame) -> DataFrame:
    return out.select(
        "click_event_id",
        "user_id",
        "click_ts_us",
        F.col("q_event_id").alias("purchase_event_id"),
        F.col("q_click_ts_us").alias("purchase_ts_us"),
        (F.col("click_ts_us") - F.col("q_click_ts_us")).alias("staleness_us"),
        F.col("q_value").alias("purchase_value"),
    )


@register("asof_join_events", oracle=_ASOF_ORACLE)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every click matched to the same user's latest
    purchase at-or-before it (NULLs when none precedes it).

    The oracle spells the pick out as an explicit inequality join +
    ROW_NUMBER so the tiebreak is total and engine-independent (DuckDB
    has a native ASOF JOIN, but its choice among equal-timestamp build
    rows is unspecified — the window form pins "greatest ts, then
    greatest event_id", exactly what the Spark sweep's sort order
    yields). The Spark side never builds the inequality join at all:
    operators/temporal.py:asof_join is one union + one keyed window —
    one shuffle on user_id, zero join fan-out, which is the formulation
    that survives 100 TB and the one the O(n*m)-per-key oracle cannot
    match at scale.
    """
    # asof_join keys both sides on the same ts column name; probe's is
    # click_ts_us, so the quote side aliases its ts to match.
    probe, quote = _asof_sides(spark, sf_dir)
    out = asof_join(
        probe,
        quote,
        on="user_id",
        ts="click_ts_us",
        payload=["event_id", "click_ts_us", "value"],
        tiebreak="event_id",
        suffix="q_",
    )
    return _asof_project(out)


@register("asof_join_chunked_events", oracle=_ASOF_ORACLE)
def asof_join_chunked_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-proof chunked as-of against the SAME oracle as
    asof_join_events — the point being checked is precisely that the
    three-stage bounded-sort formulation (in-chunk sweep → per-chunk
    summary cumulation → carry-in fill; operators/temporal.py:
    asof_join_chunked) is output-identical to the one-window form while
    never sorting more than one (user, day) slice per task. Chunk width
    = 1 day of epoch-micros; the testdata spans a month, so the
    carry-in path genuinely exercises multi-chunk gaps.
    """
    probe, quote = _asof_sides(spark, sf_dir)
    out = asof_join_chunked(
        probe,
        quote,
        on="user_id",
        ts="click_ts_us",
        payload=["event_id", "click_ts_us", "value"],
        tiebreak="event_id",
        chunk_width=24 * HOUR_US,
        suffix="q_",
    )
    return _asof_project(out)


@register(
    "interval_range_join",
    oracle=f"""
    WITH purch AS (
      SELECT event_id AS purchase_event_id, user_id, epoch_us(ts) AS start_us
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, epoch_us(ts) AS ts_us, value
      FROM events WHERE event_type = 'click'
    )
    SELECT p.purchase_event_id,
           p.user_id,
           p.start_us,
           COUNT(c.ts_us) AS n_clicks,
           CAST(COALESCE(SUM(CAST(c.value AS DECIMAL(18,6))), 0) AS DOUBLE)
             AS total_click_value,
           MIN(c.ts_us) AS first_click_us
    FROM purch p LEFT JOIN c
      ON c.user_id = p.user_id
     AND c.ts_us >= p.start_us AND c.ts_us < p.start_us + {HOUR_US}
    GROUP BY p.purchase_event_id, p.user_id, p.start_us
    """,
)
def interval_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: per purchase, aggregate the same user's clicks in
    the hour starting at the purchase ([ts, ts+1h)), keeping zero-click
    purchases.

    The oracle is the textbook inequality join; the Spark side is the
    binned form (operators/temporal.py:binned_range_join): intervals
    explode into their <= 2 covering one-hour bins, probes carry their
    single bin, and the match is an EQUI-join on (user_id, bin) plus an
    exact containment filter — bounded 2x fan-out instead of a
    nested-loop range join. Match-less purchases come back via a left
    join of the interval table against the aggregate (small side: one
    row per matched purchase).
    """
    ev = events_tbl(spark, sf_dir)
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("ts_us").alias("start_us"),
        (F.col("ts_us") + F.lit(HOUR_US)).alias("end_us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts_us", F.col("value").cast("decimal(18,6)").alias("click_value")
    )
    matched = binned_range_join(
        purch, clicks, on="user_id", start="start_us", end="end_us",
        probe_ts="ts_us", bin_width=HOUR_US,
    )
    agg = matched.groupBy("purchase_event_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.sum("click_value").alias("sum_value"),
        F.min("ts_us").alias("first_click_us"),
    )
    return purch.join(agg, "purchase_event_id", "left").select(
        "purchase_event_id",
        "user_id",
        "start_us",
        F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_clicks"),
        F.coalesce(F.col("sum_value"), F.lit(0).cast("decimal(18,6)"))
        .cast("double")
        .alias("total_click_value"),
        "first_click_us",
    )
