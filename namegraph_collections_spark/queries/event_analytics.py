"""Event-funnel and cohort-retention analytics (registry 58+, behind
the driver window — locally parity-checked).

The two canonical product-analytics queries over an event stream,
chosen because their natural Spark plans share ONE shuffle key: every
stage — first-touch times, ordered funnel progression, cohort
assignment, per-offset activity — is keyed on ``user_id`` (or derives
from a user-keyed aggregate), so consecutive aggregations and the
join-backs reuse the same hash partitioning instead of introducing
new exchanges. At 100 TB the event table is hashed on user once and
every later step is co-located.

Funnel semantics are the strict ORDERED kind: a click only counts if
it happens after the user's first view, a purchase only after that
first qualifying click (min-after-predecessor chain). The unordered
variant ("did all three ever happen") overcounts conversion and is
what naive COUNT(DISTINCT type)=3 computes — the join-back chain here
is the price of the honest number.

Timestamps ride as BIGINT epoch micros (``events_tbl``), so the
after-predecessor comparisons are integer compares in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.queries.registry import events_tbl, register

#: Ordered funnel: first-touch of each stage must follow its predecessor.
FUNNEL = ["view", "click", "purchase"]

#: Conversion window: the next stage counts only within 12h of the
#: previous stage's first-touch (without a window every active user
#: eventually "converts" and the funnel is a single degenerate row).
CONV_WINDOW_US = 12 * 3_600_000_000

DAY_US = 24 * 3_600_000_000


@register(
    "funnel_conversion",
    oracle=f"""
    WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
    s1 AS (
      SELECT user_id, MIN(ts_us) FILTER (WHERE event_type = '{FUNNEL[0]}') AS t1
      FROM ev GROUP BY user_id
    ),
    s2 AS (
      SELECT s1.user_id, s1.t1, MIN(ev.ts_us) AS t2
      FROM s1 JOIN ev ON ev.user_id = s1.user_id
      WHERE ev.event_type = '{FUNNEL[1]}' AND s1.t1 IS NOT NULL
        AND ev.ts_us > s1.t1 AND ev.ts_us <= s1.t1 + {CONV_WINDOW_US}
      GROUP BY s1.user_id, s1.t1
    ),
    s3 AS (
      SELECT s2.user_id, MIN(ev.ts_us) AS t3
      FROM s2 JOIN ev ON ev.user_id = s2.user_id
      WHERE ev.event_type = '{FUNNEL[2]}'
        AND ev.ts_us > s2.t2 AND ev.ts_us <= s2.t2 + {CONV_WINDOW_US}
      GROUP BY s2.user_id
    ),
    staged AS (
      SELECT s1.user_id,
             CASE WHEN s3.user_id IS NOT NULL THEN 3
                  WHEN s2.user_id IS NOT NULL THEN 2
                  WHEN s1.t1 IS NOT NULL THEN 1
                  ELSE 0 END AS stage
      FROM s1
      LEFT JOIN s2 ON s2.user_id = s1.user_id
      LEFT JOIN s3 ON s3.user_id = s1.user_id
    )
    SELECT stage, COUNT(*) AS n_users FROM staged GROUP BY stage
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-ordered {stages} funnel: users counted at the deepest
    stage whose first-touch happened AFTER the previous stage's
    first-touch and within the conversion window of it. Output:
    (stage, n_users), stage 0 = users with events but no first-stage
    touch.

    Every aggregation and join is keyed on user_id — one shuffle key
    end-to-end (see module docstring).
    """
    ev = events_tbl(spark, sf_dir).select("user_id", "event_type", "ts_us")
    s1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == FUNNEL[0], F.col("ts_us"))).alias("t1")
    )
    s2 = (
        s1.filter(F.col("t1").isNotNull())
        .join(ev.filter(F.col("event_type") == FUNNEL[1]), "user_id")
        .filter(
            (F.col("ts_us") > F.col("t1"))
            & (F.col("ts_us") <= F.col("t1") + CONV_WINDOW_US)
        )
        .groupBy("user_id", "t1")
        .agg(F.min("ts_us").alias("t2"))
    )
    s3 = (
        s2.join(ev.filter(F.col("event_type") == FUNNEL[2]), "user_id")
        .filter(
            (F.col("ts_us") > F.col("t2"))
            & (F.col("ts_us") <= F.col("t2") + CONV_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )
    staged = (
        s1.join(s2.select("user_id", "t2"), "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            F.when(F.col("t3").isNotNull(), F.lit(3))
            .when(F.col("t2").isNotNull(), F.lit(2))
            .when(F.col("t1").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("stage")
        )
    )
    return staged.groupBy("stage").agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "cohort_retention",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) // {DAY_US} AS day FROM events
    ),
    cohorts AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id),
    activity AS (SELECT DISTINCT user_id, day FROM ev)
    SELECT c.cohort_day, a.day - c.cohort_day AS offset_days,
           COUNT(*) AS n_active
    FROM cohorts c JOIN activity a ON a.user_id = c.user_id
    GROUP BY c.cohort_day, offset_days
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily retention triangle: users cohorted by first-seen day,
    counted once per (cohort, day-offset) they were active on.

    cohort assignment, per-day activity dedup, and the join meet on
    user_id; only the final rollup re-keys (to the cohort cell). The
    activity ``distinct`` runs BEFORE the join, so the join fans out
    per active-day, not per raw event — at 100 TB that's the
    difference between joining billions of events and millions of
    (user, day) rows.
    """
    ev = events_tbl(spark, sf_dir).select(
        "user_id", F.expr(f"ts_us div {DAY_US}").alias("day")
    )
    cohorts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = ev.distinct()
    return (
        activity.join(cohorts, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("offset_days"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM ordered
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts (the Markov bigram table
    behind next-event features): each consecutive pair in a user's
    (ts, event_id)-ordered stream contributes one (prev, next) count.

    event_id is the tiebreak, making the order TOTAL — a lag over a
    non-total order is nondeterministic under re-partitioning, which
    the cross-engine value hash would catch immediately. One shuffle
    on user_id for the lag window (tiny per-user sorts), one rollup
    to the 5×5 matrix — the classic sessionization shape, no
    self-join of the stream against itself.
    """
    ev = events_tbl(spark, sf_dir).select("user_id", "event_id", "event_type", "ts_us")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
