"""Temporal joins Spark lacks natively: as-of join and binned range join.

The reference engine never needed these (its pipelines are snapshot
batch jobs), but any event-keyed training-data pipeline does — "join
each example to the latest label/feature-snapshot at-or-before its
timestamp" is the canonical point-in-time-correctness operator, and
"aggregate events inside an interval" is its windowed sibling. Both
are expressed here as compositions of existing DataFrame ops, per the
project contract (composition first, Pandas UDF only if semantics
demand it — they don't here).

Scale design
------------
``asof_join``: the naive formulation is an inequality join
(``q.ts <= p.ts`` + keep-latest), which Spark plans as a broadcast
nested loop or a sort-merge with per-key cross products — O(n·m) per
key and a skew bomb at 100 TB. Instead both sides are union-tagged and
swept with ONE window per key: sort by (ts, side, quote tiebreak) and
carry the last-seen quote forward with ``last(..., ignorenulls=True)``.
That is the streaming merge formulation databases compile ASOF JOIN
to; cost is one hash shuffle on the key plus a per-partition sort —
the same price as any keyed window, with no join explosion at all.

``binned_range_join``: intervals are exploded into the fixed-width
time bins they cover and probes are tagged with their single bin, so
the match meets in an EQUI-join on (key, bin) with an exact
containment filter after — never a nested loop. With bin width >= the
max interval length each interval covers at most 2 bins, so the
fan-out is bounded by 2x regardless of data volume; each probe lands
in exactly one bin, so an (interval, probe) pair can match only once
and no dedup pass is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    probe: DataFrame,
    quote: DataFrame,
    on: str,
    ts: str,
    payload: list[str],
    tiebreak: str,
    suffix: str = "q_",
) -> DataFrame:
    """Point-in-time join: for every probe row, attach the payload of
    the single quote row with the greatest ``ts`` <= probe ``ts`` for
    the same ``on`` key (ties on quote ``ts`` broken by the greatest
    ``tiebreak``), or NULLs when no quote precedes it.

    ``probe`` and ``quote`` must both carry ``on`` and ``ts``;
    ``payload`` names the quote columns to attach (each emitted as
    ``{suffix}{name}``); ``tiebreak`` is a quote column making the
    pick total (typically a unique id) and must be in ``payload``'s
    table. Probe columns pass through unchanged.

    Equal timestamps count as "at-or-before": the quote side sorts
    before the probe side at the same instant, mirroring
    ``ASOF JOIN ... ON q.ts <= p.ts`` semantics.
    """
    qtypes = dict(quote.dtypes)
    out_cols = [f"{suffix}{c}" for c in payload]
    # Quote rows: side 0 (visible to probes at the same instant).
    q_tagged = quote.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tb"),
        *[F.col(c).alias(o) for c, o in zip(payload, out_cols)],
        *[F.lit(None).cast(t).alias(f"_p_{c}") for c, t in probe.dtypes],
    )
    p_tagged = probe.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("_side"),
        F.lit(None).cast(qtypes[tiebreak]).alias("_tb"),
        *[F.lit(None).cast(qtypes[c]).alias(o) for c, o in zip(payload, out_cols)],
        *[F.col(c).alias(f"_p_{c}") for c in probe.columns],
    )
    # One shuffle on the key; the frame must be ROWS (a RANGE frame is
    # illegal with a multi-column sort, and ROWS is what the sweep
    # means anyway). NULL _tb on probe rows sorts first under ASC, so a
    # probe row can never outsort a same-instant quote.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = q_tagged.unionByName(p_tagged).select(
        "*", *[F.last(o, ignorenulls=True).over(w).alias(f"_f_{o}") for o in out_cols]
    )
    return swept.filter(F.col("_side") == 1).select(
        *[F.col(f"_p_{c}").alias(c) for c in probe.columns],
        *[F.col(f"_f_{o}").alias(o) for o in out_cols],
    )


def binned_range_join(
    intervals: DataFrame,
    probes: DataFrame,
    on: str,
    start: str,
    end: str,
    probe_ts: str,
    bin_width: int,
) -> DataFrame:
    """Inner-join every probe row to every interval row (same ``on``
    key) whose half-open window ``[start, end)`` contains ``probe_ts``.

    ``bin_width`` must be >= the maximum interval length so each
    interval covers at most two bins. Returns interval columns +
    probe columns; callers project/aggregate after (and LEFT-join the
    aggregate back to the interval table if match-less intervals must
    survive — keeping that join outside this operator keeps its
    semantics one thing).
    """
    bw = int(bin_width)
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(f"CAST({start} AS BIGINT) div {bw}"),
                    F.expr(f"(CAST({end} AS BIGINT) - 1) div {bw}"),
                )
            )
        ),
    )
    pr = probes.withColumn("_bin", F.expr(f"CAST({probe_ts} AS BIGINT) div {bw}"))
    contained = (F.col(probe_ts) >= F.col(start)) & (F.col(probe_ts) < F.col(end))
    return iv.join(pr, [on, "_bin"], "inner").filter(contained).drop("_bin")
