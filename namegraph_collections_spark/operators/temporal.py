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


def _sweep(
    probe: DataFrame,
    quote: DataFrame,
    part_cols: list[str],
    ts: str,
    payload: list[str],
    tiebreak: str,
    suffix: str,
    keep_cols: list[str],
    matched_col: str | None = None,
) -> DataFrame:
    """Union-tag + window sweep core shared by the plain and chunked
    as-of forms. Partitions on ``part_cols``; returns one row per probe
    row carrying ``keep_cols`` (probe columns plus any bookkeeping
    columns like the chunk id) and the filled ``{suffix}{payload}``
    columns. ``matched_col`` (if given) adds a boolean: did ANY quote
    precede this probe — distinguishable from "matched a quote whose
    payload fields are all NULL", which per-column null checks cannot
    tell apart."""
    qtypes = dict(quote.dtypes)
    out_cols = [f"{suffix}{c}" for c in payload]
    probe_keep = [(c, t) for c, t in probe.dtypes if c in keep_cols]
    # The whole winner row travels as ONE struct — filling each payload
    # column with its own last(ignorenulls) would backfill a NULL field
    # of the winning quote from an OLDER quote, emitting a row that
    # mixes two quotes. The struct is non-null for every quote row
    # (even when all its fields are null), so last(ignorenulls) picks
    # whole rows atomically. Positional field names: payload may repeat
    # the ts column, and duplicate struct field names are ambiguous.
    pay_struct_type = (
        "struct<" + ",".join(f"_f{i}:{qtypes[c]}" for i, c in enumerate(payload)) + ">"
    )
    # Quote rows: side 0 (visible to probes at the same instant).
    q_tagged = quote.select(
        *[F.col(c) for c in part_cols],
        F.col(ts),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tb"),
        F.struct(
            *[F.col(c).alias(f"_f{i}") for i, c in enumerate(payload)]
        ).alias("_pay"),
        *[F.lit(None).cast(t).alias(f"_p_{c}") for c, t in probe_keep],
    )
    p_tagged = probe.select(
        *[F.col(c) for c in part_cols],
        F.col(ts),
        F.lit(1).alias("_side"),
        F.lit(None).cast(qtypes[tiebreak]).alias("_tb"),
        F.lit(None).cast(pay_struct_type).alias("_pay"),
        *[F.col(c).alias(f"_p_{c}") for c, _ in probe_keep],
    )
    # One shuffle on the partition key(s); the frame must be ROWS (a
    # RANGE frame is illegal with a multi-column sort, and ROWS is what
    # the sweep means anyway). NULL _tb on probe rows sorts first under
    # ASC, so a probe row can never outsort a same-instant quote.
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = q_tagged.unionByName(p_tagged).select(
        "*", F.last("_pay", ignorenulls=True).over(w).alias("_win")
    )
    extra = [F.col("_win").isNotNull().alias(matched_col)] if matched_col else []
    return swept.filter(F.col("_side") == 1).select(
        *[F.col(f"_p_{c}").alias(c) for c, _ in probe_keep],
        *[F.col("_win").getField(f"_f{i}").alias(o) for i, o in enumerate(out_cols)],
        *extra,
    )


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

    The per-key window implies a per-key sort: fine up to millions of
    rows per key, but a single pathological key (one instrument with
    billions of ticks) serializes its sort in one task. For that shape
    use :func:`asof_join_chunked`, which bounds every sort by the
    chunk width.
    """
    return _sweep(
        probe, quote, [on], ts, payload, tiebreak, suffix, keep_cols=probe.columns
    )


def asof_join_chunked(
    probe: DataFrame,
    quote: DataFrame,
    on: str,
    ts: str,
    payload: list[str],
    tiebreak: str,
    chunk_width: int,
    suffix: str = "q_",
) -> DataFrame:
    """Skew-proof as-of join: identical output to :func:`asof_join`
    for ANY ``chunk_width`` > 0, but no task ever sorts more than one
    (key, time-chunk) slice.

    Three bounded stages instead of one unbounded per-key sort:

    1. **In-chunk sweep** — the plain sweep partitioned by
       (key, ``ts div chunk_width``): finds each probe's latest
       at-or-before quote *within its own chunk*. Sort size is bounded
       by rows-per-chunk regardless of per-key cardinality.
    2. **Chunk summaries** — ONE aggregate row per (key, chunk) on the
       quote side: the chunk's winning (ts, tiebreak, payload) struct
       via ``max(struct)`` (struct comparison is lexicographic on
       (ts, tiebreak) — exactly the pick rule; tiebreak is unique so
       later fields never decide). A second window cumulates these
       per key ACROSS chunks — but over the summary relation, whose
       per-key row count is #chunks, not #events, so the skew cannot
       reappear there.
    3. **Carry-in join + coalesce** — each probe chunk's carry-in (the
       winner of all STRICTLY EARLIER chunks) joins back on
       (key, chunk) and fills only probes their own chunk left NULL —
       an in-chunk hit is always newer than any earlier chunk's.

    Timestamps must be non-negative (same integer-``div`` chunk
    arithmetic caveat as :func:`binned_range_join`).
    """
    ck = "_chunk"
    bw = int(chunk_width)
    out_cols = [f"{suffix}{c}" for c in payload]
    p2 = probe.withColumn(ck, F.expr(f"CAST({ts} AS BIGINT) div {bw}"))
    q2 = quote.withColumn(ck, F.expr(f"CAST({ts} AS BIGINT) div {bw}"))

    in_chunk = _sweep(
        p2, q2, [on, ck], ts, payload, tiebreak, suffix,
        keep_cols=[*probe.columns, ck],
        matched_col="_hit",
    )

    # Stage 2: per-(key, chunk) winner struct; positional field names
    # (_s0=ts, _s1=tiebreak, _s2..=payload) because payload may repeat
    # the ts column and duplicate struct field names are ambiguous.
    best = F.struct(
        F.col(ts).alias("_s0"),
        F.col(tiebreak).alias("_s1"),
        *[F.col(c).alias(f"_s{i + 2}") for i, c in enumerate(payload)],
    )
    summaries = q2.groupBy(on, ck).agg(F.max(best).alias("_best"))
    markers = p2.select(on, ck).distinct()
    # Markers sort BEFORE the same chunk's summary (side 0 < 1), so the
    # preceding-rows frame sees exactly the strictly-earlier chunks.
    lagged = (
        summaries.select(on, ck, F.lit(1).alias("_side"), "_best")
        .unionByName(
            markers.select(
                on, ck, F.lit(0).alias("_side"),
                F.lit(None).cast(dict(summaries.dtypes)["_best"]).alias("_best"),
            )
        )
    )
    wc = (
        Window.partitionBy(on)
        .orderBy(F.col(ck).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        lagged.select(on, ck, "_side", F.last("_best", ignorenulls=True).over(wc).alias("_carry"))
        .filter(F.col("_side") == 0)
        .select(on, ck, "_carry")
    )

    # Stage 3: fill the gaps, WHOLE ROWS at a time — gate on the
    # sweep's match witness, not per-column nulls: an in-chunk winner
    # with a NULL payload field must keep that NULL, never splice the
    # carry-in's value for just that field (mixing two quotes). Carry
    # payload field i lives at _s{i+2}.
    filled = in_chunk.join(carry, [on, ck], "left").select(
        *[F.col(c) for c in probe.columns],
        *[
            F.when(F.col("_hit"), F.col(o))
            .otherwise(F.col("_carry").getField(f"_s{i + 2}"))
            .alias(o)
            for i, o in enumerate(out_cols)
        ],
    )
    return filled


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

    Timestamps must be non-negative: the bin arithmetic uses integer
    ``div``, which truncates toward zero in Spark but floors in
    DuckDB-style SQL — the two agree only for values >= 0 (epoch
    micros always are).
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
