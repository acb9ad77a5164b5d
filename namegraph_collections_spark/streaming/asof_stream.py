"""Streaming as-of enrichment — the incremental twin of
``operators/temporal.py:asof_join``.

A feature-attachment stream: quotes (feature snapshots) and probes
(examples to enrich) arrive interleaved on one event stream; each
probe is emitted exactly once, enriched with the best quote at-or-
before it. Per key the state is ONE winner tuple (ts, tiebreak,
payload) — O(1) per key regardless of history length, the property
that lets the stream run forever where the batch window re-sorts the
full history per run.

Ordering contract (same family as ``cdc_stream.change_capture``): the
pick "latest at-or-before" is only meaningful if time does not run
backwards across micro-batches, so input files must be time-
partitioned (each file's rows no earlier than the previous file's —
the landing-zone norm). WITHIN a batch, rows are sorted per key by
(ts, quote-before-probe, tiebreak), so intra-file disorder is fine;
across batches a late quote older than an already-emitted probe
cannot retroactively fix that probe — streaming append semantics.
Batch/stream equivalence under this contract is pinned by
tests/test_asof_stream.py against the batch operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_enrich_stream(
    events: DataFrame,
    on: str,
    ts: str,
    tiebreak: str,
    payload: list[str],
    is_quote: str,
    probe_cols: list[str],
    suffix: str = "q_",
) -> DataFrame:
    """Enrich probe rows with the latest-so-far quote per ``on`` key.

    ``events``: streaming (or batch) DataFrame carrying quotes and
    probes on one stream; ``is_quote`` names a boolean column telling
    them apart. Output: ``probe_cols`` + ``{suffix}{payload}`` (NULLs
    until the key's first quote). State per key: one row —
    (ts, tiebreak, payload) of the winner so far.
    """
    import pandas as pd  # noqa: PLC0415 — also needed on the worker
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    dt = dict(events.dtypes)
    out_fields = [f"{c} {dt[c]}" for c in probe_cols] + [
        f"{suffix}{c} {dt[c]}" for c in payload
    ]
    out_schema = ", ".join(out_fields)
    state_schema = ", ".join(
        [f"_ts {dt[ts]}", f"_tb {dt[tiebreak]}"]
        + [f"_s{i} {dt[c]}" for i, c in enumerate(payload)]
    )
    need = list(dict.fromkeys([on, ts, tiebreak, is_quote, *payload, *probe_cols]))
    slim = events.select(*[F.col(c) for c in need])
    out_names = [*probe_cols, *[f"{suffix}{c}" for c in payload]]

    def update(key, pdf_iter, state: GroupState):
        best = tuple(state.get) if state.exists else None  # (_ts, _tb, *_payload)
        pdfs = [p for p in pdf_iter if len(p)]
        out = []
        if pdfs:
            pdf = pd.concat(pdfs, ignore_index=True).sort_values(
                # quotes before probes at the same instant (~is_quote:
                # False<True, quote rows get False), tiebreak ascending
                # so iteration order is the sweep order.
                by=[ts, is_quote, tiebreak],
                ascending=[True, False, True],
                kind="stable",
            )
            cols = list(pdf.columns)
            for row in pdf.itertuples(index=False, name=None):
                r = dict(zip(cols, row))
                if r[is_quote]:
                    cand = (r[ts], r[tiebreak], *[r[c] for c in payload])
                    if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                        best = cand
                else:
                    q_vals = best[2:] if best is not None else (None,) * len(payload)
                    out.append(tuple(r[c] for c in probe_cols) + tuple(q_vals))
        if best is not None:
            state.update(best)
        yield pd.DataFrame(out, columns=out_names, dtype=object)

    return slim.groupBy(on).applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )
