"""Streaming change capture — the §2.10 twin of the batch CDC family
(operators/cdc.py).

The reference's update path is batch: produce_update_operations diffs
a previous JSONL snapshot against the current one plus the live index
(update_es.py:249-313). The streaming form consumes snapshot files as
they land and forwards only CHANGES: per business key, state holds the
last row hash; an arriving row emits ``create`` (never seen),
``update`` (hash differs), or nothing (no-op suppressed — the point of
change capture). State is one 32-char hash per key, via
``applyInPandasWithState``.

Deletions are deliberately out of scope here: detecting absence
requires a full-snapshot barrier, which is what the batch three-way
diff (snapshot_diff_three_way) is for — the two compose as
"stream forwards upserts continuously, the periodic batch sweep
archives". That split is exactly how large index-sync systems bound
streaming state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from namegraph_collections_spark.operators.cdc import row_hash

CDC_OUTPUT = "key string, op string, new_hash string"
CDC_STATE = "last_hash string"


def change_capture(
    snapshots: DataFrame,
    key: str,
    compare_cols: Sequence[str],
    order_col: str | None = None,
) -> DataFrame:
    """Forward create/update ops from a stream of snapshot rows.

    ``snapshots`` is a (streaming or batch) DataFrame carrying ``key``
    and ``compare_cols``. The row hash is computed JVM-side (the same
    ``row_hash`` the batch diff uses, so stream and batch classify
    identically); only (key, hash) — plus ``order_col`` when given —
    ever reaches Python, keeping the Arrow transfer and the per-key
    state O(1) regardless of row width.

    Ordering contract: classification is sequential per key, so rows
    for one key must be processed in snapshot order. Within ONE
    micro-batch Spark does not guarantee any particular row order for
    a group, so either (a) run one snapshot file per trigger
    (``maxFilesPerTrigger=1``, as ``read_event_stream`` sets — then
    batch boundaries ARE snapshot boundaries), or (b) pass
    ``order_col`` naming a monotone snapshot-sequence column; the
    group's rows are then sorted on it before classifying, which is
    correct even when several snapshot files land in one trigger.
    """
    import pandas as pd  # noqa: PLC0415 — also needed on the worker
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cols = [F.col(key).cast("string").alias("key"), row_hash(compare_cols).alias("h")]
    if order_col is not None:
        cols.append(F.col(order_col).alias("_seq"))
    hashed = snapshots.select(*cols)

    def update(k, pdf_iter, state: GroupState):
        last = state.get[0] if state.exists else None
        rows = []
        if order_col is not None:
            # sorting needs the whole group in hand; only this branch
            # may buffer all Arrow chunks
            pdfs = list(pdf_iter)
            hs = (
                pd.concat(pdfs, ignore_index=True).sort_values("_seq", kind="stable")["h"]
                if pdfs
                else ()
            )
        else:
            # stream chunk-by-chunk: a hot key's group must not be
            # materialized at once
            hs = (h for pdf in pdf_iter for h in pdf["h"])
        for h in hs:
            if last is None:
                rows.append((k[0], "create", h))
                last = h
            elif h != last:
                rows.append((k[0], "update", h))
                last = h
        if last is not None:
            state.update((last,))
        yield pd.DataFrame(rows, columns=["key", "op", "new_hash"])

    return hashed.groupBy("key").applyInPandasWithState(
        update,
        CDC_OUTPUT,
        CDC_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )
