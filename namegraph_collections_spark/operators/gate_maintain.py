"""Incremental maintenance of the per-domain quality gate —
distinct-count IVM, the case the engine's additive rollup IVM
(queries/rollups.py::incremental_hourly_rollup) cannot cover.

The gate (queries/web_rollup.py::host_quality_rollup) needs
``n_pages = COUNT(DISTINCT norm_url)`` per domain, and a distinct
count is not additive across batches: two batches can contribute the
same canonical URL, so per-batch gate tables cannot simply be summed.
The standard IVM answer is to maintain state at the DISTINCT KEY's
grain — one row per (domain, norm_url) carrying the additive measures
— because at that grain everything IS additive: merging a batch is a
sum-by-key, distinct pages per domain is a row count, and the gate
re-derives exactly. Same dated-snapshot rotation as the MinHash band
index (operators/dedup_index.py); day N+1's batch merges into day N's
state.

Scale shape: per batch, the fused per-doc program (scan bandwidth) +
one (domain, norm_url)-keyed partial-aggregated shuffle of the batch
+ a sum-by-key merge against state that a production deployment
bucket-joins on the same key (co-located, no corpus-wide shuffle);
state size is bounded by the number of distinct canonical URLs, the
same asymptotics as the URL-dedup index a web pipeline already keeps.
The gate re-derivation aggregates state rows — |pages| → |domains|,
a reduction, never a re-scan of any document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namegraph_collections_spark.operators.cdc import (
    LATEST_MARKER,
    latest_snapshot,
    rotate_snapshot,
)
from namegraph_collections_spark.queries.web_rollup import (
    finish_rollup,
    per_doc_web_frame_of,
)

#: State schema: one row per (domain, norm_url) — the distinct key's
#: grain, where every measure is additive.
STATE_COLS = ["domain", "norm_url", "n_docs", "n_keep", "sum_words"]


def gate_state_for(docs: DataFrame) -> DataFrame:
    """Page-grain state contribution of a batch — the IDENTICAL fused
    per-doc arithmetic as the full-corpus rollup, aggregated to the
    (domain, norm_url) key."""
    per_doc = per_doc_web_frame_of(docs.select("doc_id", "source", "text"))
    return per_doc.groupBy("domain", "norm_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.sum("n_words").cast("long").alias("sum_words"),
    )


def _snapshot_committed(spark: SparkSession, base_dir: str, stamp: str) -> bool:
    """True only if the stamp's snapshot was COMMITTED — i.e. its
    ``_SUCCESS`` marker exists. Spark's Parquet writer creates the
    directory at job start and writes ``_SUCCESS`` last, so a bare
    directory without the marker is a crash mid-write: treating it as
    already-merged would repoint the gate at corrupt state and lose
    the batch forever. Partial directories fall through to the normal
    merge, whose mode("overwrite") write replaces them safely (the
    latest-marker was never repointed at them)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    success = jvm.org.apache.hadoop.fs.Path(
        f"{base_dir}/snapshot={stamp}/_SUCCESS"
    )
    return success.getFileSystem(conf).exists(success)


def _marker_stamp(spark: SparkSession, base_dir: str) -> str | None:
    """The stamp the latest-marker currently points at (None before
    the first rotation)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    marker = jvm.org.apache.hadoop.fs.Path(f"{base_dir}/{LATEST_MARKER}")
    fs = marker.getFileSystem(conf)
    if not fs.exists(marker):
        return None
    stream = fs.open(marker)
    try:
        return bytes(stream.readAllBytes()).decode("utf-8")
    finally:
        stream.close()


def _repoint_marker(spark: SparkSession, base_dir: str, stamp: str) -> None:
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    marker = jvm.org.apache.hadoop.fs.Path(f"{base_dir}/{LATEST_MARKER}")
    out = marker.getFileSystem(conf).create(marker, True)
    out.write(bytearray(stamp.encode("utf-8")))
    out.close()


def maintain_gate_state(
    spark: SparkSession, base_dir: str, new_docs: DataFrame, stamp: str
) -> DataFrame:
    """Merge a batch into the standing page-grain state and rotate a
    dated snapshot: read the marker's current state (empty before the
    first rotation), sum-by-key with the batch's contribution, write,
    repoint. Returns the rotated state as read back from storage.

    IDEMPOTENT per stamp: a stamp whose snapshot was already
    COMMITTED (its ``_SUCCESS`` marker exists — a bare directory from
    a crash mid-write does NOT count and falls through to a safe
    overwrite merge) was already merged: a foreachBatch replay of a
    delivered batch id re-merging it would double every additive
    measure, so the replay only repoints the marker at the existing
    snapshot and returns it. Callers must key the stamp to the batch
    identity (the streaming twin stamps with the zero-padded
    micro-batch id) for this guarantee to hold, and stamps must be
    lexicographically monotonic (dated stamps and zero-padded ids
    are): Structured Streaming only ever redelivers the LATEST batch,
    but the batch API has no such guard, so a replay of a stamp
    OLDER than the marker's current one raises instead of silently
    rolling the gate state back."""
    if _snapshot_committed(spark, base_dir, stamp):
        current_stamp = _marker_stamp(spark, base_dir)
        if current_stamp is not None and stamp < current_stamp:
            raise ValueError(
                f"out-of-order replay: stamp {stamp!r} is older than the "
                f"latest-marker's {current_stamp!r}; repointing would roll "
                "the gate state back past newer merges"
            )
        _repoint_marker(spark, base_dir, stamp)
        return latest_snapshot(spark, base_dir)
    new_state = gate_state_for(new_docs)
    current = latest_snapshot(spark, base_dir)
    if current is None:
        merged = new_state
    else:
        merged = (
            current.select(*STATE_COLS)
            .unionByName(new_state)
            .groupBy("domain", "norm_url")
            .agg(
                F.sum("n_docs").alias("n_docs"),
                F.sum("n_keep").alias("n_keep"),
                F.sum("sum_words").alias("sum_words"),
            )
        )
    rotate_snapshot(merged.select(*STATE_COLS), base_dir, stamp)
    return latest_snapshot(spark, base_dir)


def gate_from_state(state: DataFrame) -> DataFrame:
    """Re-derive the gate table from the page-grain state: distinct
    pages per domain is a ROW COUNT at this grain, everything else a
    sum — then the shared ``finish_rollup`` emits the exact
    host_quality_rollup schema (pinned equal to the one-shot rollup
    by tests/test_gate_maintain.py)."""
    agg = state.groupBy("domain").agg(
        F.sum("n_docs").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.sum("n_keep").alias("n_keep"),
        F.sum("sum_words").alias("sum_words"),
    )
    return finish_rollup(agg)
