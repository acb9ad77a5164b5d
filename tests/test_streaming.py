"""Structured Streaming tests: every streaming operator is checked
against its batch twin on the same data (unified-API parity), driven
with Trigger.AvailableNow through file-stream sources — the engine's
incremental execution mode.
"""

from __future__ import annotations

import shutil

import pytest

from namegraph_collections_spark.streaming.events import (
    read_event_stream,
    run_available_now,
    running_user_totals,
    sessionize,
    streaming_dedup,
    windowed_rollup,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    return str(d)


@pytest.fixture(scope="module")
def events_dir_dup(tmp_path_factory):
    """Two copies of the same file → every event arrives twice,
    in two separate micro-batches."""
    d = tmp_path_factory.mktemp("events_stream_dup")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-1.parquet")
    return str(d)


def _batch_events(spark, events_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(events_dir)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_reads_nanos_generation(spark, tmp_path):
    """A TIMESTAMP(NANOS) events file (written via pyarrow ns
    timestamps) streams correctly: read_event_stream probes the
    encoding, picks the LongType schema + nanosAsLong conf, and
    with_event_time lands on the same event_time as the NTZ path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = 1_700_000_000_000_000_000  # epoch ns
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([t0, t0 + 3_600_000_000_000, t0 + 2 * 3_600_000_000_000], pa.timestamp("ns")),
            "user_id": pa.array([10, 11, 10], pa.int64()),
            "event_type": pa.array(["a", "b", "a"], pa.string()),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"], pa.string()),
        }
    )
    d = tmp_path / "nanos_in"
    d.mkdir()
    pq.write_table(tbl, d / "part-0.parquet", use_deprecated_int96_timestamps=False, coerce_timestamps=None)
    stream = read_event_stream(spark, str(d))
    assert dict(stream.dtypes)["ts"] == "bigint"
    rolled = windowed_rollup(stream)
    got = run_available_now(rolled, str(tmp_path / "ckpt_nanos"), output_mode="complete")
    rows = _rows(got, ["hour_us", "event_type", "n", "total_value"])
    assert len(rows) == 3
    # ns → us, floored to the containing hour window
    assert rows[0][0] == (t0 // 1_000_000_000 // 3600) * 3600 * 1_000_000


def test_windowed_rollup_stream_matches_batch(spark, events_dir, tmp_path):
    stream = windowed_rollup(read_event_stream(spark, events_dir))
    got = run_available_now(stream, str(tmp_path / "ckpt"), output_mode="complete")
    want = windowed_rollup(_batch_events(spark, events_dir))
    cols = ["hour_us", "event_type", "n", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.count() > 0


def test_streaming_dedup(spark, events_dir_dup, tmp_path):
    stream = streaming_dedup(read_event_stream(spark, events_dir_dup))
    got = run_available_now(stream, str(tmp_path / "ckpt"))
    n_distinct = _batch_events(spark, events_dir_dup).select("event_id").distinct().count()
    # duplicates either dedup'd (within watermark) or dropped as late —
    # never double-counted
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_sessionize_stream_matches_batch(spark, events_dir, tmp_path):
    stream = sessionize(read_event_stream(spark, events_dir))
    got = run_available_now(stream, str(tmp_path / "ckpt"), output_mode="complete")
    want = sessionize(_batch_events(spark, events_dir))
    cols = ["user_id", "session_start_us", "session_end_us", "n_events", "session_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_session_query_matches_streaming_twin(spark, events_dir):
    """The registered batch query and the streaming sessionize agree."""
    from namegraph_collections_spark.queries import REGISTRY

    q = REGISTRY["session_window_rollup"].fn(spark, SF_DIR)
    tw = sessionize(_batch_events(spark, events_dir))
    cols = ["user_id", "session_start_us", "session_end_us", "n_events", "session_value"]
    assert _rows(q, cols) == _rows(tw, cols)


def test_running_user_totals_stateful(spark, events_dir, tmp_path):
    stream = running_user_totals(read_event_stream(spark, events_dir))
    got = run_available_now(stream, str(tmp_path / "ckpt"), output_mode="update")
    batch = _batch_events(spark, events_dir)
    from pyspark.sql import functions as F

    want = batch.groupBy("user_id").agg(
        F.sum("value").alias("total"), F.count(F.lit(1)).alias("n")
    )
    got_n = {r["user_id"]: r["n"] for r in got.collect()}
    want_rows = {r["user_id"]: (r["total"], r["n"]) for r in want.collect()}
    assert set(got_n) == set(want_rows)
    for uid, (total, n) in want_rows.items():
        assert got_n[uid] == n
    got_total = {r["user_id"]: r["total"] for r in got.collect()}
    for uid, (total, n) in want_rows.items():
        assert got_total[uid] == pytest.approx(total, rel=1e-9)
