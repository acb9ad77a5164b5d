"""Streaming as-of enrichment vs the batch as-of join: time-partitioned
files drained through AvailableNow must enrich every probe exactly as
the batch window sweep does (tests/test_temporal.py pins that sweep's
semantics; this pins the stream's equivalence to it)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from namegraph_collections_spark.operators.temporal import asof_join
from namegraph_collections_spark.streaming.asof_stream import asof_enrich_stream
from namegraph_collections_spark.streaming.events import run_available_now

from conftest import write_single_parquet

COLS = "user_id long, event_id long, ts long, is_quote boolean, value double"


def _mkrows(n=300):
    # ts grows with i ⇒ chronological files; ties exercised via i//2
    return [
        ((i * 13) % 5, i, (i // 2) * 10, (i % 3 == 0), float(i % 11))
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    rows = _mkrows()
    d = tmp_path_factory.mktemp("asof_stream_in")
    for fi, chunk in enumerate([rows[:100], rows[100:200], rows[200:]]):
        write_single_parquet(spark.createDataFrame(chunk, COLS), d / f"{fi}-events.parquet")
    return str(d)


def test_stream_matches_batch_asof(spark, stream_dir, tmp_path):
    stream = (
        spark.readStream.schema(COLS).option("maxFilesPerTrigger", 1).parquet(stream_dir)
    )
    enriched = asof_enrich_stream(
        stream,
        on="user_id",
        ts="ts",
        tiebreak="event_id",
        payload=["event_id", "ts", "value"],
        is_quote="is_quote",
        probe_cols=["user_id", "event_id", "ts"],
    )
    got = run_available_now(enriched, str(tmp_path / "ckpt"), output_mode="append")
    got_map = {
        r["event_id"]: (r["q_event_id"], r["q_ts"], r["q_value"]) for r in got.collect()
    }

    all_df = spark.createDataFrame(_mkrows(), COLS)
    probe = all_df.filter(~F.col("is_quote")).select("user_id", "event_id", "ts")
    quote = all_df.filter(F.col("is_quote")).select("user_id", "event_id", "ts", "value")
    want = asof_join(
        probe, quote, on="user_id", ts="ts", payload=["event_id", "ts", "value"],
        tiebreak="event_id",
    )
    want_map = {
        r["event_id"]: (r["q_event_id"], r["q_ts"], r["q_value"]) for r in want.collect()
    }
    assert len(got_map) == len(want_map) > 0
    assert got_map == want_map


def test_stream_state_is_one_tuple_per_key(spark, tmp_path):
    # Probes before any quote get NULLs; state then tracks the winner.
    rows = [
        (1, 0, 5, False, 0.0),   # probe before any quote → NULLs
        (1, 1, 10, True, 1.5),   # quote
        (1, 2, 10, True, 2.5),   # same-ts quote, higher tiebreak wins
        (1, 3, 11, False, 0.0),  # probe → event 2
        (1, 4, 12, True, None),  # newer quote with NULL payload
        (1, 5, 13, False, 0.0),  # probe → event 4, value stays NULL
    ]
    df = spark.createDataFrame(rows, COLS)
    d = tmp_path / "in"
    d.mkdir()
    write_single_parquet(df, d / "0-events.parquet")
    stream = spark.readStream.schema(COLS).option("maxFilesPerTrigger", 1).parquet(str(d))
    out = run_available_now(
        asof_enrich_stream(
            stream, on="user_id", ts="ts", tiebreak="event_id",
            payload=["event_id", "value"], is_quote="is_quote",
            probe_cols=["event_id"],
        ),
        str(tmp_path / "ckpt"),
        output_mode="append",
    )
    got = {r["event_id"]: (r["q_event_id"], r["q_value"]) for r in out.collect()}
    # event 5: the winner is quote 4 whose value is NULL — whole-row
    # state must keep it NULL, never splice quote 2's 2.5 in.
    assert got == {0: (None, None), 3: (2, 2.5), 5: (4, None)}
