"""Streaming change capture vs the batch snapshot diff: two snapshot
files drained through AvailableNow must classify exactly like
operators/cdc.snapshot_diff (minus deletes/noops, which change capture
suppresses by design)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from namegraph_collections_spark.operators.cdc import snapshot_diff
from namegraph_collections_spark.streaming.cdc_stream import change_capture
from namegraph_collections_spark.streaming.events import run_available_now

COLS = "k long, name string, rank long"


def _snap1(spark):
    return spark.createDataFrame([(i, f"n{i}", i % 7) for i in range(200)], COLS)


def _snap2(spark):
    # mutate rank for k%5==0, add 20 new keys, keep the rest identical
    rows = [(i, f"n{i}", (i % 7) + (10 if i % 5 == 0 else 0)) for i in range(200)]
    rows += [(i, f"n{i}", 1) for i in range(200, 220)]
    return spark.createDataFrame(rows, COLS)


@pytest.fixture(scope="module")
def snap_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cdc_snaps")
    # one file per snapshot → one micro-batch per snapshot
    _snap1(spark).coalesce(1).write.parquet(str(d / "s1"))
    _snap2(spark).coalesce(1).write.parquet(str(d / "s2"))
    import glob
    import shutil

    files = sorted(glob.glob(str(d / "s*" / "part-*.parquet")))
    stream_dir = tmp_path_factory.mktemp("cdc_stream_in")
    for i, f in enumerate(files):
        shutil.copy(f, stream_dir / f"{i}-snap.parquet")
    return str(stream_dir)


def test_change_capture_stream_matches_batch_diff(spark, snap_dir, tmp_path):
    stream = spark.readStream.schema(COLS).option("maxFilesPerTrigger", 1).parquet(snap_dir)
    ops = run_available_now(
        change_capture(stream, "k", ["k", "name", "rank"]),
        str(tmp_path / "ckpt"),
        output_mode="append",
    )
    got = {(r["key"], r["op"]) for r in ops.collect()}

    # batch twin: snapshot1 keys are all creates; snapshot2 vs snapshot1
    # classifies updates (deletes/noops suppressed in change capture)
    creates = {(str(r["k"]), "create") for r in _snap1(spark).collect()}
    diff2 = snapshot_diff(_snap1(spark), _snap2(spark), "k", ["k", "name", "rank"])
    want = creates
    for r in diff2.collect():
        if r["op"] == "create":
            want.add((str(r["k"]), "create"))
        elif r["op"] == "update":
            want.add((str(r["k"]), "update"))
    assert got == want
    # exact cardinality: 220 creates (200 + 20 new) + 40 updates
    assert sum(1 for _, op in got if op == "create") == 220
    assert sum(1 for _, op in got if op == "update") == 40


def test_change_capture_order_col_multi_snapshot_trigger(spark, tmp_path):
    """Several snapshot files landing in ONE trigger (no
    maxFilesPerTrigger): order_col restores snapshot order per key, so
    mutated keys classify create-then-update even when both versions
    arrive in the same micro-batch."""
    import glob
    import shutil

    d = tmp_path / "in"
    d.mkdir()
    _snap1(spark).withColumn("seq", F.lit(1)).coalesce(1).write.parquet(str(tmp_path / "s1"))
    _snap2(spark).withColumn("seq", F.lit(2)).coalesce(1).write.parquet(str(tmp_path / "s2"))
    # adversarial file naming: the NEWER snapshot sorts first
    shutil.copy(glob.glob(str(tmp_path / "s2" / "part-*.parquet"))[0], d / "0-newer.parquet")
    shutil.copy(glob.glob(str(tmp_path / "s1" / "part-*.parquet"))[0], d / "1-older.parquet")
    stream = spark.readStream.schema(COLS + ", seq long").parquet(str(d))
    ops = run_available_now(
        change_capture(stream, "k", ["k", "name", "rank"], order_col="seq"),
        str(tmp_path / "ckpt"),
        output_mode="append",
    )
    rows = ops.collect()
    got = {(r["key"], r["op"]) for r in rows}
    assert sum(1 for _, op in got if op == "create") == 220
    assert sum(1 for _, op in got if op == "update") == 40
    by_key = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(r["op"])
    # every mutated key (k%5==0 of the original 200) is create→update
    assert by_key["5"] == ["create", "update"]
    assert by_key["0"] == ["create", "update"]


def test_change_capture_suppresses_noops(spark, tmp_path):
    """Re-delivering an identical snapshot emits nothing."""
    import shutil

    d = tmp_path / "in"
    d.mkdir()
    snap = _snap1(spark)
    snap.coalesce(1).write.parquet(str(tmp_path / "one"))
    import glob

    f = glob.glob(str(tmp_path / "one" / "part-*.parquet"))[0]
    shutil.copy(f, d / "0-snap.parquet")
    shutil.copy(f, d / "1-snap.parquet")
    stream = spark.readStream.schema(COLS).option("maxFilesPerTrigger", 1).parquet(str(d))
    ops = run_available_now(
        change_capture(stream, "k", ["k", "name", "rank"]),
        str(tmp_path / "ckpt"),
        output_mode="append",
    )
    assert ops.filter(F.col("op") == "update").count() == 0
    assert ops.count() == snap.count()  # creates only, once each
