"""Multimodal plumbing tests: schemas, Arrow batch shapes, header
decode, frame explosion, and the NotImplementedError gate for real
codecs (driver brief — codecs aren't in this container)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from namegraph_collections_spark.functions.multimodal import (
    FRAME_SIZE,
    META_SCHEMA,
    _decode_real,
    byte_histogram_features,
    decode_media_meta,
    frame_sample,
    synthesize_media,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return synthesize_media(docs).cache()


def test_media_schema_and_payload(spark, media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "payload", "source"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    row = media.orderBy("media_id").first()
    assert bytes(row["payload"])[:4] == b"FAKE"


def test_decode_media_meta(spark, media):
    meta = decode_media_meta(media)
    assert meta.schema == META_SCHEMA
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    want = {
        r["doc_id"]: (r["n_chars"] % 640, r["n_chars"] % 480, r["n_chars"] + 8)
        for r in docs.collect()
    }
    got = {r["media_id"]: (r["width"], r["height"], r["n_bytes"]) for r in meta.collect()}
    assert got == want
    assert meta.filter(F.col("format") != "fake").count() == 0


def test_byte_histogram(spark, media):
    hists = byte_histogram_features(media)
    rows = hists.collect()
    assert len(rows) == media.count()
    docs = {r["doc_id"]: r["n_chars"] for r in
            spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()}
    for r in rows[:20]:
        assert len(r["hist"]) == 16
        assert sum(r["hist"]) == docs[r["media_id"]]  # every body byte binned


def test_frame_sample_explodes_rows(spark, media):
    frames = frame_sample(media, every_n=2)
    n_videos = media.filter(F.col("kind") == "video").count()
    assert frames.count() > n_videos  # one row in → many frames out
    r = frames.first()
    assert len(bytes(r["frame"])) == FRAME_SIZE
    # sampled indices are the even ones
    assert frames.filter(F.col("frame_idx") % 2 != 0).count() == 0


def test_real_codec_gate():
    with pytest.raises(NotImplementedError):
        _decode_real(b"\x89PNG", "image")
