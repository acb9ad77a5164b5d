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


# ---------------------------------------------------------------------------
# Round 11: from-spec PNG/JPEG header parsing — the dimensions/
# metadata class of the real-codec seam, now real. Positive paths are
# driver-hashed (image_header_decode); these pin the REFUSAL paths a
# value hash cannot see.
# ---------------------------------------------------------------------------
import struct
import zlib

from namegraph_collections_spark.functions.multimodal import (
    PNG_SIG,
    decode_image_headers,
    parse_jpeg_header,
    parse_png_header,
    synthesize_image_files,
)


def _png(width=17, height=9, depth=8, color=2):
    body = b"IHDR" + struct.pack(">IIBBBBB", width, height, depth, color, 0, 0, 0)
    return (
        PNG_SIG
        + (13).to_bytes(4, "big")
        + body
        + (zlib.crc32(body) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _jpeg(width=17, height=9, precision=8, ncomp=3):
    sof = b"\xff\xc0\x00\x11" + bytes([precision]) + struct.pack(">HH", height, width)
    sof += bytes([ncomp, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    com = b"\xff\xfe\x00\x04ab"
    return b"\xff\xd8" + com + sof + b"\xff\xd9"


def test_png_header_roundtrip_and_refusals():
    assert parse_png_header(_png()) == (17, 9, 8, 2)
    # corrupted CRC must REFUSE, not emit a plausible header
    bad = bytearray(_png())
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        parse_png_header(bytes(bad))
    with pytest.raises(ValueError, match="signature"):
        parse_png_header(b"\x89PNX" + _png()[4:])
    with pytest.raises(ValueError, match="truncated"):
        parse_png_header(_png()[:20])
    # first chunk must be IHDR
    swapped = bytearray(_png())
    swapped[12:16] = b"IDAT"
    with pytest.raises(ValueError, match="IHDR"):
        parse_png_header(bytes(swapped))


def test_jpeg_header_walk_and_refusals():
    assert parse_jpeg_header(_jpeg()) == (17, 9, 8, 3)
    # marker fill bytes before a segment are legal (T.81 B.1.1.2)
    padded = b"\xff\xd8\xff\xff\xff\xfe\x00\x04ab" + _jpeg()[2:]
    assert parse_jpeg_header(padded) == (17, 9, 8, 3)
    # DHT (C4) sits in the Cx range but is NOT a frame header — the
    # walker must skip it by length and land on the real SOF0
    dht = b"\xff\xc4\x00\x05" + b"\x00" * 3
    with_dht = b"\xff\xd8" + dht + _jpeg()[2:]
    assert parse_jpeg_header(with_dht) == (17, 9, 8, 3)
    with pytest.raises(ValueError, match="SOI"):
        parse_jpeg_header(b"\x89PNG1234")
    with pytest.raises(ValueError, match="no SOF"):
        parse_jpeg_header(b"\xff\xd8\xff\xd9")
    # a lying segment length that runs off the stream
    with pytest.raises(ValueError):
        parse_jpeg_header(b"\xff\xd8\xff\xfe\xff\xff")
    # round-11 ADVICE: a malformed SOF declaring seg_len < 8 must
    # REFUSE, not read the next segment's bytes as a plausible header
    tiny_sof = b"\xff\xd8\xff\xc0\x00\x03\x08" + _jpeg()[2:]
    with pytest.raises(ValueError, match="SOF segment length"):
        parse_jpeg_header(tiny_sof)
    # and Lf must equal 8 + 3*Nf exactly (T.81 §B.2.2)
    bad_lf = bytearray(_jpeg())
    # _jpeg's SOF0 sits right after the 6-byte COM: FF C0 <len:2>
    assert bad_lf[8:10] == b"\xff\xc0"
    bad_lf[10:12] = (0x12).to_bytes(2, "big")  # 18 != 8 + 3*3
    with pytest.raises(ValueError, match="8 \\+ 3"):
        parse_jpeg_header(bytes(bad_lf))


def test_synthesized_images_are_structurally_valid(spark):
    """The JVM-side synthesizer and the Python-side parser agree on
    every header field — including the crc32(JVM) == zlib.crc32
    identity the PNG leg rests on."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    media = synthesize_image_files(docs)
    meta = {r["media_id"]: r for r in decode_image_headers(media).collect()}
    for d in docs.select("doc_id", "n_chars").collect():
        m = meta[d["doc_id"]]
        assert m["width"] == d["n_chars"] % 640 + 1
        assert m["height"] == d["n_chars"] % 480 + 1
        assert m["format"] == ("png" if d["doc_id"] % 2 == 0 else "jpeg")
        assert m["bit_depth"] == 8


def test_gif_header_roundtrip_and_refusals():
    from namegraph_collections_spark.functions.multimodal import (
        parse_gif_header,
    )

    gif = b"GIF89a" + struct.pack("<HH", 17, 9) + bytes([0x30, 0, 0]) + b"\x3b"
    assert parse_gif_header(gif) == ("89a", 17, 9, 4, 0)
    # 87a is equally legal; the GCT flag is the packed byte's top bit
    old = b"GIF87a" + struct.pack("<HH", 640, 480) + bytes([0xF7, 5, 0])
    assert parse_gif_header(old) == ("87a", 640, 480, 8, 1)
    with pytest.raises(ValueError, match="signature"):
        parse_gif_header(b"GIF90a" + gif[6:])
    with pytest.raises(ValueError, match="truncated"):
        parse_gif_header(gif[:10])
    zero = b"GIF89a" + struct.pack("<HH", 0, 9) + bytes([0, 0, 0])
    with pytest.raises(ValueError, match="nonzero"):
        parse_gif_header(zero)


def _wav(channels=2, rate=44100, bits=16, junk=True, data_size=0):
    chunks = b""
    if junk:
        payload = b"skip me please!"  # odd length -> exercises padding
        chunks += b"LIST" + len(payload).to_bytes(4, "little") + payload
        chunks += b"\x00" * (len(payload) & 1)
    block = channels * bits // 8
    chunks += b"fmt " + (16).to_bytes(4, "little") + struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block, block, bits
    )
    chunks += b"data" + data_size.to_bytes(4, "little")
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_wav_header_walk_and_refusals():
    from namegraph_collections_spark.functions.multimodal import (
        parse_wav_header,
    )

    # the walker must skip the odd-length LIST chunk (with pad byte)
    assert parse_wav_header(_wav()) == (2, 44100, 16, 0)
    assert parse_wav_header(_wav(1, 8000, 8, junk=False)) == (1, 8000, 8, 0)
    with pytest.raises(ValueError, match="RIFF"):
        parse_wav_header(b"RIFX" + _wav()[4:])
    with pytest.raises(ValueError, match="no fmt"):
        parse_wav_header(b"RIFF" + (4).to_bytes(4, "little") + b"WAVE")
    # a lying chunk size that runs off the stream must refuse
    bad = bytearray(_wav(junk=False))
    bad[16:20] = (9999).to_bytes(4, "little")  # fmt size
    with pytest.raises(ValueError, match="truncated"):
        parse_wav_header(bytes(bad))
    # PCM internal consistency: block_align must equal channels*bits/8
    lying = bytearray(_wav(junk=False))
    # fmt body starts at 20; block_align is bytes 32:34 (<H)
    lying[32:34] = (7).to_bytes(2, "little")
    with pytest.raises(ValueError, match="block_align"):
        parse_wav_header(bytes(lying))


def test_synthesized_av_files_parse_to_the_oracle_fields(spark):
    """The JVM-side GIF/WAV synthesizer and the Python-side from-spec
    parsers agree on every header field — including the little-endian
    u16/u32 assembly (reversed big-endian bytes) and the LIST-junk
    skip. Mirrors test_synthesized_images_are_structurally_valid."""
    from namegraph_collections_spark.functions.multimodal import (
        decode_av_headers,
        synthesize_av_files,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    src = {r.doc_id: r.n_chars for r in docs.select("doc_id", "n_chars").collect()}
    got = {r.media_id: r for r in decode_av_headers(synthesize_av_files(docs)).collect()}
    assert set(got) == set(src)
    for doc_id, n_chars in src.items():
        r = got[doc_id]
        if doc_id % 2 == 0:
            assert r.format == "gif"
            assert (r.width, r.height) == (n_chars % 640 + 1, n_chars % 480 + 1)
            assert r.color_res == doc_id % 8 + 1
            assert r.n_bytes == 14
        else:
            assert r.format == "wav"
            assert r.channels == doc_id % 3 + 1
            assert r.sample_rate == n_chars % 40000 + 8000
            assert r.bits_per_sample == (8, 16, 24)[doc_id % 3]
            assert r.n_bytes == 76


def test_single_pass_battery_matches_legacy_legs(spark, sf_dir):
    """Round-13 single-pass battery decode == the legacy 4-leg union,
    row for row (including the hist leg of the histogram layout)."""
    from namegraph_collections_spark.functions.multimodal import (
        decode_battery_legs,
        synthesize_battery_inputs,
        synthesize_media,
    )
    from namegraph_collections_spark.queries.multimodal import _decode_legs, _hist_leg
    from namegraph_collections_spark.queries.registry import spread, tbl

    docs = spread(tbl(spark, sf_dir, "documents"), "doc_id")
    legacy = _decode_legs(synthesize_media(docs), docs)
    merged = decode_battery_legs(synthesize_battery_inputs(docs))
    # names+types must match exactly; nullability may differ (a lit()
    # column is non-nullable, a mapInPandas schema field is nullable —
    # the driver's schema check compares names and types, and the
    # value hash is unaffected)
    assert [(f.name, f.dataType) for f in merged.schema.fields] == [
        (f.name, f.dataType) for f in legacy.schema.fields
    ]
    l = sorted(tuple(map(repr, r)) for r in legacy.collect())
    m = sorted(tuple(map(repr, r)) for r in merged.collect())
    assert m == l
    # hist leg (the multimodal_byte_histogram layout)
    hist_legacy = sorted(
        (r.media_id, r.hist) for r in _hist_leg(synthesize_media(docs)).collect()
    )
    hist_merged = sorted(
        (r.media_id, r.hist)
        for r in decode_battery_legs(synthesize_battery_inputs(docs), with_hist=True)
        .filter("op = 'hist'")
        .collect()
    )
    assert hist_merged == hist_legacy
