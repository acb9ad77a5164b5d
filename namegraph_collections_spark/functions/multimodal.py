"""Multimodal (image/audio/video) column plumbing (driver brief).

Media travel as opaque ``binary`` payload columns plus a typed
metadata struct; decode / feature-extract / frame-sample run as
Arrow-batched ``mapInPandas`` stages so each partition streams
record-batches through Python once, never row-at-a-time.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
the decode step is STUBBED: payloads carry a deterministic fake
header that `decode_media_meta` parses for real, and `_decode_real`
raises NotImplementedError until a codec library is installed. The
Spark-side plumbing — schemas, partitioning, UDF signatures, batch
shapes — is real and tested.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("source", StringType()),
    ]
)

META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("format", StringType()),
    ]
)

_MAGIC = b"FAKE"
_HEADER_FMT = ">4sHH"  # magic, width, height
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)

N_HIST_BINS = 16
FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("hist", ArrayType(LongType())),
    ]
)

FRAME_SIZE = 64  # bytes per fake "frame"
FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def _media_kind_expr():
    """image|audio|video cycled by doc_id — a row-local expression over
    the documents columns (shared by synthesize_media and the round-13
    single-pass battery synthesis)."""
    return F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )


def _media_payload_expr():
    """FAKE header (dims derived from n_chars) + utf-8 text body, as a
    pure expression over the documents columns."""
    width = (F.col("n_chars") % 640).cast("int")
    height = (F.col("n_chars") % 480).cast("int")
    # >HH big-endian shorts: hex → zero-pad to 4 nibbles → unhex
    def be16(col):
        return F.unhex(F.lpad(F.hex(col), 4, "0"))

    header = F.concat(F.lit(_MAGIC), be16(width), be16(height))
    return F.concat(header, F.encode("text", "utf-8"))


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from `documents`: payload =
    FAKE header (dims derived from n_chars) + utf-8 text body.

    Header assembly is a JVM expression (concat of binary literals +
    int-to-binary), so synthesis itself never leaves codegen.
    """
    return docs.select(
        F.col("doc_id").alias("media_id"),
        _media_kind_expr().alias("kind"),
        _media_payload_expr().alias("payload"),
        "source",
    )


#: PNG file signature (PNG spec §5.2) and the fixed layout of the
#: IHDR chunk that MUST follow it (§11.2.2): length(4) type(4)
#: width(4) height(4) bit-depth(1) colour-type(1) compression(1)
#: filter(1) interlace(1) crc(4) — all integers big-endian.
PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: JPEG markers (ITU-T T.81 §B): segments are FF <marker> <len:u16,
#: includes itself>; frame headers (SOFn) carry precision(1)
#: height(2) width(2) n_components(1). C4/C8/CC are DHT/JPG/DAC —
#: NOT frame headers despite sitting in the Cx range.
_JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_png_header(b: bytes) -> tuple[int, int, int, int]:
    """From-spec PNG header parse (no codec library): verify the
    8-byte signature, require the first chunk to be a 13-byte IHDR,
    verify its CRC-32 (PNG §5.3 computes it over chunk type + data —
    the standard polynomial, zlib.crc32), and return (width, height,
    bit_depth, colour_type). Raises ValueError on any malformation —
    a header decoder that silently mis-reads is worse than none."""
    import zlib

    if b[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    if len(b) < len(PNG_SIG) + 25:
        raise ValueError("truncated PNG: no room for IHDR")
    off = len(PNG_SIG)
    (length,) = struct.unpack(">I", b[off : off + 4])
    ctype = b[off + 4 : off + 8]
    if ctype != b"IHDR" or length != 13:
        raise ValueError(f"first chunk must be IHDR(13), got {ctype!r}({length})")
    data = b[off + 8 : off + 8 + 13]
    (crc,) = struct.unpack(">I", b[off + 21 : off + 25])
    if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
        raise ValueError("IHDR CRC mismatch")
    width, height = struct.unpack(">II", data[:8])
    bit_depth, colour_type = data[8], data[9]
    if width == 0 or height == 0:
        raise ValueError("PNG dimensions must be nonzero")
    return width, height, bit_depth, colour_type


def parse_jpeg_header(b: bytes) -> tuple[int, int, int, int]:
    """From-spec baseline/progressive JPEG header parse (no codec
    library): verify SOI, walk the segment stream skipping non-frame
    segments by their declared lengths (tolerating marker fill bytes,
    T.81 §B.1.1.2), and read (width, height, precision, n_components)
    from the first SOFn frame header. Raises ValueError when the
    stream is malformed or ends before a frame header."""
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        raise ValueError("not a JPEG: no SOI")
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        # optional fill bytes: any number of FFs may pad a marker
        while pos < len(b) and b[pos] == 0xFF:
            pos += 1
        if pos >= len(b):
            break
        marker = b[pos]
        pos += 1
        if marker == 0xD9:  # EOI before any SOF
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # RSTn/TEM: bare
            continue
        if pos + 2 > len(b):
            raise ValueError("truncated segment length")
        (seg_len,) = struct.unpack(">H", b[pos : pos + 2])
        if seg_len < 2:
            raise ValueError(f"segment length {seg_len} < 2")
        if marker in _JPEG_SOF_MARKERS:
            # the declared length must cover the fixed fields we read:
            # len(2) + precision(1) + height(2) + width(2) + Nf(1) = 8
            # (T.81 §B.2.2: Lf = 8 + 3*Nf). Without this a malformed
            # SOF declaring seg_len < 8 would read bytes belonging to
            # the NEXT segment as a plausible header (round-11 ADVICE).
            if seg_len < 8:
                raise ValueError(f"SOF segment length {seg_len} < 8")
            if pos + 8 > len(b):
                raise ValueError("truncated SOF header")
            precision = b[pos + 2]
            height, width = struct.unpack(">HH", b[pos + 3 : pos + 7])
            n_components = b[pos + 7]
            if seg_len != 8 + 3 * n_components:
                raise ValueError(
                    f"SOF length {seg_len} != 8 + 3*{n_components} (T.81 §B.2.2)"
                )
            if width == 0 or height == 0:
                raise ValueError("JPEG dimensions must be nonzero")
            return width, height, precision, n_components
        pos += seg_len
    raise ValueError("no SOF frame header before end of stream")


def _decode_real(payload: bytes, kind: str):
    """Real pixel/sample decode hook — requires PIL/librosa/av, not
    in this container. The dimensions/metadata class no longer routes
    here: PNG and JPEG headers are parsed from spec by
    `parse_png_header` / `parse_jpeg_header` (round-11)."""
    raise NotImplementedError(
        f"real {kind} pixel decoding requires a codec library; only "
        "header/metadata parsing (PNG, JPEG) and the FAKE format are "
        "supported in this environment"
    )


def decode_media_meta(media: DataFrame) -> DataFrame:
    """Decode payload headers into typed metadata via mapInPandas.

    Parses the deterministic FAKE header; any other format routes to
    `_decode_real` (NotImplementedError until codecs exist). Batches
    stream through Arrow; output is one metadata row per media row.
    """

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] == _MAGIC:
                    _, width, height = struct.unpack(_HEADER_FMT, b[:_HEADER_SIZE])
                    fmt = "fake"
                elif b[: len(PNG_SIG)] == PNG_SIG:
                    width, height, _, _ = parse_png_header(b)
                    fmt = "png"
                elif b[:2] == b"\xff\xd8":
                    width, height, _, _ = parse_jpeg_header(b)
                    fmt = "jpeg"
                else:  # pragma: no cover — no real codecs in container
                    _decode_real(b, kind)
                    continue
                rows.append((media_id, kind, width, height, len(b), fmt))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "width", "height", "n_bytes", "format"]
            )

    return media.mapInPandas(decode, META_SCHEMA)


IMG_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("bit_depth", IntegerType()),
        StructField("color", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

#: PNG colour types cycled by the synthesizer (greyscale, truecolour,
#: truecolour+alpha — the three non-palette, non-grey-alpha types).
_PNG_COLOR_TYPES = (0, 2, 6)


def _image_payload_expr():
    """Deterministic REAL image byte streams from `documents`: even
    doc_ids become structurally-valid PNGs (signature + CRC-correct
    IHDR + IEND), odd ones baseline JPEGs (SOI + JFIF APP0 + a COM
    segment the parser must walk past + SOF0 + EOI). Dimensions
    derive from n_chars (1 + n_chars % 640 x 1 + n_chars % 480 — PNG
    forbids zero dims), so an oracle can recompute every header field
    arithmetically while the decode side parses actual bytes.

    Assembly is pure JVM expression (concat of binary literals +
    int-to-big-endian via hex/lpad/unhex; the IHDR CRC is Spark's own
    `crc32`, the same CRC-32 the PNG spec mandates) — synthesis never
    leaves codegen, exactly like `synthesize_media`.
    """

    def be(col, nibbles):
        return F.unhex(F.lpad(F.hex(col), nibbles, "0"))

    width = (F.col("n_chars") % 640 + 1).cast("long")
    height = (F.col("n_chars") % 480 + 1).cast("long")
    color_type = F.element_at(
        F.array(*[F.lit(c) for c in _PNG_COLOR_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    ).cast("long")
    ihdr_body = F.concat(
        F.lit(b"IHDR"),
        be(width, 8),
        be(height, 8),
        F.lit(bytes([8])),  # bit depth
        be(color_type, 2),
        F.lit(bytes([0, 0, 0])),  # compression, filter, interlace
    )
    png = F.concat(
        F.lit(PNG_SIG),
        F.lit((13).to_bytes(4, "big")),
        ihdr_body,
        be(F.crc32(ihdr_body), 8),
        F.lit((0).to_bytes(4, "big") + b"IEND" + (0xAE426082).to_bytes(4, "big")),
    )
    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    comment = b"synthetic header-class jpeg"
    com = b"\xff\xfe" + (len(comment) + 2).to_bytes(2, "big") + comment
    sof0 = F.concat(
        F.lit(b"\xff\xc0\x00\x11\x08"),  # SOF0, len 17, precision 8
        be(height, 4),
        be(width, 4),
        F.lit(bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])),  # 3 comps
    )
    jpeg = F.concat(F.lit(b"\xff\xd8" + app0 + com), sof0, F.lit(b"\xff\xd9"))
    return F.when(F.col("doc_id") % 2 == 0, png).otherwise(jpeg)


def synthesize_image_files(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.col("doc_id").alias("media_id"),
        _image_payload_expr().alias("payload"),
    )


synthesize_image_files.__doc__ = _image_payload_expr.__doc__


def decode_image_headers(media: DataFrame) -> DataFrame:
    """Arrow-batched from-spec image header decode: PNG and JPEG byte
    streams → (format, width, height, bit_depth, color, n_bytes) via
    `parse_png_header` / `parse_jpeg_header` over mapInPandas record
    batches. For PNG, ``color`` is the IHDR colour type; for JPEG,
    the SOF component count. Malformed payloads RAISE (task failure),
    they never emit garbage rows."""

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                if b[: len(PNG_SIG)] == PNG_SIG:
                    w, h, depth, color = parse_png_header(b)
                    fmt = "png"
                else:
                    w, h, depth, color = parse_jpeg_header(b)
                    fmt = "jpeg"
                rows.append((media_id, fmt, w, h, depth, color, len(b)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "format",
                    "width",
                    "height",
                    "bit_depth",
                    "color",
                    "n_bytes",
                ],
            )

    return media.mapInPandas(decode, IMG_META_SCHEMA)


def byte_histogram_features(media: DataFrame) -> DataFrame:
    """Feature extraction: 16-bin byte histogram of the payload body
    (after the header) — the stand-in for an embedding model, with the
    real shape: binary in, fixed-width vector out, vectorized numpy
    over Arrow batches.
    """

    def extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, hists = [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                body = np.frombuffer(bytes(payload), dtype=np.uint8)[_HEADER_SIZE:]
                hists.append(np.bincount(body >> 4, minlength=N_HIST_BINS).astype("int64").tolist())
                ids.append(media_id)
            yield pd.DataFrame({"media_id": ids, "hist": hists})

    return media.mapInPandas(extract, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling stub: treat the payload body as fixed-size
    frames, emit every ``every_n``-th with its index — a row-exploding
    mapInPandas (one input row → many output rows), the decode-side
    shape of real frame extraction.
    """

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                body = bytes(payload)[_HEADER_SIZE:]
                n_frames = len(body) // FRAME_SIZE
                for i in range(0, n_frames, every_n):
                    ids.append(media_id)
                    idxs.append(i)
                    frames.append(body[i * FRAME_SIZE : (i + 1) * FRAME_SIZE])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.filter(F.col("kind") == "video").mapInPandas(sample, FRAMES_SCHEMA)


# ---------------------------------------------------------------------------
# Round-12 widening of the from-spec header class (VERDICT r11 #7):
# GIF logical-screen descriptor and WAV/RIFF fmt chunk — pure-
# arithmetic parses like the PNG/JPEG work, extending the multimodal
# metadata coverage to animation and AUDIO containers. Same contract:
# refuse malformation, never emit a plausible mis-read.
# ---------------------------------------------------------------------------

#: GIF signatures (GIF89a spec §17): 6-byte header, then the 7-byte
#: logical-screen descriptor — width(2,LE) height(2,LE) packed(1)
#: background(1) aspect(1). All integers LITTLE-endian (§4).
GIF_SIGS = (b"GIF87a", b"GIF89a")

#: RIFF/WAVE layout (RIFF spec / RFC 2361): 'RIFF' size(4,LE) 'WAVE',
#: then chunks of id(4) size(4,LE) data[size] (+1 pad byte when size
#: is odd); the 'fmt ' chunk carries audio_format(2) channels(2)
#: sample_rate(4) byte_rate(4) block_align(2) bits_per_sample(2),
#: all little-endian.
WAV_FMT_MIN = 16


def parse_gif_header(b: bytes) -> tuple[str, int, int, int, int]:
    """From-spec GIF header parse (no codec library): verify the
    GIF87a/GIF89a signature and read the logical-screen descriptor —
    (version, width, height, color_resolution, gct_flag). Integers are
    little-endian per spec §4; ``color_resolution`` is the descriptor's
    3-bit field + 1 (bits per primary). Raises ValueError on any
    malformation."""
    if len(b) < 13:
        raise ValueError("truncated GIF: no room for the screen descriptor")
    if b[:6] not in GIF_SIGS:
        raise ValueError("not a GIF: bad signature")
    version = b[3:6].decode("ascii")
    width, height = struct.unpack("<HH", b[6:10])
    packed = b[10]
    color_resolution = ((packed >> 4) & 0x7) + 1
    gct_flag = packed >> 7
    if width == 0 or height == 0:
        raise ValueError("GIF dimensions must be nonzero")
    return version, width, height, color_resolution, gct_flag


def parse_wav_header(b: bytes) -> tuple[int, int, int, int]:
    """From-spec WAV header parse (no codec library): verify the
    RIFF/WAVE container, walk chunks by their declared little-endian
    sizes (honoring the odd-size pad byte) to the first ``fmt `` chunk,
    validate its internal consistency (PCM block_align = channels *
    bits/8; byte_rate = sample_rate * block_align), and return
    (channels, sample_rate, bits_per_sample, data_bytes) where
    ``data_bytes`` is the declared size of the ``data`` chunk (0 when
    the stream ends before one). Raises ValueError on malformation."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data_bytes = 0
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk: {len(body)} < {size}")
        if cid == b"fmt ":
            if size < WAV_FMT_MIN:
                raise ValueError(f"fmt chunk {size} < {WAV_FMT_MIN}")
            audio_format, channels, sample_rate, byte_rate, block_align, bits = (
                struct.unpack("<HHIIHH", body[:16])
            )
            if channels == 0 or sample_rate == 0 or bits == 0:
                raise ValueError("WAV fmt fields must be nonzero")
            if audio_format == 1:  # PCM: derived fields must agree
                if block_align != channels * bits // 8:
                    raise ValueError(
                        f"block_align {block_align} != channels*bits/8"
                    )
                if byte_rate != sample_rate * block_align:
                    raise ValueError(
                        f"byte_rate {byte_rate} != rate*block_align"
                    )
            fmt = (channels, sample_rate, bits)
        elif cid == b"data":
            data_bytes = size
        pos += 8 + size + (size & 1)  # odd sizes carry a pad byte
    if fmt is None:
        raise ValueError("no fmt chunk before end of stream")
    return fmt[0], fmt[1], fmt[2], data_bytes


AV_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("color_res", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("bits_per_sample", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

#: The synthesizer's LIST junk chunk the WAV walker must skip (the
#: JPEG COM-segment treatment), and the PCM bit depths it cycles.
_WAV_JUNK = b"synthetic av-header wav"
_WAV_BITS = (8, 16, 24)


def _av_payload_expr():
    """Deterministic REAL animation/audio byte streams from
    `documents`: even doc_ids become GIF89a headers (signature +
    logical-screen descriptor + trailer), odd ones PCM WAVs (RIFF +
    a LIST junk chunk the walker must skip + consistent fmt + empty
    data chunk). Every field derives from (doc_id, n_chars)
    arithmetic so an oracle can recompute it without parsing bytes.
    Assembly is pure JVM expression — little-endian u16/u32 are built
    by concatenating the reversed big-endian bytes (hex/lpad/unhex +
    per-byte substr), so synthesis never leaves codegen."""

    def be(col, nibbles):
        return F.unhex(F.lpad(F.hex(col), nibbles, "0"))

    def le(col, nbytes):
        b = be(col, nbytes * 2)
        return F.concat(
            *[F.substring(b, i, 1) for i in range(nbytes, 0, -1)]
        )

    width = (F.col("n_chars") % 640 + 1).cast("long")
    height = (F.col("n_chars") % 480 + 1).cast("long")
    # packed: GCT flag 0, color-resolution bits = doc_id % 8
    packed = ((F.col("doc_id") % 8) * 16).cast("long")
    gif = F.concat(
        F.lit(b"GIF89a"),
        le(width, 2),
        le(height, 2),
        be(packed, 2),
        F.lit(bytes([0, 0])),  # background index, aspect ratio
        F.lit(b"\x3b"),  # trailer
    )
    channels = (F.col("doc_id") % 3 + 1).cast("long")
    bits = F.element_at(
        F.array(*[F.lit(x) for x in _WAV_BITS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    ).cast("long")
    rate = (F.col("n_chars") % 40000 + 8000).cast("long")
    block_align = (channels * bits / 8).cast("long")
    byte_rate = rate * block_align
    junk = b"LIST" + len(_WAV_JUNK).to_bytes(4, "little") + _WAV_JUNK
    junk += b"\x00" * (len(_WAV_JUNK) & 1)  # pad to even
    fmt_chunk = F.concat(
        F.lit(b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")),
        le(channels, 2),
        le(rate, 4),
        le(byte_rate, 4),
        le(block_align, 2),
        le(bits, 2),
    )
    data_chunk = b"data" + (0).to_bytes(4, "little")
    riff_size = 4 + len(junk) + (8 + 16) + len(data_chunk)
    wav = F.concat(
        F.lit(b"RIFF" + riff_size.to_bytes(4, "little") + b"WAVE" + junk),
        fmt_chunk,
        F.lit(data_chunk),
    )
    return F.when(F.col("doc_id") % 2 == 0, gif).otherwise(wav)


def synthesize_av_files(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.col("doc_id").alias("media_id"),
        _av_payload_expr().alias("payload"),
    )


synthesize_av_files.__doc__ = _av_payload_expr.__doc__


def decode_av_headers(media: DataFrame) -> DataFrame:
    """Arrow-batched from-spec GIF/WAV header decode over mapInPandas
    record batches: (media_id, format, width, height, color_res,
    channels, sample_rate, bits_per_sample, n_bytes) with the
    inapplicable fields NULL per format. Malformed payloads RAISE
    (task failure), never garbage rows — the decode contract the
    PNG/JPEG class established."""

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:6] in GIF_SIGS:
                    _, w, h, cres, _ = parse_gif_header(b)
                    rows.append(
                        (media_id, "gif", w, h, cres, None, None, None, len(b))
                    )
                else:
                    ch, rate, bits, _ = parse_wav_header(b)
                    rows.append(
                        (media_id, "wav", None, None, None, ch, rate, bits, len(b))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "format",
                    "width",
                    "height",
                    "color_res",
                    "channels",
                    "sample_rate",
                    "bits_per_sample",
                    "n_bytes",
                ],
            )

    return media.mapInPandas(decode, AV_META_SCHEMA)


# ---------------------------------------------------------------------------
# Round-13 single-pass battery decode (guide §2.3/§2.4 + §4): the
# decode battery previously ran FOUR independent legs — meta, frame
# sample, PNG/JPEG headers, GIF/WAV headers — each its own parquet
# scan, spread exchange, JVM synthesis and mapInPandas stage, i.e.
# four corpus passes and four Python boundary crossings for one
# result. All four parses read byte streams synthesized from the SAME
# document row, so ONE projection synthesizes every payload and ONE
# Arrow-batched pass emits all legs' rows (1 scan, 1 exchange, 1
# Python stage). Each leg's parse logic is the shared from-spec
# parser above, so the singles (image_header_decode, av_header_decode,
# multimodal_byte_histogram's hist leg) and the battery can never
# drift. Row-for-row equality with the legacy 4-leg union is pinned by
# tests/test_multimodal.py::test_single_pass_battery_matches_legacy_legs.
# ---------------------------------------------------------------------------

#: The battery's output layout (queries/multimodal.py::_decode_legs).
BATTERY_SCHEMA = StructType(
    [
        StructField("op", StringType()),
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("format", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_md5", StringType()),
        StructField("bit_depth", IntegerType()),
        StructField("color", IntegerType()),
        StructField("color_res", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("bits_per_sample", IntegerType()),
    ]
)

#: BATTERY_SCHEMA plus the histogram CSV column (the
#: multimodal_byte_histogram layout carries both).
BATTERY_HIST_SCHEMA = StructType(
    BATTERY_SCHEMA.fields + [StructField("hist", StringType())]
)

_BATTERY_COLS = [f.name for f in BATTERY_HIST_SCHEMA.fields]


def synthesize_battery_inputs(docs: DataFrame) -> DataFrame:
    """One projection carrying every synthesized byte stream the
    battery decodes: the FAKE media payload (meta + frame legs), the
    PNG/JPEG stream (imghdr leg) and the GIF/WAV stream (avhdr leg).
    Pure JVM expressions — the same synthesis programs as
    synthesize_media / synthesize_image_files / synthesize_av_files,
    emitted side by side from one scan."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        _media_kind_expr().alias("kind"),
        _media_payload_expr().alias("payload"),
        _image_payload_expr().alias("img_payload"),
        _av_payload_expr().alias("av_payload"),
    )


def decode_battery_legs(frame: DataFrame, every_n: int = 2, with_hist: bool = False) -> DataFrame:
    """The battery's four decode legs (plus, optionally, the 16-bin
    byte histogram) in ONE Arrow-batched pass over
    ``synthesize_battery_inputs`` rows. Emits, per input row: one
    ``meta`` row (the decode_media_meta dispatch), the sampled
    ``frame`` rows for video payloads (every ``every_n``-th
    FRAME_SIZE-byte slice, md5-hexed — hashlib.md5 is the same MD5 the
    JVM ``md5()`` computed on the frame bytes), one ``imghdr`` row and
    one ``avhdr`` row (the shared from-spec parsers), and with
    ``with_hist`` one ``hist`` row (the byte_histogram_features
    program, serialized to the CSV string the driver canonicalizer
    hashes). Malformed payloads RAISE, never emit garbage rows."""
    import hashlib

    want_hist = with_hist

    def decode(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        nulls = (None,) * 13
        for pdf in batches:
            rows = []
            for media_id, kind, payload, img, av in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"],
                pdf["img_payload"], pdf["av_payload"],
            ):
                b = bytes(payload)
                if want_hist:
                    body_arr = np.frombuffer(b, dtype=np.uint8)[_HEADER_SIZE:]
                    hist = np.bincount(body_arr >> 4, minlength=N_HIST_BINS)
                    rows.append(
                        ("hist", media_id) + nulls + (",".join(str(int(v)) for v in hist),)
                    )
                # meta leg — the decode_media_meta dispatch, verbatim
                if b[:4] == _MAGIC:
                    _, width, height = struct.unpack(_HEADER_FMT, b[:_HEADER_SIZE])
                    fmt = "fake"
                elif b[: len(PNG_SIG)] == PNG_SIG:
                    width, height, _, _ = parse_png_header(b)
                    fmt = "png"
                elif b[:2] == b"\xff\xd8":
                    width, height, _, _ = parse_jpeg_header(b)
                    fmt = "jpeg"
                else:  # pragma: no cover — no real codecs in container
                    _decode_real(b, kind)
                    continue
                rows.append(
                    ("meta", media_id, kind, width, height, len(b), fmt,
                     None, None, None, None, None, None, None, None, None)
                )
                # frame leg — frame_sample(media, every_n), md5 applied
                if kind == "video":
                    body = b[_HEADER_SIZE:]
                    n_frames = len(body) // FRAME_SIZE
                    for i in range(0, n_frames, every_n):
                        digest = hashlib.md5(
                            body[i * FRAME_SIZE : (i + 1) * FRAME_SIZE]
                        ).hexdigest()
                        rows.append(
                            ("frame", media_id, None, None, None, None, None,
                             i, digest, None, None, None, None, None, None, None)
                        )
                # imghdr leg — decode_image_headers dispatch, verbatim
                ib = bytes(img)
                if ib[: len(PNG_SIG)] == PNG_SIG:
                    w, h, depth, color = parse_png_header(ib)
                    ifmt = "png"
                else:
                    w, h, depth, color = parse_jpeg_header(ib)
                    ifmt = "jpeg"
                rows.append(
                    ("imghdr", media_id, None, w, h, len(ib), ifmt,
                     None, None, depth, color, None, None, None, None, None)
                )
                # avhdr leg — decode_av_headers dispatch, verbatim
                ab = bytes(av)
                if ab[:6] in GIF_SIGS:
                    _, gw, gh, cres, _ = parse_gif_header(ab)
                    rows.append(
                        ("avhdr", media_id, None, gw, gh, len(ab), "gif",
                         None, None, None, None, cres, None, None, None, None)
                    )
                else:
                    ch, rate, bits, _ = parse_wav_header(ab)
                    rows.append(
                        ("avhdr", media_id, None, None, None, len(ab), "wav",
                         None, None, None, None, None, ch, rate, bits, None)
                    )
            yield pd.DataFrame(rows, columns=_BATTERY_COLS)

    schema = BATTERY_HIST_SCHEMA if with_hist else BATTERY_SCHEMA
    if not with_hist:
        # same row tuples minus the trailing hist cell
        def decode_no_hist(batches: Iterator) -> Iterator:
            for pdf in decode(batches):
                yield pdf[_BATTERY_COLS[:-1]]

        return frame.mapInPandas(decode_no_hist, schema)
    return frame.mapInPandas(decode, schema)
