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


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from `documents`: payload =
    FAKE header (dims derived from n_chars) + utf-8 text body.

    Header assembly is a JVM expression (concat of binary literals +
    int-to-binary), so synthesis itself never leaves codegen.
    """
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    width = (F.col("n_chars") % 640).cast("int")
    height = (F.col("n_chars") % 480).cast("int")
    # >HH big-endian shorts: hex → zero-pad to 4 nibbles → unhex
    def be16(col):
        return F.unhex(F.lpad(F.hex(col), 4, "0"))

    header = F.concat(F.lit(_MAGIC), be16(width), be16(height))
    return (
        docs.withColumn("width", width)
        .withColumn("height", height)
        .select(
            F.col("doc_id").alias("media_id"),
            kind.alias("kind"),
            F.concat(header, F.encode("text", "utf-8")).alias("payload"),
            "source",
        )
    )


def _decode_real(payload: bytes, kind: str):
    """Real codec hook — requires PIL/librosa/av, not in this
    container."""
    raise NotImplementedError(
        f"real {kind} decoding requires a codec library; only the FAKE "
        "header format is supported in this environment"
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
                else:  # pragma: no cover — no real codecs in container
                    _decode_real(b, kind)
                    continue
                rows.append((media_id, kind, width, height, len(b), fmt))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "width", "height", "n_bytes", "format"]
            )

    return media.mapInPandas(decode, META_SCHEMA)


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
