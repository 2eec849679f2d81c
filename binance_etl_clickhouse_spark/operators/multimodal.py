"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-friendly
layout, Arrow-batched ``mapInPandas`` feature extraction with a declared
output schema. The actual media decode is STUBBED (no image/audio libraries
in this environment): ``decode_media`` raises NotImplementedError by default
and tests exercise the deterministic fake decoder, which produces features
from the raw bytes (size, digest, fake dimensions) through the exact same
batch path a real decoder would use.

Design for 100 TB of media: binary blobs ride in parquet with the metadata
struct alongside; feature extraction, resize, and frame sampling are all
embarrassingly parallel over partitions (mapInPandas, no shuffle) —
binary-in/binary-out stages preserve MEDIA_SCHEMA so they compose into one
pipelined pass over the data.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, digest string, fake_width int, fake_height int"
)


def attach_binary_content(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", mime: str = "text/plain"
) -> DataFrame:
    """Build a MEDIA_SCHEMA frame from any table (test harness: UTF-8 bytes
    of the text column stand in for image bytes)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("double").alias("duration_s"),
        ).alias("meta"),
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in decoder: byte-level features only."""
    out = pd.DataFrame()
    out["media_id"] = pdf["media_id"]
    out["n_bytes"] = pdf["content"].map(len).astype("int64")
    out["digest"] = pdf["content"].map(lambda b: hashlib.md5(b).hexdigest())
    out["fake_width"] = (out["n_bytes"] % 1920).astype("int32")
    out["fake_height"] = (out["n_bytes"] % 1080).astype("int32")
    return out


def extract_media_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``real_decode=True`` is the seam where PIL/ffmpeg-style decoding would
    plug in; unavailable here, so it raises (clearly marked stub).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "media decoding requires image/audio libraries not present "
                    "in this environment; plug a decoder into this seam"
                )
            yield _fake_decode_batch(pdf)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_media(
    media: DataFrame, width: int, height: int, real_decode: bool = False
) -> DataFrame:
    """Resize stage: binary in -> binary out, MEDIA_SCHEMA preserved, so
    stages compose (``resize |> frame-sample |> features``) with no shuffle.

    The pixel work is stubbed (no PIL here): the fake "resize" is a
    deterministic byte truncation/pad to ``width*height`` bytes through the
    same Arrow batch path a real resampler would use, and the metadata
    struct is updated for real — downstream stages must see the new dims.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "image resize requires a decoder not present in this "
                    "environment; plug PIL/opencv into this seam"
                )
            out = pd.DataFrame()
            out["media_id"] = pdf["media_id"]
            out["content"] = pdf["content"].map(
                lambda b: bytes(b)[:n].ljust(n, b"\0")
            )
            out["meta"] = [
                {
                    "mime": (m or {}).get("mime"),
                    "width": width,
                    "height": height,
                    "duration_s": (m or {}).get("duration_s"),
                }
                for m in pdf["meta"]
            ]
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8,
    real_decode: bool = False,
) -> DataFrame:
    """Frame-sampling stage: one input row fans out to ≤ ``max_frames`` rows
    (a flat-map, which is why this is ``mapInPandas`` and not a scalar UDF).

    Stub semantics: every ``every_n_bytes``-th slice of the blob stands in
    for a decoded video frame; a real implementation would seek keyframes
    with ffmpeg in exactly this batch loop. Row-explosion stays inside the
    partition — no shuffle until something downstream groups.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "frame extraction requires ffmpeg-style decoding not "
                    "present in this environment; plug it into this seam"
                )
            rows = []
            for mid, blob, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                b = bytes(blob)
                for i in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame": b[i * every_n_bytes : (i + 1) * every_n_bytes],
                            "meta": meta,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame", "meta"]
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
