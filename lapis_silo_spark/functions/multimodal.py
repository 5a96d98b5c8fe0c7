"""Multimodal columns: opaque binary payloads + typed metadata, with the
decode / feature-extract stages as Arrow-batched Pandas UDF plumbing.

The container has no image/audio libraries, so the actual byte→pixels/samples
decode is STUBBED (clearly marked below); everything Spark-side — schema,
``mapInPandas`` batch shape, partitioning, metadata extraction — is real and
tested. A deployment swaps ``_decode_image_stub`` for a real decoder (PIL,
ffmpeg, ...) without touching any plan structure.

Scale notes: binary columns ride in Parquet as BYTE_ARRAY; metadata-only
queries never touch the bytes (column pruning), and the decode stage is a
narrow mapInPandas (no shuffle) whose parallelism is the file-split count.
"""

from __future__ import annotations

import os
from hashlib import md5 as _md5
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def binary_metadata(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Typed metadata over an opaque binary column — pure JVM expressions:
    byte length, md5 digest, magic-byte sniffing for common containers."""
    b = F.col(bin_col)
    magic = F.substring(F.hex(b), 1, 8)
    media_type = (
        F.when(magic == "89504E47", F.lit("image/png"))
        .when(F.substring(F.hex(b), 1, 6) == "FFD8FF", F.lit("image/jpeg"))
        .when(magic == "52494646", F.lit("audio/wav"))  # RIFF
        .when(magic == "1A45DFA3", F.lit("video/webm"))
        .otherwise(F.lit("application/octet-stream"))
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.length(b).alias("n_bytes"),
        F.md5(b).alias("digest"),  # md5 over raw bytes — a utf8 cast is lossy for binary
        media_type.alias("media_type"),
    )


_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _REAL_DECODE() -> bool:
    return bool(os.environ.get("SILO_SPARK_REAL_DECODE"))


def _decode_image_stub(payload: bytes) -> tuple[int, int, int, list[float]]:
    """STUB decoder — deterministic fake standing in for a real image decoder.

    Raises ``NotImplementedError`` when real decoding is requested via env
    flag; otherwise fabricates (width, height, channels, 4-dim feature) from
    the byte content so the full pipeline shape is exercised deterministically.
    """
    if _REAL_DECODE():
        raise NotImplementedError(
            "real image decoding requires an image library not present in "
            "this container; install one and replace _decode_image_stub"
        )
    digest = _md5(payload).digest()
    width = 16 + digest[0] % 64
    height = 16 + digest[1] % 64
    channels = 1 + digest[2] % 3
    feature = [b / 255.0 for b in digest[:4]]
    return width, height, channels, feature


def decode_images(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Arrow-batched decode/feature-extract stage: ``mapInPandas`` over
    (id, binary) batches → (id, width, height, n_channels, feature).

    This is the real plumbing a production decode stage uses — only the
    per-payload byte interpretation is stubbed (see _decode_image_stub).
    """
    selected = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(bin_col).alias("payload")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # column-wise iteration — iterrows() materializes a Series per
            # row and dominates the stage cost at scale
            decoded = [
                _decode_image_stub(bytes(p) if p is not None else b"")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "id": pdf["id"].to_numpy(),
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "n_channels": [d[2] for d in decoded],
                "feature": [d[3] for d in decoded],
            })

    return selected.mapInPandas(decode_batches, schema=_DECODED_SCHEMA)


def frame_sample_plan(
    df: DataFrame, id_col: str, bin_col: str, every_nth: int = 30
) -> DataFrame:
    """Video frame-sampling *plan* shape: one output row per sampled frame
    index. Frame count is stubbed as a deterministic function of byte length
    (real: container demux); the explode/partitioning shape is the real one.
    """
    frames = F.sequence(
        F.lit(0),
        F.greatest((F.length(F.col(bin_col)) / 1000).cast("int"), F.lit(0)),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(frames, lambda i: i % every_nth == 0)
        ).alias("frame_index"),
    )
