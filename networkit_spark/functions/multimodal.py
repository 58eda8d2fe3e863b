"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode/feature-extract/resize/frame-sample as Arrow-batched
``mapInPandas`` stages.

The sandbox has no image/audio codecs, so the DECODE step is stubbed
(raises ``NotImplementedError`` unless ``fake=True``, which derives a
deterministic value from the raw bytes). Everything around the stub —
schema, batch shape, partitioning, UDF signatures — is the real Spark
plumbing and is tested: swapping the stub for PIL/ffmpeg changes one
function body, not the pipeline.

Canonical media schema:
    media(media_id: long, kind: string, data: binary,
          meta: struct<width:int, height:int, sample_rate:int,
                       duration_ms:int>)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("data", BinaryType()),
    StructField("meta", StructType([
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ])),
])

FEATURE_DIM = 8

_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("features", ArrayType(FloatType())),
])


def decode(data: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """Decode raw media bytes to a pixel/sample array.

    STUB: real decoding needs PIL/soundfile/ffmpeg, absent in this
    container. ``fake=True`` returns the raw byte values — deterministic,
    enough to exercise the downstream pipeline shape.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires PIL/soundfile/ffmpeg; "
            "run with fake=True in environments without codecs"
        )
    return np.frombuffer(data, dtype=np.uint8)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, features: array<float>): FEATURE_DIM floats per item via
    Arrow-batched mapInPandas. The fake featurizer is the first
    FEATURE_DIM decoded byte values / 255 (zero-padded)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for data, kind in zip(pdf["data"], pdf["kind"]):
                arr = decode(bytes(data), kind, fake=fake)
                v = np.zeros(FEATURE_DIM, dtype=np.float32)
                head = arr[:FEATURE_DIM].astype(np.float32) / 255.0
                v[: len(head)] = head
                feats.append(v.tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.select("media_id", "kind", "data").mapInPandas(
        run, schema=_FEATURE_SCHEMA
    )


def resize_images(media: DataFrame, width: int, height: int,
                  fake: bool = True) -> DataFrame:
    """(media_id, data): image resize stage — stubbed to an identity on the
    raw bytes under ``fake`` (the real body is PIL resize), preserving the
    binary-in/binary-out contract."""

    schema = StructType([
        StructField("media_id", LongType()),
        StructField("data", MEDIA_SCHEMA["data"].dataType),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for data, kind in zip(pdf["data"], pdf["kind"]):
                decode(bytes(data), kind, fake=fake)  # enforce decodability
                out.append(bytes(data))  # stub: identity
            yield pd.DataFrame({"media_id": pdf["media_id"], "data": out})

    return media.select("media_id", "kind", "data").mapInPandas(run, schema=schema)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """(media_id, frame_idx): frame-sampling plan for video rows — pure
    column math over meta.duration_ms (no decode needed to PLAN the
    sampling; the decode of chosen frames is the stubbed stage)."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(F.sequence(F.lit(0), n_frames - 1))
                .alias("frame_idx"))
    )


def text_as_fake_media(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Adapter used by tests/queries: wrap UTF-8 text bytes as media rows
    so the binary pipeline is exercised end-to-end deterministically."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("data"),
        F.struct(
            F.lit(0).cast("int").alias("width"),
            F.lit(0).cast("int").alias("height"),
            F.lit(0).cast("int").alias("sample_rate"),
            F.lit(0).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
