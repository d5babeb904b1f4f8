"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages. The actual codec work needs
image/audio libraries that are NOT in this container, so the decode step
is STUBBED: ``decode_image``/``decode_audio`` raise NotImplementedError,
and ``fake_decode`` provides a deterministic stand-in (metadata parsed
from the payload's md5) so the Spark-side plumbing — schema, partitioning,
UDF signature, Arrow batch shape — is real and tested.

Scale notes: mapInPandas streams Arrow batches, so a 100 TB binary column
never materializes rows in Python lists; per-batch vectorized numpy only.
Payload columns should be stored in their own parquet column chunk
(automatic) and pruned unless needed (select the metadata struct, not the
bytes).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def decode_image(payload: bytes):
    """Real image decode — requires an imaging library not present here."""
    raise NotImplementedError(
        "image decoding requires an imaging library (e.g. Pillow) that is "
        "not installed in this environment; use fake_decode for plumbing tests"
    )


def decode_audio(payload: bytes):
    """Real audio decode — requires an audio library not present here."""
    raise NotImplementedError(
        "audio decoding requires an audio library that is not installed in "
        "this environment; use fake_decode for plumbing tests"
    )


def _fake_meta(payload: bytes, media_type: str):
    """Deterministic stand-in metadata derived from md5(payload)."""
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 if media_type == "image" else 1 + h[2] % 30
    return len(payload), width, height, n_frames


def attach_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Test harness: synthesize an opaque payload column from the text
    bytes (deterministic fake 'media'). Production replaces this with a
    real binary source column."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def extract_metadata(media: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction (Arrow batches; vectorized per batch)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _fake_meta(p, t)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pd.DataFrame(
                metas, columns=["n_bytes", "width", "height", "n_frames"]
            )
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(_extract, META_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: FEATURE_DIM float32 per payload,
    derived from md5 bytes (deterministic fake for the embedding model)."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = np.stack(
                [
                    np.frombuffer(hashlib.md5(p).digest(), dtype=np.uint8)[
                        :FEATURE_DIM
                    ].astype(np.float32)
                    / 255.0
                    for p in pdf["payload"]
                ]
            )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "feature": list(feats)}
            )

    return media.mapInPandas(_features, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling plan for video payloads: explode sampled frame
    indices from the (fake-decoded) frame count. The decode of each frame
    is stubbed; the partitioning/row-multiplication plumbing is real."""
    meta = extract_metadata(media.filter(F.col("media_type") == "video"))
    return meta.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
