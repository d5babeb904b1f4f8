"""Multimodal column plumbing: real binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / feature-extract / frame-sample run as
Arrow-batched ``mapInPandas`` stages. No external codec libraries exist
in this environment, so the engine implements REAL pure-numpy decoders
for uncompressed container formats:

* ``decode_image`` — BMP (BITMAPINFOHEADER, 24-bit BI_RGB, bottom-up,
  4-byte row padding) → (h, w, 3) uint8;
* ``decode_audio`` — RIFF/WAVE PCM16 mono → int16 samples + sample rate;
* ``decode_video`` — a minimal raw container (``VID0`` magic + uint16
  w/h/n_frames + raw RGB24 frames) → (n_frames, h, w, 3) uint8.

``attach_media`` synthesizes real payloads in these formats
deterministically from (doc_id, text bytes), so decode→metadata and
decode→features flow REAL pixels/samples end-to-end, and the DuckDB
oracle can recompute the expected metadata from the same closed-form
size rules (see ``__spark_entry__.oracle_sql()['multimodal_metadata']``).

Scale notes: mapInPandas streams Arrow batches, so a 100 TB binary column
never materializes rows in Python lists; header parsing is O(bytes) per
payload and the histogram feature is vectorized numpy (frombuffer +
bincount) per payload. Payload columns live in their own parquet column
chunk (automatic) and are pruned unless selected.
"""

from __future__ import annotations

import struct
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

FEATURE_COUNT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("feature", ArrayType(LongType())),
    ]
)

WAV_SAMPLE_RATE = 8000


# ---------------------------------------------------------------------------
# encoders (deterministic synth harness: text bytes -> real containers)
# ---------------------------------------------------------------------------

def _cycle_bytes(data: bytes, n: int) -> np.ndarray:
    """n bytes cycling over data (b"\\0" if empty) — vectorized."""
    if not data:
        data = b"\0"
    arr = np.frombuffer(data, dtype=np.uint8)
    reps = -(-n // len(arr))
    return np.tile(arr, reps)[:n]


def encode_bmp(width: int, height: int, pixel_source: bytes) -> bytes:
    """24-bit BI_RGB bottom-up BMP with the standard 54-byte header."""
    row_size = ((3 * width + 3) // 4) * 4
    img_size = row_size * height
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + img_size, 0, 0, 54,
        40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0,
    )
    rows = _cycle_bytes(pixel_source, 3 * width * height).reshape(height, 3 * width)
    padded = np.zeros((height, row_size), dtype=np.uint8)
    padded[:, : 3 * width] = rows
    return header + padded.tobytes()


def encode_wav(n_samples: int, sample_source: bytes,
               sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """PCM16 mono RIFF/WAVE; samples derived from the source bytes."""
    samples = (
        (_cycle_bytes(sample_source, n_samples).astype(np.int16) - 64) * 256
    ).astype("<i2")
    data = samples.tobytes()
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ",
        16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return header + data


def encode_vid0(width: int, height: int, n_frames: int,
                frame_source: bytes) -> bytes:
    """Minimal raw video container: 'VID0' + uint16 w, h, n_frames + raw
    RGB24 frames (no compression — the honest no-codec-libs format)."""
    header = struct.pack("<4sHHH", b"VID0", width, height, n_frames)
    body = _cycle_bytes(frame_source, n_frames * width * height * 3)
    return header + body.tobytes()


# ---------------------------------------------------------------------------
# decoders (real parsers, pure numpy/struct)
# ---------------------------------------------------------------------------

def decode_image(payload: bytes) -> np.ndarray:
    """BMP → (height, width, 3) uint8 (BGR order as stored).

    Supports the synthesis subset: BITMAPINFOHEADER, 24-bit, BI_RGB,
    bottom-up. Raises ValueError on anything else.
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0 or height <= 0:
        raise ValueError("unsupported BMP variant")
    row_size = ((3 * width + 3) // 4) * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * height, offset=data_offset
    ).reshape(height, row_size)
    # bottom-up storage -> top-down array
    return rows[::-1, : 3 * width].reshape(height, width, 3)


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono → (int16 samples, sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    sample_rate, bits, channels = None, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        if cid == b"fmt ":
            fmt, channels, sample_rate = struct.unpack_from("<HHI", payload, pos + 8)
            bits = struct.unpack_from("<H", payload, pos + 22)[0]
            if fmt != 1:
                raise ValueError("non-PCM WAV")
        elif cid == b"data":
            if bits != 16 or channels != 1:
                raise ValueError("unsupported WAV layout")
            samples = np.frombuffer(payload, dtype="<i2", count=size // 2,
                                    offset=pos + 8)
            return samples, sample_rate
        pos += 8 + size + (size % 2)
    raise ValueError("WAV data chunk missing")


def decode_video(payload: bytes) -> np.ndarray:
    """VID0 container → (n_frames, height, width, 3) uint8."""
    if payload[:4] != b"VID0":
        raise ValueError("not a VID0 payload")
    width, height, n_frames = struct.unpack_from("<HHH", payload, 4)
    body = np.frombuffer(payload, dtype=np.uint8,
                         count=n_frames * height * width * 3, offset=10)
    return body.reshape(n_frames, height, width, 3)


# ---------------------------------------------------------------------------
# synthesis-parameter rules (shared with the DuckDB oracle)
# ---------------------------------------------------------------------------
# image: w = 4 + n_text_bytes % 13, h = 4 + doc_id % 11
# audio: n_samples = 32 + (n_text_bytes * 3) % 241
# video: w = 2 + doc_id % 7, h = 2 + n_text_bytes % 5, f = 1 + doc_id % 12

def _synth_payload(doc_id: int, media_type: str, text: bytes) -> bytes:
    n = len(text)
    if media_type == "image":
        return encode_bmp(4 + n % 13, 4 + doc_id % 11, text)
    if media_type == "audio":
        return encode_wav(32 + (n * 3) % 241, text)
    return encode_vid0(2 + doc_id % 7, 2 + n % 5, 1 + doc_id % 12, text)


def attach_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Test harness: synthesize REAL BMP/WAV/VID0 payloads from the text
    bytes (mapInPandas, Arrow batches). Production replaces this stage
    with a binary source column read straight from parquet."""
    typed = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("raw"),
    )

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _synth_payload(int(d), t, bytes(r))
                for d, t, r in zip(pdf["doc_id"], pdf["media_type"], pdf["raw"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": pdf["media_type"].values,
                    "payload": payloads,
                }
            )

    return typed.mapInPandas(_synth, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# metadata / features / frame sampling over real decodes
# ---------------------------------------------------------------------------

def _decode_meta(payload: bytes, media_type: str):
    """(n_bytes, width, height, n_frames) from the REAL container header."""
    if media_type == "image":
        img = decode_image(bytes(payload))
        return len(payload), img.shape[1], img.shape[0], 1
    if media_type == "audio":
        samples, _rate = decode_audio(bytes(payload))
        return len(payload), int(samples.shape[0]), 1, 1
    vid = decode_video(bytes(payload))
    return len(payload), vid.shape[2], vid.shape[1], vid.shape[0]


def extract_metadata(media: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction — every field parsed from the real
    container header (Arrow batches; numpy decode per payload)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _decode_meta(p, t)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pd.DataFrame(
                metas, columns=["n_bytes", "width", "height", "n_frames"]
            )
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(_extract, META_SCHEMA)


def _feature_histogram(values: np.ndarray) -> np.ndarray:
    """FEATURE_DIM-bin normalized byte histogram (vectorized)."""
    hist = np.bincount(values >> 4, minlength=FEATURE_DIM).astype(np.float32)
    total = hist.sum()
    return hist / total if total else hist


def extract_features(media: DataFrame, normalize: bool = True) -> DataFrame:
    """Decode → FEATURE_DIM per payload: 16-bin histogram over REAL
    decoded content (pixel bytes for image/video, uint8-folded samples
    for audio). ``normalize=True`` (default) yields float32 fractions —
    the ML-pipeline shape; ``normalize=False`` yields exact int64 counts,
    the hash-stable form the DuckDB oracle twin reproduces."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p, t in zip(pdf["payload"], pdf["media_type"]):
                p = bytes(p)
                if t == "image":
                    vals = decode_image(p).reshape(-1)
                elif t == "audio":
                    samples, _ = decode_audio(p)
                    vals = ((samples.astype(np.int32) >> 8) + 128).astype(np.uint8)
                else:
                    vals = decode_video(p).reshape(-1)
                if normalize:
                    feats.append(_feature_histogram(vals))
                else:
                    feats.append(
                        np.bincount(vals >> 4, minlength=FEATURE_DIM).astype(np.int64)
                    )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "feature": feats}
            )

    return media.mapInPandas(
        _features, FEATURE_SCHEMA if normalize else FEATURE_COUNT_SCHEMA
    )


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Nearest-neighbor image resize (decode → resize → re-encode BMP),
    the standardize-resolution stage of a training-data pipeline.

    Pure-numpy NN sampling (``img[np.ix_(ys, xs)]`` with
    ``src = (dst * in_size) // out_size``) per Arrow batch; non-image rows
    are dropped. Returns (doc_id, width, height, payload) where payload is
    a real re-encoded BMP of the resized pixels — decode(resize(x))
    roundtrips exactly (tests/test_multimodal.py)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for d, t, p in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                if t != "image":
                    continue
                img = decode_image(bytes(p))
                h, w = img.shape[:2]
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                res = img[np.ix_(ys, xs)]
                # encode_bmp stores bottom-up; feed rows reversed so
                # decode_image(payload) returns `res` exactly
                ids.append(int(d))
                payloads.append(encode_bmp(out_w, out_h, res[::-1].tobytes()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series([out_w] * len(ids), dtype="int32"),
                    "height": pd.Series([out_h] * len(ids), dtype="int32"),
                    "payload": pd.Series(payloads, dtype=object),
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("payload", BinaryType()),
        ]
    )
    return media.mapInPandas(_resize, schema)


def frame_sample(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame sampling for video payloads: decode the container header and
    explode every ``every_n``-th frame index; the row-multiplication
    partitioning is the production plan shape."""
    meta = extract_metadata(media.filter(F.col("media_type") == "video"))
    return meta.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
