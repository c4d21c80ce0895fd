"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed in Arrow-batched Pandas stages.

The decode step is environment-gated: real codecs (PIL/av/soundfile)
are NOT in this container, so `decode_image` raises NotImplementedError
unless a codec import succeeds, and the default pipeline runs the
DETERMINISTIC FAKE decoder (content-hash derived metadata + fixed-shape
feature vectors). Everything around the decode — schemas, mapInPandas
signatures, batch shapes, partitioning — is real and tested, so wiring
a real codec in is a one-function swap.

Scale notes: media blobs are fat rows — the same
arrow.maxRecordsPerBatch discipline as the extraction kernel applies;
feature extraction is a narrow mapInPandas stage; frame sampling emits
multiple rows per asset via an iterator (no driver involvement).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha256", StringType(), False),
        StructField("features", ArrayType(DoubleType()), False),
    ]
)

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("duration_ms", LongType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_channels", IntegerType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha256", StringType(), False),
        StructField("features", ArrayType(DoubleType()), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("frame_index", IntegerType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("frame_sha256", StringType(), False),
    ]
)

_HAVE_PIL = False
try:  # real codec path — absent in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    pass

_HAVE_SOUNDFILE = False
try:  # real audio codec path — absent in this container
    import soundfile  # noqa: F401

    _HAVE_SOUNDFILE = True
except ImportError:
    pass


def decode_image(payload: bytes) -> "np.ndarray":
    """REAL decode path — requires an image codec.

    Raises NotImplementedError here (no PIL in the container); the
    deterministic fake (`_fake_decode_meta`) carries the pipeline.
    """
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image codec unavailable in this environment; "
            "fake_decode=True uses the deterministic stand-in"
        )
    raise NotImplementedError("real decode intentionally unwired in v0")


def _fake_decode_meta(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in: dimensions + a 16-dim feature vector
    derived from the content digest (stable across runs/partitions)."""
    digest = hashlib.sha256(payload).digest()
    w = 64 + digest[0] * 4
    h = 64 + digest[1] * 4
    feats = (
        np.frombuffer(digest[:16], dtype=np.uint8).astype(np.float64) / 255.0
    )
    return w, h, feats


def image_features_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for b in batches:
        if not len(b):
            continue
        rows = []
        for asset_id, payload in zip(b["asset_id"], b["payload"]):
            payload = payload or b""
            w, h, feats = _fake_decode_meta(payload)
            rows.append(
                (
                    asset_id,
                    w,
                    h,
                    len(payload),
                    hashlib.sha256(payload).hexdigest(),
                    feats.tolist(),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "asset_id",
                "width",
                "height",
                "n_bytes",
                "sha256",
                "features",
            ],
        )


def extract_image_features(media: DataFrame) -> DataFrame:
    """media(asset_id, kind, payload, mime) -> IMAGE_FEATURES_SCHEMA.
    Narrow Arrow-batched stage; non-image rows filtered relationally."""
    return (
        media.where(F.col("kind") == "image")
        .select("asset_id", "payload")
        .mapInPandas(image_features_batch, schema=IMAGE_FEATURES_SCHEMA)
    )


def decode_audio(payload: bytes) -> "np.ndarray":
    """REAL decode path — requires an audio codec (soundfile/av).

    Raises NotImplementedError here (no codec in the container); the
    deterministic fake (`_fake_decode_audio_meta`) carries the
    pipeline, so wiring a real codec in is a one-function swap — the
    Spark-side plumbing (schema, mapInPandas signature, batch shape)
    is identical either way.
    """
    if not _HAVE_SOUNDFILE:
        raise NotImplementedError(
            "audio codec unavailable in this environment; "
            "the deterministic stand-in carries the pipeline"
        )
    raise NotImplementedError("real decode intentionally unwired in v0")


def _fake_decode_audio_meta(
    payload: bytes,
) -> tuple[int, int, int, np.ndarray]:
    """Deterministic audio stand-in: (duration_ms, sample_rate,
    n_channels, 16-dim feature vector), all derived from the content
    sha256 — stable across runs/partitions AND replayable from the hex
    digest in plain SQL (the DuckDB oracle recomputes the identical
    values from substr(sha256_hex, ...)):

    - duration_ms  = 500 + int(hex[4:8], 16)  % 59500   (0.5 - 60 s)
    - sample_rate  = [8000,16000,22050,44100,48000][int(hex[8:10],16) % 5]
    - n_channels   = 1 + int(hex[10:12], 16) % 2
    - features     = digest bytes 16..31 / 255
    """
    digest = hashlib.sha256(payload).digest()
    duration_ms = 500 + int.from_bytes(digest[2:4], "big") % 59500
    sample_rate = (8000, 16000, 22050, 44100, 48000)[digest[4] % 5]
    n_channels = 1 + digest[5] % 2
    feats = (
        np.frombuffer(digest[16:32], dtype=np.uint8).astype(np.float64)
        / 255.0
    )
    return duration_ms, sample_rate, n_channels, feats


def audio_features_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for b in batches:
        if not len(b):
            continue
        rows = []
        for asset_id, payload in zip(b["asset_id"], b["payload"]):
            payload = payload or b""
            dur, sr, ch, feats = _fake_decode_audio_meta(payload)
            rows.append(
                (
                    asset_id,
                    dur,
                    sr,
                    ch,
                    len(payload),
                    hashlib.sha256(payload).hexdigest(),
                    feats.tolist(),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "asset_id",
                "duration_ms",
                "sample_rate",
                "n_channels",
                "n_bytes",
                "sha256",
                "features",
            ],
        )


def extract_audio_features(media: DataFrame) -> DataFrame:
    """media(asset_id, kind, payload, mime) -> AUDIO_FEATURES_SCHEMA.
    The audio twin of :func:`extract_image_features`: non-audio rows
    filtered relationally, then one narrow Arrow-batched stage."""
    return (
        media.where(F.col("kind") == "audio")
        .select("asset_id", "payload")
        .mapInPandas(audio_features_batch, schema=AUDIO_FEATURES_SCHEMA)
    )


def sample_frames_batch(every_ms: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            rows = []
            for asset_id, payload in zip(b["asset_id"], b["payload"]):
                payload = payload or b""
                digest = hashlib.sha256(payload).digest()
                # fake duration: 1-60s derived from content
                duration_ms = 1000 + int.from_bytes(digest[2:4], "big") % 59000
                for i, ts in enumerate(range(0, duration_ms, every_ms)):
                    frame_digest = hashlib.sha256(
                        payload + ts.to_bytes(8, "big")
                    ).hexdigest()
                    rows.append((asset_id, i, ts, frame_digest))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "frame_index", "ts_ms", "frame_sha256"],
            )

    return fn


def sample_video_frames(media: DataFrame, every_ms: int = 5000) -> DataFrame:
    """video assets -> one row per sampled frame (fan-out inside the
    Arrow stage; no collect/driver loop)."""
    return (
        media.where(F.col("kind") == "video")
        .select("asset_id", "payload")
        .mapInPandas(sample_frames_batch(every_ms), schema=FRAME_SCHEMA)
    )
