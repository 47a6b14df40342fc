"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery — schema, Arrow batch shape, mapInPandas UDF
signatures, partitioning — is real and tested. The actual byte decoding is
STUBBED: the image/audio codec libraries are not in this container, so
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless a
decoder import succeeds, and the feature/resize/frame-sample operators run on
a clearly-marked deterministic fake decode (bytes → hash-derived values) so
the distributed plumbing is exercised end-to-end.

Swap-in point for production: replace ``_fake_decode`` with PIL/libav calls —
the batching, schema, and partition behavior do not change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
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
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                    StructField("format", StringType()),
                ]
            ),
        ),
    ]
)

_KINDS = ("image", "audio", "video")


def synthesize_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (seeded bytes; payload ~1 KiB)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id in pdf["id"]:
                media_id = int(media_id)
                kind = _KINDS[media_id % 3]
                payload = hashlib.blake2b(
                    f"{seed}:{media_id}".encode(), digest_size=32
                ).digest() * 32
                meta = {
                    "width": 64 + (media_id % 8) * 32 if kind == "image" else None,
                    "height": 64 + (media_id % 5) * 32 if kind == "image" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                    "duration_ms": 1000 + media_id % 5000 if kind != "image" else None,
                    "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                }
                rows.append((media_id, kind, payload, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(0, n, 1).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decoder_available() -> bool:
    try:  # pragma: no cover - decoder libs absent in this container
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def decode_image(payload: bytes, meta: dict) -> "np.ndarray":
    """Real decode path — STUB: raises unless a decoder is installed."""
    if not _decoder_available():
        raise NotImplementedError(
            "image decode requires PIL/pillow, not present in this container; "
            "the pipeline uses the deterministic fake decode instead"
        )
    import io

    import PIL.Image

    return np.asarray(PIL.Image.open(io.BytesIO(payload)))  # pragma: no cover


def _fake_decode(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic FAKE decode: payload bytes tiled into an (h, w) uint8
    array. Stands in for codec output so downstream ops are exercised."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    need = h * w
    reps = -(-need // len(buf))
    return np.tile(buf, reps)[:need].reshape(h, w)


FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("features", StringType()),  # csv of FEATURE_DIM floats
        StructField("n_bytes", LongType()),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Per-item feature vector via mapInPandas (batch shape = Arrow batch).

    Features: FEATURE_DIM bucket-means of the (fake-)decoded array — a stand-
    in for a CNN/embedding forward pass with the same batching profile.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = _fake_decode(bytes(payload), 32, 32).astype(np.float64)
                chunks = np.array_split(arr.ravel(), FEATURE_DIM)
                vec = [round(float(c.mean()), 6) for c in chunks]
                feats.append(",".join(str(v) for v in vec))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("payload_out", BinaryType()),
    ]
)


def resize_images(media: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """Resize (nearest-neighbor on the fake decode) — images only; shows the
    filter-then-map plumbing with binary output columns."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for payload in pdf["payload"]:
                arr = _fake_decode(bytes(payload), 32, 32)
                ys = (np.arange(out_h) * 32 // out_h)[:, None]
                xs = (np.arange(out_w) * 32 // out_w)[None, :]
                outs.append(arr[ys, xs].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "payload_out": outs,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video rows: 1 (fake) frame per ``every_ms`` of
    duration — a 1→N fan-out mapInPandas, the same shape as real ffmpeg
    frame extraction."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                duration = (meta or {}).get("duration_ms") or 0
                n_frames = max(1, duration // every_ms)
                for i in range(int(n_frames)):
                    ids.append(media_id)
                    idxs.append(i)
                    frames.append(
                        hashlib.blake2b(
                            bytes(payload)[:64] + i.to_bytes(4, "big"), digest_size=16
                        ).digest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(run, schema=FRAME_SCHEMA)
