"""Multimodal column operators for the training-data pipeline.

Images / audio / video ride through the engine as opaque ``binary`` columns
with typed metadata structs (the same pattern as the ``html`` payload column:
bytes stay in the DataFrame, no temp files — SURVEY §2.1 S3). The Spark-side
plumbing — schemas, Arrow batch shapes, ``mapInPandas`` signatures,
partitioning behavior — is real and tested; the actual media decode is
STUBBED because no image/audio codec libraries exist in this container:

- ``decode=\"strict\"``  → raises NotImplementedError (the honest production
  posture until a codec dependency lands on the executors);
- ``decode=\"fake\"``    → a deterministic pure function of the payload bytes
  (stable across executors/runs), which keeps every downstream operator —
  feature extraction, resize bookkeeping, frame sampling, dedup joins —
  fully exercisable at full scale.

Everything is Arrow-batched ``mapInPandas``; per-row work happens inside the
batch loop on the executor, never at the DataFrame level.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURE_SCHEMA = (
    "media_id long, width int, height int, n_tiles_w int, n_tiles_h int, "
    "sha256 string, feature array<float>"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_sha256 string"

FEATURE_DIM = 16


def _fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decode: dimensions derived from a
    stable digest of the bytes (range chosen to exercise the tiling paths,
    including the ≤640 bypass)."""
    digest = hashlib.sha256(payload).digest()
    width = 320 + int.from_bytes(digest[0:2], "big") % 1600
    height = 320 + int.from_bytes(digest[2:4], "big") % 1600
    return width, height


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic unit-norm feature vector from the payload digest."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((4 * FEATURE_DIM) // len(digest) + 1))[: 4 * FEATURE_DIM], dtype=np.uint32)
    vec = (raw.astype(np.float64) / np.iinfo(np.uint32).max) - 0.5
    norm = np.linalg.norm(vec)
    return (vec / norm).astype(np.float32)


def image_features(media: DataFrame, decode: str = "strict") -> DataFrame:
    """binary image column → (dims, tile plan, content hash, feature vector).

    The tile plan reuses the reference's deterministic tiling math
    (process/image_process.py:21-111 — D2/D3), which at scale doubles as the
    per-document cost model for skew control (SURVEY §2.4 M2)."""
    from ocr_project_spark.functions.markers import tiling_plan

    if decode not in ("strict", "fake"):
        raise ValueError(f"unknown decode mode: {decode}")

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "strict":
                raise NotImplementedError(
                    "image decode requires a codec library on the executors "
                    "(none in this environment); use decode='fake' for the "
                    "deterministic stand-in"
                )
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                w, h = _fake_decode_dims(data)
                tw, th = tiling_plan(w, h)
                rows.append(
                    {
                        "media_id": int(media_id),
                        "width": w,
                        "height": h,
                        "n_tiles_w": tw,
                        "n_tiles_h": th,
                        "sha256": hashlib.sha256(data).hexdigest(),
                        "feature": _fake_feature(data),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "n_tiles_w",
                    "n_tiles_h",
                    "sha256",
                    "feature",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        _batches, schema=IMAGE_FEATURE_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000, decode: str = "strict"
) -> DataFrame:
    """video → 1→N frame sample rows (explode shape, like doc→pages D1).

    Frame count derives from ``meta.duration_ms``; each sampled frame gets a
    deterministic content id (digest of payload + frame index in the fake
    decode). Real frame extraction is the stubbed step."""
    if decode not in ("strict", "fake"):
        raise ValueError(f"unknown decode mode: {decode}")

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "strict":
                raise NotImplementedError(
                    "video decode requires a codec library on the executors; "
                    "use decode='fake' for the deterministic stand-in"
                )
            rows = []
            for media_id, payload, duration in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                data = bytes(payload)
                n_frames = max(int(duration) // every_ms, 1)
                for i in range(n_frames):
                    # ASCII frame suffix: a pure byte-level function that a
                    # SQL differential oracle can replay (sha256(payload ||
                    # '#frame-' || i)) when the payload is valid text
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "frame_idx": i,
                            "frame_sha256": hashlib.sha256(
                                data + b"#frame-%d" % i
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_sha256"]
            )

    return media.select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    ).mapInPandas(_batches, schema=FRAME_SAMPLE_SCHEMA)


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media fixture table (no external data): payload bytes
    are a pure function of media_id."""
    rows = []
    for media_id in range(n):
        kind = ("image", "audio", "video")[media_id % 3]
        payload = hashlib.sha256(f"media-{media_id}".encode()).digest() * (
            1 + media_id % 7
        )
        rows.append(
            (
                media_id,
                kind,
                bytearray(payload),
                ("application/octet-stream", None, None, 500 + 700 * (media_id % 5)),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
