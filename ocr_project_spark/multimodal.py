"""Multimodal column operators for the training-data pipeline.

Images / audio / video ride through the engine as opaque ``binary`` columns
with typed metadata structs (the same pattern as the ``html`` payload column:
bytes stay in the DataFrame, no temp files — SURVEY §2.1 S3). The Spark-side
plumbing — schemas, Arrow batch shapes, ``mapInPandas`` signatures,
partitioning behavior — is real and tested. Decode has three tiers:

- binary netpbm (P6 RGB / P5 gray) payloads decode FOR REAL in
  ``decode=\"strict\"`` mode — header parse + numpy pixel view, no codec
  library needed — feeding genuine dimensions and a luminance-grid content
  feature;
- other formats (JPEG/PNG/audio/video) raise NotImplementedError in strict
  mode (the honest production posture until a codec dependency lands on
  the executors);
- ``decode=\"fake\"`` is a deterministic pure function of the payload bytes
  (stable across executors/runs), which keeps every downstream operator —
  feature extraction, resize bookkeeping, frame sampling, dedup joins —
  fully exercisable at full scale for any format.

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
    "n_tokens int, sha256 string, feature array<float>"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_sha256 string"

FEATURE_DIM = 16


PPM_MAGIC = b"P6"
PGM_MAGIC = b"P5"


def decode_netpbm(payload: bytes) -> np.ndarray:
    """REAL image decode for the binary netpbm formats (P6 RGB / P5 gray) —
    parseable with numpy alone, no codec library. Returns (h, w, 3) uint8.
    Raises ValueError for anything else (JPEG/PNG/… need a codec dependency
    on the executors — the strict-mode NotImplementedError path)."""
    magic = payload[:2]
    if magic not in (PPM_MAGIC, PGM_MAGIC):
        raise ValueError(f"not a binary netpbm payload (magic {magic!r})")
    # header: magic, whitespace/comment-separated width height maxval, then
    # ONE whitespace byte, then raw samples
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    channels = 3 if magic == PPM_MAGIC else 1
    n = width * height * channels
    pix = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    img = pix.reshape(height, width, channels)
    if channels == 1:
        img = np.repeat(img, 3, axis=2)
    return img


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM bytes (the test-fixture inverse)."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


GRID = 4  # real features: GRID×GRID luminance-mean grid → FEATURE_DIM


def _real_feature(img: np.ndarray) -> np.ndarray:
    """Deterministic content feature from decoded pixels: a GRID×GRID grid
    of mean luminance values, unit-normalized — the classic thumbnail-hash
    embedding for near-dup search over images."""
    lum = img.astype(np.float64).mean(axis=2)
    h, w = lum.shape
    cells = np.empty((GRID, GRID), dtype=np.float64)
    for r in range(GRID):
        for c in range(GRID):
            cells[r, c] = lum[
                r * h // GRID : max((r + 1) * h // GRID, r * h // GRID + 1),
                c * w // GRID : max((c + 1) * w // GRID, c * w // GRID + 1),
            ].mean()
    vec = cells.reshape(-1) - cells.mean()
    norm = np.linalg.norm(vec)
    if norm < 1e-12:
        vec = np.ones(FEATURE_DIM) / np.sqrt(FEATURE_DIM)
        return vec.astype(np.float32)
    return (vec / norm).astype(np.float32)


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
    (process/image_process.py:21-111 — D2/D3), and ``n_tokens`` is the
    reference's exact token-interleave count for that plan
    (image_process.py:383-401) — the per-document cost model for skew /
    batch-budget control at scale (SURVEY §2.4 M2)."""
    from ocr_project_spark.functions.markers import tiling_plan, vision_token_cost

    if decode not in ("strict", "fake"):
        raise ValueError(f"unknown decode mode: {decode}")

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                if decode == "fake":
                    w, h = _fake_decode_dims(data)
                    feature = _fake_feature(data)
                elif data[:2] in (PPM_MAGIC, PGM_MAGIC):
                    # REAL decode path: binary netpbm needs no codec library
                    img = decode_netpbm(data)
                    h, w = img.shape[:2]
                    feature = _real_feature(img)
                else:
                    raise NotImplementedError(
                        "this payload format requires a codec library on "
                        "the executors (none in this environment); binary "
                        "netpbm (P5/P6) decodes natively, or use "
                        "decode='fake' for the deterministic stand-in"
                    )
                tw, th = tiling_plan(w, h)
                rows.append(
                    {
                        "media_id": int(media_id),
                        "width": w,
                        "height": h,
                        "n_tiles_w": tw,
                        "n_tiles_h": th,
                        "n_tokens": vision_token_cost(w, h),
                        "sha256": hashlib.sha256(data).hexdigest(),
                        "feature": feature,
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
                    "n_tokens",
                    "sha256",
                    "feature",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        _batches, schema=IMAGE_FEATURE_SCHEMA
    )


TILE_SCHEMA = (
    "media_id long, tile_idx int, n_tiles_w int, n_tiles_h int, "
    "tile_sha256 string"
)
TILE_SIZE = 640  # reference process/config.py:8 IMAGE_SIZE


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy index mapping — deterministic,
    no codec/interp library): (h, w, c) → (height, width, c)."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return img[ys[:, None], xs[None, :]]


def image_tiles(media: DataFrame, decode: str = "strict") -> DataFrame:
    """The reference's dynamic-tiling preprocessing as a 1→N operator
    (process/image_process.py:88-111: resize to the chosen tile grid, then
    crop ``TILE_SIZE``² tiles): decode → tiling plan → nearest-neighbor
    resize to (640·nw, 640·nh) → one row per tile with its content hash.
    Real for netpbm payloads; ``fake`` derives per-tile digests without
    pixels (the full-scale plumbing drill). Explode shape mirrors
    doc→pages (D1)."""
    from ocr_project_spark.functions.markers import tiling_plan

    if decode not in ("strict", "fake"):
        raise ValueError(f"unknown decode mode: {decode}")

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                if decode == "fake":
                    w, h = _fake_decode_dims(data)
                    tw, th = tiling_plan(w, h)
                    for idx in range(tw * th):
                        rows.append(
                            {
                                "media_id": int(media_id),
                                "tile_idx": idx,
                                "n_tiles_w": tw,
                                "n_tiles_h": th,
                                "tile_sha256": hashlib.sha256(
                                    data + b"#tile-%d" % idx
                                ).hexdigest(),
                            }
                        )
                    continue
                if data[:2] not in (PPM_MAGIC, PGM_MAGIC):
                    raise NotImplementedError(
                        "this payload format requires a codec library; "
                        "binary netpbm (P5/P6) decodes natively, or use "
                        "decode='fake'"
                    )
                img = decode_netpbm(data)
                h, w = img.shape[:2]
                tw, th = tiling_plan(w, h)
                resized = resize_nearest(img, TILE_SIZE * tw, TILE_SIZE * th)
                for idx in range(tw * th):
                    r, c = divmod(idx, tw)
                    tile = resized[
                        r * TILE_SIZE : (r + 1) * TILE_SIZE,
                        c * TILE_SIZE : (c + 1) * TILE_SIZE,
                    ]
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "tile_idx": idx,
                            "n_tiles_w": tw,
                            "n_tiles_h": th,
                            "tile_sha256": hashlib.sha256(
                                np.ascontiguousarray(tile).tobytes()
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "tile_idx",
                    "n_tiles_w",
                    "n_tiles_h",
                    "tile_sha256",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        _batches, schema=TILE_SCHEMA
    )


AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, duration_ms long, "
    "rms_x1000 long, zero_crossings long"
)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL audio decode for RIFF/WAVE PCM (8- or 16-bit) — chunk walk with
    stdlib struct + numpy sample view, no codec library. Returns
    (mono float64 samples in [-1, 1], sample_rate). Raises ValueError for
    non-WAV payloads and unsupported encodings."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV encoding (fmt={audio_format}, bits={bits})")
    if bits == 16:
        raw = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
        samples = raw.astype(np.float64) / 32768.0
    else:
        raw = np.frombuffer(data, dtype=np.uint8)
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    if channels > 1:
        n = len(samples) // channels * channels
        samples = samples[:n].reshape(-1, channels).mean(axis=1)
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """mono float [-1,1] → 16-bit PCM WAV bytes (the test-fixture inverse)."""
    import struct

    pcm = (np.clip(samples, -1.0, 1.0) * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def audio_features(media: DataFrame, decode: str = "strict") -> DataFrame:
    """binary audio column → (sample_rate, sample/duration counts, RMS
    energy, zero crossings) — the silence/clipping/energy gates an audio
    training pipeline filters on. RIFF/WAVE PCM decodes FOR REAL (see
    :func:`decode_wav`); compressed codecs raise in strict mode; ``fake``
    is the digest-derived stand-in. Integer-scaled outputs
    (``rms_x1000``)."""
    if decode not in ("strict", "fake"):
        raise ValueError(f"unknown decode mode: {decode}")

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                if decode == "fake":
                    digest = hashlib.sha256(data).digest()
                    rate = 8000 + int.from_bytes(digest[0:2], "big") % 40000
                    n = 1000 + int.from_bytes(digest[2:5], "big") % 100000
                    rms = int.from_bytes(digest[5:7], "big") % 1000
                    zc = int.from_bytes(digest[7:10], "big") % n
                elif data[:4] == b"RIFF":
                    samples, rate = decode_wav(data)
                    n = len(samples)
                    rms = int(np.sqrt(np.mean(samples**2)) * 1000) if n else 0
                    zc = int(np.count_nonzero(np.diff(np.signbit(samples))))
                else:
                    raise NotImplementedError(
                        "this audio format requires a codec library on the "
                        "executors; RIFF/WAVE PCM decodes natively, or use "
                        "decode='fake' for the deterministic stand-in"
                    )
                rows.append(
                    {
                        "media_id": int(media_id),
                        "sample_rate": rate,
                        "n_samples": n,
                        "duration_ms": n * 1000 // max(rate, 1),
                        "rms_x1000": rms,
                        "zero_crossings": zc,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_samples",
                    "duration_ms",
                    "rms_x1000",
                    "zero_crossings",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        _batches, schema=AUDIO_FEATURE_SCHEMA
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
