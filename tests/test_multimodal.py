"""Multimodal plumbing tests: schemas, batch shapes, explode semantics, and
the strict-vs-fake decode gate (the decode itself is stubbed — no codec libs
in this container; the Spark mechanics are real).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_project_spark.multimodal import (
    FEATURE_DIM,
    image_features,
    sample_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, n=24).cache()


def test_media_fixture_schema(media):
    assert media.count() == 24
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_strict_decode_raises(media):
    with pytest.raises(Exception) as exc_info:
        image_features(media, decode="strict").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_unknown_decode_mode_rejected(media):
    with pytest.raises(ValueError, match="unknown decode mode"):
        image_features(media, decode="nope")


def test_image_features_deterministic(media):
    rows1 = {r["media_id"]: r for r in image_features(media, decode="fake").collect()}
    rows2 = {r["media_id"]: r for r in image_features(media, decode="fake").collect()}
    assert len(rows1) == 24
    for mid, r in rows1.items():
        assert r["sha256"] == rows2[mid]["sha256"]
        assert r["feature"] == rows2[mid]["feature"]
        assert len(r["feature"]) == FEATURE_DIM
        # tiling plan obeys the reference bounds: bypass (1,1) or 2..6 tiles
        n_tiles = r["n_tiles_w"] * r["n_tiles_h"]
        assert n_tiles == 1 or 2 <= n_tiles <= 6
        assert r["width"] > 0 and r["height"] > 0


def test_feature_unit_norm(media):
    import math

    row = image_features(media, decode="fake").first()
    norm = math.sqrt(sum(x * x for x in row["feature"]))
    assert abs(norm - 1.0) < 1e-3


def test_frame_sampling_explode(media):
    frames = sample_frames(media, every_ms=500, decode="fake")
    per_media = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    durations = {r["media_id"]: r["meta"]["duration_ms"] for r in media.collect()}
    assert per_media.keys() == durations.keys()
    for mid, n in per_media.items():
        assert n == max(durations[mid] // 500, 1)
    # frame ids unique and deterministic
    ids = [r["frame_sha256"] for r in frames.collect()]
    assert len(ids) == len(set(ids))


def _ppm_media(spark, n=8):
    import numpy as np

    from ocr_project_spark.multimodal import encode_ppm

    rows = []
    dims = []
    for media_id in range(n):
        w, h = 40 + media_id * 100, 30 + media_id * 80
        # deterministic gradient pattern per image
        img = np.fromfunction(
            lambda y, x, c: (x * (media_id + 1) + y * 3 + c * 50) % 256,
            (h, w, 3),
            dtype=np.int64,
        ).astype(np.uint8)
        rows.append((media_id, "image", bytearray(encode_ppm(img)),
                     ("image/x-portable-pixmap", w, h, None)))
        dims.append((media_id, w, h))
    from ocr_project_spark.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA), dims


def test_real_netpbm_decode_roundtrip():
    import numpy as np

    from ocr_project_spark.multimodal import decode_netpbm, encode_ppm

    img = (np.arange(5 * 7 * 3).reshape(5, 7, 3) % 256).astype("uint8")
    assert np.array_equal(decode_netpbm(encode_ppm(img)), img)
    # P5 grayscale replicates into 3 channels; comments tolerated
    pgm = b"P5\n# a comment\n3 2\n255\n" + bytes(range(6))
    out = decode_netpbm(pgm)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out[:, :, 0], np.arange(6, dtype="uint8").reshape(2, 3))


def test_image_features_real_decode(spark):
    """Strict mode REALLY decodes netpbm payloads: true dimensions, a
    content feature from actual pixels, deterministic across runs."""
    from ocr_project_spark.multimodal import image_features

    media, dims = _ppm_media(spark)
    rows = {r["media_id"]: r for r in image_features(media, decode="strict").collect()}
    for media_id, w, h in dims:
        assert (rows[media_id]["width"], rows[media_id]["height"]) == (w, h)
        n_tiles = rows[media_id]["n_tiles_w"] * rows[media_id]["n_tiles_h"]
        assert n_tiles == 1 or 2 <= n_tiles <= 6
    rows2 = {r["media_id"]: r for r in image_features(media, decode="strict").collect()}
    for media_id in rows:
        assert rows[media_id]["feature"] == rows2[media_id]["feature"]
    # distinct images → distinct features
    feats = {tuple(r["feature"]) for r in rows.values()}
    assert len(feats) == len(rows)


def test_strict_mode_still_raises_on_undecodable(spark, media):
    """Non-netpbm payloads keep the honest NotImplementedError posture."""
    import pytest as _pytest

    from ocr_project_spark.multimodal import image_features

    with _pytest.raises(Exception) as exc_info:
        image_features(media, decode="strict").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_real_wav_decode_roundtrip():
    import numpy as np

    from ocr_project_spark.multimodal import decode_wav, encode_wav

    t = np.arange(8000) / 8000.0
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    samples, rate = decode_wav(encode_wav(sine, 8000))
    assert rate == 8000 and len(samples) == 8000
    assert np.max(np.abs(samples - sine)) < 1e-3  # 16-bit quantization


def test_audio_features_real_decode(spark):
    """Strict mode really decodes WAV: duration from the header, RMS of a
    0.5-amplitude sine ≈ 0.354, zero crossings ≈ 2·f·duration."""
    import numpy as np

    from ocr_project_spark.multimodal import MEDIA_SCHEMA, audio_features, encode_wav

    rows = []
    for media_id, freq in ((0, 440), (1, 100)):
        t = np.arange(16000) / 8000.0  # 2 seconds at 8 kHz
        wav = encode_wav(0.5 * np.sin(2 * np.pi * freq * t), 8000)
        rows.append((media_id, "audio", bytearray(wav),
                     ("audio/wav", None, None, 2000)))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in audio_features(media, decode="strict").collect()}
    for media_id, freq in ((0, 440), (1, 100)):
        r = out[media_id]
        assert r["sample_rate"] == 8000 and r["duration_ms"] == 2000
        assert abs(r["rms_x1000"] - 354) <= 2  # 0.5/sqrt(2)
        assert abs(r["zero_crossings"] - 2 * freq * 2) <= 2


def test_audio_strict_raises_on_undecodable(spark, media):
    import pytest as _pytest

    from ocr_project_spark.multimodal import audio_features

    with _pytest.raises(Exception) as exc_info:
        audio_features(media, decode="strict").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_audio_features_fake_deterministic(spark, media):
    from ocr_project_spark.multimodal import audio_features

    a = audio_features(media, decode="fake").collect()
    b = audio_features(media, decode="fake").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_resize_nearest_properties():
    import numpy as np

    from ocr_project_spark.multimodal import resize_nearest

    img = (np.arange(6 * 4 * 3).reshape(6, 4, 3) % 256).astype("uint8")
    up = resize_nearest(img, 8, 12)
    assert up.shape == (12, 8, 3)
    # identity resize is exact; corners map to corners
    assert np.array_equal(resize_nearest(img, 4, 6), img)
    assert np.array_equal(up[0, 0], img[0, 0])


def test_image_tiles_real_decode(spark):
    """Real tiling path: tile count equals the plan, tiles are 640² crops of
    the nearest-neighbor resize, deterministic across runs."""
    from ocr_project_spark.multimodal import image_tiles

    media, dims = _ppm_media(spark)
    rows = [r.asDict() for r in image_tiles(media, decode="strict").collect()]
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    from ocr_project_spark.functions.markers import tiling_plan

    for media_id, w, h in dims:
        tiles = by_media[media_id]
        tw, th = tiling_plan(w, h)
        assert len(tiles) == tw * th
        assert {t["tile_idx"] for t in tiles} == set(range(tw * th))
        assert all((t["n_tiles_w"], t["n_tiles_h"]) == (tw, th) for t in tiles)
    rows2 = [r.asDict() for r in image_tiles(media, decode="strict").collect()]
    assert sorted(map(tuple, (r.values() for r in rows))) == sorted(
        map(tuple, (r.values() for r in rows2))
    )


def test_image_tiles_fake_plumbing(spark, media):
    from ocr_project_spark.multimodal import image_tiles

    rows = image_tiles(media, decode="fake").collect()
    assert rows
    ids = [(r["media_id"], r["tile_idx"]) for r in rows]
    assert len(ids) == len(set(ids))
