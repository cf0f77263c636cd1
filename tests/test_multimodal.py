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


# --- real PNG decode (stdlib zlib + unfiltering, no codec lib) --------------


def _gradient_rgb(h, w, seed=7):
    import numpy as np

    base = seed + np.arange(w)[None, :] * 3 + np.arange(h)[:, None] * 5
    return (
        (base[:, :, None] + 85 * np.arange(3)[None, None, :]) % 256
    ).astype(np.uint8)


def test_png_roundtrip_all_filter_types():
    """encode_png(filter f) → decode_png must reproduce the exact pixels
    for every PNG scanline filter (None/Sub/Up/Average/Paeth)."""
    import numpy as np

    from ocr_project_spark.multimodal import decode_png, encode_png

    img = _gradient_rgb(23, 31)
    for f in range(5):
        out = decode_png(encode_png(img, filter_type=f))
        assert out.shape == img.shape
        assert np.array_equal(out, img), f"filter {f} mismatch"


def test_png_gray_matches_netpbm_decode():
    """The netpbm and PNG strict paths must agree pixel-for-pixel on the
    same image (round-trip cross-check per the round-2 verdict)."""
    import numpy as np

    from ocr_project_spark.multimodal import (
        decode_netpbm,
        decode_png,
        encode_png,
        encode_ppm,
    )

    img = _gradient_rgb(17, 29)
    via_ppm = decode_netpbm(encode_ppm(img))
    for f in range(5):
        via_png = decode_png(encode_png(img, filter_type=f))
        assert np.array_equal(via_png, via_ppm)
    # gray color type: single channel replicated like P5
    gray = img[:, :, :1].repeat(3, axis=2)
    assert np.array_equal(decode_png(encode_png(gray, gray=True, filter_type=4)), gray)


def test_png_rgba_and_palette_color_types():
    import struct
    import zlib

    import numpy as np

    from ocr_project_spark.multimodal import PNG_MAGIC, decode_png

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    # RGBA: alpha must be dropped
    h, w = 5, 4
    rgba = (np.arange(h * w * 4, dtype=np.int64) * 37 % 256).astype(np.uint8)
    rgba = rgba.reshape(h, w, 4)
    scan = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
    png = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), rgba[:, :, :3])

    # palette: indices expand through PLTE
    pal = (np.arange(256 * 3, dtype=np.int64) * 11 % 256).astype(np.uint8)
    idx = (np.arange(h * w, dtype=np.int64) * 13 % 256).astype(np.uint8).reshape(h, w)
    scan = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    png = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), pal.reshape(256, 3)[idx])


def test_image_features_strict_on_png(spark):
    """A PNG payload must ride the REAL strict path now (round-2 verdict:
    a real crawl corpus is mostly PNG/JPEG), agreeing with the netpbm
    decode of the same pixels."""
    from ocr_project_spark.multimodal import encode_png, encode_ppm, image_features

    img = _gradient_rgb(700, 900)
    media = spark.createDataFrame(
        [(1, bytearray(encode_png(img, filter_type=2))),
         (2, bytearray(encode_ppm(img)))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in image_features(media, decode="strict").collect()}
    assert rows[1]["width"] == 900 and rows[1]["height"] == 700
    assert rows[1]["feature"] == rows[2]["feature"]
    assert rows[1]["n_tokens"] == rows[2]["n_tokens"]


def test_image_tiles_strict_on_png(spark):
    from ocr_project_spark.multimodal import encode_png, encode_ppm, image_tiles

    img = _gradient_rgb(650, 1300)
    media = spark.createDataFrame(
        [(1, bytearray(encode_png(img, filter_type=1))),
         (2, bytearray(encode_ppm(img)))],
        "media_id long, payload binary",
    )
    tiles = image_tiles(media, decode="strict").collect()
    by_media = {}
    for r in tiles:
        by_media.setdefault(r["media_id"], {})[r["tile_idx"]] = r["tile_sha256"]
    # identical pixels → identical tile hashes through either container
    assert by_media[1] == by_media[2] and len(by_media[1]) >= 2


def test_image_pixel_stats_strict_and_corrupt(spark):
    import numpy as np

    from ocr_project_spark.multimodal import encode_png, image_pixel_stats

    img = _gradient_rgb(9, 11)
    media = spark.createDataFrame(
        [(1, bytearray(encode_png(img, filter_type=3))),
         (2, bytearray(b"\xff\xd8\xff\xe0 jpeg-ish")),
         (3, bytearray(b"\x89PNG\r\n\x1a\n truncated"))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in image_pixel_stats(media, decode="strict").collect()}
    assert rows[1]["width"] == 11 and rows[1]["height"] == 9
    assert rows[1]["pixel_sum"] == int(img.astype(np.int64).sum())
    assert not rows[1]["corrupt"]
    assert rows[2]["corrupt"] and rows[3]["corrupt"]


def test_png_corrupt_idat_is_valueerror_not_batch_death():
    """A structurally valid PNG with a corrupt/truncated IDAT stream must
    raise ValueError from decode_png (NOT zlib.error/struct.error/IndexError,
    which would kill the whole Arrow batch in image_pixel_stats)."""
    import struct
    import zlib

    import pytest

    from ocr_project_spark.multimodal import (
        PNG_MAGIC,
        corrupt_png_idat,
        decode_png,
        encode_png,
    )

    img = _gradient_rgb(9, 11)
    good = encode_png(img, filter_type=4)

    # truncated deflate stream, intact chunk framing
    with pytest.raises(ValueError, match="corrupt PNG compressed stream"):
        decode_png(corrupt_png_idat(good))

    # flipped byte inside the IDAT body (adler32 mismatch or bad deflate)
    flipped = bytearray(good)
    idat_off = good.index(b"IDAT") + 8
    flipped[idat_off] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(flipped))

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    # short IHDR → ValueError, not struct.error
    png = (
        PNG_MAGIC
        + chunk(b"IHDR", b"\x00\x00\x00\x05")
        + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="short IHDR"):
        decode_png(png)

    # palette index beyond a short PLTE → ValueError, not IndexError
    import numpy as np

    idx = np.full((3, 4), 9, dtype=np.uint8)  # index 9, palette holds 4
    scan = b"".join(b"\x00" + idx[y].tobytes() for y in range(3))
    png = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", bytes(range(12)))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette index"):
        decode_png(png)


def test_png_corrupt_idat_yields_corrupt_row(spark):
    """End-to-end: the corrupt-IDAT payload flows through image_pixel_stats
    as a corrupt row while its batch-mates decode normally."""
    import numpy as np

    from ocr_project_spark.multimodal import (
        corrupt_png_idat,
        encode_png,
        image_pixel_stats,
    )

    img = _gradient_rgb(9, 11)
    good = encode_png(img, filter_type=2)
    media = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(corrupt_png_idat(good)))],
        "media_id long, payload binary",
    )
    rows = {
        r["media_id"]: r
        for r in image_pixel_stats(media, decode="strict").collect()
    }
    assert not rows[1]["corrupt"]
    assert rows[1]["pixel_sum"] == int(img.astype(np.int64).sum())
    assert rows[2]["corrupt"] and rows[2]["pixel_sum"] == 0


def test_png_paeth_decode_throughput():
    """The documented decode budget for the worst-case filter: a 1024×1024
    RGB all-Paeth PNG (3 MB of pixel data, the sequential-scan path) must
    decode well under 10 s — the tight scalar scan does it in ~1 s; the old
    per-element numpy loop took >10× that."""
    import time

    import numpy as np

    from ocr_project_spark.multimodal import decode_png, encode_png

    rng_free = (
        np.arange(1024, dtype=np.int64)[:, None] * 7
        + np.arange(1024, dtype=np.int64)[None, :] * 13
    )
    img = (
        (rng_free[:, :, None] + 85 * np.arange(3)[None, None, :]) % 256
    ).astype(np.uint8)
    payload = encode_png(img, filter_type=4)
    t0 = time.monotonic()
    out = decode_png(payload)
    elapsed = time.monotonic() - t0
    assert np.array_equal(out, img)
    assert elapsed < 10.0, f"Paeth decode took {elapsed:.1f}s for 3 MB of pixels"


def test_synthesize_png_media_sql_contract(spark):
    """The planted-PNG contract the driver oracle replays: width, height
    and pixel_sum are the documented pure functions of the id."""
    import numpy as np

    from ocr_project_spark.multimodal import image_pixel_stats, synthesize_png_media

    the_ids = list(range(0, 40, 3)) + [7, 38]  # 7, 38 ≡ 7 (mod 31) → corrupt
    ids = spark.createDataFrame([(i,) for i in the_ids], "doc_id long")
    out = {
        r["media_id"]: r
        for r in image_pixel_stats(
            synthesize_png_media(ids), decode="strict"
        ).collect()
    }
    for i in the_ids:
        r = out[i]
        if i % 31 == 7:
            assert (r["width"], r["height"], r["pixel_sum"], r["corrupt"]) == (
                0,
                0,
                0,
                True,
            )
            continue
        w, h = 16 + i % 48, 12 + (i // 7) % 36
        base = i + np.arange(w)[None, :] + 2 * np.arange(h)[:, None]
        if i % 2 == 0:
            expect = 3 * int((base % 256).sum())
        else:
            expect = int(
                ((base[:, :, None] + 85 * np.arange(3)[None, None, :]) % 256).sum()
            )
        assert (r["width"], r["height"], r["pixel_sum"], r["corrupt"]) == (
            w,
            h,
            expect,
            False,
        )


# --- real Y4M video decode (codec-free container) ---------------------------


def _luma_frames(n, h, w, seed=3):
    import numpy as np

    base = seed + np.arange(w)[None, :] + 2 * np.arange(h)[:, None]
    return [((base + 3 * t) % 256).astype(np.uint8) for t in range(n)]


def test_y4m_roundtrip():
    import numpy as np

    from ocr_project_spark.multimodal import decode_y4m, encode_y4m

    frames = _luma_frames(4, 12, 16)
    decoded, w, h, fps = decode_y4m(encode_y4m(frames, fps=(25, 1)))
    assert (w, h, fps) == (16, 12, (25, 1))
    assert len(decoded) == 4
    for (luma, raw), orig in zip(decoded, frames):
        assert np.array_equal(luma, orig)


def test_y4m_truncated_tail_frame_dropped():
    from ocr_project_spark.multimodal import decode_y4m, encode_y4m

    payload = encode_y4m(_luma_frames(3, 8, 8))
    decoded, *_ = decode_y4m(payload[:-10])  # cut into the last frame
    assert len(decoded) == 2


def test_frame_sampling_arithmetic():
    from ocr_project_spark.multimodal import _sampled_frame_indices

    # 30 fps, 1 s sampling → frames 0, 30, 60
    assert _sampled_frame_indices(75, (30, 1), 1000) == [0, 30, 60]
    # sampling faster than the frame rate dedups to every frame
    assert _sampled_frame_indices(3, (10, 1), 10) == [0, 1, 2]
    # NTSC-style fractional rate
    assert _sampled_frame_indices(90, (30000, 1001), 1000) == [0, 29, 59, 89]


def test_sample_frames_strict_real_y4m(spark):
    import hashlib

    from ocr_project_spark.multimodal import encode_y4m, sample_frames

    frames = _luma_frames(5, 10, 14)
    payload = encode_y4m(frames, fps=(10, 1))
    media = spark.createDataFrame(
        [(7, bytearray(payload), ("video/x-y4m", None, None, None))],
        "media_id long, payload binary, "
        "meta struct<mime string, width int, height int, duration_ms int>",
    )
    out = sample_frames(media, every_ms=100, decode="strict").collect()
    assert [r["frame_idx"] for r in sorted(out, key=lambda r: r["frame_idx"])] == list(range(5))
    # content hash = sha256 of the frame's raw plane bytes, recomputed here
    neutral = b"\x80" * (10 * 14)
    for r in out:
        expect = hashlib.sha256(
            frames[r["frame_idx"]].tobytes() + neutral + neutral
        ).hexdigest()
        assert r["frame_sha256"] == expect


def test_sample_frames_strict_rejects_codec_containers(spark):
    import pytest as _pytest

    from ocr_project_spark.multimodal import sample_frames

    media = spark.createDataFrame(
        [(1, bytearray(b"\x00\x00\x00\x20ftypisom fake-mp4"), ("video/mp4", None, None, 2000))],
        "media_id long, payload binary, "
        "meta struct<mime string, width int, height int, duration_ms int>",
    )
    with _pytest.raises(Exception, match="codec library"):
        sample_frames(media, decode="strict").collect()


def test_frame_pixel_stats_matches_planted_formula(spark):
    import numpy as np

    from ocr_project_spark.multimodal import frame_pixel_stats, synthesize_y4m_media

    ids = spark.createDataFrame([(i,) for i in range(0, 30, 3)], "doc_id long")
    out = frame_pixel_stats(
        synthesize_y4m_media(ids), every_ms=100, decode="strict"
    ).collect()
    seen = set()
    for r in out:
        i, t = r["media_id"], r["frame_idx"]
        w, h = 8 + i % 24, 6 + (i // 5) % 18
        base = i + np.arange(w)[None, :] + 2 * np.arange(h)[:, None]
        assert (r["width"], r["height"]) == (w, h)
        assert r["luma_sum"] == int(((base + 3 * t) % 256).sum())
        seen.add((i, t))
    for i in range(0, 30, 3):
        assert sum(1 for a, _ in seen if a == i) == 2 + i % 4


def test_frame_sampling_rejects_nonpositive_interval():
    from ocr_project_spark.multimodal import _sampled_frame_indices

    with pytest.raises(ValueError, match="positive"):
        _sampled_frame_indices(10, (30, 1), 0)
