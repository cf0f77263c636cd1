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
