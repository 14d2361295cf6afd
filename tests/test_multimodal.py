"""Multimodal plumbing tests: schemas, batch iteration, fan-out,
determinism of the stubbed codec (SURVEY §7.6)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_data_lakehouse_demo_spark.operators import multimodal as mm
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    return mm.synth_media_from_documents(docs).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "payload", "meta"]
    meta_names = [f.name for f in media.schema["meta"].dataType.fields]
    assert meta_names == ["width", "height", "sample_rate", "duration_ms", "codec"]
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_image_features_deterministic(media):
    a = {r["media_id"]: r for r in mm.extract_image_features(media).collect()}
    b = {r["media_id"]: r for r in mm.extract_image_features(media.repartition(7)).collect()}
    assert a.keys() == b.keys() and len(a) > 0
    for k in a:
        assert a[k] == b[k]
        assert 0.0 <= a[k]["brightness"] <= 255.0


def test_resize_contract(media, spark):
    resized = mm.resize_images(media, 16, 16)
    rows = resized.collect()
    assert len(rows) == media.filter(F.col("kind") == "image").count()
    for r in rows[:5]:
        assert r["meta"]["width"] == 16 and r["meta"]["height"] == 16
        assert len(bytes(r["payload"])) == 16 * 16 * 3
    # resized output is itself valid MEDIA_SCHEMA input
    feats = mm.extract_image_features(resized)
    assert feats.count() == len(rows)


def test_video_frame_fanout(media):
    frames = mm.sample_video_frames(media, every_ms=500)
    per_media = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter(F.col("kind") == "video").select(
            "media_id", "meta.duration_ms"
        ).collect()
    }
    assert per_media.keys() == durations.keys()
    for mid, n in per_media.items():
        assert n == max(1, durations[mid] // 500)
    one = frames.filter(F.col("frame_idx") == 0).first()
    assert one["ts_ms"] == 0 and len(bytes(one["frame_payload"])) > 0


def test_audio_features_bounds(media):
    feats = mm.extract_audio_features(media).collect()
    assert len(feats) == media.filter(F.col("kind") == "audio").count()
    for r in feats:
        assert r["n_samples"] > 0
        assert 0.0 <= r["rms"] <= 1.0 and 0.0 <= r["peak"] <= 1.0
        # fake codec output is uniform-ish noise: rms near 1/sqrt(3)
        assert 0.4 <= r["rms"] <= 0.75


def test_fake_codec_keystream_deterministic():
    a = mm._keystream(b"seed", 64)
    b = mm._keystream(b"seed", 64)
    c = mm._keystream(b"other", 64)
    assert np.array_equal(a, b) and not np.array_equal(a, c)
