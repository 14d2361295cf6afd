"""Query inventory — multimodal operators.

The decode layer is Python-side (mapInPandas), so the audio/video
entries are rows-only driver checks with their schema/batch/determinism
contracts pytest-verified in tests/test_multimodal.py. MM1 is the
exception (promoted r8): over tier-1 BMP payloads every feature is an
exact analytic value, so it carries a full value-hash oracle — a
generated VALUES table of the expected features (tools/gen_mm1_oracle.py),
nothing approximate on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from open_data_lakehouse_demo_spark.operators import multimodal as mm
from open_data_lakehouse_demo_spark.plans._mm1_oracle import MM1_ORACLE_SQL
from open_data_lakehouse_demo_spark.plans.inventory import query, t


@query("image_feature_extract", ("MM1",), oracle=MM1_ORACLE_SQL, tags=("multimodal",))
def image_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode → color stats + aHash over TIER-1 payloads: real BMP
    bytes (deterministic per-id gradients, synth_real_media) through the
    pure-numpy BMP codec and Arrow-batched mapInPandas
    (operators/multimodal.py). Oracle = the generated expected-feature
    VALUES table — exact integer-pixel means and aHash bits, so the
    whole encode→batch→decode→feature path is value-hash-checked
    end-to-end against an implementation that shares none of the
    plumbing (tools/gen_mm1_oracle.py)."""
    media = mm.synth_real_media(t(spark, sf_dir, "documents"))
    return mm.extract_image_features(media)


@query("audio_feature_extract", ("MM2",), tags=("multimodal",))
def audio_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode → RMS/peak/zero-crossings via mapInPandas
    (operators/multimodal.py)."""
    media = mm.synth_media_from_documents(t(spark, sf_dir, "documents"))
    return mm.extract_audio_features(media)


@query("video_frame_sample", ("MM3",), tags=("multimodal",))
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (1 frame / 500ms) with in-worker fan-out
    (operators/multimodal.py)."""
    media = mm.synth_media_from_documents(t(spark, sf_dir, "documents"))
    return mm.sample_video_frames(media, every_ms=500).select(
        "media_id", "frame_idx", "ts_ms"
    )
