"""Query inventory — multimodal operators (rows-only driver checks).

The decode layer is Python-side (mapInPandas) so these aren't
SQL-expressible; schema/batch/determinism contracts are pytest-verified in
tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from open_data_lakehouse_demo_spark.operators import multimodal as mm
from open_data_lakehouse_demo_spark.plans.inventory import query, t


@query("image_feature_extract", ("MM1",), tags=("multimodal",))
def image_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode → color stats + aHash via Arrow-batched mapInPandas
    (operators/multimodal.py; codec stubbed deterministically)."""
    media = mm.synth_media_from_documents(t(spark, sf_dir, "documents"))
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
