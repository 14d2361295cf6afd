"""Multimodal (image/audio/video) column operators — binary payloads with
typed metadata, processed via Arrow-batched mapInPandas.

Beyond-reference training-data-pipeline operators (SURVEY.md §7.6). The
Spark-side plumbing is REAL and tested — schemas, partitioning, batch
shapes, generator-based mapInPandas that never materializes a partition —
while the codec layer is stubbed: this container has no image/audio
libraries, so ``decode_image``/``decode_audio`` try the real libraries
first (PIL / soundfile) and fall back to a clearly-marked deterministic
fake decoder (md5-keystream pixels/samples). Swapping in real codecs
changes ONE function each; every schema, signature and batch contract
stays identical.

Data model: media rows are
    media_id BIGINT, kind STRING, payload BINARY,
    meta STRUCT<width INT, height INT, sample_rate INT,
                duration_ms INT, codec STRING>
— the payload is opaque to Spark (never parsed JVM-side), the typed meta
column is what filters/partition-prunes (e.g. ``meta.codec = 'fake'`` or
width ranges push down to the Parquet scan).

Scale notes:
  - mapInPandas consumes/produces an *iterator* of batches: constant
    memory per task regardless of partition size, and Arrow moves the
    binary columns zero-copy.
  - spark.sql.execution.arrow.maxRecordsPerBatch bounds decode working
    sets (payloads can be MBs each; set it low for video).
  - frame sampling fans out rows inside the Python stage — the explode
    happens in the worker, not as a JVM generator, so frame payload bytes
    are produced exactly once.
  - repartition on media_id before heavy decode stages to balance skew
    from variable payload sizes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id BIGINT, kind STRING, payload BINARY, "
    "meta STRUCT<width: INT, height: INT, sample_rate: INT, "
    "duration_ms: INT, codec: STRING>"
)


# ---------------------------------------------------------------------------
# Codec layer (the ONLY stubbed part)
# ---------------------------------------------------------------------------

def _keystream(seed_bytes: bytes, n: int) -> np.ndarray:
    """Deterministic byte stream for the fake codec: PCG64 seeded from
    md5(seed_bytes). One hash + a vectorized generator per payload —
    ~100× faster than chaining md5 blocks for MB-sized frames, and
    PCG64's output stream is specified, so results stay deterministic
    and platform-stable."""
    seed = int.from_bytes(hashlib.md5(seed_bytes).digest(), "big")
    return np.random.Generator(np.random.PCG64(seed)).integers(
        0, 256, n, dtype=np.uint8
    )


def decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """payload → HxWx3 uint8 array. Real codec if available, else the
    deterministic fake (STUB — see module docstring)."""
    try:  # pragma: no cover - PIL absent in this container
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload)).convert("RGB").resize((width, height))
        return np.asarray(img, dtype=np.uint8)
    except ImportError:
        return _keystream(payload, width * height * 3).reshape(height, width, 3)


def decode_audio(payload: bytes, sample_rate: int, duration_ms: int) -> np.ndarray:
    """payload → float32 mono samples in [-1, 1]. Real codec if available,
    else the deterministic fake (STUB)."""
    try:  # pragma: no cover - soundfile absent in this container
        import io

        import soundfile as sf

        data, _ = sf.read(io.BytesIO(payload), dtype="float32")
        return data if data.ndim == 1 else data.mean(axis=1)
    except ImportError:
        n = max(1, sample_rate * duration_ms // 1000)
        raw = _keystream(payload, n)
        return (raw.astype(np.float32) - 127.5) / 127.5


# ---------------------------------------------------------------------------
# Synthetic media table (test/bench fixture derived from `documents`)
# ---------------------------------------------------------------------------

def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents fixture:
    payload = utf-8 text bytes (opaque), meta from doc stats. kind cycles
    image/audio/video by doc_id."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.col("doc_id") % 16 * 8 + 32).cast("int").alias("width"),
            (F.col("doc_id") % 9 * 8 + 24).cast("int").alias("height"),
            F.lit(8000).cast("int").alias("sample_rate"),
            (F.col("n_chars") % 2000 + 200).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# mapInPandas operators (real plumbing)
# ---------------------------------------------------------------------------

IMAGE_FEATURE_SCHEMA = (
    "media_id BIGINT, width INT, height INT, mean_r DOUBLE, mean_g DOUBLE, "
    "mean_b DOUBLE, brightness DOUBLE, phash BIGINT"
)


def extract_image_features(media: DataFrame) -> DataFrame:
    """Decode each image batch and emit per-image color stats + a 64-bit
    average-hash (aHash) fingerprint."""
    img = media.filter(F.col("kind") == "image").select(
        "media_id", "payload", "meta.width", "meta.height"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = decode_image(bytes(r.payload), int(r.width), int(r.height))
                gray = arr.mean(axis=2)
                # aHash: 8x8 downsample (block mean) vs global mean → 64 bits
                h8 = gray[: gray.shape[0] // 8 * 8, : gray.shape[1] // 8 * 8]
                blocks = h8.reshape(8, h8.shape[0] // 8, 8, h8.shape[1] // 8).mean(axis=(1, 3))
                bits = (blocks > blocks.mean()).flatten()
                phash = int(np.packbits(bits).view(">u8")[0]) - (1 << 63)  # signed
                rows.append(
                    {
                        "media_id": r.media_id,
                        "width": int(r.width),
                        "height": int(r.height),
                        "mean_r": float(arr[:, :, 0].mean()),
                        "mean_g": float(arr[:, :, 1].mean()),
                        "mean_b": float(arr[:, :, 2].mean()),
                        "brightness": float(gray.mean()),
                        "phash": phash,
                    }
                )
            yield pd.DataFrame(rows)

    return img.mapInPandas(fn, IMAGE_FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_width: int, out_height: int) -> DataFrame:
    """Decode → resize (nearest-neighbor on the decoded array) → re-emit
    payload bytes + updated meta. Keeps the MEDIA_SCHEMA contract so
    resized tables compose with every other operator here."""
    img = media.filter(F.col("kind") == "image")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                meta = r.meta
                arr = decode_image(bytes(r.payload), int(meta["width"]), int(meta["height"]))
                ys = (np.arange(out_height) * arr.shape[0] // out_height).clip(0, arr.shape[0] - 1)
                xs = (np.arange(out_width) * arr.shape[1] // out_width).clip(0, arr.shape[1] - 1)
                resized = arr[ys][:, xs]
                out.append(
                    {
                        "media_id": r.media_id,
                        "kind": "image",
                        "payload": resized.tobytes(),
                        "meta": {
                            "width": out_width,
                            "height": out_height,
                            "sample_rate": meta["sample_rate"],
                            "duration_ms": meta["duration_ms"],
                            "codec": "raw-rgb",
                        },
                    }
                )
            yield pd.DataFrame(out)

    return img.mapInPandas(fn, MEDIA_SCHEMA)


FRAME_SCHEMA = "media_id BIGINT, frame_idx INT, ts_ms INT, frame_payload BINARY"


def sample_video_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Sample one frame every ``every_ms`` from each video payload. The
    fan-out happens inside the Python stage; output rows carry the frame
    bytes (fake codec: per-frame md5 keystream keyed by (payload, idx))."""
    vid = media.filter(F.col("kind") == "video").select(
        "media_id", "payload", "meta.duration_ms", "meta.width", "meta.height"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                n_frames = max(1, int(r.duration_ms) // every_ms)
                for i in range(n_frames):
                    seed = bytes(r.payload) + i.to_bytes(4, "big")
                    frame = _keystream(seed, int(r.width) * int(r.height) * 3)
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": i,
                            "ts_ms": i * every_ms,
                            "frame_payload": frame.tobytes(),
                        }
                    )
            yield pd.DataFrame(rows)

    return vid.mapInPandas(fn, FRAME_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "media_id BIGINT, n_samples BIGINT, rms DOUBLE, peak DOUBLE, zero_crossings BIGINT"
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Decode audio batches → RMS / peak / zero-crossing-count features."""
    aud = media.filter(F.col("kind") == "audio").select(
        "media_id", "payload", "meta.sample_rate", "meta.duration_ms"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                x = decode_audio(bytes(r.payload), int(r.sample_rate), int(r.duration_ms))
                rows.append(
                    {
                        "media_id": r.media_id,
                        "n_samples": int(x.size),
                        "rms": float(np.sqrt((x.astype(np.float64) ** 2).mean())),
                        "peak": float(np.abs(x).max()),
                        "zero_crossings": int((np.diff(np.signbit(x)) != 0).sum()),
                    }
                )
            yield pd.DataFrame(rows)

    return aud.mapInPandas(fn, AUDIO_FEATURE_SCHEMA)


def media_pipeline(spark: SparkSession, docs: DataFrame) -> dict[str, DataFrame]:
    """Convenience wiring of the full multimodal surface for tests/bench."""
    media = synth_media_from_documents(docs)
    return {
        "media": media,
        "image_features": extract_image_features(media),
        "resized": resize_images(media, 16, 16),
        "frames": sample_video_frames(media, every_ms=500),
        "audio_features": extract_audio_features(media),
    }
