"""Multimodal column queries (north-star extension — rows-only checks:
binary codec plumbing has no SQL twin; exact values are asserted in
tests/test_multimodal.py).

The synthetic tables are generated deterministically from item ids, so the
driver sees stable row counts and values across runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coldata_spark.operators import multimodal as MM
from coldata_spark.registry import register


@register("q50_image_features", survey="ext-multimodal-image", sql=None)
def q50_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary image column -> decode -> per-channel means + perceptual hash
    via Arrow-batched mapInPandas (decode stub; real codec drops into
    decode_image_stub's seam)."""
    imgs = MM.synthetic_images(spark, n=64)
    feats = MM.extract_image_features(imgs)
    return feats.select(
        "item_id",
        F.round(F.element_at("mean_rgb", 1), 4).alias("mean_r"),
        F.round(F.element_at("mean_rgb", 2), 4).alias("mean_g"),
        F.round(F.element_at("mean_rgb", 3), 4).alias("mean_b"),
        "phash",
        "n_bytes",
    )


@register("q51_image_resize_pipeline", survey="ext-multimodal-image", sql=None)
def q51_image_resize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize (8x8 -> 4x4) then feature-extract — two chained mapInPandas
    stages over binary columns, the standard media-pipeline shape."""
    imgs = MM.synthetic_images(spark, n=32)
    small = MM.resize_images(imgs, 4, 4)
    return MM.extract_image_features(small).select("item_id", "phash", "n_bytes")


@register("q52_audio_features", survey="ext-multimodal-audio", sql=None)
def q52_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCM16 audio column -> rms / zero-crossings / duration."""
    audio = MM.synthetic_audio(spark, n=32)
    feats = MM.extract_audio_features(audio)
    return feats.select(
        "item_id",
        F.round("rms", 4).alias("rms"),
        "zero_crossings",
        F.round("duration_sec", 3).alias("duration_sec"),
    )
