"""Multimodal column queries (north-star extension).

The binary fixtures are integer-formulaic (see operators/multimodal.py), so
each query now carries a full DuckDB oracle that REGENERATES the pixel /
sample values with generate_series and recomputes the decoded features
bit-exactly — upgrading these from rows-only to hash-checked rows while the
Spark side still exercises the real Arrow mapInPandas codec plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coldata_spark.operators import multimodal as MM
from coldata_spark.registry import register


# aHash oracle over formulaic pixels: s = channel-sum per pixel; bit_p =
# (s_p * npix > sum(s)) — the same integer-space threshold the Spark-side
# decoder uses, so the packed hex strings agree to the bit.
_IMAGE_PHASH_SQL = """
    WITH ids AS (SELECT unnest(generate_series(0, {max_id})) AS item_id),
    px AS (
        SELECT item_id, p,
               (item_id*31 + src_p*7) % 256        AS c0,
               (item_id*31 + src_p*7 + 13) % 256   AS c1,
               (item_id*31 + src_p*7 + 26) % 256   AS c2
        FROM (
            SELECT item_id, p, {src_p} AS src_p
            FROM ids, unnest(generate_series(0, {max_p})) AS t(p)
        )
    ),
    s AS (SELECT item_id, p, c0, c1, c2, c0 + c1 + c2 AS s FROM px),
    tot AS (
        SELECT item_id, sum(s) AS total,
               CAST(sum(c0) AS DOUBLE) / {npix} AS mean_r,
               CAST(sum(c1) AS DOUBLE) / {npix} AS mean_g,
               CAST(sum(c2) AS DOUBLE) / {npix} AS mean_b
        FROM s GROUP BY item_id
    ),
    bits AS (
        SELECT s.item_id, s.p,
               CASE WHEN s.s * {npix} > tot.total THEN 1 ELSE 0 END AS bit
        FROM s JOIN tot ON s.item_id = tot.item_id
    ),
    bytes AS (
        SELECT item_id, p // 8 AS b,
               CAST(sum(bit * (1 << (7 - (p % 8)))) AS INT) AS byte
        FROM bits GROUP BY item_id, p // 8
    ),
    ph AS (
        SELECT item_id, string_agg(printf('%02x', byte), '' ORDER BY b) AS phash
        FROM bytes GROUP BY item_id
    )
"""


@register(
    "q50_image_features",
    survey="ext-multimodal-image",
    sql=_IMAGE_PHASH_SQL.format(max_id=63, max_p=63, npix=64, src_p="p")
    + """
    SELECT t.item_id, mean_r, mean_g, mean_b, ph.phash,
           CAST(192 AS BIGINT) AS n_bytes
    FROM tot t JOIN ph ON t.item_id = ph.item_id
    """,
)
def q50_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary image column -> decode -> per-channel means + perceptual hash
    via Arrow-batched mapInPandas (decode stub; real codec drops into
    decode_image_stub's seam).  The oracle regenerates the formulaic pixels
    in SQL and recomputes mean/aHash — a hard hash check on the whole
    decode -> feature path."""
    imgs = MM.synthetic_images(spark, n=64)
    feats = MM.extract_image_features(imgs)
    return feats.select(
        "item_id",
        F.element_at("mean_rgb", 1).alias("mean_r"),
        F.element_at("mean_rgb", 2).alias("mean_g"),
        F.element_at("mean_rgb", 3).alias("mean_b"),
        "phash",
        "n_bytes",
    )


@register(
    "q51_image_resize_pipeline",
    survey="ext-multimodal-image",
    # nearest-neighbor 8x8 -> 4x4: resized pixel p reads source pixel
    # (2*(p//4))*8 + 2*(p%4); 16 bits -> 2 bytes -> 4 hex chars.
    sql=_IMAGE_PHASH_SQL.format(
        max_id=31, max_p=15, npix=16, src_p="(2*(p // 4))*8 + 2*(p % 4)"
    )
    + """
    SELECT t.item_id, ph.phash, CAST(48 AS BIGINT) AS n_bytes
    FROM tot t JOIN ph ON t.item_id = ph.item_id
    """,
)
def q51_image_resize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize (8x8 -> 4x4) then feature-extract — two chained mapInPandas
    stages over binary columns, the standard media-pipeline shape."""
    imgs = MM.synthetic_images(spark, n=32)
    small = MM.resize_images(imgs, 4, 4)
    return MM.extract_image_features(small).select("item_id", "phash", "n_bytes")


@register(
    "q52_audio_features",
    survey="ext-multimodal-audio",
    sql="""
    WITH ids AS (SELECT unnest(generate_series(0, 31)) AS item_id),
    w AS (
        SELECT item_id, i,
               ((item_id*7919 + i*104729) % 65536) - 32768 AS w
        FROM ids, unnest(generate_series(0, 799)) AS t(i)
    ),
    sgn AS (
        SELECT item_id, w,
               sign(w) AS s,
               lag(sign(w)) OVER (PARTITION BY item_id ORDER BY i) AS prev
        FROM w
    )
    SELECT item_id,
           sqrt(CAST(sum(w*w) AS DOUBLE) / (32768.0*32768.0*800)) AS rms,
           CAST(sum(CASE WHEN prev IS NOT NULL AND s <> prev
                         THEN 1 ELSE 0 END) AS INT) AS zero_crossings,
           CAST(800 AS DOUBLE) / 8000 AS duration_sec
    FROM sgn
    GROUP BY item_id
    """,
)
def q52_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCM16 audio column -> decode -> rms / zero-crossings / duration.
    rms comes from the exact integer dot product so the oracle's
    sqrt(sum(w^2)/K) is the identical IEEE computation."""
    audio = MM.synthetic_audio(spark, n=32)
    feats = MM.extract_audio_features(audio)
    return feats.select("item_id", "rms", "zero_crossings", "duration_sec")


@register(
    "q111_video_frame_sample",
    survey="ext-multimodal-video",
    sql="""
    WITH ids AS (SELECT unnest(generate_series(0, 47)) AS item_id),
    v AS (
        SELECT item_id,
               30 + (item_id*17) % 241 AS n_frames,
               24 + (item_id % 3)*6    AS fps
        FROM ids
    ),
    s AS (
        SELECT item_id, fps,
               unnest(generate_series(0, n_frames - 1, 10)) AS frame_idx
        FROM v
    )
    SELECT item_id,
           CAST(frame_idx AS BIGINT)                   AS frame_idx,
           CAST(frame_idx * 1000000 // fps AS BIGINT)  AS ts_micros
    FROM s
    """,
)
def q111_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video metadata -> every-Nth frame index -> integer microsecond
    timestamp (frame_idx * 1e6 DIV fps: integer division is bit-identical
    cross-engine, float division is not).  Decoding the sampled frames is
    the codec seam; the lateral explode (zero shuffles, scales linearly in
    frames) is the real plan a frame-extraction pipeline feeds.
    Reference treats media as opaque payloads the same way
    (/root/reference/src/coldata/crawler/crawler.py stores raw bytes)."""
    vids = MM.synthetic_videos(spark, n=48)
    sampled = MM.frame_sample(vids, every_n=10)
    return sampled.select(
        "item_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.expr("CAST(frame_idx AS BIGINT) * 1000000 DIV fps").alias("ts_micros"),
    )
