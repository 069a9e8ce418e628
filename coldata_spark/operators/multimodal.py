"""Multimodal columns (north-star extension; no reference counterpart).

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct.  All Spark-side plumbing — schemas, partition-friendly batch shapes,
Arrow-batched UDF signatures — is real and tested; the actual codec work
(JPEG decode, resampling) is STUBBED behind deterministic fakes because the
media libraries (PIL/ffmpeg/torchaudio) are not in this container.  Each
stub documents exactly where the real implementation drops in; swapping it
changes no plan shape.

Scale notes: media processing is the embarrassing-parallel slow path —
mapInPandas over binary columns with Arrow transfer, no shuffle.  The one
scale trap is row size: batches are bounded by
spark.sql.execution.arrow.maxRecordsPerBatch, and very large blobs should
drop that to keep Arrow batches inside executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", IMAGE_META),
    ]
)


def synthetic_images(spark, n: int = 64, width: int = 8, height: int = 8) -> DataFrame:
    """Deterministic fake image table: content = raw RGB bytes derived from
    the item id (stands in for real JPEG bytes; same column shapes).

    Pixels follow the closed-form ``(id*31 + p*7 + c*13) % 256`` (p = pixel
    index, c = channel) rather than a PRNG so a SQL oracle can regenerate
    them with generate_series and verify the decoded features bit-exactly.
    """
    rows = []
    p = np.arange(height * width).reshape(height, width, 1)
    c = np.arange(3).reshape(1, 1, 3)
    for i in range(n):
        px = ((i * 31 + p * 7 + c * 13) % 256).astype(np.uint8)
        rows.append((i, px.tobytes(), (width, height, 3, "RAW_RGB")))
    # small synthetic tables: a few partitions, not one-Python-worker-per-row
    return spark.createDataFrame(rows, IMAGE_SCHEMA).coalesce(max(1, n // 16))


def decode_image_stub(content: bytes, meta) -> np.ndarray:
    """Codec seam: RAW_RGB decodes as raw HxWxC uint8 (the deterministic
    fixture path); any other format tries PIL behind an import-try and
    raises NotImplementedError only when the library is genuinely absent.
    The Spark-side plumbing (schema, Arrow batching, partitioning) is the
    same either way — swapping in the real codec changes nothing upstream."""
    if meta["format"] == "RAW_RGB":
        return np.frombuffer(content, dtype=np.uint8).reshape(
            meta["height"], meta["width"], meta["channels"]
        )
    try:
        import io

        from PIL import Image  # not installed in this container; real path
    except ImportError as ex:
        raise NotImplementedError(
            f"decode for format {meta['format']!r} requires PIL/ffmpeg "
            "(not available in this container)"
        ) from ex
    return np.asarray(Image.open(io.BytesIO(content)).convert("RGB"))


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("mean_rgb", T.ArrayType(T.DoubleType())),
        T.StructField("phash", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def extract_image_features(images: DataFrame) -> DataFrame:
    """Decode + feature-extract via mapInPandas: per-channel means and a
    perceptual-hash-style signature (mean-threshold bits of the downsampled
    grayscale — a real aHash, computed on the stub-decoded pixels)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"item_id": [], "mean_rgb": [], "phash": [], "n_bytes": []}
            for item_id, content, meta in zip(
                pdf["item_id"], pdf["content"], pdf["meta"]
            ):
                px = decode_image_stub(content, meta)
                # aHash with the threshold comparison kept in INTEGER space
                # (s_p * npix > sum(s)  <=>  gray_p > mean(gray)): avoids
                # float summation-order ties so any engine reproduces the
                # identical bit string.
                s = px.astype(np.int64).sum(axis=2).flatten()
                bits = s * s.size > s.sum()
                packed = np.packbits(bits).tobytes()
                out["item_id"].append(item_id)
                out["mean_rgb"].append(
                    (px.reshape(-1, 3).astype(np.int64).sum(axis=0)
                     / (px.shape[0] * px.shape[1])).tolist()
                )
                out["phash"].append(packed.hex())
                out["n_bytes"].append(len(content))
            yield pd.DataFrame(out)

    return images.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(images: DataFrame, new_w: int, new_h: int) -> DataFrame:
    """Resize via nearest-neighbor sampling on the stub-decoded array (the
    real path swaps in PIL's resampling; plan shape identical)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"item_id": [], "content": [], "meta": []}
            for item_id, content, meta in zip(
                pdf["item_id"], pdf["content"], pdf["meta"]
            ):
                px = decode_image_stub(content, meta)
                ys = (np.arange(new_h) * meta["height"] // new_h).astype(int)
                xs = (np.arange(new_w) * meta["width"] // new_w).astype(int)
                resized = px[np.ix_(ys, xs)]
                out["item_id"].append(item_id)
                out["content"].append(resized.tobytes())
                out["meta"].append(
                    {"width": new_w, "height": new_h, "channels": 3, "format": "RAW_RGB"}
                )
            yield pd.DataFrame(out)

    return images.mapInPandas(run, schema=IMAGE_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
    ]
)


def synthetic_audio(spark, n: int = 32, sr: int = 8000, seconds: float = 0.1) -> DataFrame:
    """Fake PCM16 audio derived from the item id.

    Integer pseudo-noise ``((id*7919 + i*104729) % 65536) - 32768`` instead
    of a sine: transcendental-function rounding differs across engines, but
    integer modular arithmetic lets a SQL oracle regenerate the exact
    samples.  The decode path (bytes -> int16 -> features) is unchanged.
    """
    rows = []
    ns = int(sr * seconds)
    idx = np.arange(ns, dtype=np.int64)
    for i in range(n):
        wave = (((i * 7919 + idx * 104729) % 65536) - 32768).astype("<i2")
        rows.append((i, wave.tobytes(), sr, ns))
    return spark.createDataFrame(rows, AUDIO_SCHEMA).coalesce(max(1, n // 16))


AUDIO_FEATURES = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.IntegerType()),
        T.StructField("duration_sec", T.DoubleType()),
    ]
)


def extract_audio_features(audio: DataFrame) -> DataFrame:
    """PCM16 decode (real) + rms/zero-crossing features.  Compressed codecs
    would raise NotImplementedError at the same seam as images."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"item_id": [], "rms": [], "zero_crossings": [], "duration_sec": []}
            for item_id, content, sr, ns in zip(
                pdf["item_id"], pdf["content"], pdf["sample_rate"], pdf["n_samples"]
            ):
                wi = np.frombuffer(content, dtype="<i2").astype(np.int64)
                # rms from the exact integer dot product: sum(w^2) < 2^53 so
                # the divide + sqrt are single IEEE ops any engine reproduces
                # bit-exactly (float mean() would vary with summation order).
                rms = float(np.sqrt(wi.dot(wi) / (32768.0 * 32768.0 * len(wi))))
                out["item_id"].append(item_id)
                out["rms"].append(rms)
                out["zero_crossings"].append(int(np.sum(np.sign(wi[1:]) != np.sign(wi[:-1]))))
                out["duration_sec"].append(ns / sr)
            yield pd.DataFrame(out)

    return audio.mapInPandas(run, schema=AUDIO_FEATURES)


VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps", T.IntegerType()),
    ]
)


def synthetic_videos(spark, n: int = 48) -> DataFrame:
    """Deterministic fake video-metadata table (the container bytes stay
    behind the codec seam, like images/audio): closed-form
    ``n_frames = 30 + (id*17) % 241`` and ``fps in {24, 30, 36}`` so a SQL
    oracle can regenerate the exact sampled frame set with generate_series.
    """
    rows = [(i, 30 + (i * 17) % 241, 24 + (i % 3) * 6) for i in range(n)]
    return spark.createDataFrame(rows, VIDEO_SCHEMA).coalesce(max(1, n // 16))


def frame_sample(video_meta: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling as plumbing: given (item_id, n_frames, ...),
    emit the sampled frame indices 0..n_frames-1 via a lateral sequence
    explode — the plan a real decoder feeds.  All columns except n_frames
    pass through (fps, uri, ... ride along to the decode stage).  Decode
    itself is the NotImplementedError seam."""
    passthrough = [c for c in video_meta.columns if c != "n_frames"]
    # zero-frame / corrupt / NULL-count rows contribute no frames (the
    # same contract for all three) — an unguarded sequence(0, -1, n)
    # throws 'illegal sequence boundaries' and fails the whole job on one
    # bad row
    idxs = F.when(
        F.col("n_frames") > 0,
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)),
    ).otherwise(F.array().cast("array<int>"))
    return video_meta.select(
        *passthrough,
        F.explode(idxs).alias("frame_idx"),
    )
