#!/usr/bin/env python
"""Absolute decode throughput for the multimodal family (round-12 verdict
missing #3 / #5).

The sweep's multimodal ratios (q111 694x, q51 197x, q52 142x, q50 104x) are
ORACLE-ASYMMETRIC: the DuckDB twin replays feature math over regenerated
integer fields in ~ms while the Spark side decodes REAL bytes (RIFF/WAV
container parse, PPM P6 header+raster, frame sampling) through Arrow
mapInPandas.  A ratio between those two is not a number about either
engine; the defensible record for a decode path is absolute throughput —
MB/s and items/s, total and per core.

This tool builds volume fixtures (thousands of real WAV / PPM files as
binary rows — the q50-family's n=32..64 synthetic rows are correctness
fixtures, far too small to time), runs the REAL decode+feature extractors
(extract_audio_features_from_wav / extract_image_features_from_ppm /
frame_sample), and records bytes/s.

Usage: python tools/decode_bench.py [--items 4096]
Output: markdown table for SCALE.md + .bench_cache/decode_bench.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

REPEATS = 3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=4096)
    args = ap.parse_args()

    import numpy as np

    from bench import CACHE_ROOT
    from coldata_spark.operators import multimodal as MM
    from coldata_spark.session import get_spark

    spark = get_spark(app_name="decode_bench")
    sc_cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 1))
    n = args.items

    # ---- volume fixtures: real container bytes, deterministic ----------
    # WAV: 1 s PCM16 mono @ 8 kHz -> ~16 KB/file.  PPM: 64x64 RGB ->
    # ~12 KB/file.  Video-meta: the q111 shape (frame indexes from typed
    # metadata, no raster).
    def wav_rows():
        for i in range(n):
            t = np.arange(8000)
            samples = (
                3000 * np.sin(2 * np.pi * (100 + i % 50) * t / 8000)
            ).astype("<i2")
            yield (i, bytearray(MM.encode_wav(samples, 8000)))

    def ppm_rows():
        for i in range(n):
            px = ((np.arange(64 * 64 * 3) * (i + 7)) % 256).astype(
                np.uint8
            ).reshape(64, 64, 3)
            yield (i, bytearray(MM.encode_ppm(px)))

    wav = spark.createDataFrame(wav_rows(), "key LONG, payload BINARY").repartition(
        sc_cores
    )
    ppm = spark.createDataFrame(ppm_rows(), "key LONG, payload BINARY").repartition(
        sc_cores
    )
    wav.cache().count()
    ppm.cache().count()
    wav_bytes = wav.select(F_len("payload")).groupBy().sum().collect()[0][0]
    ppm_bytes = ppm.select(F_len("payload")).groupBy().sum().collect()[0][0]

    out: dict[str, dict] = {}

    def bench(name: str, df_fn, total_bytes: int, items: int):
        df_fn().count()  # warm (codegen + python workers)
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            df_fn().count()
            best = min(best, time.perf_counter() - t0)
        rec = {
            "sec": round(best, 3),
            "items": items,
            "mb": round(total_bytes / 1e6, 1),
            "mb_per_sec": round(total_bytes / 1e6 / best, 1),
            "items_per_sec": round(items / best),
            "mb_per_sec_per_core": round(total_bytes / 1e6 / best / sc_cores, 2),
        }
        out[name] = rec
        print(f"{name}: {rec}", flush=True)

    bench(
        "wav_decode_features (q171 path)",
        lambda: MM.extract_audio_features_from_wav(wav),
        wav_bytes,
        n,
    )
    bench(
        "ppm_decode_features (q172 path)",
        lambda: MM.extract_image_features_from_ppm(ppm),
        ppm_bytes,
        n,
    )

    # the q50/q51 stub-decode path (raw pixel buffers, no container):
    imgs = MM.synthetic_images(spark, n=n, width=16, height=16)
    imgs.cache().count()
    img_bytes = n * 16 * 16 * 3
    bench(
        "raw_image_features (q50 path, 16x16)",
        lambda: MM.extract_image_features(imgs),
        img_bytes,
        n,
    )

    vids = MM.synthetic_videos(spark, n=n)
    vids.cache().count()
    frames = MM.frame_sample(vids, every_n=10).count()
    bench(
        "video_frame_sample (q111 path, metadata-only)",
        lambda: MM.frame_sample(vids, every_n=10),
        0,
        int(frames),
    )

    os.makedirs(CACHE_ROOT, exist_ok=True)
    path = os.path.join(CACHE_ROOT, "decode_bench.json")
    with open(path, "w") as fh:
        json.dump({"items": n, "cores": sc_cores, "results": out}, fh, indent=1)
    print(f"wrote {path}")

    lines = [
        f"| decode path ({n} items, {sc_cores} cores) | sec | MB | MB/s "
        "| items/s | MB/s/core |",
        "|---|---|---|---|---|---|",
    ]
    for k, v in out.items():
        lines.append(
            f"| {k} | {v['sec']} | {v['mb']} | {v['mb_per_sec']} "
            f"| {v['items_per_sec']} | {v['mb_per_sec_per_core']} |"
        )
    print("\n".join(lines))


def F_len(col):
    from pyspark.sql import functions as F

    return F.length(F.col(col))


if __name__ == "__main__":
    main()
