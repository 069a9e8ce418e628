"""Multimodal plumbing tests: schemas, Arrow batch shapes, stub seams."""

from __future__ import annotations

import numpy as np
import pytest

from coldata_spark.operators import multimodal as MM


def test_image_features(spark):
    imgs = MM.synthetic_images(spark, n=16)
    feats = MM.extract_image_features(imgs).collect()
    assert len(feats) == 16
    f = feats[0]
    assert len(f.mean_rgb) == 3
    assert all(0 <= v <= 255 for v in f.mean_rgb)
    assert len(f.phash) == 16  # 64 bits -> 8 bytes -> 16 hex chars
    assert f.n_bytes == 8 * 8 * 3
    # determinism
    again = MM.extract_image_features(imgs).collect()
    assert {r.item_id: r.phash for r in again} == {r.item_id: r.phash for r in feats}


def test_image_resize_roundtrip(spark):
    imgs = MM.synthetic_images(spark, n=4, width=8, height=8)
    small = MM.resize_images(imgs, 4, 4)
    rows = small.collect()
    assert all(r.meta.width == 4 and r.meta.height == 4 for r in rows)
    assert all(len(r.content) == 4 * 4 * 3 for r in rows)
    # resize again through the same plan — composable
    tiny = MM.resize_images(small, 2, 2).collect()
    assert all(len(r.content) == 2 * 2 * 3 for r in tiny)


def test_decode_stub_seam():
    with pytest.raises(NotImplementedError):
        MM.decode_image_stub(b"\xff\xd8", {"format": "JPEG", "width": 1, "height": 1, "channels": 3})


def test_audio_features(spark):
    audio = MM.synthetic_audio(spark, n=8)
    feats = MM.extract_audio_features(audio).collect()
    assert len(feats) == 8
    for f in feats:
        assert 0.5 < f.rms < 0.65  # full-scale uniform noise -> rms ~ 1/sqrt(3)
        assert f.zero_crossings > 0
        assert f.duration_sec == pytest.approx(0.1)


def test_frame_sampling(spark):
    meta = spark.createDataFrame([(0, 100), (1, 25)], ["item_id", "n_frames"])
    frames = MM.frame_sample(meta, every_n=10).collect()
    by_item = {}
    for r in frames:
        by_item.setdefault(r.item_id, []).append(r.frame_idx)
    assert by_item[0] == list(range(0, 100, 10))
    assert by_item[1] == [0, 10, 20]


def test_binary_file_source_feeds_image_pipeline(spark, tmp_path):
    """binaryFile source -> multimodal image schema -> feature extraction:
    the ingestion on-ramp for real media files (content bytes land in the
    same `content` column the synthetic tables model)."""
    import numpy as np
    from pyspark.sql import functions as F

    from coldata_spark.operators import multimodal as MM
    from coldata_spark.sources.io import read_binary_files

    d = tmp_path / "imgs"
    d.mkdir()
    w = h = 4
    for i in range(6):
        rng = np.random.default_rng(seed=i)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        (d / f"img_{i}.rgb").write_bytes(px.tobytes())
    (d / "ignore.txt").write_text("not an image")

    raw = read_binary_files(spark, str(d), glob="*.rgb")
    assert raw.count() == 6  # glob pruned the .txt at listing time

    images = raw.select(
        F.regexp_extract(F.col("path"), r"img_(\d+)\.rgb$", 1)
        .cast("long")
        .alias("item_id"),
        F.col("content"),
        F.struct(
            F.lit(w).alias("width"),
            F.lit(h).alias("height"),
            F.lit(3).alias("channels"),
            F.lit("RAW_RGB").alias("format"),
        ).alias("meta"),
    )
    feats = MM.extract_image_features(images).collect()
    assert len(feats) == 6
    # features must be deterministic and match the synthetic path for the
    # same bytes: item 0's mean brightness equals numpy's direct computation
    rng = np.random.default_rng(seed=0)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    got = {r["item_id"]: r for r in feats}
    assert abs(float(np.mean(got[0]["mean_rgb"])) - float(px.mean())) < 1e-6


def test_video_frame_sample_with_fps_passthrough(spark):
    vids = MM.synthetic_videos(spark, n=6)
    sampled = MM.frame_sample(vids, every_n=10)
    assert set(sampled.columns) == {"item_id", "fps", "frame_idx"}
    rows = sampled.collect()
    by_item = {}
    for r in rows:
        by_item.setdefault(r.item_id, []).append(r.frame_idx)
    meta = {r.item_id: (r.n_frames, r.fps) for r in vids.collect()}
    for i, (n_frames, fps) in meta.items():
        assert by_item[i] == list(range(0, n_frames, 10))
        assert fps in (24, 30, 36)


def test_decode_seam_tries_pil_for_encoded_formats():
    """Non-RAW formats route through the PIL import-try: with PIL absent
    the seam raises the documented NotImplementedError; with PIL present
    it decodes.  Either way the error happens AT the seam, not upstream."""
    import numpy as np

    from coldata_spark.operators.multimodal import decode_image_stub

    meta = {"format": "PNG", "width": 2, "height": 2, "channels": 3}
    try:
        import PIL  # noqa: F401

        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(np.zeros((2, 2, 3), dtype=np.uint8)).save(buf, "PNG")
        out = decode_image_stub(buf.getvalue(), meta)
        assert out.shape == (2, 2, 3)
    except ImportError:
        import pytest

        with pytest.raises(NotImplementedError, match="PNG"):
            decode_image_stub(b"\x89PNG-not-really", meta)


def test_frame_sample_zero_frames_yields_no_rows(spark):
    """Round-4 review fix: a zero/NULL n_frames row contributes no frames
    instead of crashing the job with illegal sequence boundaries."""
    from coldata_spark.operators.multimodal import frame_sample

    meta = spark.createDataFrame(
        [(1, 25), (2, 0), (3, None)], "item_id long, n_frames int"
    )
    got = frame_sample(meta, every_n=10).groupBy("item_id").count().collect()
    counts = {r.item_id: r["count"] for r in got}
    assert counts == {1: 3}  # frames 0, 10, 20; items 2 and 3 absent


# ---------------------------------------------------------------------------
# Round-10: real container codecs (WAV via stdlib wave, PPM P6 via header
# parse) — the seam stops being a stub for formats this sandbox can decode.
# ---------------------------------------------------------------------------


def test_wav_roundtrip_exact():
    idx = np.arange(800, dtype=np.int64)
    samples = (((5 * 7919 + idx * 104729) % 65536) - 32768).astype("<i2")
    b = MM.encode_wav(samples, 8000)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"  # genuine container
    x, sr = MM.decode_wav(b)
    assert sr == 8000
    assert np.array_equal(x, samples)


def test_wav_decode_rejects_unsupported_width():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # PCM8
        w.setframerate(8000)
        w.writeframes(b"\x00" * 16)
    with pytest.raises(NotImplementedError, match="PCM16"):
        MM.decode_wav(buf.getvalue())


def test_wav_decode_stereo_shape():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(np.arange(20, dtype="<i2").tobytes())
    x, sr = MM.decode_wav(buf.getvalue())
    assert sr == 44100 and x.shape == (10, 2)


def test_ppm_roundtrip_and_comment_tolerance():
    p = np.arange(64).reshape(8, 8, 1)
    c = np.arange(3).reshape(1, 1, 3)
    px = ((7 * 31 + p * 7 + c * 13) % 256).astype(np.uint8)
    assert np.array_equal(MM.decode_ppm(MM.encode_ppm(px)), px)
    # netpbm allows comments and arbitrary whitespace in the header
    hdr = b"P6\n# made by a foreign tool\n  8\t8\n# another\n255\n"
    assert np.array_equal(MM.decode_ppm(hdr + px.tobytes()), px)


def test_ppm_decode_rejects_bad_input():
    with pytest.raises(ValueError, match="P6"):
        MM.decode_ppm(b"P3\n1 1\n255\n0 0 0")
    with pytest.raises(ValueError, match="truncated PPM raster"):
        MM.decode_ppm(b"P6\n4 4\n255\n" + b"\x00" * 10)
    with pytest.raises(NotImplementedError, match="maxval"):
        MM.decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 6)


def test_decode_image_stub_dispatches_ppm():
    px = np.full((2, 3, 3), 7, dtype=np.uint8)
    meta = {"format": "PPM", "width": 3, "height": 2, "channels": 3}
    assert np.array_equal(MM.decode_image_stub(MM.encode_ppm(px), meta), px)


def test_wav_file_features_end_to_end(spark, tmp_path):
    """Real bytes on a real filesystem: encode WAV -> tar shards ->
    binaryFile scan -> untar -> RIFF parse in-UDF -> features match the
    PCM-column extractor on the same samples."""
    from coldata_spark.sources import io as IO

    audio = MM.synthetic_audio(spark, n=8)
    IO.export_tar_shards(
        MM.encode_wav_column(audio),
        str(tmp_path / "wav"),
        n_shards=2,
        key_col="item_id",
        payload_col="payload",
        ext="wav",
    )
    shards = IO.read_tar_shards(spark, str(tmp_path / "wav"), ext="wav")
    got = {
        r.item_id: r
        for r in MM.extract_audio_features_from_wav(shards).collect()
    }
    want = {r.item_id: r for r in MM.extract_audio_features(audio).collect()}
    assert set(got) == set(want) == set(range(8))
    for i in range(8):
        assert got[i].sample_rate == 8000  # parsed from the RIFF header
        assert got[i].rms == want[i].rms  # identical IEEE computation
        assert got[i].zero_crossings == want[i].zero_crossings


def test_ppm_file_features_end_to_end(spark, tmp_path):
    from coldata_spark.sources import io as IO

    imgs = MM.synthetic_images(spark, n=8)
    IO.export_tar_shards(
        MM.encode_ppm_column(imgs),
        str(tmp_path / "ppm"),
        n_shards=2,
        key_col="item_id",
        payload_col="payload",
        ext="ppm",
    )
    shards = IO.read_tar_shards(spark, str(tmp_path / "ppm"), ext="ppm")
    got = {
        r.item_id: r
        for r in MM.extract_image_features_from_ppm(shards).collect()
    }
    want = {r.item_id: r for r in MM.extract_image_features(imgs).collect()}
    assert set(got) == set(want) == set(range(8))
    for i in range(8):
        assert (got[i].width, got[i].height) == (8, 8)  # from the header
        assert got[i].phash == want[i].phash
        assert [got[i].mean_r, got[i].mean_g, got[i].mean_b] == list(
            want[i].mean_rgb
        )
