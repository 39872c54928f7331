"""Multimodal plumbing: schema, mapInPandas batching, stub semantics."""

import numpy as np
import pytest

from louvain_spark.operators.multimodal import (
    attach_fake_media,
    extract_features,
    frame_sample_plan,
)


def _docs(spark):
    return spark.createDataFrame(
        [(0, "hello world"), (1, "hello world"), (2, "something else")],
        "doc_id long, text string",
    )


def test_media_schema_and_features(spark):
    media = attach_fake_media(_docs(spark))
    feats = extract_features(media, dim=8).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert set(by_id) == {0, 1, 2}
    # deterministic content-derived: same payload → same digest + feature
    assert by_id[0]["digest"] == by_id[1]["digest"]
    assert list(by_id[0]["feature"]) == list(by_id[1]["feature"])
    assert by_id[0]["digest"] != by_id[2]["digest"]
    v = np.array(by_id[0]["feature"])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    assert by_id[0]["n_bytes"] == len(b"hello world")


def test_strict_mode_raises(spark):
    media = attach_fake_media(_docs(spark))
    with pytest.raises(Exception) as exc:
        extract_features(media, dim=8, strict=True).collect()
    assert "NotImplementedError" in str(exc.value) or "decode" in str(exc.value)


def test_frame_sample_plan(spark):
    media = spark.createDataFrame(
        [(1, "video", b"x", None, None, 3500, "h264"), (2, "image", b"y", 4, 4, None, "raw")],
        "media_id long, kind string, payload binary, width int, height int, duration_ms int, codec string",
    )
    rows = frame_sample_plan(media, every_ms=1000).collect()
    got = sorted((r["media_id"], r["frame_ts_ms"]) for r in rows)
    assert got == [(1, 0), (1, 1000), (1, 2000), (1, 3000)]


def test_real_ppm_decode_and_feature(spark):
    """Real image path: PPM payload → decoded pixel stats (no stub)."""
    from louvain_spark.operators.multimodal import decode_ppm, encode_ppm

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(10, 8, 3), dtype=np.uint8)
    payload = encode_ppm(img)
    assert np.array_equal(decode_ppm(payload), img)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), "ppm")],
        "media_id long, kind string, payload binary, codec string",
    )
    row = extract_features(media, dim=16, strict=True).collect()[0]
    v = np.array(row["feature"])
    from louvain_spark.operators.multimodal import image_feature

    want = image_feature(img)
    assert abs(np.linalg.norm(want) - 1.0) < 1e-5
    assert np.allclose(v[: len(want)], want[:16], atol=1e-6)


def test_real_wav_decode_and_feature(spark):
    from louvain_spark.operators.multimodal import audio_feature, decode_wav, encode_wav

    t = np.arange(8000)
    samples = (np.sin(2 * np.pi * 440 * t / 8000) * 20000).astype(np.int16)
    payload = encode_wav(samples)
    dec, rate = decode_wav(payload)
    assert rate == 8000 and np.array_equal(dec, samples)
    media = spark.createDataFrame(
        [(7, "audio", bytearray(payload), "wav")],
        "media_id long, kind string, payload binary, codec string",
    )
    row = extract_features(media, dim=16, strict=True).collect()[0]
    want = audio_feature(samples)
    assert np.allclose(np.array(row["feature"])[: len(want)], want, atol=1e-6)


def test_real_video_frame_sampling(spark):
    """PPMV container: sampled frames decode real pixels at the right ts."""
    from louvain_spark.operators.multimodal import (
        encode_ppmv,
        image_feature,
        sample_frames,
    )

    rng = np.random.RandomState(1)
    frames = [rng.randint(0, 256, size=(6, 6, 3), dtype=np.uint8) for _ in range(5)]
    payload = encode_ppmv(frames, frame_ms=40)  # 200ms clip
    media = spark.createDataFrame(
        [(3, "video", bytearray(payload), "ppmv")],
        "media_id long, kind string, payload binary, codec string",
    )
    rows = sample_frames(media, every_ms=80, dim=16).collect()
    got = sorted((r["frame_ts_ms"], r["frame_idx"]) for r in rows)
    assert got == [(0, 0), (80, 2), (160, 4)]
    by_ts = {r["frame_ts_ms"]: np.array(r["feature"]) for r in rows}
    want = image_feature(frames[2])
    assert np.allclose(by_ts[80][: len(want)], want, atol=1e-6)
