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
