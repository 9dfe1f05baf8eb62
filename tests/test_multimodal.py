"""Multimodal plumbing tests: schema, determinism, fan-out shape, and
failure isolation of the mapInPandas media operators."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from meerpipe_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    sample_frames,
)


@pytest.fixture()
def media(spark):
    rows = [
        Row(media_id=1, kind="image", payload=b"img-bytes-1", mime="image/png",
            width=64, height=64, duration_s=None),
        Row(media_id=2, kind="image", payload=b"img-bytes-2", mime="image/png",
            width=32, height=32, duration_s=None),
        Row(media_id=3, kind="video", payload=b"vid-bytes", mime="video/mp4",
            width=320, height=240, duration_s=3.5),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_shape_and_determinism(spark, media):
    out1 = {r.media_id: r.feature for r in extract_features(media, dim=16).collect()}
    out2 = {r.media_id: r.feature for r in extract_features(media, dim=16).collect()}
    assert set(out1) == {1, 2, 3}
    for mid in out1:
        assert len(out1[mid]) == 16
        assert out1[mid] == out2[mid]  # deterministic in payload bytes
    # unit norm
    assert sum(x * x for x in out1[1]) == pytest.approx(1.0, rel=1e-5)
    assert out1[1] != out1[2]


def test_extract_features_isolates_failures(spark, media):
    def flaky(payload: bytes, dim: int):
        if payload == b"img-bytes-2":
            raise ValueError("corrupt")
        from meerpipe_spark.operators.multimodal import _stub_decode

        return _stub_decode(payload, dim)

    out = {r.media_id: r for r in extract_features(media, dim=8, decoder=flaky).collect()}
    assert out[1].decode_ok and out[3].decode_ok
    assert not out[2].decode_ok and out[2].feature is None


def test_sample_frames_fanout(spark, media):
    frames = sample_frames(media.filter("kind = 'video'"), every_s=1.0).collect()
    # 3.5 s at 1 fps -> 4 frames, indexed 0..3
    assert [f.frame_idx for f in sorted(frames, key=lambda r: r.frame_idx)] == [0, 1, 2, 3]
    assert all(f.media_id == 3 for f in frames)
    assert len({bytes(f.frame) for f in frames}) == 4  # distinct frames
