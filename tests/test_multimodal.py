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


def test_cap_image_sizes_contract(spark):
    """K3 (generate_images_results.py:176-190): iterative reduce-by
    target/size until under the cap; small images untouched; the loop
    factor applies to both dimensions (area ~ factor^2)."""
    from pyspark.sql import Row

    from meerpipe_spark.sinks import cap_image_sizes

    rows = [
        Row(media_id=1, payload=bytes(bytearray(range(256)) * 8000)),  # ~2 MB
        Row(media_id=2, payload=b"small"),
    ]
    df = spark.createDataFrame(rows)
    out = {r.media_id: r for r in cap_image_sizes(df, cap_bytes=1_000_000).collect()}
    assert out[1].resized and out[1].n_bytes <= 1_000_000
    assert not out[2].resized and bytes(out[2].payload) == b"small"
    # matches the sequential reference loop with the same stub encoder
    buf = bytes(bytearray(range(256)) * 8000)
    while len(buf) > 1_000_000:
        f = 800_000 / len(buf)
        buf = buf[: max(1, int(len(buf) * f * f))]
    assert out[1].n_bytes == len(buf)


def test_cap_image_sizes_failure_isolated(spark):
    from pyspark.sql import Row

    from meerpipe_spark.sinks import cap_image_sizes

    def bad_resize(payload, factor):
        raise RuntimeError("encoder exploded")

    df = spark.createDataFrame([Row(media_id=1, payload=b"x" * 2_000_000)])
    out = cap_image_sizes(df, cap_bytes=1_000_000, resize=bad_resize).collect()[0]
    assert not out.resized and out.n_bytes == 2_000_000  # passthrough, no task failure


def test_image_dhash_brightness_invariant_and_fail_soft(spark):
    import numpy as np

    from meerpipe_spark.functions.png import encode_png
    from meerpipe_spark.operators.multimodal import image_dhash

    rng = np.random.default_rng(7)
    base = rng.integers(40, 200, size=(8, 8)).astype(np.uint8)
    shifted = (base + 20).astype(np.uint8)  # uniform brightness shift
    rows = [
        (1, bytearray(encode_png(base))),
        (2, bytearray(encode_png(shifted))),
        (3, bytearray(b"not a png")),
    ]
    media = spark.createDataFrame(rows, "media_id LONG, payload BINARY")
    got = {r["media_id"]: (r["dhash"], r["decode_ok"]) for r in image_dhash(media).collect()}
    # dHash compares ADJACENT pixels: a uniform shift preserves every bit
    assert got[1] == got[2]
    assert got[1][1] is True
    # corrupt payload: isolated, not a task failure
    assert got[3] == (None, False)


def test_vectors_to_png_roundtrip_lossless(spark):
    import numpy as np

    from meerpipe_spark.functions.png import decode_png
    from meerpipe_spark.operators.multimodal import vectors_to_png

    vec = [((i * 13) % 160) / 20.0 - 4.0 for i in range(64)]
    df = spark.createDataFrame([(9, vec)], "vec_id LONG, embedding ARRAY<DOUBLE>")
    payload = bytes(vectors_to_png(df).collect()[0]["payload"])
    px = decode_png(payload)
    expect = np.clip(np.floor((np.array(vec) + 4.0) * 32.0), 0, 255).astype(np.uint8)
    assert (px.flatten() == expect).all()


def test_audio_frame_features_known_signal_and_fail_soft(spark):
    import numpy as np

    from meerpipe_spark.operators.multimodal import audio_frame_features

    # square wave +/-100 alternating every sample: rms=100, zcr=63
    sq = np.tile([100, -100], 32).astype("<i2").tobytes()
    silent = np.zeros(64, dtype="<i2").tobytes()
    rows = [
        (1, bytearray(sq)),
        (2, bytearray(silent)),
        (3, bytearray(b"odd")),  # not a multiple of frame bytes
    ]
    media = spark.createDataFrame(rows, "media_id LONG, payload BINARY")
    got = {
        (r["media_id"], r["frame_idx"]): (r["rms"], r["zcr"], r["decode_ok"])
        for r in audio_frame_features(media, frame=64).collect()
    }
    assert got[(1, 0)] == (100.0, 63, True)
    assert got[(2, 0)] == (0.0, 0, True)
    assert got[(3, -1)] == (None, None, False)
