"""GIF89a codec + profile-movie sink (K3 tail, make_stokes_movie parity).

The LZW encoder is validated against the canonical public GIF test
vector (the 10x10 sample image documented in the GIF LZW literature):
encoding its pixel stream reproduces the reference bytes exactly, and
decoding the reference bytes reproduces the pixels."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from meerpipe_spark.functions.gif import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
    render_profile_frame,
)

CANONICAL_STREAM = bytes.fromhex("8C2D99872A1CDC33A00275EC95FAA8DE608C04914C01")
CANONICAL_PIXELS = bytes(
    [1] * 5 + [2] * 5
    + [1] * 5 + [2] * 5
    + [1] * 5 + [2] * 5
    + [1, 1, 1, 0, 0, 0, 0, 2, 2, 2]
    + [1, 1, 1, 0, 0, 0, 0, 2, 2, 2]
    + [2, 2, 2, 0, 0, 0, 0, 1, 1, 1]
    + [2, 2, 2, 0, 0, 0, 0, 1, 1, 1]
    + [2] * 5 + [1] * 5
    + [2] * 5 + [1] * 5
    + [2] * 5 + [1] * 5
)


def test_lzw_matches_canonical_vector():
    assert lzw_encode(CANONICAL_PIXELS, 2) == CANONICAL_STREAM
    assert lzw_decode(CANONICAL_STREAM, 2) == CANONICAL_PIXELS


@pytest.mark.parametrize("seed,n,alphabet", [(0, 10, 256), (1, 5000, 256), (2, 60000, 4), (3, 200000, 2)])
def test_lzw_roundtrip(seed, n, alphabet):
    rng = np.random.default_rng(seed)
    data = bytes(rng.integers(0, alphabet, n, dtype=np.uint8))
    assert lzw_decode(lzw_encode(data)) == data


def test_lzw_roundtrip_runs_cross_dict_reset():
    # constant run long enough to fill the 4096-entry dictionary
    data = b"\x07" * 200_000
    assert lzw_decode(lzw_encode(data)) == data


def test_gif_multiframe_roundtrip():
    rng = np.random.default_rng(4)
    frames = [rng.integers(0, 256, (40, 80)).astype(np.uint8) for _ in range(5)]
    gif = encode_gif(frames, delay_cs=50)
    assert gif[:6] == b"GIF89a" and gif[-1:] == b"\x3b"
    back = decode_gif(gif)
    assert len(back) == 5
    for a, b in zip(frames, back):
        assert (a == b).all()


def _build_gif(frame, interlace=False, local_palette=None):
    """Hand-assemble a single-frame GIF89a exercising the two valid
    variants encode_gif never emits: interlaced row order (flag 0x40,
    rows stored in the four-pass 8/8, 4/8, 2/4, 1/2 sequence) and a
    frame-local color table (flag 0x80) that must override the global
    gray ramp."""
    import struct

    from meerpipe_spark.functions.gif import _sub_blocks, lzw_encode

    h, w = frame.shape
    out = bytearray(b"GIF89a") + struct.pack("<HH", w, h)
    out.append(0xF7)
    out += b"\x00\x00"
    for i in range(256):
        out += bytes((i, i, i))
    flags = 0
    data_rows = frame
    if interlace:
        order = np.concatenate([
            np.arange(0, h, 8), np.arange(4, h, 8),
            np.arange(2, h, 4), np.arange(1, h, 2),
        ])
        data_rows = frame[order]
        flags |= 0x40
    if local_palette is not None:
        flags |= 0x80 | 7
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([flags])
    if local_palette is not None:
        out += local_palette.tobytes()
    out.append(8)
    out += _sub_blocks(lzw_encode(np.ascontiguousarray(data_rows).tobytes(), 8))
    out += b"\x3b"
    return bytes(out)


def test_decode_interlaced_frame_restores_row_order():
    rng = np.random.default_rng(6)
    frame = rng.integers(0, 256, (11, 7)).astype(np.uint8)  # odd h: all 4 passes
    back = decode_gif(_build_gif(frame, interlace=True))
    assert len(back) == 1
    assert (back[0] == frame).all()
    # and the flag matters: the same pixel stream without de-interlacing
    # is NOT the original (guards against the pre-r13 silent scramble)
    scrambled = decode_gif(_build_gif(frame, interlace=False))
    order = np.concatenate([
        np.arange(0, 11, 8), np.arange(4, 11, 8),
        np.arange(2, 11, 4), np.arange(1, 11, 2),
    ])
    assert (scrambled[0] == frame).all()  # non-interlaced path unchanged
    assert not (frame[order] == frame).all()


def test_decode_local_palette_overrides_global():
    rng = np.random.default_rng(7)
    frame = rng.integers(0, 256, (9, 5)).astype(np.uint8)
    inv = np.stack([255 - np.arange(256)] * 3, axis=1).astype(np.uint8)
    back = decode_gif(_build_gif(frame, local_palette=inv))
    # indices map through the LOCAL inverted ramp, not the global one
    assert (back[0] == (255 - frame)).all()


def test_decode_interlaced_with_local_palette():
    rng = np.random.default_rng(8)
    frame = rng.integers(0, 256, (16, 4)).astype(np.uint8)
    inv = np.stack([255 - np.arange(256)] * 3, axis=1).astype(np.uint8)
    back = decode_gif(_build_gif(frame, interlace=True, local_palette=inv))
    assert (back[0] == (255 - frame)).all()


def test_render_profile_frame_shapes_and_traces():
    vals = np.sin(np.linspace(0, 2 * np.pi, 128)) + 2
    res = vals - vals.mean()
    img = render_profile_frame(vals, res, height=64)
    assert img.shape == (64, 128) and img.dtype == np.uint8
    # profile trace in the top half at 255, residual in bottom at 128
    assert (img[:32] == 255).sum() == 128
    assert (img[32:] == 128).sum() == 128


def test_write_profile_movie_end_to_end(spark, tmp_path):
    from meerpipe_spark.sinks import write_profile_movie

    rows = []
    for obs in ("obsA", "obsB"):
        for f in range(3):
            for b in range(32):
                v = float(np.sin(b / 5.0 + f) + 2)
                rows.append(Row(obs_id=obs, frame_idx=f, bin=b, value=v, residual=v - 2))
    frames = spark.createDataFrame(rows)
    manifest = {r.obs_id: r for r in write_profile_movie(frames, str(tmp_path)).collect()}
    assert set(manifest) == {"obsA", "obsB"}
    for obs, m in manifest.items():
        assert m.written and m.n_frames == 3
        data = (tmp_path / f"{obs}.gif").read_bytes()
        decoded = decode_gif(data)
        assert len(decoded) == 3 and decoded[0].shape == (64, 32)


def test_write_profile_movie_size_cap(spark, tmp_path):
    from meerpipe_spark.sinks import write_profile_movie

    rng = np.random.default_rng(5)
    rows = [
        Row(obs_id="big", frame_idx=f, bin=b, value=float(rng.standard_normal()),
            residual=float(rng.standard_normal()))
        for f in range(4) for b in range(64)
    ]
    frames = spark.createDataFrame(rows)
    out = write_profile_movie(frames, str(tmp_path), max_bytes=10).collect()[0]
    assert not out.written and not (tmp_path / "big.gif").exists()
