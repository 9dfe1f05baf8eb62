"""Pure-numpy PNG codec tests: roundtrip, all five scanline filters,
box resize, and the real decode-resize-reencode path through the K3
image-cap sink and the media feature extractor."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import Row

from meerpipe_spark.functions.png import (
    PNG_SIGNATURE,
    _chunk,
    decode_png,
    encode_png,
    png_resize_reencode,
    resize_box,
)


@pytest.mark.parametrize("shape", [(7, 5), (8, 8, 3), (4, 6, 4), (3, 3, 2)])
def test_roundtrip(shape):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    back = decode_png(encode_png(img))
    np.testing.assert_array_equal(back, img)


def _apply_filter(ftype: int, cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Reference scanline filtering (W3C PNG spec definitions)."""
    c = cur.astype(np.int32)
    p = prev.astype(np.int32)
    n = len(c)
    out = np.empty(n, dtype=np.int32)
    for x in range(n):
        left = c[x - bpp] if x >= bpp else 0
        up = p[x]
        ul = p[x - bpp] if x >= bpp else 0
        if ftype == 0:
            out[x] = c[x]
        elif ftype == 1:
            out[x] = c[x] - left
        elif ftype == 2:
            out[x] = c[x] - up
        elif ftype == 3:
            out[x] = c[x] - (left + up) // 2
        elif ftype == 4:
            pr = left + up - ul
            pa, pb, pc = abs(pr - left), abs(pr - up), abs(pr - ul)
            pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            out[x] = c[x] - pred
    return (out % 256).astype(np.uint8)


@pytest.mark.parametrize("channels", [1, 3])
def test_decode_all_filter_types(channels):
    """Hand-build a PNG whose five scanlines use filters 0..4; the decoder
    must reconstruct the original pixels for each."""
    rng = np.random.default_rng(11)
    h, w = 5, 6
    img = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    stride = w * channels
    flat = img.reshape(h, stride)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = y % 5
        raw.append(ftype)
        raw.extend(_apply_filter(ftype, flat[y], prev, channels).tobytes())
        prev = flat[y]
    color_type = {1: 0, 3: 2}[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    data = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    back = decode_png(data)
    np.testing.assert_array_equal(back.reshape(h, w, channels), img)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"definitely not a png")


def test_resize_box_constant_and_shape():
    img = np.full((40, 60, 3), 123, dtype=np.uint8)
    half = resize_box(img, 0.5)
    assert half.shape == (20, 30, 3)
    assert (half == 123).all()
    tiny = resize_box(img, 0.001)  # never collapses below 1x1
    assert tiny.shape == (1, 1, 3)
    # box average: 2x2 blocks of a checkerboard average to the midpoint
    cb = np.zeros((4, 4), dtype=np.uint8)
    cb[::2, 1::2] = 255
    cb[1::2, ::2] = 255
    out = resize_box(cb, 0.5)
    assert out.shape == (2, 2)
    assert (np.abs(out.astype(int) - 128) <= 1).all()


def test_png_resize_reencode_shrinks_noise():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(256, 256, 3), dtype=np.uint8)
    payload = encode_png(img)
    smaller = png_resize_reencode(payload, 0.5)
    assert len(smaller) < len(payload)
    assert decode_png(smaller).shape == (128, 128, 3)


def test_cap_image_sizes_real_png(spark):
    """K3 with REAL pixels: an incompressible PNG over the cap comes out
    a VALID PNG under the cap (decode proves a real re-encode happened —
    the truncation stub would produce an unparseable payload)."""
    from meerpipe_spark.sinks import cap_image_sizes

    rng = np.random.default_rng(5)
    big = encode_png(rng.integers(0, 256, size=(700, 700, 3), dtype=np.uint8))
    assert len(big) > 1_000_000
    df = spark.createDataFrame([Row(media_id=1, payload=big)])
    out = cap_image_sizes(df, cap_bytes=1_000_000).collect()[0]
    assert out.resized and out.n_bytes <= 1_000_000
    shrunk = decode_png(bytes(out.payload))  # valid PNG, real pixels
    assert shrunk.ndim == 3 and shrunk.shape[2] == 3
    assert shrunk.shape[0] < 700 and shrunk.shape[1] < 700


def test_decode_image_real_png_feature(spark):
    from meerpipe_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    rng = np.random.default_rng(9)
    png_a = encode_png(rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8))
    png_b = encode_png(rng.integers(0, 256, size=(20, 20), dtype=np.uint8))
    rows = [
        Row(media_id=1, kind="image", payload=png_a, mime="image/png",
            width=48, height=32, duration_s=None),
        Row(media_id=2, kind="image", payload=png_b, mime="image/png",
            width=20, height=20, duration_s=None),
        Row(media_id=3, kind="image", payload=b"not-an-image", mime="image/bmp",
            width=1, height=1, duration_s=None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    from meerpipe_spark.operators.multimodal import decode_image_real

    out = {
        r.media_id: r
        for r in extract_features(media, dim=16, decoder=decode_image_real).collect()
    }
    assert out[1].decode_ok and out[2].decode_ok
    assert not out[3].decode_ok  # opaque format -> isolated failure
    assert len(out[1].feature) == 16
    assert sum(x * x for x in out[1].feature) == pytest.approx(1.0, rel=1e-5)
    # deterministic in the pixels
    again = {
        r.media_id: r.feature
        for r in extract_features(media, dim=16, decoder=decode_image_real).collect()
    }
    assert again[1] == out[1].feature
