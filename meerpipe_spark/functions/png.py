"""Pure-numpy + stdlib-zlib PNG codec.

The reference caps its pipeline images at 1 MB by iteratively resizing
and re-encoding with PIL (generate_images_results.py:176-191). PIL does
not ship in this container, so this module provides a REAL codec built
only on ``zlib`` (stdlib) and numpy — enough to make the image-cap sink
and the media feature extractor operate on actual pixels:

- :func:`encode_png` — 8-bit grayscale / RGB / RGBA, filter 0, zlib IDAT;
- :func:`decode_png` — bit depth 8, color types 0/2/4/6, all five scanline
  filters (None/Sub/Up/Average/Paeth), non-interlaced;
- :func:`resize_box` — deterministic box-average downscale (area filter);
- :func:`png_resize_reencode` — the ``resize(payload, factor)`` callable
  contract used by ``sinks.cap_image_sizes``.

Where PIL IS importable, callers should prefer it (LANCZOS + JPEG
quality=85 like the reference); see ``sinks.default_image_resize`` which
picks PIL → this codec → proportional-truncation stub in that order.

PNG format per the public W3C spec (RFC 2083); no external code.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_COLOR_TYPE_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode HxW (gray), HxWx2 (gray+alpha), HxWx3 (RGB) or HxWx4 (RGBA)
    uint8 array as a PNG (filter type 0 on every scanline)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError(f"encode_png wants uint8, got {a.dtype}")
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"encode_png wants HxW[x{{1,2,3,4}}], got shape {arr.shape}")
    h, w, ch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 prepended to each scanline
    raw = np.empty((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = a.reshape(h, w * ch)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering → reconstructed bytes (h, stride)."""
    lines = raw.reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(lines[y, 0])
        cur = lines[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, dtype=np.int32)
        if ftype == 0:  # None
            rec = cur
        elif ftype == 1:  # Sub: recon[x] = cur[x] + recon[x-bpp]
            rec = cur.copy()
            # per-byte-offset prefix sum mod 256 along a stride of bpp
            for off in range(bpp):
                rec[off::bpp] = np.cumsum(rec[off::bpp]) % 256
        elif ftype == 2:  # Up
            rec = (cur + prev) % 256
        elif ftype == 3:  # Average
            rec = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (cur[x] + (left + prev[x]) // 2) % 256
        elif ftype == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                rec[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG → uint8 array HxW (gray) or
    HxWxC. Palette (type 3) and sub-byte depths are out of scope."""
    if not data.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIGNATURE)
    width = height = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + payload + crc
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color_type not in _COLOR_TYPE_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = _COLOR_TYPE_CHANNELS[color_type]
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None or channels is None:
        raise ValueError("PNG missing IHDR")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * channels
    if raw.size != height * (1 + stride):
        raise ValueError(
            f"PNG data size {raw.size} != expected {height * (1 + stride)}"
        )
    out = _unfilter(raw, height, stride, channels).reshape(height, width, channels)
    return out[:, :, 0] if channels == 1 else out


def resize_box(arr: np.ndarray, factor: float) -> np.ndarray:
    """Deterministic area (box-average) resample by ``factor`` on both
    dimensions. Downscale groups source pixels per destination pixel via
    index mapping; upscale repeats (nearest). Always returns >= 1x1."""
    a = np.asarray(arr)
    squeeze = a.ndim == 2
    if squeeze:
        a = a[:, :, None]
    h, w, ch = a.shape
    nh = max(1, int(round(h * factor)))
    nw = max(1, int(round(w * factor)))
    # map each destination row/col to a source slice [lo, hi)
    ys = (np.arange(nh + 1) * h / nh).round().astype(int)
    xs = (np.arange(nw + 1) * w / nw).round().astype(int)
    ys[-1], xs[-1] = h, w
    # cumulative-sum integral image → box means in O(1) per cell
    integral = np.zeros((h + 1, w + 1, ch), dtype=np.float64)
    integral[1:, 1:] = np.cumsum(np.cumsum(a, axis=0), axis=1)
    y0, y1 = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1).clip(max=h)
    x0, x1 = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1).clip(max=w)
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    total = (
        integral[y1][:, x1]
        - integral[y1][:, x0]
        - integral[y0][:, x1]
        + integral[y0][:, x0]
    )
    out = np.clip(np.rint(total / area[:, :, None]), 0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


def png_resize_reencode(payload: bytes, factor: float, compress_level: int = 6) -> bytes:
    """The ``resize(payload, factor) -> bytes`` contract for
    ``sinks.cap_image_sizes``: decode → box-resize both dimensions →
    re-encode. Raises on non-PNG input (caller falls back)."""
    img = decode_png(payload)
    return encode_png(resize_box(img, factor), compress_level)
