"""Minimal pure-Python PNG codec (stdlib ``zlib``/``struct`` + numpy).

Exists so the multimodal image path (`sources/multimodal.py:resize_images`)
can execute its REAL decode->resize->encode branch in environments without
PIL — the container this engine is developed in has no image libraries, and
a stubbed decode was the one component that could never run end-to-end.

Scope (deliberately small, spec-compliant subset — W3C PNG spec / RFC 2083):
- 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA)
- non-interlaced only
- all five row filters on decode (None/Sub/Up/Average/Paeth)
- encode writes filter-0 rows, one IDAT chunk

This is a *codec of last resort*: per-row Python loops are fine for test
assets and metadata probes; production clusters install PIL/turbojpeg and
`multimodal.resize_images` automatically prefers them.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: channels per supported color type
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(b: bytes | None) -> bool:
    return b is not None and b[:8] == SIGNATURE


def _chunks(b: bytes):
    pos = 8
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            break


def read_dims(b: bytes) -> tuple[int, int]:
    """(width, height) from IHDR without decompressing pixel data — the
    cheap metadata probe `decode_media_meta` uses."""
    if not is_png(b) or len(b) < 24:
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", b[16:24])
    return int(w), int(h)


def decode(b: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array of shape (height, width, channels)."""
    if not is_png(b):
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    for ctype, data in _chunks(b):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG (bit_depth={bit_depth}, color_type={color_type}, "
            f"interlace={interlace}); this codec handles 8-bit non-interlaced "
            "gray/RGB/gray-alpha/RGBA"
        )
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")

    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).copy()
        if ftype == 0:  # None
            pass
        elif ftype == 2:  # Up
            row += prev
        elif ftype == 1:  # Sub — sequential in x, loop over pixels
            for x in range(ch, stride):
                row[x] = (int(row[x]) + int(row[x - ch])) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - ch]) if x >= ch else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - ch]) if x >= ch else 0
                bb = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                row[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = row
        prev = out[y]
    return out.reshape(height, width, ch)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) or (h, w, channels in {1,2,3,4}) -> PNG bytes."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype != np.uint8 or arr.ndim != 3:
        raise ValueError("encode expects a uint8 array of shape (h, w[, c])")
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    stride = w * ch
    flat = arr.reshape(h, stride)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (pixel-center sampling) — the
    same grid every numpy build computes identically, unlike interpolating
    filters whose rounding can differ between BLAS/SIMD paths."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(out_h) + 0.5) * h / out_h, h - 1).astype(np.int64)
    xs = np.minimum((np.arange(out_w) + 0.5) * w / out_w, w - 1).astype(np.int64)
    return arr[ys][:, xs]
