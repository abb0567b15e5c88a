"""PNG encode/decode on the stdlib (zlib) + numpy — no image libraries.

Decode: 8-bit greyscale (color type 0), RGB (2), RGBA (6), all five
scanline filters (None/Sub/Up/Average/Paeth), multi-IDAT streams.
Palette/interlace/16-bit are rejected with clear errors. Encode: 8-bit
RGB, filter 0, one IDAT. Spec: the public PNG standard (RFC 2083 /
ISO 15948). Role: the reference's image side-channel content handling
(harvester/image_harvest.py:67-102) — here the codec is in-engine.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, filter_type: int = 1) -> bytes:
    """(h, w, 3) uint8 RGB → PNG bytes (single IDAT).

    ``filter_type`` 0-4 applies that scanline filter to every row
    (filters run on RAW neighbor values, so the encode side is fully
    vectorized; default Sub compresses gradients well and exercises a
    non-trivial decode path)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB")
    if not 0 <= filter_type <= 4:
        raise ValueError("filter_type must be 0..4")
    h, w = img.shape[:2]
    flat = img.reshape(h, w * 3)
    bpp = 3
    a = np.zeros_like(flat)
    a[:, bpp:] = flat[:, :-bpp]                   # left neighbor
    b = np.zeros_like(flat)
    b[1:] = flat[:-1]                             # up neighbor
    c = np.zeros_like(flat)
    c[1:, bpp:] = flat[:-1, :-bpp]                # up-left neighbor
    if filter_type == 0:
        filtered = flat
    elif filter_type == 1:
        filtered = flat - a
    elif filter_type == 2:
        filtered = flat - b
    elif filter_type == 3:
        filtered = flat - ((a.astype(np.int32) + b.astype(np.int32)) // 2
                           ).astype(np.uint8)
    else:
        filtered = flat - _paeth(a, b, c)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(bytes([filter_type]) + filtered[r].tobytes()
                   for r in range(h))
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b""))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a,
                   np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB (grey replicated, alpha dropped)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(data):
        ln, tag = struct.unpack(">I4s", data[pos:pos + 8])
        payload = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth}: only 8 supported")
    if interlace:
        raise NotImplementedError("Adam7 interlacing not supported")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise NotImplementedError(f"color type {ctype} (palette?) "
                                  "not supported")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    bpp = channels
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ftype = raw[r * (stride + 1)]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=r * (stride + 1) + 1)
        if ftype == 0:
            cur = line.copy()
        elif ftype == 2:      # Up
            cur = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            # PNG filter arithmetic is mod 256 by spec — explicit & 0xFF
            cur = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if ftype == 1:
                    cur[x] = (int(line[x]) + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (int(line[x]) + (a + b) // 2) & 0xFF
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                    cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown filter {ftype}")
        out[r] = cur
        prev = cur
    px = out.reshape(h, w, channels)
    if channels == 1:
        return np.dstack([px[..., 0]] * 3)
    if channels == 2:          # grey + alpha
        return np.dstack([px[..., 0]] * 3)
    return px[..., :3].copy()
