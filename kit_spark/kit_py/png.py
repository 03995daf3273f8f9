"""Real PNG codec — pure stdlib ``zlib`` + numpy, no image libraries.

Implements the PNG container (RFC 2083 / ISO 15948) far enough to make the
engine's lossless image path a *genuine* format rather than a stand-in:

* ``encode_png``: 8-bit RGB (color type 2), non-interlaced, one zlib IDAT,
  filter type 0 on every scanline, CRC-correct chunks — output opens in any
  image viewer.
* ``decode_png``: parses the chunk stream (CRC-verified), supports bit
  depth 8, color types 0 (grayscale, expanded to RGB), 2 (RGB) and
  6 (RGBA, alpha dropped), and **all five scanline filters**
  (None/Sub/Up/Average/Paeth) so standard-encoder output decodes too.
  Interlaced (Adam7) and palette images raise ``ValueError`` — they are
  outside the engine's input contract (BASELINE.json:15 fmt in {png,jpeg}).

Scanlines with no left-neighbor dependency (filters 0/2) unfilter fully
vectorized; Sub/Average/Paeth need the sequential left scan the format
defines.  Our own encoder always emits filter 0, so the hot decode path
(engine-synthesized tables) never enters the sequential branch.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray, level: int = 6) -> bytes:
    """HxWx3 uint8 -> real PNG bytes (RGB8, non-interlaced, filter 0)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_png expects HxWx3 uint8")
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # one filter byte (0 = None) prepended per scanline, vectorized
    lines = np.zeros((h, w * 3 + 1), dtype=np.uint8)
    lines[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(lines.tobytes(), level)
    return (SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def _iter_chunks(data: bytes):
    pos = len(SIGNATURE)
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if len(payload) != length or pos + 12 + length > n:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        yield tag, payload
        pos += 12 + length
        if tag == b"IEND":
            return
    raise ValueError("PNG stream ended without IEND")


def _unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data has wrong length")
    out = np.zeros((h, stride), dtype=np.uint8)
    flat = np.frombuffer(raw, dtype=np.uint8)
    for y in range(h):
        base = y * (stride + 1)
        ftype = int(flat[base])
        line = flat[base + 1:base + 1 + stride].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up: no left dependency, vectorized
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth: sequential left scan
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                if ftype == 1:
                    val = line[i] + a
                elif ftype == 3:
                    val = line[i] + ((a + int(prev[i])) >> 1)
                else:
                    b = int(prev[i])
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    val = line[i] + pred
                cur[i] = val & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Real PNG bytes -> HxWx3 uint8 (RGB; grayscale expanded, alpha dropped).

    Every corrupt-payload failure mode surfaces as ``ValueError`` so the
    per-row guards in the fetch/decode operators (which catch ValueError /
    NotImplementedError to mark a row failed instead of killing the task)
    see a uniform contract — a corrupt IDAT otherwise escapes as
    ``zlib.error``.
    """
    try:
        return _decode_png(data)
    except (zlib.error, struct.error, IndexError) as exc:
        raise ValueError(f"truncated/corrupt PNG stream: {exc}") from exc


def _decode_png(data: bytes) -> np.ndarray:
    if data[:8] != SIGNATURE:
        raise ValueError("not a PNG stream")
    ihdr = None
    idat_parts: list[bytes] = []
    for tag, payload in _iter_chunks(data):
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat_parts.append(payload)
    if ihdr is None or not idat_parts:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0:
        raise ValueError("unsupported PNG (need bit depth 8, method 0)")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    channels = {0: 1, 2: 3, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color}")
    raw = zlib.decompress(b"".join(idat_parts))
    px = _unfilter(raw, h, w, channels).reshape(h, w, channels)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 4:
        return np.ascontiguousarray(px[:, :, :3])
    return px
