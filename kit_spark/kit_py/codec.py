"""Deterministic image codec + PSNR / perceptual hash.

The BASELINE.json:15 input table carries opaque ``bytes:binary`` image
payloads with ``fmt in {png, jpeg}`` and a per-row fetch invariant:
decoded-pixel allclose (PSNR >= 40 dB for lossy formats, exact for lossless)
plus caption equality.

* **png is real**: the lossless path emits and decodes genuine PNG bytes
  via the in-repo stdlib-zlib codec (kit_py/png.py — CRC-correct chunks,
  all five scanline filters on decode).  No image library needed.
* **jpeg is real too**: the lossy path emits and decodes genuine baseline
  JFIF (kit_py/jpeg.py — 4:4:4 DCT, quality-scaled quantization,
  canonical Huffman; quality 98 holds PSNR >= 43 dB even on the
  noise-dominated synthetic pixels, above the 40 dB invariant).
* ``kimg-q`` (``FMT_LOSSY_FAST``) is the deterministic quantization
  stand-in kept for the *throughput* kernels (bench fetch-verify, host
  capacity probe): pure-Python JPEG entropy coding is ~50x slower than
  the libjpeg-turbo a production executor would call, so benchmarking
  with it would measure the interpreter, not the engine — the stand-in's
  zlib-bound cost is the honest proxy for a C codec.  Its payloads are
  header + zlib(quantized RGB), uniform step 4, PSNR ~= 46.9 dB.

Everything per-pixel is numpy-vectorized; the only per-symbol Python is
JPEG's inherently sequential Huffman bit stream.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC_LOSSLESS = b"KIMG"
MAGIC_LOSSY = b"KIMQ"
_QUANT_STEP = 4

FMT_LOSSLESS = "png"       # real PNG (kit_py/png.py)
FMT_LOSSY = "jpeg"         # real baseline JPEG (kit_py/jpeg.py)
FMT_LOSSY_FAST = "kimg-q"  # deterministic stand-in: C-codec cost proxy
JPEG_QUALITY = 98          # keeps PSNR >= 40 dB on noise-dominated pixels


_SM_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_C2 = np.uint64(0x94D049BB133111EB)


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic RGB pixels for an image id — counter-based splitmix64
    noise (fully vectorized, no RNG state) plus a smooth gradient so lossy
    quantization has structure to distort."""
    seed = np.uint64(zlib.crc32(image_id.encode("utf-8")))
    n = h * w * 3
    with np.errstate(over="ignore"):
        z = (np.arange(n, dtype=np.uint64)
             + seed * np.uint64(0x9E3779B97F4A7C15) + np.uint64(1))
        z = (z ^ (z >> np.uint64(30))) * _SM_C1
        z = (z ^ (z >> np.uint64(27))) * _SM_C2
        z = z ^ (z >> np.uint64(31))
    noise = (z & np.uint64(0xFF)).astype(np.int32).reshape(h, w, 3)
    xx = (np.arange(w, dtype=np.int32) * 255) // max(w - 1, 1)
    yy = (np.arange(h, dtype=np.int32) * 255) // max(h - 1, 1)
    grad = (xx[None, :] + yy[:, None]) // 2
    out = (noise + grad[..., None]) % 256
    return out.astype(np.uint8)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode HxWx3 uint8 pixels: real PNG / real JPEG / kimg-q fast path."""
    if fmt == FMT_LOSSLESS:
        from kit_spark.kit_py.png import encode_png

        return encode_png(pixels, level=1)
    if fmt == FMT_LOSSY:
        from kit_spark.kit_py.jpeg import encode_jpeg

        return encode_jpeg(pixels, quality=JPEG_QUALITY)
    if fmt == FMT_LOSSY_FAST:
        h, w = pixels.shape[:2]
        q = (pixels.astype(np.int32) // _QUANT_STEP * _QUANT_STEP + _QUANT_STEP // 2)
        q = np.clip(q, 0, 255).astype(np.uint8)
        payload = zlib.compress(q.tobytes(), level=1)
        return MAGIC_LOSSY + struct.pack("<II", w, h) + payload
    raise ValueError(f"unknown fmt: {fmt}")


def decode_image(data: bytes) -> np.ndarray:
    """Decode image bytes -> HxWx3 uint8.

    PNG and baseline JPEG decode for real (kit_py/png.py, kit_py/jpeg.py);
    ``kimg`` stand-in headers decode natively.
    """
    if data[:4] == b"\x89PNG":
        from kit_spark.kit_py.png import decode_png

        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        from kit_spark.kit_py.jpeg import decode_jpeg

        return decode_jpeg(data)
    magic = data[:4]
    if magic in (MAGIC_LOSSLESS, MAGIC_LOSSY):
        w, h = struct.unpack("<II", data[4:12])
        raw = zlib.decompress(data[12:])
        return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    raise ValueError("unknown image container")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def verify_row(data: bytes, image_id: str, w: int, h: int, fmt: str) -> tuple[bool, float]:
    """Per-row fetch invariant (BASELINE.json:15): decode and compare with
    the reference pixels — exact for lossless, PSNR >= 40 dB for lossy.
    Returns (ok, psnr_db)."""
    decoded = decode_image(data)
    if decoded.shape != (h, w, 3):
        return False, 0.0
    ref = synth_pixels(image_id, w, h)
    if fmt == FMT_LOSSLESS:
        ok = bool(np.array_equal(decoded, ref))
        return ok, float("inf") if ok else psnr(decoded, ref)
    db = psnr(decoded, ref)
    return db >= 40.0, db


def phash64(pixels: np.ndarray) -> int:
    """64-bit mean-threshold perceptual hash over an 8x8 grayscale reduce.

    Signed int64 output (Spark LongType / parquet int64 compatible).
    """
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = np.linspace(0, h, 9, dtype=np.int64)
    xs = np.linspace(0, w, 9, dtype=np.int64)
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            block = gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                         xs[j]:max(xs[j + 1], xs[j] + 1)]
            cells[i, j] = block.mean()
    bits = (cells > cells.mean()).flatten()
    value = 0
    for bit in bits:
        value = (value << 1) | int(bit)
    return value - (1 << 64) if value >= (1 << 63) else value
