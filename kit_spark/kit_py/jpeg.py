"""Real baseline JPEG codec — pure numpy + stdlib, no image libraries.

Removes the engine's last image-format stub: ``\\xff\\xd8`` JFIF bytes now
decode for real.  Implements ITU-T T.81 baseline sequential DCT:

* ``encode_jpeg``: RGB -> BT.601 YCbCr, 4:4:4 (no chroma subsampling),
  8x8 FDCT (orthonormal matrix form, one einsum over all blocks),
  IJG quality-scaled Annex-K-style quantization tables, zigzag +
  DC-differential + AC run-length, canonical Huffman coding with the
  table definitions embedded in DHT segments, 0xFF byte stuffing.
* ``decode_jpeg``: marker parse (APPn skipped, DQT/SOF0/DHT/SOS), 16-bit
  peek table-driven Huffman decode, dequantize + IDCT vectorized across
  all blocks, YCbCr -> RGB.  Supports baseline 3-component 4:4:4 and
  single-component grayscale; progressive (SOF2), subsampled, arithmetic
  and restart-interval streams raise ``ValueError``.

The format is self-describing (quant + Huffman tables ride in the
stream), so any table set this encoder emits is decodable by standard
decoders; the inverse direction accepts any baseline 4:4:4 stream.  The
entropy-coding inner loop is per-symbol Python (inherent to Huffman's
sequential bit stream) — everything per-pixel/per-coefficient is numpy.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: flat 8x8 index (row*8+col) for each scan position
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

_Q_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.float64)
_Q_CHR = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.float64)


def _scaled_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_Q_LUM * s + 50) // 100, 1, 255)
    qc = np.clip((_Q_CHR * s + 50) // 100, 1, 255)
    return ql, qc


def _dct_matrix() -> np.ndarray:
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0, :] *= 1 / np.sqrt(2)
    return m


_M = _dct_matrix()

# Huffman table *definitions*: BITS (count of codes per length 1..16) and
# the value list, DHT-serializable.  These are the conventional tables;
# correctness does not depend on them specifically since DHT carries them.
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Value -> (code, length) per the canonical construction (T.81 C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    """MSB-first bit emitter with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self._out.append(byte)
            if byte == 0xFF:
                self._out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> bytes:
        if self._n:
            self.write(0x7F, 8 - self._n)  # pad with 1-bits per spec
        return bytes(self._out)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255)


def _to_blocks(chan: np.ndarray) -> np.ndarray:
    """HxW (8-multiple) -> (n_blocks, 8, 8) in raster block order."""
    h, w = chan.shape
    return (chan.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _from_blocks(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    return (blocks.reshape(h8 // 8, w8 // 8, 8, 8)
            .transpose(0, 2, 1, 3).reshape(h8, w8))


def _bit_size(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _segment(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dht_payload(tc: int, th: int, table) -> bytes:
    bits, values = table
    return bytes([tc << 4 | th] + bits + values)


def encode_jpeg(pixels: np.ndarray, quality: int = 92) -> bytes:
    """HxWx3 uint8 RGB -> baseline JFIF bytes (4:4:4)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_jpeg expects HxWx3 uint8")
    h, w = pixels.shape[:2]
    ql, qc = _scaled_tables(quality)
    ycc = _rgb_to_ycbcr(pixels.astype(np.float64))
    h8, w8 = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    ycc = np.pad(ycc, ((0, h8 - h), (0, w8 - w), (0, 0)), mode="edge")

    # all components: FDCT + quantize, vectorized over every block at once
    comp_zz = []
    for ci in range(3):
        blocks = _to_blocks(ycc[..., ci]) - 128.0
        coef = np.einsum("ux,nxy,vy->nuv", _M, blocks, _M)
        q = ql if ci == 0 else qc
        qz = np.round(coef / q[None]).astype(np.int64)
        comp_zz.append(qz.reshape(-1, 64)[:, ZIGZAG])

    dc_codes = [_canonical_codes(*_DC_LUM), _canonical_codes(*_DC_CHR)]
    ac_codes = [_canonical_codes(*_AC_LUM), _canonical_codes(*_AC_CHR)]
    bw = _BitWriter()
    pred = [0, 0, 0]
    for b in range(comp_zz[0].shape[0]):  # MCU raster order, 4:4:4
        for ci in range(3):
            tid = 0 if ci == 0 else 1
            zz = comp_zz[ci][b]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            size = _bit_size(diff)
            code, length = dc_codes[tid][size]
            bw.write(code, length)
            if size:
                bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = int(nz[-1]) + 1 if nz.size else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[tid][0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                size = _bit_size(v)
                code, length = ac_codes[tid][(run << 4) | size]
                bw.write(code, length)
                bw.write(v if v > 0 else v + (1 << size) - 1, size)
                run = 0
            if last < 63:
                code, length = ac_codes[tid][0x00]  # EOB
                bw.write(code, length)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _segment(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _segment(0xFFDB, bytes([0]) + bytes(
        ql.astype(np.uint8).reshape(64)[ZIGZAG]))
    out += _segment(0xFFDB, bytes([1]) + bytes(
        qc.astype(np.uint8).reshape(64)[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])  # 1x1 sampling: 4:4:4
    out += _segment(0xFFC0, sof)
    out += _segment(0xFFC4, _dht_payload(0, 0, _DC_LUM))
    out += _segment(0xFFC4, _dht_payload(1, 0, _AC_LUM))
    out += _segment(0xFFC4, _dht_payload(0, 1, _DC_CHR))
    out += _segment(0xFFC4, _dht_payload(1, 1, _AC_CHR))
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])
    out += _segment(0xFFDA, sos)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _decode_tables(bits: list[int], values: list[int]):
    """16-bit-peek lookup arrays: peeked value -> (symbol, code length)."""
    sym = np.zeros(1 << 16, dtype=np.int16) - 1
    ln = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym[lo:hi] = values[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return sym, ln


class _BitReader:
    """MSB-first reader over unstuffed scan bytes with 16-bit peeks."""

    def __init__(self, data: bytes) -> None:
        self._data = data + b"\x00\x00"  # peek slack past the final bits
        self._pos = 0
        self._acc = 0
        self._n = 0

    def peek16(self) -> int:
        while self._n < 16:
            self._acc = (self._acc << 8) | self._data[self._pos]
            self._pos += 1
            self._n += 8
        return (self._acc >> (self._n - 16)) & 0xFFFF

    def skip(self, length: int) -> None:
        self._n -= length
        self._acc &= (1 << self._n) - 1

    def read(self, length: int) -> int:
        if length == 0:
            return 0
        while self._n < length:
            self._acc = (self._acc << 8) | self._data[self._pos]
            self._pos += 1
            self._n += 8
        v = (self._acc >> (self._n - length)) & ((1 << length) - 1)
        self._n -= length
        self._acc &= (1 << self._n) - 1
        return v


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if v < (1 << (size - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> HxWx3 uint8 RGB (grayscale expanded)."""
    try:
        return _decode_jpeg(data)
    except (IndexError, struct.error, KeyError) as exc:
        # truncated segments (IndexError/struct.error) and dangling table /
        # component ids (KeyError on qtabs/htabs/component lookup) — all
        # must surface as ValueError for the per-row decode guards
        raise ValueError(f"truncated/corrupt JPEG stream: {exc}") from exc


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], tuple] = {}
    sof = None
    scan = None
    comps_sos = None
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 4 <= n and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > n or data[pos + 1] == 0xFF:
            # stream ends in fill bytes (conforming padding just before
            # EOI): treat as end-of-stream, not a 0xFF "marker" whose
            # length field would be parsed from trailing bytes
            break
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        payload = data[pos + 2:pos + seglen]
        body_end = pos + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                zz = np.frombuffer(payload[p + 1:p + 65], dtype=np.uint8)
                qtabs[tq] = zz.astype(np.float64)[UNZIGZAG].reshape(8, 8)
                p += 65
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = payload[6 + 3 * ci:9 + 3 * ci]
                if hv != 0x11:
                    raise ValueError("subsampled JPEG not supported (4:4:4 only)")
                comps.append((cid, tq))
            sof = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1:p + 17])
                cnt = sum(bits)
                values = list(payload[p + 17:p + 17 + cnt])
                htabs[(tc, th)] = _decode_tables(bits, values)
                p += 17 + cnt
        elif marker == 0xDD:
            raise ValueError("restart intervals not supported")
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            comps_sos = [(payload[1 + 2 * i], payload[2 + 2 * i] >> 4,
                          payload[2 + 2 * i] & 0x0F) for i in range(ns)]
            # entropy data runs to the next real marker (unstuff FF00)
            end = body_end
            while end < n - 1:
                if data[end] == 0xFF and data[end + 1] not in (0x00,):
                    break
                end += 1
            scan = data[body_end:end].replace(b"\xff\x00", b"\xff")
            pos = end
            continue
        pos = body_end
    if sof is None or scan is None or comps_sos is None:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps = sof
    h8, w8 = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    n_blocks = (h8 // 8) * (w8 // 8)
    nc = len(comps)
    zz_all = [np.zeros((n_blocks, 64), dtype=np.float64) for _ in range(nc)]

    br = _BitReader(scan)
    pred = [0] * nc
    sos_by_cid = {cid: (td, ta) for cid, td, ta in comps_sos}
    for b in range(n_blocks):
        for ci, (cid, _tq) in enumerate(comps):
            td, ta = sos_by_cid[cid]
            dsym, dln = htabs[(0, td)]
            asym, aln = htabs[(1, ta)]
            peek = br.peek16()
            size = int(dsym[peek])
            if size < 0:
                raise ValueError("invalid DC Huffman code")
            br.skip(int(dln[peek]))
            diff = _extend(br.read(size), size) if size else 0
            pred[ci] += diff
            block = zz_all[ci][b]
            block[0] = pred[ci]
            k = 1
            while k < 64:
                peek = br.peek16()
                rs = int(asym[peek])
                if rs < 0:
                    raise ValueError("invalid AC Huffman code")
                br.skip(int(aln[peek]))
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += rs >> 4
                size = rs & 0x0F
                if k > 63:
                    raise ValueError("AC coefficient overrun")
                block[k] = _extend(br.read(size), size)
                k += 1

    planes = []
    for ci, (_cid, tq) in enumerate(comps):
        coef = zz_all[ci][:, UNZIGZAG].reshape(-1, 8, 8) * qtabs[tq][None]
        blocks = np.einsum("xu,nuv,yv->nxy", _M.T, coef, _M.T) + 128.0
        planes.append(_from_blocks(blocks, h8, w8)[:h, :w])
    if nc == 1:
        gray = np.clip(planes[0], 0, 255)
        return np.repeat(np.rint(gray).astype(np.uint8)[..., None], 3, axis=2)
    if nc != 3:
        raise ValueError(f"unsupported component count {nc}")
    rgb = _ycbcr_to_rgb(np.stack(planes, axis=-1))
    return np.rint(rgb).astype(np.uint8)
