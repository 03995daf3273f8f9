"""Real-PNG codec tests (kit_py/png.py): round-trip, every scanline filter,
chunk CRC verification, color-type expansion."""

import struct
import zlib

import numpy as np
import pytest

from kit_spark.kit_py import png as P


def _rand(h, w, c, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8).astype(np.uint8)


def test_round_trip_exact():
    px = _rand(21, 33, 3, 1)
    assert np.array_equal(P.decode_png(P.encode_png(px)), px)


def test_round_trip_1x1_and_wide():
    for h, w in ((1, 1), (1, 257), (257, 1)):
        px = _rand(h, w, 3, h * 1000 + w)
        assert np.array_equal(P.decode_png(P.encode_png(px)), px)


def _manual_png(px, filter_fn, color=2):
    """Build a PNG applying `filter_fn(y, line, prev, bpp) -> (ftype, bytes)`
    per scanline — lets tests exercise decode of filters our encoder never
    emits."""
    h, w, c = px.shape
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int32)
        ftype, fline = filter_fn(y, line, prev, c)
        raw.append(ftype)
        raw.extend(bytes(bytearray(int(v) & 0xFF for v in fline)))
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (P.SIGNATURE + P._chunk(b"IHDR", ihdr)
            + P._chunk(b"IDAT", zlib.compress(bytes(raw)))
            + P._chunk(b"IEND", b""))


def _sub(y, line, prev, bpp):
    out = [line[i] - (line[i - bpp] if i >= bpp else 0) for i in range(len(line))]
    return 1, out


def _up(y, line, prev, bpp):
    return 2, list(line - prev)


def _avg(y, line, prev, bpp):
    out = [line[i] - (((line[i - bpp] if i >= bpp else 0) + prev[i]) >> 1)
           for i in range(len(line))]
    return 3, out


def _paeth(y, line, prev, bpp):
    out = []
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out.append(line[i] - pred)
    return 4, out


@pytest.mark.parametrize("filt", [_sub, _up, _avg, _paeth])
def test_decode_all_filter_types(filt):
    px = _rand(9, 13, 3, 7)
    assert np.array_equal(P.decode_png(_manual_png(px, filt)), px)


def test_decode_mixed_filters_per_scanline():
    px = _rand(8, 8, 3, 11)
    filters = [_sub, _up, _avg, _paeth]

    def mixed(y, line, prev, bpp):
        return filters[y % 4](y, line, prev, bpp)

    assert np.array_equal(P.decode_png(_manual_png(px, mixed)), px)


def test_grayscale_expands_and_rgba_drops_alpha():
    gray = _rand(6, 5, 1, 3)
    data = _manual_png(gray, lambda y, l, p, b: (0, list(l)), color=0)
    out = P.decode_png(data)
    assert out.shape == (6, 5, 3)
    assert np.array_equal(out[:, :, 0], gray[:, :, 0])
    assert np.array_equal(out[:, :, 1], gray[:, :, 0])

    rgba = _rand(4, 7, 4, 5)
    data = _manual_png(rgba, lambda y, l, p, b: (0, list(l)), color=6)
    assert np.array_equal(P.decode_png(data), rgba[:, :, :3])


def test_crc_corruption_rejected():
    px = _rand(5, 5, 3, 9)
    data = bytearray(P.encode_png(px))
    data[40] ^= 0xFF  # flip a byte inside IDAT payload
    with pytest.raises(ValueError, match="CRC"):
        P.decode_png(bytes(data))


def test_truncation_and_bad_signature_rejected():
    px = _rand(5, 5, 3, 13)
    data = P.encode_png(px)
    with pytest.raises(ValueError):
        P.decode_png(data[:30])
    with pytest.raises(ValueError):
        P.decode_png(b"NOTAPNG!" + data[8:])


def test_interlaced_rejected():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)  # interlace=1
    data = (P.SIGNATURE + P._chunk(b"IHDR", ihdr)
            + P._chunk(b"IDAT", zlib.compress(b"\x00" * (4 * 13)))
            + P._chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="interlaced"):
        P.decode_png(data)


def test_corrupt_idat_surfaces_as_valueerror():
    """A corrupt IDAT is a zlib.error inside; the per-row decode guards
    require every corrupt payload to surface as ValueError."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from kit_spark.kit_py.png import decode_png, encode_png

    data = bytearray(encode_png(np.zeros((8, 8, 3), dtype=np.uint8)))
    pos = 8
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = bytes(data[pos + 4:pos + 8])
        if tag == b"IDAT":
            garbage = bytes((i * 37 + 5) % 256 for i in range(length))
            data[pos + 8:pos + 8 + length] = garbage
            crc = zlib.crc32(tag + garbage) & 0xFFFFFFFF
            data[pos + 8 + length:pos + 12 + length] = struct.pack(">I", crc)
            break
        pos += 12 + length
    with pytest.raises(ValueError):
        decode_png(bytes(data))
