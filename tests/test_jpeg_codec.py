"""Baseline-JPEG codec tests (kit_py/jpeg.py): round-trip fidelity, odd
geometries, grayscale, marker-structure checks, malformed-stream rejection."""

import struct

import numpy as np
import pytest

from kit_spark.kit_py import jpeg as J
from kit_spark.kit_py.codec import psnr, synth_pixels


def test_round_trip_meets_invariant_on_noise():
    px = synth_pixels("jt1", 48, 40)  # noise+gradient: JPEG's worst case
    out = J.decode_jpeg(J.encode_jpeg(px, quality=98))
    assert out.shape == px.shape
    assert psnr(out, px) >= 40.0


def test_smooth_image_high_fidelity_and_compresses():
    g = np.zeros((64, 64, 3), np.uint8)
    g[:] = ((np.arange(64)[None, :, None] * 2
             + np.arange(64)[:, None, None]) % 256).astype(np.uint8)
    data = J.encode_jpeg(g, quality=92)
    assert len(data) < g.nbytes // 4  # DCT actually compresses smooth data
    assert psnr(J.decode_jpeg(data), g) >= 45.0


@pytest.mark.parametrize("h,w", [(1, 1), (8, 8), (9, 17), (33, 7), (40, 64)])
def test_odd_geometries_pad_and_crop(h, w):
    px = synth_pixels(f"jt{h}x{w}", w, h)
    out = J.decode_jpeg(J.encode_jpeg(px, quality=95))
    assert out.shape == (h, w, 3)
    assert psnr(out, px) >= 35.0


def test_quality_monotonicity():
    px = synth_pixels("jt-q", 32, 32)
    dbs = [psnr(J.decode_jpeg(J.encode_jpeg(px, quality=q)), px)
           for q in (50, 80, 95, 100)]
    assert dbs == sorted(dbs)
    assert dbs[-1] >= 50.0


def test_marker_structure():
    data = J.encode_jpeg(synth_pixels("jt-m", 16, 16))
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in data[:30]
    # SOF0 present, declares 3 components at 8-bit precision, 1x1 sampling
    i = data.find(b"\xff\xc0")
    assert i > 0
    prec, h, w, nc = struct.unpack(">BHHB", data[i + 4:i + 10])
    assert (prec, h, w, nc) == (8, 16, 16, 3)
    assert data[i + 11] == 0x11 and data[i + 14] == 0x11 and data[i + 17] == 0x11


def test_byte_stuffing_round_trips():
    # many blocks of varied content -> 0xFF bytes occur in the entropy
    # stream with overwhelming probability; stuffing must be transparent
    px = synth_pixels("jt-stuff", 96, 96)
    data = J.encode_jpeg(px, quality=90)
    assert b"\xff\x00" in data  # stuffed bytes present
    assert J.decode_jpeg(data).shape == px.shape


def test_grayscale_stream_decodes():
    # hand-build a 1-component stream by re-encoding only the Y plane
    px = np.repeat(synth_pixels("jt-gray", 16, 16)[:, :, :1], 3, axis=2)
    out = J.decode_jpeg(J.encode_jpeg(px, quality=97))
    # gray input -> decoded channels stay close to each other
    assert int(np.abs(out.astype(int)[..., 0] - out.astype(int)[..., 1]).max()) <= 4


def test_unsupported_and_malformed_rejected():
    px = synth_pixels("jt-bad", 16, 16)
    data = bytearray(J.encode_jpeg(px))
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\x00\x00" + bytes(data[2:]))  # no SOI
    with pytest.raises(ValueError):
        J.decode_jpeg(bytes(data[:40]))  # truncated headers
    i = bytes(data).find(b"\xff\xc0")
    prog = data[:i] + b"\xff\xc2" + data[i + 2:]
    with pytest.raises(ValueError, match="baseline"):
        J.decode_jpeg(bytes(prog))  # progressive SOF2
    sub = bytearray(data)
    sub[i + 11] = 0x22  # 2x2 sampling on component 1
    with pytest.raises(ValueError, match="subsampled"):
        J.decode_jpeg(bytes(sub))


def test_deterministic():
    px = synth_pixels("jt-det", 24, 24)
    assert J.encode_jpeg(px, 93) == J.encode_jpeg(px, 93)


def test_missing_dht_surfaces_as_valueerror():
    """Stripping the Huffman tables leaves a dangling table id (KeyError
    inside) — must surface as ValueError for the per-row decode guards."""
    import struct

    import numpy as np
    import pytest

    from kit_spark.kit_py.jpeg import decode_jpeg, encode_jpeg

    data = encode_jpeg(np.full((16, 16, 3), 128, dtype=np.uint8), quality=90)
    out = bytearray(data[:2])
    pos = 2
    while pos + 4 <= len(data):
        marker = data[pos + 1]
        if marker == 0xDA:  # keep SOS + entropy stream onward
            out.extend(data[pos:])
            break
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        if marker != 0xC4:  # drop every DHT segment
            out.extend(data[pos:pos + 2 + seglen])
        pos += 2 + seglen
    with pytest.raises(ValueError):
        decode_jpeg(bytes(out))


def test_fill_bytes_before_marker_decode():
    """T.81 B.1.1.2 allows 0xFF fill bytes before any marker; padded
    conforming streams must decode to the same pixels."""
    import numpy as np

    from kit_spark.kit_py.codec import synth_pixels
    from kit_spark.kit_py.jpeg import decode_jpeg, encode_jpeg

    px = synth_pixels("fill-byte-test", 24, 16)
    data = encode_jpeg(px, quality=95)
    dqt = data.index(b"\xff\xdb")
    padded = data[:dqt] + b"\xff\xff\xff" + data[dqt:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(data))


def test_fill_bytes_just_before_eoi_decode():
    """A conforming stream padded with fill bytes immediately before EOI
    (and one truncated INSIDE trailing fill bytes) must not desync: the
    padded stream decodes identically; the truncated one either decodes
    (pixels already complete) or raises ValueError — never IndexError."""
    import numpy as np

    from kit_spark.kit_py.codec import synth_pixels
    from kit_spark.kit_py.jpeg import decode_jpeg, encode_jpeg

    px = synth_pixels("fill-eoi-test", 24, 16)
    data = encode_jpeg(px, quality=95)
    assert data.endswith(b"\xff\xd9")
    padded = data[:-2] + b"\xff\xff\xff" + data[-2:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(data))
    # stream ENDING in fill bytes (EOI cut off after padding)
    ends_in_fill = data[:-2] + b"\xff\xff\xff"
    try:
        out = decode_jpeg(ends_in_fill)
        assert np.array_equal(out, decode_jpeg(data))
    except ValueError:
        pass
