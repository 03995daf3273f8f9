"""Deterministic image codec + per-row fetch invariant tests (D7 kernel)."""

import numpy as np
import pytest

from kit_spark.kit_py import codec as C


def test_lossless_round_trip_exact():
    px = C.synth_pixels("img0000000001", 64, 48)
    data = C.encode_image(px, C.FMT_LOSSLESS)
    out = C.decode_image(data)
    assert np.array_equal(out, px)
    ok, db = C.verify_row(data, "img0000000001", 64, 48, C.FMT_LOSSLESS)
    assert ok and db == float("inf")


def test_lossy_meets_psnr_invariant():
    px = C.synth_pixels("img0000000002", 96, 64)
    data = C.encode_image(px, C.FMT_LOSSY)
    out = C.decode_image(data)
    db = C.psnr(out, px)
    assert 40.0 <= db < 60.0  # quantization step 4 -> ~46.9 dB
    ok, db2 = C.verify_row(data, "img0000000002", 96, 64, C.FMT_LOSSY)
    assert ok and db2 == pytest.approx(db)


def test_verify_rejects_wrong_content():
    px = C.synth_pixels("img0000000003", 32, 32)
    data = C.encode_image(px, C.FMT_LOSSLESS)
    ok, _ = C.verify_row(data, "img0000000004", 32, 32, C.FMT_LOSSLESS)
    assert not ok


def test_lossless_bytes_are_real_png():
    px = C.synth_pixels("img0000000007", 33, 21)
    data = C.encode_image(px, C.FMT_LOSSLESS)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"  # genuine container
    assert np.array_equal(C.decode_image(data), px)


def test_lossy_bytes_are_real_jpeg():
    px = C.synth_pixels("img0000000008", 24, 40)
    data = C.encode_image(px, C.FMT_LOSSY)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"  # real JFIF
    assert C.psnr(C.decode_image(data), px) >= 40.0


def test_fast_lossy_stand_in_round_trip():
    px = C.synth_pixels("img0000000009", 40, 24)
    data = C.encode_image(px, C.FMT_LOSSY_FAST)
    assert data[:4] == C.MAGIC_LOSSY
    db = C.psnr(C.decode_image(data), px)
    assert 40.0 <= db < 60.0


def test_garbage_rejected():
    with pytest.raises(ValueError):
        C.decode_image(b"\xff\xd8\xff\xe0....")  # truncated JFIF
    with pytest.raises(ValueError):
        C.decode_image(b"\x89PNG\r\n\x1a\n....")  # corrupt PNG
    with pytest.raises(ValueError):
        C.decode_image(b"????....")


def test_synth_deterministic_and_phash_stable():
    a = C.synth_pixels("imgX", 40, 40)
    b = C.synth_pixels("imgX", 40, 40)
    assert np.array_equal(a, b)
    h1 = C.phash64(a)
    assert isinstance(h1, int)
    assert -(1 << 63) <= h1 < (1 << 63)
    # lossy encode barely perturbs the phash (few borderline bits at most)
    lossy = C.decode_image(C.encode_image(a, C.FMT_LOSSY))
    hamming = bin((C.phash64(lossy) ^ h1) & ((1 << 64) - 1)).count("1")
    assert hamming <= 8
