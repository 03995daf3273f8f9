"""Property tests for the real media codecs (PNG / GIF / JPEG): arbitrary
pixel content round-trips, arbitrary geometry, lossy bounds.  Derandomized
so CI runs are reproducible."""

import numpy as np
from hypothesis import given, settings, strategies as st

from kit_spark.kit_py import gif as G, jpeg as J, png as P
from kit_spark.kit_py.codec import psnr

geom = st.tuples(st.integers(1, 24), st.integers(1, 24))


def _pixels(seed: int, h: int, w: int, c: int = 3) -> np.ndarray:
    rng = np.random.RandomState(seed % (2**31))
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8).astype(np.uint8)


@settings(derandomize=True, max_examples=40, deadline=None)
@given(geom, st.integers(0, 2**31))
def test_png_round_trip_any_content(hw, seed):
    h, w = hw
    px = _pixels(seed, h, w)
    assert np.array_equal(P.decode_png(P.encode_png(px)), px)


@settings(derandomize=True, max_examples=30, deadline=None)
@given(geom, st.integers(0, 2**31), st.integers(1, 4))
def test_gif_round_trip_any_frames(hw, seed, n_frames):
    h, w = hw
    frames = [_pixels(seed + i, h, w, 1)[:, :, 0] for i in range(n_frames)]
    out = G.decode_gif(G.encode_gif(frames))
    assert len(out) == n_frames
    for got, idx in zip(out, frames):
        assert np.array_equal(got, G.GRAY_PALETTE[idx])


@settings(derandomize=True, max_examples=20, deadline=None)
@given(geom, st.integers(0, 2**31))
def test_jpeg_any_content_decodes_within_bound(hw, seed):
    h, w = hw
    px = _pixels(seed, h, w)
    out = J.decode_jpeg(J.encode_jpeg(px, quality=99))
    assert out.shape == px.shape
    # uniform random noise is JPEG's worst case; q99 keeps it comfortably
    # above the engine's 40 dB invariant
    assert psnr(out, px) >= 40.0


@settings(derandomize=True, max_examples=20, deadline=None)
@given(st.integers(0, 2**31))
def test_jpeg_constant_images_near_exact(seed):
    rng = np.random.RandomState(seed % (2**31))
    px = np.full((16, 16, 3), rng.randint(0, 256), dtype=np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(px, quality=92))
    assert int(np.abs(out.astype(int) - px.astype(int)).max()) <= 2
