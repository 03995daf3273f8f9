"""Animated-GIF codec tests (kit_py/gif.py): LZW round-trips incl. table
resets, multi-frame compositing, sub-block handling, malformed input."""

import numpy as np
import pytest

from kit_spark.kit_py import gif as G


def _noise(h, w, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w), dtype=np.uint8).astype(np.uint8)


def test_single_frame_round_trip():
    idx = _noise(17, 23, 1)
    frames = G.decode_gif(G.encode_gif([idx]))
    assert len(frames) == 1
    assert np.array_equal(frames[0], G.GRAY_PALETTE[idx])


def test_multi_frame_round_trip():
    seq = [_noise(12, 31, s) for s in range(5)]
    frames = G.decode_gif(G.encode_gif(seq))
    assert len(frames) == 5
    for got, idx in zip(frames, seq):
        assert np.array_equal(got, G.GRAY_PALETTE[idx])


def test_lzw_table_reset_path():
    # random 256-color noise at this size forces the 4096-entry table to
    # fill and the encoder to emit mid-stream clear codes
    idx = _noise(96, 96, 42)
    assert np.array_equal(G.decode_gif(G.encode_gif([idx]))[0],
                          G.GRAY_PALETTE[idx])


def test_highly_compressible_frame():
    idx = np.zeros((64, 64), dtype=np.uint8)
    idx[32:, :] = 7
    data = G.encode_gif([idx])
    assert len(data) < 64 * 64  # LZW actually compresses runs
    assert np.array_equal(G.decode_gif(data)[0], G.GRAY_PALETTE[idx])


def test_custom_palette():
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[:, 0] = np.arange(256)  # red ramp
    idx = _noise(9, 9, 3)
    out = G.decode_gif(G.encode_gif([idx], palette=pal))[0]
    assert np.array_equal(out[:, :, 0], idx)
    assert int(out[:, :, 1].max()) == 0


def test_synth_video_deterministic_and_matches_reference():
    data1 = G.synth_video("vid001", 24, 16, 3)
    data2 = G.synth_video("vid001", 24, 16, 3)
    assert data1 == data2
    frames = G.decode_gif(data1)
    assert len(frames) == 3
    for no, frame in enumerate(frames):
        assert np.array_equal(frame, G.synth_video_frame("vid001", 24, 16, no))


def test_malformed_inputs_rejected():
    with pytest.raises(ValueError):
        G.decode_gif(b"NOTAGIF" + b"\x00" * 20)
    with pytest.raises(ValueError):
        G.encode_gif([])
    good = G.synth_video("vid002", 8, 8, 1)
    with pytest.raises((ValueError, IndexError, Exception)):
        G.decode_gif(good[:20])


def test_truncated_stream_surfaces_as_valueerror():
    import numpy as np
    import pytest

    from kit_spark.kit_py.gif import decode_gif, encode_gif

    frames = [np.full((8, 8), i * 9, dtype=np.uint8) for i in range(3)]
    data = encode_gif(frames)
    with pytest.raises(ValueError):
        decode_gif(data[:int(len(data) * 0.6)])


def test_local_color_table_composites_in_rgb():
    """A frame carrying a local color table must apply it only to its own
    rect: pixels painted by earlier frames keep their global-palette colors
    (index-canvas compositing would push old indices through the new local
    table and mis-color — or overflow — them)."""
    import struct

    import numpy as np

    from kit_spark.kit_py.gif import GRAY_PALETTE, _lzw_encode, decode_gif

    local_pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                         dtype=np.uint8)
    out = bytearray(b"GIF89a")
    out.extend(struct.pack("<HHBBB", 4, 4, 0xF7, 0, 0))
    out.extend(GRAY_PALETTE.tobytes())
    # frame 1: full canvas, global table, all-200 gray
    out.extend(b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0))
    out.append(8)
    out.extend(_lzw_encode(bytes([200] * 16), 8))
    # frame 2: 2x2 rect at (1,1), 4-entry LOCAL table, all-red
    out.extend(b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0x81))
    out.extend(local_pal.tobytes())
    out.append(2)
    out.extend(_lzw_encode(bytes([0] * 4), 2))
    out.append(0x3B)

    frames = decode_gif(bytes(out))
    assert len(frames) == 2
    assert np.array_equal(frames[0], np.full((4, 4, 3), 200, dtype=np.uint8))
    expect = np.full((4, 4, 3), 200, dtype=np.uint8)
    expect[1:3, 1:3] = [255, 0, 0]
    assert np.array_equal(frames[1], expect)


def _disposal_stream(disposal_f2, bg_idx=5):
    """3-frame GIF: full-canvas 200, then a 2x2 rect of 50 at (1,1) whose
    GCE carries ``disposal_f2``, then a 1x1 rect of 99 at (0,0)."""
    import struct

    from kit_spark.kit_py.gif import GRAY_PALETTE, _lzw_encode

    def gce(disposal):
        return bytes([0x21, 0xF9, 4, disposal << 2, 0, 0, 0, 0])

    out = bytearray(b"GIF89a")
    out.extend(struct.pack("<HHBBB", 4, 4, 0xF7, bg_idx, 0))
    out.extend(GRAY_PALETTE.tobytes())
    out.extend(gce(0))
    out.extend(b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0))
    out.append(8)
    out.extend(_lzw_encode(bytes([200] * 16), 8))
    out.extend(gce(disposal_f2))
    out.extend(b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0))
    out.append(8)
    out.extend(_lzw_encode(bytes([50] * 4), 8))
    out.extend(gce(0))
    out.extend(b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0))
    out.append(8)
    out.extend(_lzw_encode(bytes([99]), 8))
    out.append(0x3B)
    return bytes(out)


def test_disposal_restore_to_background():
    """Disposal 2: after the frame displays, its rect restores to the
    logical-screen background color (we have no transparency, so the
    opaque background-color paint is the documented semantic)."""
    frames = G.decode_gif(_disposal_stream(2))
    assert len(frames) == 3
    f2 = np.full((4, 4, 3), 200, dtype=np.uint8)
    f2[1:3, 1:3] = 50
    assert np.array_equal(frames[1], f2)
    f3 = np.full((4, 4, 3), 200, dtype=np.uint8)
    f3[1:3, 1:3] = 5  # rect went to background color (index 5 gray)
    f3[0, 0] = 99
    assert np.array_equal(frames[2], f3)


def test_disposal_restore_to_previous():
    """Disposal 3: after the frame displays, the canvas under its rect is
    restored to the pre-frame pixels."""
    frames = G.decode_gif(_disposal_stream(3))
    f3 = np.full((4, 4, 3), 200, dtype=np.uint8)  # rect 50 fully undone
    f3[0, 0] = 99
    assert np.array_equal(frames[2], f3)


def test_disposal_do_not_dispose_keeps_rect():
    """Disposal 0/1: the rect persists into later frames (the original
    behavior, now explicit against the disposal-aware path)."""
    for d in (0, 1):
        frames = G.decode_gif(_disposal_stream(d))
        f3 = np.full((4, 4, 3), 200, dtype=np.uint8)
        f3[1:3, 1:3] = 50
        f3[0, 0] = 99
        assert np.array_equal(frames[2], f3)


def test_disposal_reserved_codes_rejected():
    for d in (4, 7):
        with pytest.raises(ValueError, match="disposal"):
            G.decode_gif(_disposal_stream(d))
