"""Uncompressed BMP variants (round 11): 8-bit palette and 32-bit
BGRA (alpha dropped). Hand-authored headers — no fixture encoder for
these forms, so the decoder is pinned purely against the spec layout
(incl. 4-byte row padding and top-down negative-height rows)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hive_population_ml_spark.operators import codecs


def _bmp(w, h, bpp, body, pal=None, compression=0):
    pal_bytes = b""
    n_colors = 0
    if pal is not None:
        n_colors = len(pal)
        pal_bytes = b"".join(bytes([b, g, r, 0]) for r, g, b in pal)
    offset = 14 + 40 + len(pal_bytes)
    hdr = b"BM" + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, compression, len(body), 0, 0,
        n_colors, 0
    )
    return hdr + dib + pal_bytes + body


def test_bmp_8bit_palette_uncompressed():
    pal = [(10, 20, 30), (200, 100, 50), (0, 255, 0)]
    # 5 px wide -> row pads to 8 bytes; two rows, bottom-up
    rows = [bytes([0, 1, 2, 1, 0]) + b"\x00\x00\x00",
            bytes([2, 2, 1, 0, 0]) + b"\x00\x00\x00"]
    out = codecs.decode_bmp(_bmp(5, 2, 8, rows[0] + rows[1], pal=pal))
    exp_idx = np.array([[2, 2, 1, 0, 0], [0, 1, 2, 1, 0]])  # flipped
    exp = np.array(pal, dtype=np.uint8)[exp_idx]
    assert np.array_equal(out, exp)


def test_bmp_8bit_top_down_and_index_range():
    pal = [(1, 2, 3), (4, 5, 6)]
    body = bytes([0, 1, 0, 1]) + b""
    out = codecs.decode_bmp(_bmp(4, -1, 8, body, pal=pal))
    assert np.array_equal(out[0, :, 0], np.array([1, 4, 1, 4]))
    with pytest.raises(ValueError, match="index"):
        codecs.decode_bmp(_bmp(4, -1, 8, bytes([9, 0, 0, 0]), pal=pal))


def test_bmp_32bit_drops_alpha():
    # 2x2 BGRA, bottom-up, no padding needed (rows already 4-aligned)
    px = [
        (255, 0, 0, 9), (0, 255, 0, 9),   # storage row 0 (display 1)
        (0, 0, 255, 9), (7, 8, 9, 9),     # storage row 1 (display 0)
    ]
    body = b"".join(bytes([b, g, r, a]) for r, g, b, a in px)
    out = codecs.decode_bmp(_bmp(2, 2, 32, body))
    assert out.shape == (2, 2, 3)
    assert tuple(out[1, 0]) == (255, 0, 0)
    assert tuple(out[1, 1]) == (0, 255, 0)
    assert tuple(out[0, 0]) == (0, 0, 255)
    assert tuple(out[0, 1]) == (7, 8, 9)


def test_bmp_bitfields_stays_honest():
    body = b"\x00" * 16
    with pytest.raises(NotImplementedError, match="compression=3"):
        codecs.decode_bmp(_bmp(2, 2, 32, body, compression=3))
