"""BI_RLE8 BMP tests (round 10): the run-length-encoded palette form
behind decode_bmp's former 24-bit-only boundary. Hand-authored escape
stream (absolute run + word pad, delta, EOL/EOB), exact round trips,
and the honest raises."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hive_population_ml_spark.operators import codecs


def test_rle8_roundtrip_rgb_exact():
    rng = np.random.default_rng(6)
    pal = rng.integers(0, 256, (40, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 40, (24, 32))]
    out = codecs.decode_bmp(codecs.encode_bmp_rle8(img))
    assert np.array_equal(out, img)


def test_rle8_grayscale_palette_and_compression():
    rng = np.random.default_rng(7)
    runs = np.repeat(rng.integers(0, 8, (16, 8)), 8, axis=1).astype(np.uint8)
    data = codecs.encode_bmp_rle8(runs)
    out = codecs.decode_bmp(data)
    assert np.array_equal(out, np.stack([runs] * 3, axis=2))
    # long runs must actually compress vs raw 24-bit
    assert len(data) < runs.size * 3 * 0.5


def test_rle8_hand_authored_escape_stream():
    # absolute run (word-aligned), encoded run, EOL, delta, EOB — the
    # decoder-independent pin for every escape the spec defines
    pal_b = bytearray()
    for i in range(4):
        pal_b += bytes([i * 10, i * 20, i * 30, 0])  # BGRA entries
    body = bytes(
        [0, 3, 1, 2, 3, 0,  # absolute run [1,2,3] + word pad
         2, 0,              # encoded run: 2 x index 0
         0, 0,              # end of line -> y=1
         0, 2, 1, 1,        # delta: x+=1, y+=1 -> now y=2, x=1
         3, 3,              # encoded run: 3 x index 3
         0, 1]              # end of bitmap
    )
    offset = 14 + 40 + 16
    hdr = b"BM" + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, 5, 3, 1, 8, 1, len(body), 0, 0, 4, 0)
    out = codecs.decode_bmp(hdr + dib + bytes(pal_b) + body)
    # storage rows y0..y2 (bottom-up): y0=[1,2,3,0,0], y1 untouched
    # (delta skip leaves index 0), y2=[0,3,3,3,0]; display order flips
    exp_idx = np.array([[0, 3, 3, 3, 0], [0, 0, 0, 0, 0], [1, 2, 3, 0, 0]])
    pal_rgb = np.array([[i * 30, i * 20, i * 10] for i in range(4)],
                       dtype=np.uint8)
    assert np.array_equal(out, pal_rgb[exp_idx])


def test_rle8_too_many_colors_raise_and_other_compressions_honest():
    rng = np.random.default_rng(8)
    with pytest.raises(ValueError, match="<=256"):
        codecs.encode_bmp_rle8(rng.integers(0, 256, (64, 64, 3),
                                            dtype=np.uint8))
    # RLE4 (compression 2) stays honest
    data = bytearray(codecs.encode_bmp_rle8(np.zeros((4, 4), np.uint8)))
    struct.pack_into("<I", data, 14 + 16, 2)
    with pytest.raises(NotImplementedError, match="RLE8"):
        codecs.decode_bmp(bytes(data))


def test_rle8_truncation_raises():
    img = np.zeros((8, 8), dtype=np.uint8)
    img[::2] = 3
    data = codecs.encode_bmp_rle8(img)
    # cut inside an absolute/encoded run region: decoder must not crash
    # with IndexError — idx stays partially filled OR a ValueError is
    # raised for truncated escapes; either way no wild read
    short = data[: len(data) - 6]
    out = codecs.decode_bmp(short)  # tolerant: stops at buffer end
    assert out.shape == (8, 8, 3)


def test_rle8_delta_out_of_bounds_raises():
    """A delta escape (00 02 dx dy) that pushes the cursor past the
    image bounds is corrupt input: loud ValueError, never a silently
    partial zero-filled frame."""
    img = np.zeros((4, 4), dtype=np.uint8)
    data = bytearray(codecs.encode_bmp_rle8(img))
    (offset,) = struct.unpack_from("<I", data, 10)
    # splice a delta escape jumping far past the 4x4 bounds
    bad = bytes(data[:offset]) + b"\x00\x02\x20\x20" + bytes(data[offset:])
    with pytest.raises(ValueError, match="out of bounds"):
        codecs.decode_bmp(bad)
