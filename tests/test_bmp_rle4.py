"""BI_RLE4 BMP tests (round 11): the 4-bit run-length palette form
behind the former RLE4 honest raise. Same strategy as the RLE8 suite:
hand-authored escape stream (nibble alternation, absolute-run packing
and word pad, delta, EOL/EOB), exact round trips, honest raises."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hive_population_ml_spark.operators import codecs


def test_rle4_roundtrip_rgb_exact():
    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (13, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 13, (20, 27))]
    out = codecs.decode_bmp(codecs.encode_bmp_rle4(img))
    assert np.array_equal(out, img)


def test_rle4_grayscale_ramp_palette():
    img = (np.arange(64).reshape(8, 8) % 16).astype(np.uint8)
    out = codecs.decode_bmp(codecs.encode_bmp_rle4(img))
    assert np.array_equal(out[..., 0], img * 17)
    assert np.array_equal(out[..., 0], out[..., 1])
    assert np.array_equal(out[..., 1], out[..., 2])


def test_rle4_hand_authored_escape_stream():
    # every spec escape, plus the two RLE4-specific rules: an encoded
    # run ALTERNATES the value byte's nibbles (high first), and an
    # absolute run packs two pixels per byte with word alignment
    pal_b = bytearray()
    for i in range(4):
        pal_b += bytes([i * 10, i * 20, i * 30, 0])  # BGRA entries
    body = bytes(
        [0, 5, 0x12, 0x30, 0x20, 0x00,  # absolute [1,2,3,0,2]: 5 px =
         #                               3 data bytes + 1 word-pad byte
         0, 0,                          # end of line -> y=1
         0, 2, 1, 1,                    # delta: x+=1, y+=1 -> y=2, x=1
         3, 0x31,                       # encoded 3 px alternating 3,1,3
         0, 1]                          # end of bitmap
    )
    offset = 14 + 40 + 16
    hdr = b"BM" + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, 5, 3, 1, 4, 2, len(body), 0, 0, 4, 0)
    out = codecs.decode_bmp(hdr + dib + bytes(pal_b) + body)
    # storage rows (bottom-up): y0=[1,2,3,0,2]; y1 untouched; y2 =
    # [0,3,1,3,0] (nibble alternation); display order flips
    exp_idx = np.array([[0, 3, 1, 3, 0], [0, 0, 0, 0, 0], [1, 2, 3, 0, 2]])
    pal_rgb = np.array([[i * 30, i * 20, i * 10] for i in range(4)],
                       dtype=np.uint8)
    assert np.array_equal(out, pal_rgb[exp_idx])


def test_rle4_errors():
    rng = np.random.default_rng(12)
    with pytest.raises(ValueError, match="<=16"):
        codecs.encode_bmp_rle4(rng.integers(0, 256, (32, 32, 3),
                                            dtype=np.uint8))
    with pytest.raises(ValueError, match="< 16"):
        codecs.encode_bmp_rle4(np.full((4, 4), 200, np.uint8))
    # bpp=4 with a non-RLE4 compression stays honest
    data = bytearray(codecs.encode_bmp_rle4(np.zeros((4, 4), np.uint8)))
    struct.pack_into("<I", data, 14 + 16, 3)
    with pytest.raises(NotImplementedError, match="RLE4"):
        codecs.decode_bmp(bytes(data))


def test_rle4_truncation_tolerant_or_raises():
    img = np.zeros((8, 8), dtype=np.uint8)
    img[::2] = 3
    data = codecs.encode_bmp_rle4(img)
    out = codecs.decode_bmp(data[: len(data) - 6])  # stops at buffer end
    assert out.shape == (8, 8, 3)


def test_rle4_delta_out_of_bounds_raises():
    img = np.zeros((4, 4), dtype=np.uint8)
    data = bytearray(codecs.encode_bmp_rle4(img))
    (offset,) = struct.unpack_from("<I", data, 10)
    bad = bytes(data[:offset]) + b"\x00\x02\x20\x20" + bytes(data[offset:])
    with pytest.raises(ValueError, match="out of bounds"):
        codecs.decode_bmp(bad)
