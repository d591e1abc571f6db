"""Baseline TIFF decode tests (round 11): struct-only IFD walk over
both byte orders, strip layouts, PackBits, gray/RGB/palette
photometrics — plus a hand-authored minimal IFD fixture so the tag
parser is pinned against the spec, not the fixture encoder."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hive_population_ml_spark.operators import codecs


def _img(h=11, w=13):
    rng = np.random.default_rng(31)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("packbits", [False, True])
def test_tiff_rgb_roundtrip(big_endian, packbits):
    img = _img()
    blob = codecs.encode_tiff(img, packbits=packbits,
                              big_endian=big_endian)
    assert np.array_equal(codecs.decode_tiff(blob), img)
    # magic-sniffing shared entry
    assert np.array_equal(codecs.decode_image_payload(blob), img)


def test_tiff_multistrip_and_gray():
    img = _img(10, 7)
    blob = codecs.encode_tiff(img, rows_per_strip=3, packbits=True)
    assert np.array_equal(codecs.decode_tiff(blob), img)
    g = _img(6, 9)[:, :, 0]
    out = codecs.decode_tiff(codecs.encode_tiff(g))
    assert out.shape == (6, 9, 3)
    assert np.array_equal(out[..., 0], g)
    assert np.array_equal(out[..., 1], out[..., 2])


def test_packbits_spec_pins():
    # literal group, repeat run, -128 no-op — decoded against the spec
    # byte stream, not the encoder
    stream = bytes([2, 10, 20, 30,      # literal x3
                    0x80,               # no-op
                    0xFE, 7,            # repeat 7 x3 (257-254)
                    0, 99])             # literal x1
    assert codecs._packbits_decode(stream, 7) == bytes(
        [10, 20, 30, 7, 7, 7, 99]
    )
    with pytest.raises(ValueError, match="truncated"):
        codecs._packbits_decode(bytes([5, 1, 2]), 6)
    # encoder round-trips arbitrary bytes
    rng = np.random.default_rng(32)
    raw = bytes(rng.integers(0, 4, 500, dtype=np.uint8))  # runs likely
    assert codecs._packbits_decode(codecs._packbits_encode(raw),
                                   len(raw)) == raw


def test_tiff_hand_authored_minimal_ifd():
    # 2x2 gray WhiteIsZero, big-endian, one strip — written byte by
    # byte so the IFD walker is pinned independently of encode_tiff
    pixels = bytes([0, 64, 128, 255])
    n = 6
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4
    ifd = struct.pack(">H", n)
    for tag, typ, count, val in [
        (256, 3, 1, 2),          # width
        (257, 3, 1, 2),          # height
        (262, 3, 1, 0),          # WhiteIsZero
        (273, 4, 1, data_off),   # strip offset
        (278, 3, 1, 2),          # rows per strip
        (279, 4, 1, 4),          # strip byte count
    ]:
        if typ == 3:
            packed = struct.pack(">H", val) + b"\x00\x00"
        else:
            packed = struct.pack(">I", val)
        ifd += struct.pack(">HHI", tag, typ, count) + packed
    ifd += struct.pack(">I", 0)
    blob = struct.pack(">2sHI", b"MM", 42, ifd_off) + ifd + pixels
    out = codecs.decode_tiff(blob)
    # WhiteIsZero inverts
    assert np.array_equal(out[..., 0], np.array([[255, 191],
                                                 [127, 0]], np.uint8))


def test_tiff_palette():
    # photometric 3 + 16-bit ColorMap entries (value*257 per spec)
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    pal8 = np.array([[10, 20, 30], [40, 50, 60], [70, 80, 90],
                     [200, 210, 220]], dtype=np.uint8)
    cmap = np.zeros((3, 256), dtype=np.uint32)
    for i, (r, g, b) in enumerate(pal8):
        cmap[0, i], cmap[1, i], cmap[2, i] = r * 257, g * 257, b * 257
    n = 8
    ifd_off = 8
    # ColorMap: 768 SHORTs -> overflow area after IFD
    cmap_off = ifd_off + 2 + 12 * n + 4
    data_off = cmap_off + 768 * 2
    ifd = struct.pack("<H", n)
    for tag, typ, count, val in [
        (256, 3, 1, 2), (257, 3, 1, 2), (258, 3, 1, 8),
        (262, 3, 1, 3), (273, 4, 1, data_off), (277, 3, 1, 1),
        (279, 4, 1, 4), (320, 3, 768, cmap_off),
    ]:
        if typ == 3 and count == 1:
            packed = struct.pack("<H", val) + b"\x00\x00"
        else:
            packed = struct.pack("<I", val)
        ifd += struct.pack("<HHI", tag, typ, count) + packed
    ifd += struct.pack("<I", 0)
    cmap_bytes = struct.pack("<768H", *cmap.reshape(-1).tolist())
    blob = (struct.pack("<2sHI", b"II", 42, ifd_off) + ifd
            + cmap_bytes + idx.tobytes())
    out = codecs.decode_tiff(blob)
    assert np.array_equal(out, pal8[idx])


def test_tiff_lzw_hand_authored_bit_vector():
    # MSB-first 9-bit stream written by hand per the spec:
    #   Clear(256), 'A'(65), 'B'(66), code 258 (= "AB"), EOI(257)
    # -> decodes to "ABAB". Dictionary after: 258="AB", 259="BA".
    bits = ""
    for code in (256, 65, 66, 258, 257):
        bits += format(code, "09b")
    bits += "0" * ((8 - len(bits) % 8) % 8)
    stream = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    assert codecs._tiff_lzw_decode(stream, 4) == b"ABAB"
    # the KwKwK self-referencing case: Clear, 'A', 258 -> "A"+"AA"
    bits = "".join(format(c, "09b") for c in (256, 65, 258, 257))
    bits += "0" * ((8 - len(bits) % 8) % 8)
    stream = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    assert codecs._tiff_lzw_decode(stream, 3) == b"AAA"


def test_tiff_lzw_early_change_and_roundtrip():
    # enough distinct pairs to push the dictionary past 511 so the
    # 9->10-bit EARLY-CHANGE boundary is crossed in both directions
    rng = np.random.default_rng(33)
    raw = bytes(rng.integers(0, 256, 4000, dtype=np.uint8))
    enc = codecs._tiff_lzw_encode(raw)
    assert codecs._tiff_lzw_decode(enc, len(raw)) == raw
    # compressible content actually compresses
    runs = bytes([7] * 1000 + [9] * 1000)
    enc2 = codecs._tiff_lzw_encode(runs)
    assert len(enc2) < len(runs) // 4
    assert codecs._tiff_lzw_decode(enc2, len(runs)) == runs
    # full-table Clear path: > 4094 distinct phrases
    big = bytes(rng.integers(0, 256, 40_000, dtype=np.uint8))
    assert codecs._tiff_lzw_decode(codecs._tiff_lzw_encode(big),
                                   len(big)) == big


def test_tiff_lzw_container_roundtrip():
    img = _img(9, 14)
    blob = codecs.encode_tiff(img, lzw=True, rows_per_strip=4)
    assert np.array_equal(codecs.decode_tiff(blob), img)
    blob_mm = codecs.encode_tiff(img, lzw=True, big_endian=True)
    assert np.array_equal(codecs.decode_tiff(blob_mm), img)


def test_tiff_deflate_roundtrip():
    img = _img(12, 10)
    blob = codecs.encode_tiff(img, deflate=True, rows_per_strip=5)
    assert np.array_equal(codecs.decode_tiff(blob), img)
    with pytest.raises(ValueError, match="choose one"):
        codecs.encode_tiff(img, lzw=True, deflate=True)


def test_tiff_real_paths_in_spark(spark):
    # synthesize (LZW TIFF) -> real extract_features -> real resize,
    # all through the shared media_type dispatch
    from hive_population_ml_spark.operators import multimodal

    base = spark.range(5).withColumnRenamed("id", "doc_id")
    media = multimodal.synthesize_image(base, "doc_id", codec="tiff",
                                        width=16, height=12)
    rows = media.collect()
    assert all(r["media_type"] == "image/tiff" for r in rows)
    assert all(bytes(r["media"])[:4] == b"II*\x00" for r in rows)
    feats = multimodal.extract_features(media, dim=6,
                                        decode_stub=False).collect()
    for r in feats:
        assert r["feat"][0] == 16.0 and r["feat"][1] == 12.0
    small = multimodal.resize_media(media, 8, 6,
                                    decode_stub=False).collect()
    for r in small:
        out = codecs.decode_tiff(bytes(r["media"]))
        assert out.shape == (6, 8, 3)


def test_tiff_honest_boundaries():
    img = _img(4, 4)
    blob = bytearray(codecs.encode_tiff(img))
    # patch compression to JPEG-in-TIFF (7): find tag 259, set value
    n = struct.unpack_from("<H", blob, 8)[0]
    for k in range(n):
        pos = 10 + 12 * k
        if struct.unpack_from("<H", blob, pos)[0] == 259:
            struct.pack_into("<H", blob, pos + 8, 7)
    with pytest.raises(NotImplementedError, match="compression 7"):
        codecs.decode_tiff(bytes(blob))
    with pytest.raises(ValueError, match="TIFF"):
        codecs.decode_tiff(b"XX\x00\x00")


def test_multipage_tiff_raises_loudly():
    """A nonzero next-IFD pointer (multi-page TIFF from a foreign
    encoder) must raise, not silently decode page 1 only."""
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    data = bytearray(codecs.encode_tiff(img))
    # the fixture encoder writes a single IFD; find its next-IFD slot
    # (II little-endian: u16 entry count at ifd_off, pointer after the
    # 12-byte entries) and point it somewhere nonzero
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n_entries,) = struct.unpack_from("<H", data, ifd_off)
    slot = ifd_off + 2 + 12 * n_entries
    struct.pack_into("<I", data, slot, 8)
    with pytest.raises(NotImplementedError, match="multi-page"):
        codecs.decode_tiff(bytes(data))
    # zero pointer (the normal single-page case) still decodes
    struct.pack_into("<I", data, slot, 0)
    assert codecs.decode_tiff(bytes(data)).shape == (4, 4, 3)
