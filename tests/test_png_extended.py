"""PNG extended-coverage tests (round 11): Adam7 interlace (per-pass
filter restart, empty-pass geometry), grayscale and palette color
types. All fixtures are written by an independent hand-rolled forward
writer (filter transforms transcribed from the spec), never by
encode_png, so the decoder is pinned against the spec, not itself."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from hive_population_ml_spark.operators import codecs

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload))
    )


def _png(w, h, color_type, raw, interlace=0, plte=None, trns=None) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, interlace)
    out = _SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    out += _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    return out


def _scanlines(rows: np.ndarray, filters=None) -> bytes:
    """Forward-filter a (h, stride) byte grid; filters per row (0=None,
    2=Up — the independent spec transcription)."""
    h = rows.shape[0]
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(rows.shape[1], dtype=np.int32)
    for r in range(h):
        line = rows[r].astype(np.int32)
        if filters[r] == 0:
            enc = line
        elif filters[r] == 2:
            enc = (line - prev) % 256
        else:
            raise AssertionError("fixture writer supports filters 0/2")
        raw.append(filters[r])
        raw += bytes(enc.astype(np.uint8))
        prev = line
    return bytes(raw)


_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _interlaced_raw(img: np.ndarray, up_filter_pass=None) -> bytes:
    h, w, c = img.shape
    raw = b""
    for k, (x0, y0, dx, dy) in enumerate(_ADAM7):
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        rows = sub.reshape(sub.shape[0], sub.shape[1] * c)
        f = [2] * rows.shape[0] if k == up_filter_pass else None
        raw += _scanlines(rows, f)
    return raw


@pytest.mark.parametrize("channels", [3, 4])
def test_adam7_interlace_matches_progressive(channels):
    rng = np.random.default_rng(21)
    ct = 2 if channels == 3 else 6
    img = rng.integers(0, 256, (13, 11, channels), dtype=np.uint8)
    blob = _png(11, 13, ct, _interlaced_raw(img), interlace=1)
    assert np.array_equal(codecs.decode_png(blob), img)


def test_adam7_per_pass_filter_restart():
    # the Up filter inside pass 6 must reference the PREVIOUS ROW OF
    # THE SAME PASS (filters restart per pass) — a decoder defiltering
    # the interlaced stream as one scanline run gets this wrong
    rng = np.random.default_rng(22)
    img = rng.integers(0, 256, (10, 9, 3), dtype=np.uint8)
    blob = _png(9, 10, 2, _interlaced_raw(img, up_filter_pass=6),
                interlace=1)
    assert np.array_equal(codecs.decode_png(blob), img)


def test_adam7_empty_passes_small_image():
    # a 2x2 image leaves several Adam7 passes empty — the skip path
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (2, 2, 3), dtype=np.uint8)
    blob = _png(2, 2, 2, _interlaced_raw(img), interlace=1)
    assert np.array_equal(codecs.decode_png(blob), img)
    one = rng.integers(0, 256, (1, 1, 3), dtype=np.uint8)
    blob = _png(1, 1, 2, _interlaced_raw(one), interlace=1)
    assert np.array_equal(codecs.decode_png(blob), one)


def test_grayscale_expands_to_rgb():
    rng = np.random.default_rng(24)
    g = rng.integers(0, 256, (6, 7, 1), dtype=np.uint8)
    raw = _scanlines(g.reshape(6, 7))
    out = codecs.decode_png(_png(7, 6, 0, raw))
    assert out.shape == (6, 7, 3)
    for ch in range(3):
        assert np.array_equal(out[..., ch], g[..., 0])


def test_palette_resolves_plte():
    rng = np.random.default_rng(25)
    plte = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    idx = rng.integers(0, 5, (8, 8, 1), dtype=np.uint8)
    raw = _scanlines(idx.reshape(8, 8))
    out = codecs.decode_png(_png(8, 8, 3, raw, plte=plte))
    assert np.array_equal(out, plte[idx[..., 0]])
    # interlaced palette composes the two features
    raw_i = _interlaced_raw(idx)
    out_i = codecs.decode_png(_png(8, 8, 3, raw_i, interlace=1, plte=plte))
    assert np.array_equal(out_i, plte[idx[..., 0]])


def test_palette_errors_and_boundaries():
    plte = np.arange(9, dtype=np.uint8).reshape(3, 3)
    bad_idx = np.full((4, 4), 7, dtype=np.uint8)
    blob = _png(4, 4, 3, _scanlines(bad_idx), plte=plte)
    with pytest.raises(ValueError, match="palette index"):
        codecs.decode_png(blob)
    with pytest.raises(ValueError, match="PLTE"):
        codecs.decode_png(_png(4, 4, 3, _scanlines(bad_idx)))


def test_trns_palette_alpha():
    # round 11: tRNS upgrades palette PNG to RGBA — per-entry alpha
    # bytes for the leading entries, unlisted entries opaque
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1, 2, 1]], dtype=np.uint8)
    blob = _png(4, 1, 3, _scanlines(idx), plte=plte,
                trns=bytes([0, 128]))  # entry0 transparent, entry1 128
    out = codecs.decode_png(blob)
    assert out.shape == (1, 4, 4)
    assert list(out[0, 0]) == [255, 0, 0, 0]
    assert list(out[0, 1]) == [0, 255, 0, 128]
    assert list(out[0, 2]) == [0, 0, 255, 255]  # unlisted -> opaque


def test_trns_gray_and_rgb_color_key():
    g = np.array([[10, 20, 10, 30]], dtype=np.uint8)
    blob = _png(4, 1, 0, _scanlines(g), trns=struct.pack(">H", 10))
    out = codecs.decode_png(blob)
    assert out.shape == (1, 4, 4)
    assert list(out[0, :, 3]) == [0, 255, 0, 255]
    rgb = np.array([[[9, 8, 7], [1, 2, 3], [9, 8, 7]]], dtype=np.uint8)
    blob = _png(3, 1, 2, _scanlines(rgb.reshape(1, 9)),
                trns=struct.pack(">HHH", 9, 8, 7))
    out = codecs.decode_png(blob)
    assert out.shape == (1, 3, 4)
    assert list(out[0, :, 3]) == [0, 255, 0]
