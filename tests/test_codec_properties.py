"""Property-based round trips for the round-11 codec/ingestion tiers
(hypothesis): arbitrary byte/pixel/sample inputs through
encode-decode pairs, exploring run/width/escape boundaries hand
fixtures never enumerate. Pure python — no Spark session needed."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_population_ml_spark.io import pdftext, warc
from hive_population_ml_spark.operators import codecs, mp2

SETTINGS = settings(max_examples=25, deadline=None)


@SETTINGS
@given(st.binary(min_size=0, max_size=3000))
def test_packbits_roundtrip_any_bytes(raw):
    enc = codecs._packbits_encode(raw)
    assert codecs._packbits_decode(enc, len(raw)) == raw


@SETTINGS
@given(st.binary(min_size=0, max_size=3000))
def test_tiff_lzw_roundtrip_any_bytes(raw):
    enc = codecs._tiff_lzw_encode(raw)
    assert codecs._tiff_lzw_decode(enc, len(raw)) == raw


@SETTINGS
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_tiff_container_roundtrip_random_rgb(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    for kw in ({}, {"packbits": True}, {"lzw": True}, {"deflate": True}):
        assert np.array_equal(
            codecs.decode_tiff(codecs.encode_tiff(img, **kw)), img
        )


@SETTINGS
@given(
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_interlaced_roundtrip_random(h, w, seed):
    import struct
    import zlib

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    # forward Adam7 writer (filter 0) — independent of encode_png
    raw = b""
    for x0, y0, dx, dy in codecs._ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for r in range(sub.shape[0]):
            raw += b"\x00" + sub[r].tobytes()
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    blob = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0,
                                             0, 1))
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert np.array_equal(codecs.decode_png(blob), img)


@SETTINGS
@given(st.lists(st.integers(min_value=-30000, max_value=30000),
                min_size=1, max_size=800),
       st.sampled_from([32000, 44100, 48000]),
       # mono-LEGAL Layer II bitrates only (224+ kbit/s are
       # stereo-only per spec — _alloc_table rightly raises there)
       st.sampled_from([32, 48, 64, 128, 192]))
def test_mp2_decodes_any_samples_without_error(samples, sr, br):
    # the codec must FRAME anything losslessly-legal: output length is
    # whole frames, amplitudes bounded, decode never raises
    xi = np.asarray(samples, dtype=np.int16)
    d = mp2.decode_mp2(mp2.encode_mp2(xi, sr, 1, br))
    assert d["n_frames"] % 1152 == 0
    assert d["samples"].dtype == np.int16


@SETTINGS
@given(st.text(min_size=0, max_size=400))
def test_warc_html_roundtrip_any_text(text):
    import html as _html

    blob = warc.encode_warc(
        [{"uri": "http://x/0", "html": f"<p>{_html.escape(text)}</p>"}]
    )
    [(h, p)] = list(warc.iter_warc_records(blob))
    _, _, body = warc.split_http_response(p)
    got = warc.html_to_text(body.decode("utf-8"))
    # extraction collapses whitespace — compare collapsed forms
    want = "\n".join(
        ln for ln in (" ".join(l.split()) for l in text.splitlines()) if ln
    ).strip()
    assert got == want


@SETTINGS
@given(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=255,
                           blacklist_characters="\x7f"),
    min_size=0, max_size=300,
))
def test_pdf_literal_roundtrip_any_latin1(text):
    blob = pdftext.encode_pdf([text])
    d = pdftext.extract_pdf_text(blob)
    assert d["text"] == text.strip() or (not text.strip() and
                                         d["text"] == "")
