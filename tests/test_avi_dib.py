"""Uncompressed-DIB AVI tests (round 10: the BI_RGB path behind the
former honest raise). Evidence: byte-exact pixel round trips through
the BMP re-wrap, row-padding edge widths, biCompression-zero vs
fccHandler precedence, sampling off the container index, and the
magic-sniffing decode_image_payload shared with the MJPEG/GIF paths.
"""

from __future__ import annotations

import numpy as np
import pytest

from hive_population_ml_spark.operators import codecs, multimodal


def _frames(n, w=32, h=24):
    return [multimodal._blob_image(i, w, h) for i in range(n)]


def test_dib_avi_roundtrip_pixel_exact():
    frames = _frames(5)
    avi = codecs.encode_avi_dib(frames, fps=10)
    d = codecs.decode_avi(avi)
    assert d["codec_kind"] == "dib"
    assert d["n_frames"] == 5 and (d["width"], d["height"]) == (32, 24)
    for got, want in zip(d["frames"], frames):
        assert np.array_equal(codecs.decode_image_payload(got), want)


@pytest.mark.parametrize("w", [31, 33, 30])  # strides 93->96, 99->100, 90->92
def test_dib_row_padding_widths(w):
    frames = _frames(2, w=w, h=7)
    d = codecs.decode_avi(codecs.encode_avi_dib(frames))
    for got, want in zip(d["frames"], frames):
        assert np.array_equal(codecs.decode_image_payload(got), want)


def test_dib_sampling_and_features():
    frames = _frames(10)
    avi = codecs.encode_avi_dib(frames, fps=20)
    picks = codecs.avi_sample_frames(avi, 4)
    assert len(picks) == 4
    assert np.array_equal(codecs.decode_image_payload(picks[0]), frames[0])
    assert np.array_equal(codecs.decode_image_payload(picks[2]), frames[5])
    f = codecs.avi_features(avi)
    assert f[:4] == [32.0, 24.0, 20.0, 10.0]
    assert f[5] > 0  # gray mean of a real decoded frame


def test_dib_non24bit_honest_raise():
    avi = bytearray(codecs.encode_avi_dib(_frames(1)))
    # patch biBitCount (strf body offset 14) from 24 to 8
    i = bytes(avi).index(b"strf")
    avi[i + 8 + 14] = 8
    with pytest.raises(NotImplementedError, match="24-bit"):
        codecs.decode_avi(bytes(avi))


def test_unknown_fourcc_still_raises():
    avi = codecs.encode_avi_mjpeg(_frames(1), fps=10)
    bad = avi.replace(b"MJPG", b"XVID")
    with pytest.raises(NotImplementedError, match="MJPEG"):
        codecs.decode_avi(bad)


def test_decode_image_payload_sniffs_all_formats():
    img = _frames(1)[0]
    pal = img[::4, ::4]  # small palette-ish region (<=256 colors? force)
    small = np.zeros((8, 8, 3), dtype=np.uint8)
    small[::2] = 200
    assert np.array_equal(
        codecs.decode_image_payload(codecs.encode_bmp(img)), img
    )
    assert np.array_equal(
        codecs.decode_image_payload(codecs.encode_png(img)), img
    )
    assert np.array_equal(
        codecs.decode_image_payload(codecs.encode_gif(small)), small
    )
    jp = codecs.decode_image_payload(codecs.encode_jpeg(img, quality=90))
    assert jp.shape == img.shape
    with pytest.raises(ValueError, match="magic"):
        codecs.decode_image_payload(b"\x00\x01\x02\x03garbage")
    del pal


def test_video_frame_stats_on_dib(spark):
    frames = _frames(6)
    payload = codecs.encode_avi_dib(frames, fps=10)
    df = spark.createDataFrame(
        [(1, bytearray(payload), "video/avi", None, None, len(payload))],
        multimodal.MEDIA_SCHEMA,
    )
    rows = multimodal.video_frame_stats(df, n_frames=3).collect()
    assert len(rows) == 3
    assert all(r["gray_std"] > 0 for r in rows)
    assert all(r["motion"] > 0 for r in rows if r["frame_idx"] > 0)
