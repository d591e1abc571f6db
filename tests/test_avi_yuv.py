"""Raw-YUV AVI decode tests (codecs.py I420/IYUV/YV12/UYVY paths) —
shrinks the non-MJPEG video stub boundary with the struct-only raw
formats: BT.601 integer conversion pins, round trips under chroma
subsampling, plane-order (YV12) symmetry, sampling parity, honest
errors."""

from __future__ import annotations

import numpy as np
import pytest

from hive_population_ml_spark.operators import codecs


def _gradient(h, w, shift=0):
    yy, xx = np.mgrid[0:h, 0:w]
    r = ((xx * 255) // max(w - 1, 1) + shift) % 256
    g = ((yy * 255) // max(h - 1, 1)) % 256
    b = ((xx + yy) * 255 // max(h + w - 2, 1)) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def test_bt601_integer_pins():
    # published integer-form anchors (BT.601 limited range)
    y, u, v = codecs._rgb_to_yuv_bt601(
        np.array([[[255, 255, 255], [0, 0, 0], [255, 0, 0],
                   [0, 255, 0], [0, 0, 255]]], dtype=np.uint8)
    )
    assert list(y[0]) == [235, 16, 82, 144, 41]
    assert list(u[0]) == [128, 128, 90, 54, 240]
    assert list(v[0]) == [128, 128, 240, 34, 110]
    # inverse maps the anchors back (within integer rounding)
    rgb = codecs._yuv_to_rgb_bt601(y, u, v)
    ref = np.array([[[255, 255, 255], [0, 0, 0], [255, 0, 0],
                     [0, 255, 0], [0, 0, 255]]])
    assert int(np.abs(rgb.astype(int) - ref).max()) <= 2


@pytest.mark.parametrize("fourcc", ["I420", "IYUV", "YV12", "UYVY"])
def test_yuv_roundtrip_smooth_gradient(fourcc):
    frames = [_gradient(32, 48, s) for s in (0, 8)]
    blob = codecs.encode_avi_yuv(frames, fps=5, fourcc=fourcc)
    d = codecs.decode_avi(blob)
    assert d["codec"] == fourcc and d["n_frames"] == 2
    assert (d["width"], d["height"]) == (48, 32)
    for src, payload in zip(frames, d["frames"]):
        got = codecs.decode_image_payload(payload)
        assert got.shape == src.shape
        err = np.abs(got.astype(int) - src.astype(int))
        # smooth content: subsampled chroma reconstructs closely
        assert err.mean() < 4.0, (fourcc, err.mean())
        assert err.max() <= 40, (fourcc, err.max())


def test_yuv_gray_frames_tight():
    # R=G=B -> U=V=128 exactly; only Y quantization remains (<=2)
    g = np.repeat(_gradient(16, 16)[:, :, :1], 3, axis=2)
    blob = codecs.encode_avi_yuv([g], fourcc="I420")
    got = codecs.decode_image_payload(codecs.decode_avi(blob)["frames"][0])
    assert int(np.abs(got.astype(int) - g.astype(int)).max()) <= 2


def test_yv12_equals_i420_output():
    # same RGB through swapped plane order must decode identically
    f = _gradient(24, 32)
    a = codecs.decode_avi(codecs.encode_avi_yuv([f], fourcc="I420"))
    b = codecs.decode_avi(codecs.encode_avi_yuv([f], fourcc="YV12"))
    ga = codecs.decode_image_payload(a["frames"][0])
    gb = codecs.decode_image_payload(b["frames"][0])
    assert np.array_equal(ga, gb)


def test_yuv_sampling_index_parity():
    frames = [_gradient(16, 16, s) for s in range(10)]
    blob = codecs.encode_avi_yuv(frames, fourcc="I420")
    sampled = codecs.avi_sample_frames(blob, 4)
    assert len(sampled) == 4
    full = codecs.decode_avi(blob)["frames"]
    picks = [(j * 10) // 4 for j in range(4)]
    for s, i in zip(sampled, picks):
        assert s == full[i]


def test_yuv_errors():
    with pytest.raises(ValueError, match="even"):
        codecs.encode_avi_yuv([_gradient(15, 16)], fourcc="I420")
    with pytest.raises(ValueError, match="fourcc"):
        codecs.encode_avi_yuv([_gradient(16, 16)], fourcc="NV12")
    with pytest.raises(NotImplementedError, match="YUV"):
        codecs._yuv_frame_to_array(b"\x00" * 1024, 16, 16, "NV12")
    with pytest.raises(ValueError, match="truncated"):
        codecs._yuv_frame_to_array(b"\x00" * 10, 16, 16, "I420")
    # unknown FourCC at the container level still raises honestly
    blob = bytearray(codecs.encode_avi_yuv([_gradient(16, 16)],
                                           fourcc="I420"))
    idx = blob.find(b"I420", blob.find(b"strf"))
    blob[idx : idx + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        codecs.decode_avi(bytes(blob))
