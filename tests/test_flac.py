"""FLAC codec tests (operators/flac.py).

Same evidence strategy as the JPEG/AVI/WAV suites: published check
values (CRC-8/16), hand-authored raw-byte frames the decoder must read
(decoder-independent pins, incl. the VERBATIM and rice-escape paths the
encoder never emits), byte-exact lossless round trips across subframe
types / stereo modes / wasted bits / multi-byte UTF-8 frame numbers,
and pipeline integration through the format-sniffing decode_audio.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hive_population_ml_spark.operators import codecs, flac


def _sine(n=4000, rate=8000, freq=440.0, amp=0.5, noise=0):
    t = np.arange(n) / rate
    x = amp * 32767 * np.sin(2 * np.pi * freq * t)
    if noise:
        x = x + np.random.default_rng(1).integers(-noise, noise, n)
    return x.astype(np.int16)


# --------------------------------------------------------------------------
# primitives: CRCs, UTF-8 numbers, rice coding
# --------------------------------------------------------------------------


def test_crc_published_check_values():
    # CRC-8 poly 0x07 init 0 ("123456789") = 0xF4; FLAC's frame CRC-16
    # is poly 0x8005 init 0 non-reflected (CRC-16/UMTS), check 0xFEE8
    assert flac._crc8(b"123456789") == 0xF4
    assert flac._crc16(b"123456789") == 0xFEE8


def test_utf8_coded_numbers_roundtrip():
    for n in [0, 1, 127, 128, 2047, 2048, 65535, 1 << 20, (1 << 31) + 5,
              (1 << 36) - 1]:
        enc = flac._utf8_encode(n)
        r = flac._BitReader(enc)
        assert flac._utf8_decode(r) == n
    with pytest.raises(ValueError):
        flac._utf8_encode(1 << 36)


def test_rice_hand_vector_and_roundtrip():
    # param 2, value 3 -> zigzag 6 -> quotient 1, remainder 2:
    # bits 0 1 10 -> byte 0b0110_0000
    w = flac._BitWriter()
    flac._rice_write(w, np.array([3], dtype=np.int64), 2)
    w.align()
    assert w.getvalue() == bytes([0b01100000])
    vals = np.array([0, -1, 1, -5, 100, -32768, 32767], dtype=np.int64)
    for param in (0, 1, 4, 10):
        w = flac._BitWriter()
        flac._rice_write(w, vals, param)
        w.align()
        r = flac._BitReader(w.getvalue())
        assert flac._rice_read(r, len(vals), param) == vals.tolist()


# --------------------------------------------------------------------------
# lossless round trips — the defining property
# --------------------------------------------------------------------------


@pytest.mark.parametrize("block_size", [192, 1024, 4096])
def test_mono_roundtrip_bit_exact(block_size):
    x = _sine(n=5000, noise=60)
    d = flac.decode_flac(flac.encode_flac(x, 8000, 1, block_size=block_size))
    assert d["sample_rate"] == 8000 and d["bits"] == 16
    assert np.array_equal(d["samples"][:, 0], x.astype(np.int32))


@pytest.mark.parametrize(
    "mode", ["independent", "mid_side", "left_side", "right_side", "auto"]
)
def test_stereo_roundtrip_every_decorrelation_mode(mode):
    left = _sine(n=3000, freq=330.0, noise=40)
    right = (left * 0.9 + np.random.default_rng(2).integers(-99, 99, 3000)
             ).astype(np.int16)
    inter = np.empty(6000, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    d = flac.decode_flac(
        flac.encode_flac(inter, 8000, 2, block_size=512, stereo_mode=mode)
    )
    assert np.array_equal(d["samples"][:, 0], left.astype(np.int32))
    assert np.array_equal(d["samples"][:, 1], right.astype(np.int32))


def test_lpc_subframe_roundtrip():
    x = _sine(n=4000, noise=30)
    d = flac.decode_flac(flac.encode_flac(x, 8000, 1, force_lpc=True))
    assert np.array_equal(d["samples"][:, 0], x.astype(np.int32))


def test_constant_and_wasted_bits_roundtrip():
    c = np.full(900, -2048, dtype=np.int16)
    d = flac.decode_flac(flac.encode_flac(c, 8000, 1))
    assert np.array_equal(d["samples"][:, 0], c.astype(np.int32))
    # all samples share 3 trailing zero bits -> wasted-bits path
    w = (np.random.default_rng(3).integers(-1000, 1000, 2000) * 8).astype(
        np.int16
    )
    d = flac.decode_flac(flac.encode_flac(w, 8000, 1, block_size=512))
    assert np.array_equal(d["samples"][:, 0], w.astype(np.int32))


def test_many_frames_multibyte_frame_numbers():
    # 200 frames of 192 samples: frame indices >127 take the multi-byte
    # UTF-8 form; lossless end-to-end confirms header parsing stays in
    # sync across every frame boundary
    x = ((np.arange(192 * 200) % 251) - 125).astype(np.int16)
    d = flac.decode_flac(flac.encode_flac(x, 8000, 1, block_size=192))
    assert d["n_frames"] == 192 * 200
    assert np.array_equal(d["samples"][:, 0], x.astype(np.int32))


def test_empty_and_single_sample():
    d = flac.decode_flac(flac.encode_flac(np.array([], dtype=np.int16)))
    assert d["n_frames"] == 0 and d["samples"].shape == (0, 1)
    d = flac.decode_flac(flac.encode_flac(np.array([7], dtype=np.int16)))
    assert d["n_frames"] == 1 and d["samples"][0, 0] == 7


def test_compression_actually_compresses():
    x = _sine(n=8000)  # pure tone: very predictable
    data = flac.encode_flac(x, 8000, 1)
    assert len(data) < 2 * len(x) * 0.9  # beats raw PCM by >10%


# --------------------------------------------------------------------------
# corruption detection — CRCs and MD5 must catch bit flips
# --------------------------------------------------------------------------


def test_corruption_raises():
    x = _sine(n=2000, noise=20)
    data = bytearray(flac.encode_flac(x, 8000, 1))
    # flip one bit in the middle of the first frame's residuals
    data[len(data) // 2] ^= 0x10
    with pytest.raises(ValueError):
        flac.decode_flac(bytes(data))


def test_truncated_stream_value_error():
    # truncation anywhere — including inside the trailing CRC-16 —
    # must raise the decoder's ValueError contract, never struct.error
    x = _sine(n=500)
    data = flac.encode_flac(x, 8000, 1)
    for cut in (len(data) - 1, len(data) - 2, len(data) - 10):
        with pytest.raises(ValueError):
            flac.decode_flac(data[:cut])


def test_header_crc8_detects_flip():
    x = _sine(n=500)
    data = bytearray(flac.encode_flac(x, 8000, 1))
    # find the first frame: it starts right after the 4+4+34-byte
    # metadata prologue; flip a bit in its 4th header byte
    frame0 = 4 + 4 + 34
    data[frame0 + 3] ^= 0x02
    with pytest.raises(ValueError, match="CRC-8"):
        flac.decode_flac(bytes(data))


# --------------------------------------------------------------------------
# hand-authored raw-byte frames: paths the encoder never emits
# --------------------------------------------------------------------------


def _handmade_stream(frame_payload_bits, bs: int, total: int) -> bytes:
    """Wrap one hand-built frame (list of (value, nbits)) in a minimal
    fLaC stream: STREAMINFO for 8 kHz mono 16-bit + the frame with
    correct CRC-8/16."""
    info = flac._BitWriter()
    info.write(bs, 16)
    info.write(bs, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(8000, 20)
    info.write(0, 3)  # 1 channel
    info.write(15, 5)  # 16-bit
    info.write(total, 36)
    streaminfo = info.getvalue() + bytes(16)  # MD5 unset -> not verified
    meta = bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo

    hdr = flac._BitWriter()
    hdr.write(flac._SYNC, 14)
    hdr.write(0, 2)
    hdr.write(6, 4)  # blocksize: 8-bit follows
    hdr.write(4, 4)  # 8 kHz
    hdr.write(0, 4)  # 1 channel independent
    hdr.write(4, 3)  # 16-bit
    hdr.write(0, 1)
    head = bytearray(hdr.getvalue())
    head += flac._utf8_encode(0)
    head.append(bs - 1)
    head.append(flac._crc8(bytes(head)))

    body = flac._BitWriter()
    for v, n in frame_payload_bits:
        body.write(v, n)
    body.align()
    frame = bytes(head) + body.getvalue()
    frame += struct.pack(">H", flac._crc16(frame))
    return b"fLaC" + meta + frame


def test_handmade_verbatim_subframe():
    samples = [100, -100, 32767, -32768]
    bits = [(0, 1), (0b000001, 6), (0, 1)]  # VERBATIM, no wasted bits
    bits += [(s & 0xFFFF, 16) for s in samples]
    d = flac.decode_flac(_handmade_stream(bits, 4, 4))
    assert d["samples"][:, 0].tolist() == samples


def test_handmade_rice_escape_partition():
    # FIXED order 0 with residual coding method 0, partition order 0,
    # rice param 0b1111 = ESCAPE -> 5-bit raw width, then raw signed
    samples = [3, -2, 1, 0]
    bits = [(0, 1), (0b001000, 6), (0, 1)]  # FIXED order 0
    bits += [(0, 2), (0, 4), (0xF, 4), (5, 5)]  # escape, width 5
    bits += [(s & 0x1F, 5) for s in samples]
    d = flac.decode_flac(_handmade_stream(bits, 4, 4))
    assert d["samples"][:, 0].tolist() == samples


def test_handmade_two_partition_residual():
    # FIXED order 1 (warmup 10), block 8, partition order 1 -> two
    # partitions: first has 8/2-1=3 residuals, second has 4; rice
    # param 0 everywhere; residual +1 each step -> ramp
    bits = [(0, 1), (0b001001, 6), (0, 1)]
    bits += [(10, 16)]  # warmup
    bits += [(0, 2), (1, 4)]  # method 0, partition order 1
    bits += [(0, 4)]  # partition 1 param 0
    # zigzag(1) = 2 -> unary 2 zeros + stop at param 0
    one = [(1, 3)]  # bits 001 = unary for 2
    bits += one * 3
    bits += [(0, 4)]  # partition 2 param 0
    bits += one * 4
    d = flac.decode_flac(_handmade_stream(bits, 8, 8))
    assert d["samples"][:, 0].tolist() == [10, 11, 12, 13, 14, 15, 16, 17]


def test_reserved_subframe_type_honest_raise():
    bits = [(0, 1), (0b000010, 6), (0, 1)]  # reserved type 2
    with pytest.raises(NotImplementedError, match="reserved"):
        flac.decode_flac(_handmade_stream(bits, 4, 4))


# --------------------------------------------------------------------------
# pipeline integration: decode_audio sniffing + fingerprint invariance
# --------------------------------------------------------------------------


def test_decode_audio_sniffs_flac_and_normalizes():
    x = _sine(n=2000)
    d = codecs.decode_audio(flac.encode_flac(x, 8000, 1))
    assert d["samples"].dtype == np.int16
    assert np.array_equal(d["samples"][:, 0], x)
    # WAV path unaffected
    d2 = codecs.decode_audio(codecs.encode_wav(x, 8000, 1))
    assert np.array_equal(d2["samples"][:, 0], x)


def test_flac_fingerprint_identical_to_pcm():
    # FLAC is lossless: the spectral fingerprint must be IDENTICAL to
    # the PCM-WAV fingerprint, not merely within the d<=6 contract
    from hive_population_ml_spark.operators.multimodal import _melody_variant

    for pat in (0, 5, 11):
        sig = _melody_variant(pat, 0, 8000, 1.0)
        a = codecs.audio_fingerprint64(codecs.encode_wav(sig, 8000, 1))
        b = codecs.audio_fingerprint64(flac.encode_flac(sig, 8000, 1))
        assert a == b


def test_wav_features_on_flac_payload():
    x = _sine(n=4000)
    base = codecs.wav_features(codecs.encode_wav(x, 8000, 1))
    via_flac = codecs.wav_features(flac.encode_flac(x, 8000, 1))
    assert via_flac == pytest.approx(base)
