"""Compressed-WAV codec tests: G.711 μ-law / A-law, IMA ADPCM, IEEE
float and the 8/24/32-bit PCM depths behind the struct-only RIFF
parser (operators/codecs.py).

Evidence strategy mirrors the JPEG/AVI suites: published-spec value
pins (the classic G.711 extreme points), encode∘decode idempotence
over the full byte alphabet, an INDEPENDENT scalar reference decoder
for ADPCM checked against the vectorized one, round-trip SNR bounds,
and fingerprint invariance so the perceptual audio-dedup contract
extends to compressed re-encodes.
"""

from __future__ import annotations

import numpy as np
import pytest

from hive_population_ml_spark.operators import codecs


def _sine(n=4000, rate=8000, freq=440.0, amp=0.5):
    t = np.arange(n) / rate
    return (amp * 32767 * np.sin(2 * np.pi * freq * t)).astype(np.int16)


def _snr_db(ref: np.ndarray, out: np.ndarray) -> float:
    ref = ref.astype(np.float64)
    err = out.astype(np.float64) - ref
    return 10.0 * np.log10(np.sum(ref * ref) / max(np.sum(err * err), 1e-12))


# --------------------------------------------------------------------------
# G.711 — spec pins + idempotence + round-trip
# --------------------------------------------------------------------------


def test_mulaw_lut_spec_pins():
    lut = codecs._g711_mulaw_lut()
    # the classic G.711 extreme points: 0xFF decodes to 0, 0x7F to -1's
    # positive twin 0... byte 0x00 is the negative maximum -32124,
    # byte 0x80 the positive maximum +32124.
    assert lut[0xFF] == 0
    assert lut[0x00] == -32124
    assert lut[0x80] == 32124
    # mid-segment hand value: byte 0xCA -> inverted 0x35 -> exp 3,
    # mant 5 -> ((5<<3)+0x84)<<3 - 0x84 = 1244
    assert lut[0xCA] == 1244


def test_alaw_lut_spec_pins():
    lut = codecs._g711_alaw_lut()
    # A-law smallest magnitudes: 0x55 -> -8, 0xD5 -> +8; extremes
    # 0x2A -> -32256, 0xAA -> +32256 (the published A-law max).
    assert lut[0x55] == -8
    assert lut[0xD5] == 8
    assert lut[0x2A] == -32256
    assert lut[0xAA] == 32256


@pytest.mark.parametrize("law", ["mulaw", "alaw"])
def test_g711_encode_decode_idempotent_over_all_bytes(law):
    # encode(decode(b)) == b for every byte: the standard encoder/decoder
    # pair is a projection onto the 256 codewords. This pins both
    # directions against each other across the whole alphabet.
    if law == "mulaw":
        lut, enc = codecs._g711_mulaw_lut(), codecs._g711_mulaw_encode
    else:
        lut, enc = codecs._g711_alaw_lut(), codecs._g711_alaw_encode
    all_bytes = np.arange(256, dtype=np.uint8)
    again = enc(lut[all_bytes].astype(np.int64))
    # value-level idempotence everywhere: re-encoded bytes decode to the
    # same linear value
    assert np.array_equal(lut[again], lut[all_bytes])
    if law == "mulaw":
        # byte-level: exact except μ-law's NEGATIVE ZERO alias — 0x7F
        # and 0xFF both decode to 0 and the canonical encoder emits 0xFF
        mismatch = np.where(again != all_bytes)[0]
        assert list(mismatch) == [0x7F] and again[0x7F] == 0xFF
    else:
        assert np.array_equal(again, all_bytes)


@pytest.mark.parametrize("law,min_snr", [("mulaw", 30.0), ("alaw", 30.0)])
def test_g711_roundtrip_snr(law, min_snr):
    x = _sine()
    wav = codecs.encode_wav_g711(x, 8000, 1, law=law)
    d = codecs.decode_wav(wav)
    assert d["sample_rate"] == 8000
    assert d["n_frames"] == len(x)
    assert _snr_db(x, d["samples"][:, 0]) > min_snr


def test_g711_monotone_on_codeword_grid():
    # decoded values sorted by signed byte interpretation must cover
    # negatives and positives and the encoder must be monotone in level
    lut = codecs._g711_mulaw_lut()
    assert lut.min() < -30000 and lut.max() > 30000
    levels = np.array([-20000, -5000, -100, 0, 100, 5000, 20000])
    dec = lut[codecs._g711_mulaw_encode(levels)]
    assert np.all(np.diff(dec) >= 0)


# --------------------------------------------------------------------------
# IMA ADPCM — independent scalar reference vs vectorized decoder
# --------------------------------------------------------------------------


def _ima_decode_reference(body, n_channels, block_align):
    """Straight-line scalar transcription of the IMA spec decode loop —
    deliberately NOT sharing code with the vectorized implementation."""
    steps = codecs._IMA_STEPS.tolist()
    idx_delta = [-1, -1, -1, -1, 2, 4, 6, 8]
    spb = (block_align - 4 * n_channels) * 2 // n_channels + 1
    out = []
    for b0 in range(0, len(body) - block_align + 1, block_align):
        blk = body[b0 : b0 + block_align]
        chans = []
        for c in range(n_channels):
            pred = int.from_bytes(blk[4 * c : 4 * c + 2], "little",
                                  signed=True)
            idx = min(max(blk[4 * c + 2], 0), 88)
            # per-channel nibble sequence: 4-byte groups round-robin
            nibs = []
            data = blk[4 * n_channels :]
            for g in range(0, len(data), 4 * n_channels):
                grp = data[g + 4 * c : g + 4 * c + 4]
                for byte in grp:
                    nibs.append(byte & 0x0F)
                    nibs.append(byte >> 4)
            vals = [pred]
            for code in nibs[: spb - 1]:
                step = steps[idx]
                vpdiff = step >> 3
                if code & 4:
                    vpdiff += step
                if code & 2:
                    vpdiff += step >> 1
                if code & 1:
                    vpdiff += step >> 2
                pred = pred - vpdiff if code & 8 else pred + vpdiff
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + idx_delta[code & 7]))
                vals.append(pred)
            chans.append(vals)
        for s in range(spb):
            for c in range(n_channels):
                out.append(chans[c][s])
    return np.array(out, dtype=np.int16).reshape(-1, n_channels)


@pytest.mark.parametrize("n_channels", [1, 2])
def test_ima_adpcm_vectorized_matches_scalar_reference(n_channels):
    rng = np.random.default_rng(7)
    ba = 256 * n_channels
    body = rng.integers(0, 256, size=3 * ba, dtype=np.uint8).tobytes()
    got = codecs._ima_adpcm_decode(body, n_channels, ba)
    want = _ima_decode_reference(body, n_channels, ba)
    assert got.shape == want.shape
    assert np.array_equal(got, want)


def test_ima_adpcm_hand_pinned_block():
    # predictor 100, index 0 (step 7), nibbles 0x2 then 0x9 then zeros:
    #   code 2: vpdiff = 7>>3 + 7>>1 = 0+3 -> 103, index +(-1)->0
    #   code 9: vpdiff = 0 + 7>>2 = 1   -> 102, index 0
    #   code 0: vpdiff = 0             -> stays 102
    head = (100).to_bytes(2, "little", signed=True) + bytes([0, 0])
    body = head + bytes([0x92]) + bytes(3)  # low nibble first: 2 then 9
    wav_samples = codecs._ima_adpcm_decode(body, 1, 8)
    assert wav_samples[0, 0] == 100
    assert wav_samples[1, 0] == 103
    assert wav_samples[2, 0] == 102
    assert np.all(wav_samples[3:, 0] == 102)


def test_ima_adpcm_roundtrip_snr_and_fact_trim():
    x = _sine(n=5000)
    wav = codecs.encode_wav_ima_adpcm(x, 8000, 1)
    d = codecs.decode_wav(wav)
    # fact chunk trims the zero-padded final block to the true count
    assert d["n_frames"] == 5000
    assert _snr_db(x, d["samples"][:, 0]) > 20.0


def test_ima_adpcm_stereo_roundtrip():
    left = _sine(n=2400, freq=330.0)
    right = _sine(n=2400, freq=550.0)
    inter = np.empty(4800, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    wav = codecs.encode_wav_ima_adpcm(inter, 8000, 2, block_align=512)
    d = codecs.decode_wav(wav)
    assert d["n_channels"] == 2 and d["n_frames"] == 2400
    assert _snr_db(left, d["samples"][:, 0]) > 20.0
    assert _snr_db(right, d["samples"][:, 1]) > 20.0


# --------------------------------------------------------------------------
# PCM depths, float, parser edges
# --------------------------------------------------------------------------


def test_float32_wav_roundtrip_exactish():
    x = _sine(n=1000)
    d = codecs.decode_wav(codecs.encode_wav_float(x, 8000, 1))
    assert d["n_frames"] == 1000
    assert np.max(np.abs(d["samples"][:, 0].astype(int) - x.astype(int))) <= 1


def test_pcm8_and_pcm24_and_pcm32_decode():
    # 8-bit unsigned: 128 -> 0, 255 -> 0x7F00, 0 -> -0x8000
    body8 = bytes([128, 255, 0])
    wav8 = codecs._wav_container(0x0001, 1, 8000, 1, 8, body8, None)
    s8 = codecs.decode_wav(wav8)["samples"][:, 0]
    assert list(s8) == [0, 0x7F00, -0x8000]
    # 24-bit: value 0x123456 (LE bytes 56 34 12) -> top 16 bits 0x1234
    body24 = bytes([0x56, 0x34, 0x12]) + bytes([0x00, 0x00, 0x80])
    wav24 = codecs._wav_container(0x0001, 1, 8000, 3, 24, body24, None)
    s24 = codecs.decode_wav(wav24)["samples"][:, 0]
    assert s24[0] == 0x1234 and s24[1] == -0x8000
    # 32-bit: 0x7FFF0000 -> 0x7FFF
    body32 = np.array([0x7FFF0000, -0x80000000], dtype="<i4").tobytes()
    wav32 = codecs._wav_container(0x0001, 1, 8000, 4, 32, body32, None)
    s32 = codecs.decode_wav(wav32)["samples"][:, 0]
    assert s32[0] == 0x7FFF and s32[1] == -0x8000


def test_extensible_fmt_resolves_subformat():
    x = _sine(n=200)
    base = codecs.encode_wav_g711(x, 8000, 1, law="mulaw")
    # rebuild as WAVE_FORMAT_EXTENSIBLE wrapping the μ-law tag
    import struct as _s

    fmt, body, fact = codecs._wav_parse(base)
    guid = _s.pack("<H", 0x0007) + b"\x00\x00" + bytes(12)
    ext = _s.pack("<HHIIHH", 0xFFFE, 1, 8000, 8000, 1, 8) + _s.pack(
        "<HHI", 22, 8, 1
    ) + guid
    payload = (
        b"WAVE"
        + b"fmt " + _s.pack("<I", len(ext)) + ext
        + b"fact" + _s.pack("<II", 4, len(x))
        + b"data" + _s.pack("<I", len(body)) + body
    )
    wav = b"RIFF" + _s.pack("<I", len(payload)) + payload
    d = codecs.decode_wav(wav)
    assert d["n_frames"] == len(x)
    assert _snr_db(x, d["samples"][:, 0]) > 30.0


def test_pcm_ignores_placeholder_fact_zero():
    # streaming writers emit fact=0 and never patch it; PCM must ignore
    # fact (it is informational for uncompressed formats)
    x = _sine(n=100)
    import struct as _s

    fmt, body, _ = codecs._wav_parse(codecs.encode_wav(x, 8000, 1))
    payload = (
        b"WAVE"
        + b"fmt " + _s.pack("<I", 16)
        + _s.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        + b"fact" + _s.pack("<II", 4, 0)
        + b"data" + _s.pack("<I", len(body)) + body
    )
    wav = b"RIFF" + _s.pack("<I", len(payload)) + payload
    d = codecs.decode_wav(wav)
    assert d["n_frames"] == 100
    assert np.array_equal(d["samples"][:, 0], x)


def test_zero_sample_rate_value_error():
    import struct as _s

    payload = (
        b"WAVE"
        + b"fmt " + _s.pack("<I", 16)
        + _s.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)
        + b"data" + _s.pack("<I", 4) + bytes(4)
    )
    wav = b"RIFF" + _s.pack("<I", len(payload)) + payload
    with pytest.raises(ValueError, match="sample rate"):
        codecs.decode_wav(wav)


def test_float_nan_inf_decode_deterministic():
    body = np.array([0.5, float("nan"), float("inf"), float("-inf")],
                    dtype="<f4").tobytes()
    wav = codecs._wav_container(0x0003, 1, 8000, 4, 32, body, None)
    s = codecs.decode_wav(wav)["samples"][:, 0]
    assert list(s) == [16384, 0, 32767, -32767]


def test_unknown_format_tag_honest_raise():
    wav = codecs._wav_container(0x0055, 1, 8000, 1, 0, b"\x00\x00", None)
    with pytest.raises(NotImplementedError, match="0x0055"):
        codecs.decode_wav(wav)


def test_parser_skips_odd_sized_foreign_chunks():
    x = _sine(n=100)
    pcm = codecs.encode_wav(x, 8000, 1)
    import struct as _s

    fmt, body, _ = codecs._wav_parse(pcm)
    # LIST chunk with odd payload length before data: must be padded over
    payload = (
        b"WAVE"
        + b"fmt " + _s.pack("<I", 16)
        + _s.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        + b"LIST" + _s.pack("<I", 5) + b"INFOx" + b"\x00"
        + b"data" + _s.pack("<I", len(body)) + body
    )
    wav = b"RIFF" + _s.pack("<I", len(payload)) + payload
    d = codecs.decode_wav(wav)
    assert np.array_equal(d["samples"][:, 0], x)


# --------------------------------------------------------------------------
# Downstream invariance: features + perceptual fingerprint survive
# compressed re-encodes (the audio analog of the JPEG-re-encode pin)
# --------------------------------------------------------------------------


def _melody(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    rate, note = 8000, 1000
    freqs = rng.choice([262.0, 330.0, 392.0, 523.0, 659.0, 784.0], size=8)
    t = np.arange(note) / rate
    parts = [0.6 * 32767 * np.sin(2 * np.pi * f * t) for f in freqs]
    return np.concatenate(parts).astype(np.int16)


@pytest.mark.parametrize("codec", ["mulaw", "alaw", "adpcm", "float"])
def test_fingerprint_invariant_under_compressed_reencode(codec):
    for seed in (1, 2, 3):
        x = _melody(seed)
        ref = codecs.audio_fingerprint64(codecs.encode_wav(x, 8000, 1))
        if codec == "adpcm":
            wav = codecs.encode_wav_ima_adpcm(x, 8000, 1)
        elif codec == "float":
            wav = codecs.encode_wav_float(x, 8000, 1)
        else:
            wav = codecs.encode_wav_g711(x, 8000, 1, law=codec)
        got = codecs.audio_fingerprint64(wav)
        dist = bin((ref ^ got) & ((1 << 64) - 1)).count("1")
        assert dist <= 6, f"{codec} seed={seed} hamming={dist}"


def test_wav_features_format_agnostic():
    x = _melody(9)
    base = codecs.wav_features(codecs.encode_wav(x, 8000, 1))
    comp = codecs.wav_features(codecs.encode_wav_g711(x, 8000, 1, "alaw"))
    assert comp[0] == pytest.approx(base[0])  # duration identical
    assert comp[1] == pytest.approx(base[1], rel=0.05)  # rms within 5%
    spec_b = codecs.wav_spectral(codecs.encode_wav(x, 8000, 1))
    spec_c = codecs.wav_spectral(codecs.encode_wav_ima_adpcm(x, 8000, 1))
    assert spec_c[0] == pytest.approx(spec_b[0], rel=0.05)  # centroid
