"""MPEG-1 Layer II codec tests (operators/mp2.py).

Strategy mirrors the FLAC suite: spec-derivation pins (the Table 3-B.4
C/D affine map vs the closed-form requantizer), hand-authored
raw-frame fixtures exercising degrouping / joint stereo / CRC at the
bit level, measured round-trip SNR through the fixture-grade encoder,
and the honest-boundary errors (Layer I/III, free format, the ISO
window plug point)."""

from __future__ import annotations

import numpy as np
import pytest

from hive_population_ml_spark.operators import codecs, mp2

# Published ISO 11172-3 Table 3-B.4 constants: levels -> (C, D). The
# decoder uses the closed form (2c - L + 1)/L; this table pins the
# equivalence to the spec's affine map s'' = C * (s''' + D).
_TABLE_B4 = {
    3: (1.33333333333, 0.50000000000),
    5: (1.60000000000, 0.50000000000),
    7: (1.14285714286, 0.25000000000),
    9: (1.77777777778, 0.50000000000),
    15: (1.06666666667, 0.12500000000),
    31: (1.03225806452, 0.06250000000),
    63: (1.01587301587, 0.03125000000),
    127: (1.00787401575, 0.01562500000),
    255: (1.00392156863, 0.00781250000),
    511: (1.00195694716, 0.00390625000),
    1023: (1.00097751711, 0.00195312500),
    2047: (1.00048851979, 0.00097656250),
    4095: (1.00024420024, 0.00048828125),
    8191: (1.00012208522, 0.00024414063),
    16383: (1.00006103888, 0.00012207031),
    32767: (1.00003051851, 0.00006103516),
    65535: (1.00001525902, 0.00003051758),
}


def _snr_db(ref: np.ndarray, got: np.ndarray) -> float:
    err = got - ref
    return 10.0 * np.log10(np.sum(ref * ref) / max(np.sum(err * err), 1e-30))


def test_requantizer_matches_spec_affine_map():
    # s''' = (c - 2^(nb-1)) / 2^(nb-1) (MSB-inverted two's-complement
    # fraction), s'' = C*(s''' + D); closed form (2c - L + 1)/L must
    # agree for EVERY level class and every code
    for levels, (c_const, d_const) in _TABLE_B4.items():
        nb = max(2, int(np.ceil(np.log2(levels + 1))))
        for code in range(levels):
            s3 = (code - 2 ** (nb - 1)) / 2 ** (nb - 1)
            spec = c_const * (s3 + d_const)
            closed = (2 * code - levels + 1) / levels
            assert abs(spec - closed) < 5e-9, (levels, code)


def test_quantizer_class_table():
    # grouped classes carry 3 samples per code (Table 3-B.4 grouping)
    assert mp2._QCLASS[3] == (5, True)
    assert mp2._QCLASS[5] == (7, True)
    assert mp2._QCLASS[9] == (10, True)
    for lv, (bits, grouped) in mp2._QCLASS.items():
        if not grouped:
            assert lv == 2 ** bits - 1


def test_scalefactor_table():
    assert mp2._SCALEFACTORS[0] == pytest.approx(2.0)
    assert mp2._SCALEFACTORS[3] == pytest.approx(1.0)
    assert mp2._SCALEFACTORS[62] == pytest.approx(2.0 * 2 ** (-62 / 3))


def test_alloc_table_selection_matrix():
    # spec selection over (sample rate, per-channel bitrate)
    assert mp2._alloc_table(48000, 128, 1) is mp2._TABLE_A
    assert mp2._alloc_table(48000, 384, 2) is mp2._TABLE_A  # 192/ch
    assert mp2._alloc_table(44100, 192, 1) is mp2._TABLE_B
    assert mp2._alloc_table(44100, 64, 1) is mp2._TABLE_A
    assert mp2._alloc_table(44100, 64, 2) is mp2._TABLE_C   # 32/ch
    assert mp2._alloc_table(32000, 48, 1) is mp2._TABLE_D
    assert mp2._alloc_table(32000, 96, 1) is mp2._TABLE_B
    assert len(mp2._TABLE_A) == 27 and len(mp2._TABLE_B) == 30
    assert len(mp2._TABLE_C) == 8 and len(mp2._TABLE_D) == 12
    with pytest.raises(ValueError, match="combination"):
        mp2._alloc_table(48000, 224, 1)  # 224 kbit/s mono is illegal


def test_filterbank_flat_across_band_boundaries():
    # the derived power-complementary prototype must reconstruct tones
    # at band centers AND band boundaries (sr/64 multiples) — a plain
    # windowed sinc fails the boundaries at ~6 dB
    c, d = mp2._default_windows()
    sr = 48000
    t = np.arange(sr // 4) / sr
    for f in (60.0, 370.0, 750.0, 1500.0, 9000.0, 16000.0):
        x = 0.5 * np.sin(2 * np.pi * f * t)
        y = mp2._synth_channel(mp2._analyze_channel(x, c), d)
        dl = 481  # MPEG analysis+synthesis delay
        n = len(y)
        assert _snr_db(x[: n - dl], y[dl:n]) > 30.0, f


def _tone_mix(sr: int, seconds: float) -> np.ndarray:
    t = np.arange(int(sr * seconds)) / sr
    return (
        0.4 * np.sin(2 * np.pi * 440 * t)
        + 0.3 * np.sin(2 * np.pi * 1870 * t)
        + 0.1 * np.sin(2 * np.pi * 6100 * t)
    )


def test_roundtrip_mono_48k():
    x = _tone_mix(48000, 0.5)
    xi = np.clip(np.round(x * 32767), -32768, 32767).astype(np.int16)
    blob = mp2.encode_mp2(xi, 48000, 1, 192)
    d = mp2.decode_mp2(blob)
    assert d["sample_rate"] == 48000 and d["n_channels"] == 1
    assert d["n_frames"] % 1152 == 0 and d["n_frames"] >= len(x)
    y = d["samples"][:, 0].astype(np.float64) / 32767
    dl = 481
    n = min(len(y), len(x))
    snr = _snr_db(x[: n - dl], y[dl:n])
    assert snr > 20.0, snr  # measured 25.2 at the fixture allocation
    # compression is real: 192 kbit/s vs 768 kbit/s PCM
    assert len(blob) < 0.3 * 2 * len(xi)


def test_roundtrip_stereo_with_crc():
    x = _tone_mix(44100, 0.3)
    xs = np.stack([x, np.roll(x, 100)], axis=1)
    xi = np.clip(np.round(xs * 32767), -32768, 32767).astype(np.int16)
    blob = mp2.encode_mp2(xi, 44100, 2, 384, with_crc=True)
    d = mp2.decode_mp2(blob)
    assert d["n_channels"] == 2 and d["sample_rate"] == 44100
    y = d["samples"].astype(np.float64) / 32767
    dl = 481
    n = min(len(y), len(xs))
    assert _snr_db(xs[: n - dl], y[dl:n]) > 20.0


def test_low_bitrate_tables_cd_roundtrip():
    # 32-48 kbit/s/ch select tables C/D (8/12 subbands, grouped-heavy
    # quantizer rows) — the budget-aware fixture plan degrades to the
    # 3/5/9-level classes so these decode paths run end-to-end
    t = np.arange(int(32000 * 0.3)) / 32000
    x = 0.35 * np.sin(2 * np.pi * 700 * t)
    xi = np.clip(np.round(x * 32767), -32768, 32767).astype(np.int16)
    for sr, br in ((32000, 32), (44100, 48)):  # table D, table C
        blob = mp2.encode_mp2(xi, sr, 1, br)
        d = mp2.decode_mp2(blob)
        y = d["samples"][:, 0].astype(np.float64) / 32767
        dl = 481
        n = min(len(y), len(x))
        snr = _snr_db(x[: n - dl], y[dl:n])
        assert snr > 8.0, (sr, br, snr)  # coarse quantizers, real audio
        # compression actually reflects the low rate
        assert len(blob) < 0.15 * 2 * len(xi)


def test_crc_catches_corrupted_allocation():
    x = _tone_mix(44100, 0.1)
    xi = np.clip(np.round(x * 32767), -32768, 32767).astype(np.int16)
    blob = bytearray(mp2.encode_mp2(xi, 44100, 1, 192, with_crc=True))
    # byte 6 sits in the protected bit-allocation region
    blob[6] ^= 0x10
    with pytest.raises(ValueError, match="CRC"):
        mp2.decode_mp2(bytes(blob))


def test_degrouping_bit_exact():
    # hand-author the degrouping math: a 3-level grouped code packs
    # three samples as c = v0 + 3*v1 + 9*v2
    br = mp2._BitReader(bytes([0b10101000]))  # 5-bit code 21 = 0+3*1+9*2
    vals = mp2._read_granule(br, 3)
    # v0=0, v1=1, v2=2 -> requantized (2v-2)/3
    assert vals == pytest.approx((-2 / 3, 0.0, 2 / 3))
    # 5-level: 7-bit code 117 = 2 + 5*3 + 25*4
    br = mp2._BitReader(bytes([0b11101010, 0b00000000]))
    vals = mp2._read_granule(br, 5)
    assert vals == pytest.approx(((2 * 2 - 4) / 5, (2 * 3 - 4) / 5,
                                  (2 * 4 - 4) / 5))


def test_header_errors_and_boundaries():
    with pytest.raises(NotImplementedError, match="Layer III"):
        mp2._parse_header(bytes([0xFF, 0xFB, 0x90, 0x00]), 0)
    # Layer I (bits 11) parses — it is an executable slice now
    h = mp2._parse_header(bytes([0xFF, 0xFF, 0x90, 0x00]), 0)
    assert h["layer"] == 1 and h["bitrate_kbps"] == 288
    with pytest.raises(NotImplementedError, match="MPEG-1"):
        mp2._parse_header(bytes([0xFF, 0xF5, 0x90, 0x00]), 0)  # MPEG-2
    with pytest.raises(NotImplementedError, match="free-format"):
        mp2._parse_header(bytes([0xFF, 0xFD, 0x00, 0x00]), 0)
    with pytest.raises(ValueError, match="sync"):
        mp2.decode_mp2(b"\x00\x01\x02\x03")


def test_layer1_roundtrip_mono_and_stereo():
    x = _tone_mix(48000, 0.25)
    xi = np.clip(np.round(x * 32767), -32768, 32767).astype(np.int16)
    blob = mp2.encode_mp1(xi, 48000, 1, 384)
    d = mp2.decode_mp2(blob)
    assert d["sample_rate"] == 48000 and d["n_channels"] == 1
    assert d["n_frames"] % 384 == 0
    y = d["samples"][:, 0].astype(np.float64) / 32767
    dl = 481
    n = min(len(y), len(x))
    assert _snr_db(x[: n - dl], y[dl:n]) > 20.0
    # Layer I frame arithmetic: slots are 4 bytes
    h = {"layer": 1, "bitrate_kbps": 384, "sample_rate": 48000,
         "padding": 0}
    assert mp2._frame_bytes(h) == 12 * 384000 // 48000 * 4

    xs = np.stack([x, np.roll(x, 64)], axis=1)
    xsi = np.clip(np.round(xs * 32767), -32768, 32767).astype(np.int16)
    blob2 = mp2.encode_mp1(xsi, 44100, 2, 448, with_crc=True)
    d2 = mp2.decode_mp2(blob2)
    assert d2["n_channels"] == 2
    y2 = d2["samples"].astype(np.float64) / 32767
    n = min(len(y2), len(xs))
    assert _snr_db(xs[: n - dl], y2[dl:n]) > 15.0
    # CRC catches corrupted Layer I allocation too
    bad = bytearray(blob2)
    bad[6] ^= 0x20
    with pytest.raises(ValueError, match="CRC"):
        mp2.decode_mp2(bytes(bad))


def test_id3_skip_and_trailing_tag():
    x = _tone_mix(48000, 0.1)
    xi = np.clip(np.round(x * 32767), -32768, 32767).astype(np.int16)
    blob = mp2.encode_mp2(xi, 48000, 1, 192)
    id3v2 = b"ID3\x03\x00\x00\x00\x00\x00\x0apayload+++"  # size 10
    id3v1 = b"TAG" + b"\x00" * 125
    d = mp2.decode_mp2(id3v2 + blob + id3v1)
    assert d["n_frames"] >= len(x)


def test_window_plug_point():
    x = _tone_mix(48000, 0.1)
    xi = np.clip(np.round(x * 32767), -32768, 32767).astype(np.int16)
    blob = mp2.encode_mp2(xi, 48000, 1, 192)
    _, d_win = mp2._default_windows()
    a = mp2.decode_mp2(blob)["samples"]
    b = mp2.decode_mp2(blob, d_window=list(d_win))["samples"]
    assert np.array_equal(a, b)
    with pytest.raises(ValueError, match="512"):
        mp2.decode_mp2(blob, d_window=np.zeros(100))


def test_joint_stereo_shared_codes():
    # hand-author a joint-stereo frame: mode=1, bound=4 — subbands
    # past the bound carry ONE code set scaled by per-channel
    # scalefactors. Encode a mono-ish frame manually at 256 kbit/s.
    sr, br_kbps = 48000, 256
    table = mp2._alloc_table(sr, br_kbps, 2)
    sblimit = len(table)
    bound = 4  # mode_extension 0
    bw = mp2._BitWriter()
    b1 = 0xF8 | (2 << 1) | 1  # no CRC
    b2 = (mp2._BITRATES.index(br_kbps) << 4) | (mp2._SRATES.index(sr) << 2)
    b3 = 1 << 6  # joint stereo, mode_extension 0
    for b in (0xFF, b1, b2, b3):
        bw.write(b, 8)
    # allocation: only subband 5 (past bound) active with 7 levels
    # (table A row 2: alloc code 3), shared between channels
    for sb in range(sblimit):
        nbal = table[sb][0]
        if sb < bound:
            bw.write(0, nbal)
            bw.write(0, nbal)
        else:
            bw.write(3 if sb == 5 else 0, nbal)
    # scfsi: 2 bits per active (ch, sb): both channels of sb 5
    bw.write(2, 2)  # ch0: one scalefactor for all parts
    bw.write(2, 2)  # ch1
    # scalefactors: ch0 idx 3 (1.0), ch1 idx 0 (2.0)
    bw.write(3, 6)
    bw.write(0, 6)
    # samples: 12 granules, one subband, SHARED codes (3 bits each,
    # 7 levels): constant code 6 -> requant (12-6)/7 = 6/7
    for gr in range(12):
        for t in range(3):
            bw.write(6, 3)
    h = {"bitrate_kbps": br_kbps, "sample_rate": sr, "padding": 0}
    frame = bw.to_bytes(pad_to_bytes=mp2._frame_bytes(h))
    hdr = mp2._parse_header(frame, 0)
    assert hdr["mode"] == 1 and hdr["n_channels"] == 2
    sb_out = mp2._decode_frame_subbands(frame, 0, hdr)
    v = 6 / 7
    assert sb_out[:, 5, 0] == pytest.approx(np.full(36, 1.0 * v))
    assert sb_out[:, 5, 1] == pytest.approx(np.full(36, 2.0 * v))
    assert np.count_nonzero(sb_out[:, [s for s in range(32) if s != 5], :]) == 0


def test_decode_audio_dispatch():
    x = _tone_mix(48000, 0.1)
    xi = np.clip(np.round(x * 32767), -32768, 32767).astype(np.int16)
    blob = mp2.encode_mp2(xi, 48000, 1, 192)
    d = codecs.decode_audio(blob)
    assert d["sample_rate"] == 48000
    assert d["samples"].dtype == np.int16
    # the feature path runs end-to-end on MP2 bytes
    feats = codecs.audio_fingerprint64(blob)
    assert isinstance(feats, int)


def test_spark_e2e_mp2_fingerprint(spark):
    # Spark-side plumbing: MP2 payloads synthesized per row inside
    # mapInPandas, fingerprinted through the SAME media-path consumer
    # (audio_fingerprint_media) the WAV/FLAC fixtures use — same
    # melody across containers lands in the same bucket distance
    import pandas as pd
    from pyspark.sql import functions as F

    from hive_population_ml_spark.operators.multimodal import (
        _melody_samples,
        audio_fingerprint_media,
    )

    def synth(batches):
        for pdf in batches:
            payloads, kinds = [], []
            for _, row in pdf.iterrows():
                sig = _melody_samples(int(row["pattern"]), 32000, 1.0)
                xi = np.clip(np.round(sig * 32767), -32768, 32767).astype(
                    np.int16
                )
                if int(row["container"]) == 1:
                    payloads.append(mp2.encode_mp2(xi, 32000, 1, 192))
                    kinds.append("audio/mpeg")
                else:
                    payloads.append(codecs.encode_wav(xi, 32000, 1))
                    kinds.append("audio/wav")
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media": payloads,
                    "media_type": kinds,
                }
            )

    base = spark.createDataFrame(
        [(i, i % 2, i // 2) for i in range(8)],
        "id long, container int, pattern int",
    )
    media = base.mapInPandas(
        synth, "id long, media binary, media_type string"
    )
    rows = audio_fingerprint_media(media).collect()
    assert len(rows) == 8
    by_pat: dict = {}
    for r in rows:
        by_pat.setdefault(r["id"] // 2, []).append(r["afp"])
    for pat, fps in by_pat.items():
        assert len(fps) == 2
        intra = bin(fps[0] ^ fps[1]).count("1")
        assert intra <= 10, (pat, intra)  # WAV vs MP2, same melody


def test_fingerprint_invariant_across_wav_and_mp2():
    # the perceptual contract extends to the new container: the same
    # melody encoded as PCM WAV and as MP2 must fingerprint close
    # (intra), while a different melody stays far (inter)
    from hive_population_ml_spark.operators.multimodal import _melody_samples

    # MPEG-1 sample rates exclude 8 kHz: generate the seeded melodies
    # natively at 32 kHz (band-interior tones then span the full
    # spectrum, as in the 8 kHz fixture); int16 both ways (encode_wav's
    # fixture contract is int16 PCM)
    def i16(x):
        return np.clip(np.round(x * 32767), -32768, 32767).astype(np.int16)

    sig_a32 = i16(_melody_samples(3, 32000, 1.0))
    sig_b32 = i16(_melody_samples(7, 32000, 1.0))
    wav_a32 = codecs.encode_wav(sig_a32, 32000, 1)
    mp2_a32 = mp2.encode_mp2(sig_a32, 32000, 1, 192)
    mp2_b32 = mp2.encode_mp2(sig_b32, 32000, 1, 192)
    fp_wav = codecs.audio_fingerprint64(wav_a32)
    fp_mp2 = codecs.audio_fingerprint64(mp2_a32)
    fp_other = codecs.audio_fingerprint64(mp2_b32)
    intra = bin(fp_wav ^ fp_mp2).count("1")
    inter = bin(fp_wav ^ fp_other).count("1")
    assert intra <= 8, intra
    assert inter >= 16, inter
    assert intra < inter
