"""GIF codec tests (operators/codecs.py GIF section).

LZW is the third compression family in the codec set (after DCT/huffman
and deflate). Evidence: a hand-decoded LZW bit vector, width-growth and
dictionary-overflow stress, exact round trips (incl. interlace and
animation), the honest >256-color raise, frame sampling parity with the
AVI path, and the lossless-domain pHash pin (palette art re-encodes
byte-exactly, so the perceptual hash is IDENTICAL — while full-color
smooth fields are documented as outside GIF's same-content contract:
measured posterize intra 30, median-cut 12, both past the d<=6 bar,
which is why GIF does NOT join the dedup_image_phash fixture mix).
"""

from __future__ import annotations

import numpy as np
import pytest

from hive_population_ml_spark.operators import codecs


def _palette_image(seed: int, h: int = 24, w: int = 32, n_colors: int = 40):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, n_colors, (h, w))]


def test_lzw_hand_vector():
    # min_code=2: clear=4, end=5, width starts at 3.
    # Encoding indices [1, 1] emits: clear(4), code 1, then "1,1" is not
    # in the table -> emit 1... actually [1,1]: cur=(1), nxt=(1,1) not in
    # table -> emit table[(1,)]=1, add (1,1)=6, cur=(1); end: emit 1, end.
    # Bits LSB-first, width 3: 4='100', 1='001', 1='001', 5='101'
    # stream: 100 001 001 101 -> bits b0..: 0b001_100=0x0C? assemble:
    # acc = 4 | 1<<3 | 1<<6 | 5<<9 = 4+8+64+2560 = 2636 = 0b101001001100
    # bytes LE: 0x4C, 0x0A
    enc = codecs._gif_lzw_encode(2, [1, 1])
    assert enc == bytes([0x4C, 0x0A])
    assert codecs._gif_lzw_decode(2, enc, 2) == [1, 1]


def test_lzw_roundtrip_width_growth_and_overflow():
    rng = np.random.default_rng(9)
    for n, alphabet in ((50, 4), (5000, 16), (30000, 256)):
        seq = rng.integers(0, alphabet, n).tolist()
        min_code = max(2, int(np.ceil(np.log2(alphabet))))
        enc = codecs._gif_lzw_encode(min_code, seq)
        assert codecs._gif_lzw_decode(min_code, enc, n) == seq


def test_gif_roundtrip_exact():
    img = _palette_image(1)
    assert np.array_equal(codecs.decode_gif(codecs.encode_gif(img)), img)


def test_gif_interlaced_roundtrip_exact():
    img = _palette_image(2, h=37, w=19)  # odd sizes stress the passes
    g = codecs.encode_gif(img, interlace=True)
    assert np.array_equal(codecs.decode_gif(g), img)


def test_gif_two_color_long_runs():
    bw = np.zeros((50, 80, 3), dtype=np.uint8)
    bw[::2] = 255
    assert np.array_equal(codecs.decode_gif(codecs.encode_gif(bw)), bw)


def test_gif_256_color_noise_exact():
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 256, (64, 64))]
    assert np.array_equal(codecs.decode_gif(codecs.encode_gif(img)), img)


def test_gif_too_many_colors_honest_raise_and_posterize():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="<=256 colors"):
        codecs.encode_gif(img)
    post = codecs.decode_gif(codecs.encode_gif(img, posterize=True))
    # 3-3-2: channel errors bounded by the dropped bits
    err = np.abs(post.astype(int) - img.astype(int))
    assert err[..., 0].max() < 32 and err[..., 2].max() < 64


def test_gif_animation_roundtrip_and_sampling():
    # frames share one palette (GIF's global color table covers the
    # whole animation)
    rng = np.random.default_rng(10)
    pal = rng.integers(0, 256, (32, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 32, (24, 32))] for _ in range(8)]
    ani = codecs.encode_gif(frames, delay_cs=5)
    out = codecs.decode_gif_frames(ani)
    assert len(out) == 8
    assert all(np.array_equal(a, b) for a, b in zip(out, frames))
    # evenly-spaced sampling re-emits standalone single-frame GIFs
    chunks = codecs.gif_sample_frames(ani, 4)
    assert len(chunks) == 4
    for k, idx in enumerate((0, 2, 4, 6)):
        assert np.array_equal(codecs.decode_gif(chunks[k]), frames[idx])


def test_gif_features_shape():
    ani = codecs.encode_gif([_palette_image(20), _palette_image(21)])
    f = codecs.gif_features(ani)
    assert f[0] == 32.0 and f[1] == 24.0 and f[7] == 2.0


def test_gif_phash_identical_on_palette_art():
    # GIF's lossless domain: <=256-color images re-encode byte-exactly,
    # so the perceptual hash is IDENTICAL to the BMP of the same pixels
    for seed in (5, 6, 7):
        img = _palette_image(seed, n_colors=24)
        h_bmp = codecs.phash64(codecs.decode_bmp(codecs.encode_bmp(img)))
        h_gif = codecs.phash64(codecs.decode_gif(codecs.encode_gif(img)))
        assert h_bmp == h_gif


def test_gif_transparency_honest_raise():
    img = _palette_image(8)
    data = bytearray(codecs.encode_gif([img, img]))
    # set the transparency flag in the first GCE (pattern: 21 F9 04 ..)
    i = bytes(data).index(bytes([0x21, 0xF9, 4]))
    data[i + 3] |= 0x01
    with pytest.raises(NotImplementedError, match="transparency"):
        codecs.decode_gif_frames(bytes(data))


def test_gif_truncation_and_garbage_raise():
    img = _palette_image(9)
    g = codecs.encode_gif(img)
    with pytest.raises(ValueError):
        codecs.decode_gif(b"NOTAGIF" + g[6:])
    with pytest.raises(ValueError):
        # cut inside the LZW sub-blocks
        codecs.decode_gif(g[: len(g) // 2])


def test_multimodal_gif_animation_query(spark, sf_oracle_dir):
    from hive_population_ml_spark.queries import QUERIES, load_all

    load_all()
    rows = QUERIES["multimodal_gif_animation"](spark, sf_oracle_dir).collect()
    assert len(rows) == 120 * 4
    by_frame: dict[int, list] = {}
    for r in rows:
        by_frame.setdefault(r["frame_idx"], []).append(r)
    # panning palette art: every sampled frame after the first moves
    assert all(r["motion"] > 0 for r in rows if r["frame_idx"] > 0)
    assert all(r["motion"] == 0.0 for r in by_frame[0])
    assert all(r["gray_std"] > 0 for r in rows)


def test_multimodal_gif_dispatch(spark):
    from pyspark.sql import functions as F

    from hive_population_ml_spark.operators import multimodal

    img = _palette_image(30)
    rng = np.random.default_rng(30)
    pal = rng.integers(0, 256, (32, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 32, (24, 32))] for _ in range(6)]
    payload = codecs.encode_gif(frames)
    df = spark.createDataFrame(
        [(1, bytearray(payload), "image/gif", None, None, len(payload))],
        multimodal.MEDIA_SCHEMA,
    )
    feats = multimodal.extract_features(df, dim=8, decode_stub=False).collect()
    assert feats[0]["feat"][7] == 6.0  # n_frames
    sampled = multimodal.sample_frames(df, n_frames=3, decode_stub=False)
    rows = sampled.collect()
    assert len(rows) == 3
    first = codecs.decode_gif(bytes(rows[0]["frame"]))
    assert np.array_equal(first, frames[0])
    del img
