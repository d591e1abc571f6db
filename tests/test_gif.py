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


def test_gif_transparency_flag_composites_instead_of_raising():
    # round 11: the former honest raise is now real compositing — a
    # transparency flag keyed to palette index 0 makes those pixels
    # show the canvas (black before frame 1), and the GCE applies to
    # ONE image only (frame 2 decodes opaque)
    import numpy as np

    img = _palette_image(8)
    data = bytearray(codecs.encode_gif([img, img]))
    i = bytes(data).index(bytes([0x21, 0xF9, 4]))
    data[i + 3] |= 0x01  # transparent flag; transparent index byte = 0
    f1, f2 = codecs.decode_gif_frames(bytes(data))
    pal0 = np.unique(np.concatenate([img.reshape(-1, 3)] * 2), axis=0)[0]
    mask = (img == pal0).all(axis=2)
    assert mask.any()
    assert (f1[mask] == 0).all()          # index-0 cells show canvas
    assert np.array_equal(f1[~mask], img[~mask])
    assert np.array_equal(f2, img)        # GCE consumed by frame 1


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


def test_gif_transparency_and_disposal_hand_authored():
    """Round 11 (formerly an honest raise): hand-authored GIF89a with
    a sub-rectangle transparent frame and each disposal method — the
    compositing rules pinned straight off the spec bytes."""
    import struct

    import numpy as np

    from hive_population_ml_spark.operators import codecs

    # 4x4 screen, GCT: 0=black 1=red 2=green 3=blue, bg index 3 (blue)
    pal = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", 4, 4)
    out += bytes([0x80 | 1, 3, 0])  # GCT 4 entries, background idx 3
    out += pal

    def image(left, top, fw, fh, indices, gce=None):
        b = bytearray()
        if gce is not None:
            b += bytes([0x21, 0xF9, 4, gce[0], 0, 0, gce[1], 0])
        b += bytes([0x2C]) + struct.pack("<HHHH", left, top, fw, fh)
        b += bytes([0x00, 2])  # no LCT, min code 2
        lzw = codecs._gif_lzw_encode(2, list(indices))
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            b += bytes([len(chunk)]) + chunk
        b += bytes([0])
        return b

    # frame 1: full screen red, disposal 1 (leave in place)
    out += image(0, 0, 4, 4, [1] * 16, gce=((1 << 2), 0))
    # frame 2: 2x2 sub-rect at (1,1): [[green, transparent],
    # [transparent, blue]] with transparent index 0, disposal 2
    # (restore bg over the rect afterwards)
    out += image(1, 1, 2, 2, [2, 0, 0, 3], gce=((2 << 2) | 1, 0))
    # frame 3: 1x1 at (0,0) green, no GCE
    out += image(0, 0, 1, 1, [2])
    out += bytes([0x3B])

    frames = codecs.decode_gif_frames(bytes(out))
    assert len(frames) == 3
    red = [255, 0, 0]
    green = [0, 255, 0]
    blue = [0, 0, 255]
    f1, f2, f3 = frames
    assert (f1 == np.array(red)).all()
    # frame 2: transparent cells show frame 1's red underneath
    assert list(f2[1, 1]) == green
    assert list(f2[1, 2]) == red   # transparent -> canvas red
    assert list(f2[2, 1]) == red   # transparent -> canvas red
    assert list(f2[2, 2]) == blue
    assert list(f2[0, 0]) == red   # outside the sub-rect untouched
    # frame 3 composites onto the disposal-2 canvas: frame 2's rect
    # restored to the BACKGROUND color (blue), rest still red
    assert list(f3[0, 0]) == green  # the new 1x1 frame
    assert list(f3[1, 1]) == blue and list(f3[2, 2]) == blue
    assert list(f3[0, 3]) == red
    # disposal 3 (restore previous) pinned directly: a full red frame
    # declaring restore-previous leaves the NEXT frame compositing
    # onto the pre-frame canvas (all black):
    out2 = bytearray(b"GIF89a")
    out2 += struct.pack("<HH", 2, 1)
    out2 += bytes([0x80 | 1, 0, 0]) + pal
    out2 += image(0, 0, 2, 1, [1, 1], gce=((3 << 2), 0))  # red, disp 3
    out2 += image(0, 0, 1, 1, [0], gce=((0 << 2) | 1, 0))  # all transp
    out2 += bytes([0x3B])
    g1, g2 = codecs.decode_gif_frames(bytes(out2))
    assert list(g1[0, 0]) == red
    # frame 1's disposal 3 restored the pre-frame (black) canvas, and
    # frame 2 is fully transparent -> black shows through
    assert list(g2[0, 0]) == [0, 0, 0]
    assert list(g2[0, 1]) == [0, 0, 0]
