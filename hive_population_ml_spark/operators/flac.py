"""FLAC lossless audio codec — numpy + stdlib only.

Public-spec semantics throughout (RFC 9639 / the xiph FLAC format
document): STREAMINFO metadata, frame headers with CRC-8, subframe
types CONSTANT / VERBATIM / FIXED (orders 0-4) / LPC (quantized
coefficients + shift), rice-coded residuals (4- and 5-bit parameters,
partition orders, raw-bits escape), wasted-bits shifting, all four
channel assignments (independent, left/side, right/side, mid/side),
UTF-8-coded frame numbers, frame CRC-16 and the STREAMINFO MD5 of the
unencoded stream.

The ENCODER is the fixture/round-trip helper (per-sample Python loops,
same posture as the JPEG huffman path): fixed predictors chosen by
residual cost, optional stereo decorrelation, optional LPC emission of
the order-2 predictor (exercises the LPC decode path losslessly),
wasted-bits detection. The DECODER is complete for the subset above;
unsupported reserved codes raise NotImplementedError — the honest
boundary.

Everything is LOSSLESS: tests pin byte-exact round trips, hand-authored
raw-byte frames (decoder-independent), published CRC check values and
the MD5 stream hash.

Reference parity note: the reference pipeline treats audio as opaque
binary (/root/reference src/data/dataset.py); this gives the Spark-side
decode dispatch a real compressed-audio format beyond the WAV family.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_SYNC = 0b11111111111110  # 14-bit frame sync

# fixed-predictor coefficient rows: s[i] is predicted from the previous
# `order` samples with these weights (the k-th binomial differences)
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                    8192: 13, 16384: 14, 32768: 15}
_RATE_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
               22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
               96000: 11}
_SIZE_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_SIZE_FROM_CODE = {v: k for k, v in _SIZE_CODES.items()}


# --------------------------------------------------------------------------
# bit IO (MSB-first, like the JPEG path but without byte stuffing)
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zero bits then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0, "unaligned writer"
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, byte_pos: int = 0) -> None:
        self.data = data
        self.pos = byte_pos  # byte position
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0

    def byte_position(self) -> int:
        assert self.nbits % 8 == 0
        return self.pos - self.nbits // 8


# --------------------------------------------------------------------------
# CRCs (FLAC frame-header CRC-8 poly 0x07, frame CRC-16 poly 0x8005,
# both init 0, non-reflected)
# --------------------------------------------------------------------------

_CRC8_TABLE: list[int] | None = None
_CRC16_TABLE: list[int] | None = None


def _crc8(data: bytes) -> int:
    global _CRC8_TABLE
    if _CRC8_TABLE is None:
        tbl = []
        for b in range(256):
            r = b
            for _ in range(8):
                r = ((r << 1) ^ 0x07) & 0xFF if r & 0x80 else (r << 1) & 0xFF
            tbl.append(r)
        _CRC8_TABLE = tbl
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    global _CRC16_TABLE
    if _CRC16_TABLE is None:
        tbl = []
        for b in range(256):
            r = b << 8
            for _ in range(8):
                r = ((r << 1) ^ 0x8005) & 0xFFFF if r & 0x8000 else (
                    (r << 1) & 0xFFFF
                )
            tbl.append(r)
        _CRC16_TABLE = tbl
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[(crc >> 8) ^ b]
    return crc


# --------------------------------------------------------------------------
# UTF-8-style coded numbers (frame/sample index, up to 36 bits)
# --------------------------------------------------------------------------


def _utf8_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    for total in range(2, 8):
        if n < 1 << (7 - total + 6 * (total - 1)):
            lead = (0xFF << (8 - total)) & 0xFF
            out = [lead | (n >> (6 * (total - 1)))]
            for i in range(total - 2, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("coded number exceeds 36 bits")


def _utf8_decode(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    total = 0
    mask = 0x80
    while first & mask:
        total += 1
        mask >>= 1
    if total < 2 or total > 7:
        raise ValueError("invalid UTF-8 coded number")
    n = first & (0xFF >> (total + 1))
    for _ in range(total - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid UTF-8 continuation byte")
        n = (n << 6) | (c & 0x3F)
    return n


# --------------------------------------------------------------------------
# rice residual coding
# --------------------------------------------------------------------------


def _rice_write(w: _BitWriter, resid: np.ndarray, param: int) -> None:
    for v in resid.tolist():
        u = (v << 1) ^ (v >> 63)  # zigzag
        w.write_unary(u >> param)
        if param:
            w.write(u & ((1 << param) - 1), param)


def _rice_read(r: _BitReader, n: int, param: int) -> list[int]:
    out = []
    for _ in range(n):
        u = (r.read_unary() << param) | (r.read(param) if param else 0)
        out.append((u >> 1) ^ -(u & 1))  # un-zigzag
    return out


def _rice_cost(resid: np.ndarray, param: int) -> int:
    u = (resid.astype(np.int64) << 1) ^ (resid.astype(np.int64) >> 63)
    return int(np.sum(u >> param)) + resid.size * (param + 1)


def _best_rice_param(resid: np.ndarray) -> int:
    best_p, best_c = 0, _rice_cost(resid, 0)
    for p in range(1, 15):
        c = _rice_cost(resid, p)
        if c < best_c:
            best_p, best_c = p, c
    return best_p


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    r = s.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _write_subframe(
    w: _BitWriter, s: np.ndarray, bits: int, force_lpc: bool
) -> None:
    s = s.astype(np.int64)
    # wasted bits: common low zero bits across the subframe (real FLAC
    # encoders detect exactly this; exercises the decode-side shift)
    wasted = 0
    if np.any(s):
        ors = int(np.bitwise_or.reduce(s & ((1 << bits) - 1)))
        while wasted < bits - 1 and not (ors >> wasted) & 1:
            wasted += 1
    eff_bits = bits - wasted
    sv = s >> wasted if wasted else s

    if np.all(sv == sv[0]):
        w.write(0, 1)
        w.write(0b000000, 6)  # CONSTANT
        _write_wasted(w, wasted)
        w.write(int(sv[0]) & ((1 << eff_bits) - 1), eff_bits)
        return

    # pick the fixed order 0-2 with the smallest rice cost
    best = None
    for order in (0, 1, 2):
        if sv.size <= order:
            continue
        resid = _fixed_residual(sv, order)
        cost = _rice_cost(resid, _best_rice_param(resid))
        if best is None or cost < best[1]:
            best = (order, cost, resid)
    order, _, resid = best
    if force_lpc and sv.size > 2:
        # emit the order-2 fixed predictor AS an LPC subframe
        # (coefs [2,-1], shift 0, precision 4) — losslessly identical
        # residuals, exercises the LPC decode path
        order = 2
        resid = _fixed_residual(sv, 2)
        w.write(0, 1)
        w.write(0b100000 | (order - 1), 6)
        _write_wasted(w, wasted)
        for i in range(order):
            w.write(int(sv[i]) & ((1 << eff_bits) - 1), eff_bits)
        w.write(4 - 1, 4)  # precision-1
        w.write(0, 5)  # shift (signed, 0)
        w.write(2 & 0xF, 4)
        w.write(-1 & 0xF, 4)
    else:
        w.write(0, 1)
        w.write(0b001000 | order, 6)  # FIXED
        _write_wasted(w, wasted)
        for i in range(order):
            w.write(int(sv[i]) & ((1 << eff_bits) - 1), eff_bits)
    # residual: coding method 0 (4-bit rice), partition order 0
    param = _best_rice_param(resid)
    w.write(0, 2)
    w.write(0, 4)
    w.write(param, 4)
    _rice_write(w, resid, param)


def _write_wasted(w: _BitWriter, wasted: int) -> None:
    if wasted:
        w.write(1, 1)
        w.write_unary(wasted - 1)
    else:
        w.write(0, 1)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 8000,
    n_channels: int = 1,
    block_size: int = 4096,
    stereo_mode: str = "auto",
    force_lpc: bool = False,
) -> bytes:
    """int16 samples -> FLAC bytes. ``stereo_mode``: independent /
    mid_side / left_side / right_side / auto (auto = mid_side when it
    costs less, per block). ``force_lpc`` emits order-2 predictors as
    LPC subframes (still lossless) so tests exercise that decode path.
    """
    x = np.asarray(samples, dtype=np.int64).reshape(-1, n_channels)
    n_frames = x.shape[0]
    bits = 16

    frames = bytearray()
    for fi, b0 in enumerate(range(0, n_frames, block_size)):
        blk = x[b0 : b0 + block_size]
        bs = blk.shape[0]
        hdr = _BitWriter()
        hdr.write(_SYNC, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize strategy
        bs_code = _BLOCKSIZE_CODES.get(bs, 7)
        hdr.write(bs_code, 4)
        rate_code = _RATE_CODES.get(sample_rate, 13 if sample_rate < 65536
                                    else 0)
        hdr.write(rate_code, 4)
        chan_mode = "independent"
        if n_channels == 2:
            if stereo_mode == "auto":
                mid = (blk[:, 0] + blk[:, 1]) >> 1
                side = blk[:, 0] - blk[:, 1]
                cost_ms = int(np.abs(np.diff(mid)).sum()
                              + np.abs(np.diff(side)).sum())
                cost_ind = int(np.abs(np.diff(blk[:, 0])).sum()
                               + np.abs(np.diff(blk[:, 1])).sum())
                chan_mode = "mid_side" if cost_ms < cost_ind else "independent"
            else:
                chan_mode = stereo_mode
        chan_code = {"independent": n_channels - 1, "left_side": 8,
                     "right_side": 9, "mid_side": 10}[chan_mode]
        hdr.write(chan_code, 4)
        hdr.write(_SIZE_CODES[bits], 3)
        hdr.write(0, 1)  # reserved
        head = bytearray(hdr.out)
        assert hdr.nbits == 0
        head += _utf8_encode(fi)
        if bs_code == 7:
            head += struct.pack(">H", bs - 1)
        elif bs_code == 6:
            head += bytes([bs - 1])
        if rate_code == 13:
            head += struct.pack(">H", sample_rate)
        head.append(_crc8(bytes(head)))

        body = _BitWriter()
        if chan_mode == "independent":
            subs = [(blk[:, c], bits) for c in range(n_channels)]
        elif chan_mode == "mid_side":
            subs = [((blk[:, 0] + blk[:, 1]) >> 1, bits),
                    (blk[:, 0] - blk[:, 1], bits + 1)]
        elif chan_mode == "left_side":
            subs = [(blk[:, 0], bits), (blk[:, 0] - blk[:, 1], bits + 1)]
        else:  # right_side
            subs = [(blk[:, 0] - blk[:, 1], bits + 1), (blk[:, 1], bits)]
        for sub, sub_bits in subs:
            _write_subframe(body, sub, sub_bits, force_lpc)
        body.align()
        frame = bytes(head) + body.getvalue()
        frame += struct.pack(">H", _crc16(frame))
        frames += frame

    # STREAMINFO: min/max blocksize+framesize, rate, channels, bits,
    # total samples, MD5 of the little-endian interleaved stream
    md5 = hashlib.md5(
        x.astype("<i2").tobytes()
    ).digest()
    used_bs = min(block_size, max(n_frames, 1))
    info = _BitWriter()
    info.write(used_bs, 16)
    info.write(block_size if n_frames > block_size else used_bs, 16)
    info.write(0, 24)  # min frame size unknown
    info.write(0, 24)  # max frame size unknown
    info.write(sample_rate, 20)
    info.write(n_channels - 1, 3)
    info.write(bits - 1, 5)
    info.write(n_frames, 36)
    streaminfo = info.getvalue() + md5
    meta = bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo
    return b"fLaC" + meta + bytes(frames)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def _read_subframe(r: _BitReader, bs: int, bits: int) -> list[int]:
    if r.read(1) != 0:
        raise ValueError("subframe padding bit set")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bits - wasted
    if ftype == 0:  # CONSTANT
        v = r.read_signed(eff)
        out = [v] * bs
    elif ftype == 1:  # VERBATIM
        out = [r.read_signed(eff) for _ in range(bs)]
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        warm = [r.read_signed(eff) for _ in range(order)]
        resid = _read_residual(r, bs, order)
        out = list(warm)
        coefs = _FIXED_COEFS[order]
        for v in resid:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs))
            out.append(v + pred)
    elif ftype >= 32:  # LPC order 1-32
        order = ftype - 31
        warm = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code 1111")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        resid = _read_residual(r, bs, order)
        out = list(warm)
        for v in resid:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs)) >> shift
            out.append(v + pred)
    else:
        raise NotImplementedError(f"reserved FLAC subframe type {ftype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _read_residual(r: _BitReader, bs: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise NotImplementedError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    n_part = 1 << porder
    if bs % n_part:
        raise ValueError("partition count does not divide block size")
    out: list[int] = []
    for p in range(n_part):
        count = bs // n_part - (order if p == 0 else 0)
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            out.extend(
                r.read_signed(raw) if raw else 0 for _ in range(count)
            )
        else:
            out.extend(_rice_read(r, count, param))
    return out


def decode_flac(data: bytes, verify_md5: bool = True) -> dict:
    """FLAC bytes -> {n_channels, sample_rate, bits, n_frames,
    duration_s, samples} with ``samples`` shaped (n_frames, n_channels)
    int32 at the stream's bit depth. Verifies every frame's CRC-8/16
    and (by default) the STREAMINFO MD5 — it's a LOSSLESS codec, the
    decode either matches bit-exactly or raises."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while pos + 4 <= len(data):
        hdr = data[pos]
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        if hdr & 0x7F == 0:
            streaminfo = data[pos + 4 : pos + 4 + length]
        pos += 4 + length
        if hdr & 0x80:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC STREAMINFO missing")
    si = _BitReader(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)  # min frame size
    si.read(24)  # max frame size
    si_rate = si.read(20)
    si_channels = si.read(3) + 1
    si_bits = si.read(5) + 1
    total = si.read(36)
    md5_expected = streaminfo[18:34]

    chans: list[list[int]] = [[] for _ in range(si_channels)]
    while pos + 2 <= len(data):
        frame_start = pos
        r = _BitReader(data, pos)
        if r.read(14) != _SYNC:
            raise ValueError(f"lost FLAC frame sync at byte {frame_start}")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        rate_code = r.read(4)
        chan_code = r.read(4)
        size_code = r.read(3)
        r.read(1)  # reserved
        _utf8_decode(r)
        if bs_code == 0:
            raise NotImplementedError("reserved block size code 0")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if rate_code == 12:
            r.read(8)
        elif rate_code in (13, 14):
            r.read(16)
        crc_declared = r.read(8)
        header_len = r.byte_position() - frame_start
        if _crc8(data[frame_start : frame_start + header_len - 1]) \
                != crc_declared:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        bits = si_bits if size_code == 0 else _SIZE_FROM_CODE.get(size_code)
        if bits is None:
            raise NotImplementedError(
                f"reserved sample size code {size_code}"
            )
        if chan_code <= 7:
            n_ch = chan_code + 1
            subs = [_read_subframe(r, bs, bits) for _ in range(n_ch)]
        elif chan_code in (8, 9, 10):
            n_ch = 2
            b0 = bits + (1 if chan_code == 9 else 0)
            b1 = bits + (1 if chan_code in (8, 10) else 0)
            s0 = _read_subframe(r, bs, b0)
            s1 = _read_subframe(r, bs, b1)
            if chan_code == 8:  # left/side
                left = s0
                right = [a - b for a, b in zip(s0, s1)]
            elif chan_code == 9:  # right/side
                right = s1
                left = [a + b for a, b in zip(s1, s0)]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(s0, s1):
                    mm = (m << 1) | (s & 1)
                    left.append((mm + s) >> 1)
                    right.append((mm - s) >> 1)
            subs = [left, right]
        else:
            raise NotImplementedError(
                f"reserved channel assignment {chan_code}"
            )
        if n_ch != si_channels:
            raise ValueError("frame channel count disagrees with STREAMINFO")
        r.align()
        body_end = r.byte_position()
        if body_end + 2 > len(data):
            raise ValueError("FLAC bitstream truncated")
        crc16_declared = struct.unpack(
            ">H", data[body_end : body_end + 2]
        )[0]
        if _crc16(data[frame_start:body_end]) != crc16_declared:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = body_end + 2
        for c in range(n_ch):
            chans[c].extend(subs[c])

    samples = np.array(chans, dtype=np.int64).T
    if total:
        samples = samples[:total]
    if verify_md5 and md5_expected != bytes(16):
        if si_bits == 16:
            raw = samples.astype("<i2").tobytes()
        elif si_bits == 8:
            raw = samples.astype(np.int8).tobytes()
        else:  # 24/32-bit streams: LE at ceil(bits/8) bytes
            width = (si_bits + 7) // 8
            raw = b"".join(
                int(v).to_bytes(width, "little", signed=True)
                for v in samples.reshape(-1)
            )
        if hashlib.md5(raw).digest() != md5_expected:
            raise ValueError("FLAC MD5 mismatch — decode is not bit-exact")
    n_frames = samples.shape[0]
    return {
        "n_channels": si_channels,
        "sample_rate": si_rate,
        "bits": si_bits,
        "n_frames": n_frames,
        "duration_s": n_frames / float(si_rate) if si_rate else 0.0,
        "samples": samples.astype(np.int32),
    }
