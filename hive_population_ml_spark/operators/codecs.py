"""Stdlib-only media codecs for the multimodal operators.

The usual decode libraries (PIL / librosa / av) are not in this
container, but three real formats need nothing beyond the standard
library, so the ``decode_stub=False`` path in
``operators/multimodal.py`` is EXECUTABLE for them:

- **WAV PCM audio** — parsed with ``wave`` (header) + numpy (samples):
  duration / RMS / peak / zero-crossing features, and equal-duration
  chunking for the frame-sampling shape.
- **Uncompressed 24-bit BMP images** — parsed/written with ``struct``:
  width / height / channel statistics, and nearest-neighbor resize.
- **PNG images (8-bit RGB/RGBA)** — zlib-inflated with all five
  scanline filters unfiltered per the spec: a real COMPRESSED format,
  decode pinned in tests against an independent forward-filter writer.

These are the codec plug points the stubs document; JPEG/MP3/video stay
honestly stubbed (no stdlib DCT or video codec exists). Encoders are
included so tests and fixtures can round-trip without external tools.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# --------------------------------------------------------------------------
# WAV (PCM)
# --------------------------------------------------------------------------


def encode_wav(
    samples: np.ndarray, sample_rate: int = 8000, n_channels: int = 1
) -> bytes:
    """int16 PCM samples -> WAV bytes (fixture/round-trip helper)."""
    samples = np.asarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> dict:
    """WAV bytes -> header fields + int16 sample array.

    Returns ``{n_channels, sample_rate, n_frames, duration_s, samples}``
    with ``samples`` shaped (n_frames, n_channels).
    """
    with wave.open(io.BytesIO(data), "rb") as w:
        n_channels = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    if width != 2:
        raise NotImplementedError(
            f"only 16-bit PCM WAV is supported (got sampwidth={width})"
        )
    samples = np.frombuffer(raw, dtype="<i2").reshape(-1, n_channels)
    return {
        "n_channels": n_channels,
        "sample_rate": rate,
        "n_frames": n_frames,
        "duration_s": n_frames / float(rate),
        "samples": samples,
    }


def wav_features(data: bytes, dim: int = 8) -> list[float]:
    """Audio feature vector: [duration_s, rms, peak, zero-crossing-rate,
    n_channels, sample_rate_khz, n_frames, 0...] padded/truncated to dim.
    RMS/peak are on [-1, 1]-normalized samples."""
    d = decode_wav(data)
    x = d["samples"].astype(np.float64) / 32768.0
    mono = x.mean(axis=1)
    rms = float(np.sqrt(np.mean(mono * mono))) if mono.size else 0.0
    peak = float(np.abs(mono).max()) if mono.size else 0.0
    zcr = (
        float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8)))))
        if mono.size > 1
        else 0.0
    )
    feats = [
        d["duration_s"],
        rms,
        peak,
        zcr,
        float(d["n_channels"]),
        d["sample_rate"] / 1000.0,
        float(d["n_frames"]),
    ]
    feats = feats[:dim]
    return feats + [0.0] * (dim - len(feats))


def wav_chunks(data: bytes, n_chunks: int) -> list[bytes]:
    """Split a WAV into n_chunks equal-duration WAV payloads (the audio
    analog of video frame sampling — each chunk is itself decodable)."""
    d = decode_wav(data)
    samples, rate, nch = d["samples"], d["sample_rate"], d["n_channels"]
    n = samples.shape[0]
    step = max(n // n_chunks, 1)
    out = []
    for k in range(n_chunks):
        part = samples[k * step : min((k + 1) * step, n)]
        out.append(encode_wav(part.reshape(-1), rate, nch))
    return out


# --------------------------------------------------------------------------
# BMP (uncompressed 24-bit BI_RGB)
# --------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB array -> uncompressed 24-bit BMP bytes."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("encode_bmp expects (H, W, 3) RGB")
    row_len = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    img_size = row_len * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    body = bytearray(img_size)
    bgr = arr[:, :, ::-1]  # BMP stores BGR
    for row in range(h):
        src = bgr[h - 1 - row]  # bottom-up
        body[row * row_len : row * row_len + w * 3] = src.tobytes()
    return header + dib + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes -> (H, W, 3) uint8 RGB array."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    dib_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP is supported "
            f"(got bpp={bpp}, compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    arr = np.empty((h, w, 3), dtype=np.uint8)
    for row in range(h):
        start = offset + row * row_len
        line = np.frombuffer(data, dtype=np.uint8, count=w * 3, offset=start)
        dst = (h - 1 - row) if bottom_up else row
        arr[dst] = line.reshape(w, 3)[:, ::-1]  # BGR -> RGB
    return arr


def bmp_features(data: bytes, dim: int = 8) -> list[float]:
    """Image feature vector: [width, height, mean_r, mean_g, mean_b,
    std_gray, 0...] padded/truncated to dim (means/std on [0, 1])."""
    arr = decode_bmp(data).astype(np.float64) / 255.0
    h, w, _ = arr.shape
    gray = arr.mean(axis=2)
    feats = [
        float(w),
        float(h),
        float(arr[:, :, 0].mean()),
        float(arr[:, :, 1].mean()),
        float(arr[:, :, 2].mean()),
        float(gray.std()),
    ]
    feats = feats[:dim]
    return feats + [0.0] * (dim - len(feats))


def bmp_resize(data: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize, re-encoded as BMP."""
    arr = decode_bmp(data)
    h, w, _ = arr.shape
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return encode_bmp(arr[rows][:, cols])


# --------------------------------------------------------------------------
# PNG (stdlib zlib): a real COMPRESSED image codec with no external
# dependency — upgrades the former image/png NotImplementedError stub.
# Supported: 8-bit RGB (color type 2) and RGBA (6), non-interlaced,
# all five scanline filters on decode. Python-loop unfiltering is fine
# for the fixture/feature sizes exercised here; a production pipeline
# swaps PIL/libpng in at the same dispatch point for throughput.
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W, 3|4) uint8 array -> PNG bytes (filter 0 rows, one IDAT)."""
    import zlib

    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("encode_png expects (H, W, 3|4) uint8")
    h, w, c = arr.shape
    color_type = 2 if c == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[row].tobytes() for row in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, 3|4) uint8 array.

    Handles 8-bit RGB/RGBA, non-interlaced, every scanline filter
    (None/Sub/Up/Average/Paeth). Raises NotImplementedError for other
    bit depths / color types / interlacing — the honest boundary."""
    import zlib

    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (2, 6) or interlace:
        raise NotImplementedError(
            f"only 8-bit RGB/RGBA non-interlaced PNG supported "
            f"(depth={depth}, color_type={color_type}, interlace={interlace})"
        )
    c = 3 if color_type == 2 else 4
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data has wrong length")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytearray(stride)
    for row in range(h):
        base = row * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(c, stride):
                line[i] = (line[i] + line[i - c]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - c] if i >= c else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - c] if i >= c else 0
                up_left = prev[i - c] if i >= c else 0
                line[i] = (line[i] + _paeth(left, prev[i], up_left)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[row] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = line
    return out.reshape(h, w, c)


def png_features(data: bytes, dim: int = 8) -> list[float]:
    """Same feature contract as bmp_features, decoded from PNG (alpha
    channel ignored for the channel means)."""
    arr = decode_png(data)[:, :, :3].astype(np.float64) / 255.0
    h, w, _ = arr.shape
    gray = arr.mean(axis=2)
    feats = [
        float(w),
        float(h),
        float(arr[:, :, 0].mean()),
        float(arr[:, :, 1].mean()),
        float(arr[:, :, 2].mean()),
        float(gray.std()),
    ]
    feats = feats[:dim]
    return feats + [0.0] * (dim - len(feats))


def png_resize(data: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize, re-encoded as PNG."""
    arr = decode_png(data)
    h, w, _ = arr.shape
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return encode_png(arr[rows][:, cols])


def wav_spectral(data: bytes, n_bands: int = 8) -> list[float]:
    """Spectral profile from real PCM: [centroid_hz, rolloff85_hz,
    band_0..band_{n-1}] where bands are equal-width energy FRACTIONS of
    [0, Nyquist]. numpy rFFT on the mono mix — the stdlib-only stand-in
    for mel/MFCC front ends (librosa plugs in at this function), and the
    audio-side analog of png/bmp_features.
    """
    d = decode_wav(data)
    x = d["samples"].astype(np.float64) / 32768.0
    mono = x.mean(axis=1)
    if mono.size < 2:
        return [0.0] * (2 + n_bands)
    spec = np.abs(np.fft.rfft(mono)) ** 2
    spec[0] = 0.0  # drop DC so silence/offset doesn't dominate
    freqs = np.fft.rfftfreq(mono.size, d=1.0 / d["sample_rate"])
    total = float(spec.sum())
    if total <= 0.0:
        return [0.0] * (2 + n_bands)
    centroid = float((freqs * spec).sum() / total)
    cum = np.cumsum(spec)
    rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * total))])
    nyq = d["sample_rate"] / 2.0
    idx = np.minimum((freqs / nyq * n_bands).astype(int), n_bands - 1)
    bands = np.zeros(n_bands)
    np.add.at(bands, idx, spec)
    return [centroid, rolloff, *(bands / total).tolist()]
