"""Stdlib-only media codecs for the multimodal operators.

The usual decode libraries (PIL / librosa / av) are not in this
container, but two real formats need nothing beyond the standard
library, so the ``decode_stub=False`` path in
``operators/multimodal.py`` is EXECUTABLE for them:

- **WAV PCM audio** — parsed with ``wave`` (header) + numpy (samples):
  duration / RMS / peak / zero-crossing features, and equal-duration
  chunking for the frame-sampling shape.
- **Uncompressed 24-bit BMP images** — parsed/written with ``struct``:
  width / height / channel statistics, and nearest-neighbor resize.

These are the codec plug points the stubs document; video stays
honestly stubbed (no stdlib video codec exists). Encoders are included
so tests and fixtures can round-trip without external tools.
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
