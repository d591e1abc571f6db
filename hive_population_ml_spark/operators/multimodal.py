"""Multimodal (binary) column plumbing — SURVEY.md §2.10.

Design: media is an opaque ``binary`` column plus a typed metadata
struct; decode / feature-extraction runs as Arrow-batched pandas
functions over ``mapInPandas`` so each task processes whole record
batches (the only sane shape for per-item Python work at 100 TB —
per-row UDFs would serialize item-at-a-time).

The actual codecs (PIL/librosa/av) are NOT in this container, so the
decode step is stubbed: ``decode_stub=True`` derives small
deterministic fake features from the bytes (so the plumbing — schema,
batching, partitioning — is fully testable); ``decode_stub=False``
raises NotImplementedError at the call site where a real codec would
plug in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "id bigint, media binary, media_type string, width int, height int, n_bytes int"
)

FEATURE_SCHEMA = "id bigint, media_type string, n_bytes int, feat array<double>"


def attach_media(df: DataFrame, id_col: str, payload_col: str, media_type: str) -> DataFrame:
    """Wrap an existing column as an opaque media payload with metadata
    (stand-in for reading real image/audio bytes from object storage)."""
    payload = F.encode(F.col(payload_col).cast("string"), "UTF-8")
    return df.select(
        F.col(id_col).alias("id"),
        payload.alias("media"),
        F.lit(media_type).alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.length(payload).alias("n_bytes"),
    )


def _fake_decode(media: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in features: byte-histogram moments. Replace
    with a real codec (PIL.Image.open etc.) in production."""
    if not media:
        return [0.0] * dim
    buckets = [0] * dim
    for b in media:
        buckets[b % dim] += 1
    total = float(len(media))
    return [c / total for c in buckets]


def extract_features(
    df: DataFrame, dim: int = 8, decode_stub: bool = True, batch_hint: int = 1024
) -> DataFrame:
    """mapInPandas feature extraction over media batches.

    Each Arrow batch is decoded in one Python call; output schema is
    fixed (FEATURE_SCHEMA) so downstream plans don't depend on the
    decoder. Partitioning is preserved — no shuffle introduced.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media codecs (PIL/librosa/av) are not available in "
                    "this environment; use decode_stub=True"
                )
            feats = [_fake_decode(m, dim) for m in pdf["media"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feat": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "id bigint, media binary, media_type string, width int, height int, n_bytes int"
)

FRAME_SCHEMA = "id bigint, frame_idx int, frame binary, n_bytes int"


def resize_media(
    df: DataFrame, width: int, height: int, decode_stub: bool = True
) -> DataFrame:
    """mapInPandas resize: same row count, new (width, height) metadata
    and a re-encoded payload. The stub 'resize' is a deterministic byte
    subsample standing in for a real PIL/libswscale call; schema and
    batch shape are exactly what the real codec path uses."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real image codecs are not available in this environment; "
                    "use decode_stub=True"
                )
            target = width * height
            out = [bytes(m[:target]) if m else b"" for m in pdf["media"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media": out,
                    "media_type": pdf["media_type"],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "n_bytes": [len(m) for m in out],
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, n_frames: int = 4, decode_stub: bool = True
) -> DataFrame:
    """mapInPandas frame sampling: ONE media row → ``n_frames`` frame
    rows (cardinality-expanding, the video-decode shape). Frames are
    evenly-spaced byte slices under the stub; a real build replaces the
    slicer with av/ffmpeg keyframe extraction. No shuffle: expansion is
    per-partition, and downstream ops see a stable (id, frame_idx) key."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real video codecs are not available in this environment; "
                    "use decode_stub=True"
                )
            ids, idxs, frames = [], [], []
            for i, m in zip(pdf["id"], pdf["media"]):
                m = m or b""
                step = max(len(m) // n_frames, 1)
                for k in range(n_frames):
                    ids.append(i)
                    idxs.append(k)
                    frames.append(bytes(m[k * step : k * step + step]))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "frame_idx": idxs,
                    "frame": frames,
                    "n_bytes": [len(f) for f in frames],
                }
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)
