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
