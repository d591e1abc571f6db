"""User-facing pipeline API — the Spark restatement of the reference's
programmatic entry point ``create_dataloaders`` (reference
``src/data/dataset.py:464-640``, SURVEY.md §3.2).

The reference dispatches on ``task`` and returns (train, val, test,
info). This facade keeps that shape but is source-agnostic: callers
pass any sensor-shaped fact DataFrame (key, timestamp, measures...) and
any annotation-shaped dim DataFrame (key, date, labels...) — loaded via
``io.sources`` / ``io.adapters`` — and get back lazily-planned split
DataFrames plus schema metadata. Everything is one Catalyst DAG until
an action; nothing materializes on the driver.

Task recipes mirror the reference:
- ``population``  — centered interval window → stats bundle (+ deltas)
  → coverage gate → CASE label                  (preprocessing.py:142-204)
- ``phenotypic``  — season-scoped stats + diurnal range + calendar
  multiscale re-agg joined per key              (preprocessing.py:278-381)
- ``winter``      — pre-winter season filter → per-key stats → boolean
  survival label                                 (preprocessing.py:384-462)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ml.splits import with_split_column
from .operators.interval_join import interval_join
from .operators.stats_bundle import delta_stats, stats_bundle

__all__ = [
    "create_population_dataset",
    "create_sequence_dataset",
    "create_phenotypic_dataset",
    "create_winter_dataset",
    "create_datasets",
]


def create_population_dataset(
    sensor: DataFrame,
    annotations: DataFrame,
    key: str,
    sensor_ts: str,
    annot_key: str,
    annot_date: str,
    measures: Sequence[str],
    label_col: str,
    label_threshold: float,
    window_days: int = 7,
    min_count: int = 10,
    include_deltas: bool = True,
) -> DataFrame:
    """Per-annotation centered-window feature matrix + binary label.

    One interval join + one stats-bundle aggregation (+ one delta-stats
    window pass when requested) replaces the reference's O(A×S)
    iterrows loop (preprocessing.py:165-183).
    """
    annot_cols = [F.col(c).alias(f"__a_{c}") for c in annotations.columns]
    dim = annotations.select(*annot_cols)
    j = interval_join(
        sensor,
        dim,
        on=[(key, f"__a_{annot_key}")],
        fact_ts=sensor_ts,
        dim_ts=f"__a_{annot_date}",
        before=window_days // 2 if window_days > 1 else window_days,
        after=window_days // 2 if window_days > 1 else window_days,
        broadcast_dim=False,
    )
    group_keys = [f"__a_{c}" for c in annotations.columns]
    feats = stats_bundle(
        j,
        keys=group_keys,
        measures=list(measures),
        min_count=min_count,
        count_col=measures[0],
    )
    if include_deltas:
        deltas = delta_stats(
            j, keys=group_keys, ts=sensor_ts, measures=list(measures)
        )
        feats = feats.join(deltas, group_keys, "left")
    out = feats.select(
        *[F.col(f"__a_{c}").alias(c) for c in annotations.columns],
        *[c for c in feats.columns if not c.startswith("__a_")],
    )
    return out.withColumn(
        "label", (F.col(label_col) >= label_threshold).cast("double")
    )


def create_sequence_dataset(
    sensor: DataFrame,
    annotations: DataFrame,
    key: str,
    sensor_ts: str,
    annot_key: str,
    annot_date: str,
    measures: Sequence[str],
    label_col: str,
    label_threshold: float,
    window_days: int = 7,
    min_count: int = 10,
    max_len: int = 168,
) -> DataFrame:
    """``use_sequences=True`` analog of :func:`create_population_dataset`
    (reference ``create_dataloaders(use_sequences=...)``,
    dataset.py:464-640, sequence build at dataset.py:144-313): the SAME
    centered interval alignment, materialized as per-annotation
    (``max_len`` x len(measures)) zero-padded float tensors (W5)
    instead of the stats bundle — so aggregate and sequence models
    train on identically-aligned populations. Default ``max_len=168``
    mirrors the reference's 7-day-hourly cap (dataset.py:162-163).

    Output: every annotation column + seq_len + ``seq``
    (array<array<double>>) + binary ``label``.
    """
    from .operators.sequences import build_sequences

    annot_cols = [F.col(c).alias(f"__a_{c}") for c in annotations.columns]
    dim = annotations.select(*annot_cols)
    j = interval_join(
        sensor,
        dim,
        on=[(key, f"__a_{annot_key}")],
        fact_ts=sensor_ts,
        dim_ts=f"__a_{annot_date}",
        before=window_days // 2 if window_days > 1 else window_days,
        after=window_days // 2 if window_days > 1 else window_days,
        broadcast_dim=False,
    )
    group_keys = [f"__a_{c}" for c in annotations.columns]
    seqs = build_sequences(
        j,
        keys=group_keys,
        ts=sensor_ts,
        features=list(measures),
        tiebreak=measures[0],
        max_len=max_len,
        pad_to=max_len,
    )
    out = seqs.filter(F.col("seq_len") >= min_count).select(
        *[F.col(f"__a_{c}").alias(c) for c in annotations.columns],
        "seq_len",
        "seq",
    )
    return out.withColumn(
        "label", (F.col(label_col) >= label_threshold).cast("double")
    )


def create_phenotypic_dataset(
    sensor: DataFrame,
    annotations: DataFrame,
    key: str,
    sensor_ts: str,
    annot_key: str,
    measures: Sequence[str],
    season_start: str,
    season_end: str,
    use_multiscale: bool = True,
) -> DataFrame:
    """Season-scoped per-key features (A8) + diurnal pattern range (A6)
    + weekly multiscale re-aggregation (A5), joined wide per key, then
    labels attached by equi-join (J4)."""
    season = sensor.filter(F.col(sensor_ts).between(season_start, season_end))
    base = stats_bundle(season, keys=[key], measures=list(measures))
    # A6: mean per hour-of-day, then range across the 24 hourly means.
    hourly = (
        season.groupBy(key, F.hour(sensor_ts).alias("__h"))
        .agg(*[F.avg(m).alias(f"__hm_{m}") for m in measures])
        .groupBy(key)
        .agg(
            *[
                (F.max(f"__hm_{m}") - F.min(f"__hm_{m}")).alias(f"{m}_diurnal_range")
                for m in measures
            ]
        )
    )
    out = base.join(hourly, key, "left")
    if use_multiscale:
        # A5: weekly bucket means, then std/range across bucket means.
        weekly = (
            season.groupBy(key, F.weekofyear(sensor_ts).alias("__w"))
            .agg(*[F.avg(m).alias(f"__wm_{m}") for m in measures])
            .groupBy(key)
            .agg(
                *[
                    e
                    for m in measures
                    for e in (
                        F.stddev_samp(f"__wm_{m}").alias(f"{m}_weekly_std"),
                        (F.max(f"__wm_{m}") - F.min(f"__wm_{m}")).alias(
                            f"{m}_weekly_range"
                        ),
                    )
                ]
            )
        )
        out = out.join(weekly, key, "left")
    ann = annotations.withColumnRenamed(annot_key, key)
    return out.join(ann, key, "inner")


def create_winter_dataset(
    sensor: DataFrame,
    annotations: DataFrame,
    key: str,
    sensor_ts: str,
    annot_key: str,
    measures: Sequence[str],
    prewinter_start: str,
    prewinter_end: str,
    survival_col: str,
) -> DataFrame:
    """Pre-winter window stats per key + boolean survival label
    (survived = mortality-cause column is null, loader.py:279)."""
    pre = sensor.filter(F.col(sensor_ts).between(prewinter_start, prewinter_end))
    feats = stats_bundle(pre, keys=[key], measures=list(measures))
    ann = annotations.withColumnRenamed(annot_key, key).withColumn(
        "label", F.col(survival_col).isNull().cast("double")
    )
    return feats.join(ann, key, "inner")


def create_datasets(
    features: DataFrame,
    group_col: str,
    weights: tuple[float, float, float] = (0.7, 0.15, 0.15),
    seed: int = 42,
) -> tuple[DataFrame, DataFrame, DataFrame, dict]:
    """Reference-shaped return: (train, val, test, info). Split is
    group-wise by ``group_col`` (M4 — no entity straddles splits);
    info carries the schema metadata the reference packed into its
    loaders' ``info`` dict."""
    tagged = with_split_column(features, group_col, weights, seed)
    splits = tuple(
        tagged.filter(F.col("split") == s).drop("split")
        for s in ("train", "val", "test")
    )
    numeric = {
        f.name
        for f in features.schema.fields
        if f.dataType.typeName() in ("double", "float", "long", "integer")
    }
    info = {
        "feature_columns": sorted(
            numeric - {group_col, "label", "target"}
        ),
        "group_col": group_col,
        "weights": weights,
        "seed": seed,
    }
    return (*splits, info)
