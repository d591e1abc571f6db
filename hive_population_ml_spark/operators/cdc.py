"""Change-data-capture compaction: latest-wins per key, snapshot merge.

No reference citation exists (SURVEY.md §2.10 charter extension — the
incremental-ingest shape every production training-data pipeline needs:
crawl recrawls, label fixes, document re-scores arrive as change rows
that must compact to one current version per key).

Spark-first design: compaction is ``max_by(payload_struct,
version_struct)`` — a declarative aggregate with a map-side partial, so
the shuffle carries ONE candidate row per key per input partition, not
every version. The window-function formulation (`row_number() ... rn=1`)
would shuffle and sort every version of every key; at 100 TB of change
history with hot keys that is strictly worse. DuckDB oracles use the
window form precisely because it is an independent formulation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(names: Sequence[str]) -> list[Column]:
    return [F.col(n) for n in names]


def latest_by_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    payload: Sequence[str],
    n_versions_col: str | None = "n_versions",
) -> DataFrame:
    """Compact a change log to the latest version per key.

    ``order_by`` columns form the version vector (compared
    lexicographically, later = winner — include a unique id last for a
    deterministic total order). ``payload`` columns are carried from the
    winning row. Output: keys + payload + optional version count.

    One exchange, partial-aggregated: per-partition ``max_by`` keeps a
    single candidate per key before the shuffle — the reduce side sees
    |keys| rows per partition regardless of how many versions a hot key
    has (the skew profile of real CDC streams).
    """
    version = F.struct(*_cols(order_by))
    winner = F.max_by(F.struct(*_cols(payload)), version).alias("__w")
    aggs = [winner]
    if n_versions_col:
        aggs.append(F.count(F.lit(1)).alias(n_versions_col))
    out = df.groupBy(*_cols(keys)).agg(*aggs)
    cols = [*keys, *(f"__w.{p}" for p in payload)]
    if n_versions_col:
        cols.append(n_versions_col)
    return out.select(*cols)


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Apply a change batch onto a base snapshot, latest-wins
    (Delta/Iceberg MERGE semantics, expressed as union + compaction).

    Base rows rank below every change row (priority 0 vs 1, prepended to
    the version vector), so a change always overrides the snapshot; among
    change rows ``order_by`` decides. If ``delete_col`` names a boolean
    column on ``changes``, keys whose winning change row has it true are
    dropped from the result (tombstones).

    Scale shape: ONE shuffle of (base ∪ changes) via the same
    partial-aggregated ``max_by`` as latest_by_key — cheaper than the
    full-outer-join formulation, which shuffles both sides AND breaks
    partial aggregation. The output schema is the base schema (+ no
    tombstone column); re-writing it partitioned by the key hash makes
    the next merge's shuffle a no-op on the snapshot side (see
    skew.write_partitioned).
    """
    payload = [c for c in base.columns if c not in keys]
    ctypes = dict(changes.dtypes)
    # Base order fields are NULL: __pri=0 already ranks every base row
    # below every change row, and NULL struct fields compare lowest.
    b = base.select(
        *_cols(keys),
        F.lit(0).alias("__pri"),
        *[F.lit(None).cast(ctypes[o]).alias(f"__o_{o}") for o in order_by],
        F.lit(False).alias("__del"),
        *_cols(payload),
    )
    c = changes.select(
        *_cols(keys),
        F.lit(1).alias("__pri"),
        *[F.col(o).alias(f"__o_{o}") for o in order_by],
        (F.col(delete_col) if delete_col else F.lit(False)).alias("__del"),
        *_cols(payload),
    )
    version = ["__pri", *(f"__o_{o}" for o in order_by)]
    merged = latest_by_key(
        b.unionByName(c),
        keys=keys,
        order_by=version,
        payload=["__del", *payload],
        n_versions_col=None,
    )
    return merged.filter(~F.col("__del")).select(*keys, *payload)


def scd2_history(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    track: Sequence[str],
    tiebreak: Sequence[str] = (),
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a change
    log: one validity interval per run of unchanged ``track`` values per
    key — the dimension-versioning primitive (what was this document's
    quality label BETWEEN March and May?).

    Change points are rows whose tracked values differ (null-safe) from
    the key's previous row in (``ts_col``, ``tiebreak``) order;
    consecutive rows restating the same values collapse into the open
    interval. ``valid_to`` is the next change point's ``ts_col`` (NULL =
    still current, flagged in ``current_col``).

    Scale shape: one hash exchange on ``keys`` + one sort serves BOTH
    windows — the lag-based change-point filter and the lead-based
    interval close share the (partition, order) spec, so Catalyst reuses
    the exchange and the sort (the filter between them preserves both).
    State per key is one row (lag/lead), never the full history.
    """
    order = [F.col(ts_col), *_cols(tiebreak)]
    w = Window.partitionBy(*_cols(keys)).orderBy(*order)
    # First-row test must be unambiguous: lag(ts_col).isNull() would
    # conflate "no previous row" with "previous row has NULL ts" (a
    # NULL-ts row sorts first and would force a spurious change point
    # on the next row even with unchanged tracked values — ADVICE r6).
    changed = F.lag(F.lit(1)).over(w).isNull()
    for c in track:
        changed = changed | ~F.lag(F.col(c)).over(w).eqNullSafe(F.col(c))
    pts = df.withColumn("__chg", changed).filter(F.col("__chg")).drop("__chg")
    return pts.select(
        *keys,
        *track,
        F.col(ts_col).alias(valid_from),
        F.lead(F.col(ts_col)).over(w).alias(valid_to),
        F.lead(F.col(ts_col)).over(w).isNull().cast("int").alias(current_col),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff between two snapshots of a keyed table — the
    data-versioning primitive (what changed between yesterday's corpus
    build and today's): FULL OUTER join on ``keys``, rows classified
    ``added`` / ``removed`` / ``changed`` (any ``compare`` column
    differing, null-safe); unchanged rows are dropped.

    Output: keys + status + <col>_old/<col>_new per compare column.

    Scale shape: one co-partitioned shuffle per side (zero when both
    snapshots are written bucketed on the key — skew.bucketed_table);
    classification is map-side. ``compare`` defaults to all non-key
    columns shared by both frames.
    """
    if compare is None:
        compare = [
            c for c in old.columns if c not in keys and c in new.columns
        ]
    o = old.select(
        *_cols(keys),
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"{c}_old") for c in compare],
    )
    n = new.select(
        *_cols(keys),
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"{c}_new") for c in compare],
    )
    j = o.join(n, list(keys), "full_outer")
    changed = F.lit(False)
    for c in compare:
        changed = changed | ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status") != "unchanged")
        .select(
            *keys,
            "status",
            *[x for c in compare for x in (f"{c}_old", f"{c}_new")],
        )
    )
