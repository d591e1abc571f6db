"""Interval (range) join and as-of join — SURVEY.md §2.3 J1.

The reference aligns each dated annotation with sensor rows inside a
centered time window via an O(A×S) ``iterrows`` loop with a per-row
BETWEEN re-scan (``preprocessing.py:165-202``, ``dataset.py:197-261``).
Here the same semantics are a single declarative join:

    fact ⋈ dim ON fact.key = dim.key
              AND fact.ts BETWEEN dim.date - w AND dim.date + w

Physical strategy at scale:
- The equi-conjunct on the key makes this a hash join (broadcast when
  the dim side is small — annotations always are in the reference's
  workload); the range conjunct is evaluated as a join-condition
  filter on each key's bucket, so one scan of the fact table total.
- If BOTH sides are large with no usable equi-key selectivity, use
  ``bucketed=True``: each side is expanded to day-granularity time
  buckets and the join adds an equi-conjunct on the bucket, turning
  the range join into a co-partitioned shuffle join (the §4.3
  "time-bucketing rewrite"). Dim rows are duplicated into each bucket
  the window overlaps; the exact BETWEEN filter then prunes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def _interval(n: int, unit: str) -> Column:
    return F.expr(f"INTERVAL '{n}' {unit.upper()}")


def interval_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[tuple[str, str]],
    fact_ts: str = "ts",
    dim_ts: str = "date",
    before: int = 3,
    after: int = 3,
    unit: str = "day",
    how: str = "inner",
    broadcast_dim: bool = True,
    bucketed: bool = False,
) -> DataFrame:
    """Join fact rows to dim rows whose window contains ``fact_ts``.

    on: list of (fact_col, dim_col) equi-key pairs (may be empty for a
        pure range join — then strongly prefer ``bucketed=True`` or a
        broadcastable dim).
    Window is [dim_ts - before*unit, dim_ts + after*unit], inclusive
    on both ends — matching the reference's ``BETWEEN`` semantics
    (``preprocessing.py:93-94``).
    """
    # Window bounds are PRECOMPUTED as dim-side columns: inside the join
    # condition the two interval additions would re-execute per PROBED
    # pair (every same-key candidate, not every output row) — measured
    # ~2x on the flagship shape (3.0s -> 1.6s at sf0.1). As columns they
    # are evaluated once per dim row.
    f = fact.alias("f")
    d = (
        dim.withColumn("__lo", F.col(dim_ts) - _interval(before, unit))
        .withColumn("__hi", F.col(dim_ts) + _interval(after, unit))
        .alias("d")
    )
    cond = F.col(f"f.{fact_ts}").between(F.col("d.__lo"), F.col("d.__hi"))
    for fc, dc in on:
        cond = (F.col(f"f.{fc}") == F.col(f"d.{dc}")) & cond

    if bucketed:
        # Day-bucket both sides so Spark gets an equi-conjunct even when
        # no natural key exists; dim explodes into every bucket its
        # window can touch (window_days + 1 buckets).
        span = (before + after) * SECONDS[unit] // SECONDS["day"] + 1
        fb = f.withColumn("__bucket", F.expr(f"unix_timestamp(f.{fact_ts}) div 86400"))
        db = d.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.expr(f"unix_timestamp(d.{dim_ts} - INTERVAL '{before}' {unit.upper()}) div 86400"),
                    F.expr(f"unix_timestamp(d.{dim_ts} + INTERVAL '{after}' {unit.upper()}) div 86400"),
                )
            ),
        )
        joined = fb.join(db, (fb["__bucket"] == db["__bucket"]) & cond, how)
        return joined.drop("__bucket", "__lo", "__hi")

    if broadcast_dim:
        d = F.broadcast(d)
    return f.join(d, cond, how).drop("__lo", "__hi")


def as_of_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[tuple[str, str]],
    fact_ts: str = "ts",
    dim_ts: str = "date",
    max_lookback: int = 7,
    unit: str = "day",
    dim_id: str | None = None,
    tiebreak: list | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each dim row, the single nearest fact row within
    ``max_lookback`` of ``dim_ts`` — the "nearest reading to the
    annotation date" extension noted at SURVEY.md §2.3.
    ``direction="backward"`` (default) takes the most recent fact at
    or before the anchor; ``"forward"`` the first at or after it.

    Implemented as bounded range join + row_number()=1, so it stays a
    hash join + one windowed shuffle rather than a per-row scan; the
    tolerance bound caps per-anchor fan-in in both directions.
    """
    from pyspark.sql import Window

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    back = direction == "backward"
    joined = interval_join(
        fact,
        dim,
        on,
        fact_ts,
        dim_ts,
        before=max_lookback if back else 0,
        after=0 if back else max_lookback,
        unit=unit,
    )
    keys = [dim_id] if dim_id else [dc for _, dc in on] + [dim_ts]
    near = F.col(fact_ts).desc() if back else F.col(fact_ts).asc()
    order = [near, *(tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_intervals(
    iv: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Merge overlapping/touching [start, end] intervals per key into
    maximal ISLANDS (interval union) — the coverage primitive behind
    uptime/SLA math, sensor-gap analysis, and span-overlap accounting
    that plain GROUP BY cannot express. The reference's eager stack
    would sort each key's intervals in pandas; here one partitioned
    sort serves both window passes and the plan stays distributed.

    Classic gaps-and-islands rewrite: per key, order by start; an
    interval OPENS a new island iff its start exceeds the running max
    of all PRECEDING ends (strictly — touching intervals merge); the
    running sum of those open-flags numbers the islands, and a grouped
    agg yields per-island bounds and membership counts. Island
    boundaries depend only on the sorted starts vs the preceding-end
    running max, so equal-start tie order cannot change the result
    (s2 == s1 is never > a preceding end >= s1); ``tiebreak`` just
    pins a deterministic physical order for reproducible explains.

    Scale: ONE (key)-hash sort shuffle feeds both windows; the
    per-island agg's map-side partial combine collapses each island to
    a single row before its exchange. Skewed keys (one key = millions
    of intervals) serialize inside that key's partition — the same
    bound every per-key ordered operator in this engine carries.
    """
    from pyspark.sql import Window

    order = [start_col, end_col] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    island = F.sum("__opens").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        iv.withColumn("__opens", opens)
        .withColumn("island_id", island)
        .groupBy(key_col, "island_id")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count("*").alias("n_members"),
        )
    )
