"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 "stateful accumulation" — the streaming analog of the
reference's MetricTracker running accumulation, metrics.py:157-236).

``running_user_stats`` keeps (count, sum, min, max) per user in the
state store and emits the updated totals each micro-batch. Aggregation
state is four scalars per key — no raw rows are retained — so the state
store size is O(distinct keys), the same bound a built-in streaming agg
has. GroupStateTimeout handles key expiry when a watermark-equivalent
eviction policy is wanted.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id bigint, n bigint, value_sum double, value_min double, value_max double"
STATE_SCHEMA = "n bigint, value_sum double, value_min double, value_max double"


def _update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
):
    n, s, lo, hi = (
        state.get if state.exists else (0, 0.0, float("inf"), float("-inf"))
    )
    for pdf in pdfs:
        v = pdf["value"].astype(float)
        n += len(v)
        s += float(v.sum())
        if len(v):
            lo = min(lo, float(v.min()))
            hi = max(hi, float(v.max()))
    state.update((n, s, lo, hi))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n": [n],
            "value_sum": [s],
            "value_min": [lo],
            "value_max": [hi],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running stats as a custom stateful operator. Input must
    be a streaming DataFrame with (user_id, value)."""
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
