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


# ---------------------------------------------------------------------------
# Streaming heavy hitters: SpaceSaving (Metwally et al. 2005) per group
# via applyInPandasWithState — the bounded-state streaming analog of the
# batch `text_heavy_hitters` query (which ranks exact counts). State per
# key is EXACTLY m counter triples (token, count, err) + one long,
# independent of stream length and vocabulary size — the property that
# makes per-language trending-token tracking viable on an unbounded
# crawl stream where an exact streaming agg's state grows with the
# vocabulary. Guarantees (tested): count >= true >= count - err, and
# every token with true frequency > n_seen/m is present in the summary.
# ---------------------------------------------------------------------------

HH_OUT_SCHEMA = (
    "lang string, token string, est_count bigint, err bigint, "
    "lower_bound bigint, n_seen bigint"
)
HH_STATE_SCHEMA = (
    "tokens array<string>, counts array<bigint>, errs array<bigint>, "
    "n_seen bigint"
)


def _spacesaving_update_fn(m: int):
    def update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            tokens, counts, errs, n_seen = state.get
            summ = {
                t: [int(c), int(e)] for t, c, e in zip(tokens, counts, errs)
            }
            n_seen = int(n_seen)
        else:
            summ, n_seen = {}, 0
        for pdf in pdfs:
            for tok in pdf["token"]:
                n_seen += 1
                if tok in summ:
                    summ[tok][0] += 1
                elif len(summ) < m:
                    summ[tok] = [1, 0]
                else:
                    # evict the min counter; the newcomer inherits its
                    # count as the overestimate bound (classic SS move)
                    evict = min(summ, key=lambda t: summ[t][0])
                    mn = summ.pop(evict)[0]
                    summ[tok] = [mn + 1, mn]
        items = sorted(summ.items(), key=lambda kv: (-kv[1][0], kv[0]))
        state.update((
            [t for t, _ in items],
            [c for _, (c, _) in items],
            [e for _, (_, e) in items],
            n_seen,
        ))
        yield pd.DataFrame(
            {
                "lang": key[0],
                "token": [t for t, _ in items],
                "est_count": [c for _, (c, _) in items],
                "err": [e for _, (_, e) in items],
                "lower_bound": [c - e for _, (c, e) in items],
                "n_seen": n_seen,
            }
        )

    return update


def streaming_heavy_hitters(tokens: DataFrame, m: int = 16) -> DataFrame:
    """Per-language streaming top-token summary with O(m) state. Input
    must be a streaming DataFrame with (lang, token) rows — explode
    upstream, map-side. Emits the full m-row summary per language each
    micro-batch (update mode)."""
    return tokens.select("lang", "token").groupBy("lang").applyInPandasWithState(
        _spacesaving_update_fn(m),
        outputStructType=HH_OUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
