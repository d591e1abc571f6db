"""Determinism watch re-measurement (VERDICT r8 #7, standing policy):
for every watch-class query (distributed double sums whose outputs
round at 4-6 decimals — see PERFORMANCE.md "DETERMINISM"), compute
min |frac(x * 10^d) - 0.5| over every rounded output column at sf0.01
and sf0.1. A margin within ~1e3x of the 1e-12 relative float-merge
wobble means the query must be promoted to the quantized-moment form
(the a_spearman_trend path); margins > 1e6x the wobble hold the watch.

Usage: python tools/determinism_watch.py
Prints one JSON line: {"probe": "determinism_watch",
"margins": {query: {sf: min_margin}}}.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# watch-class queries and the decimal width their outputs round at
WATCH = {
    "a_trend_fit": 6,
    "a_seasonality_strength": 6,
    "a_autocorr_lag1": 6,
    "m16_regression_metrics": 6,
}


def main() -> None:
    from pyspark.sql import functions as _F

    from hive_population_ml_spark.queries import QUERIES, load_all
    from hive_population_ml_spark.session import get_spark

    load_all()
    spark = get_spark("determinism-watch", cpus=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    # The margin is a property of the UNROUNDED value: patch F.round to
    # identity while BUILDING the watch queries (they resolve F.round
    # at call time against the shared functions module), so the
    # collected outputs are the raw distributed sums.
    real_round = _F.round
    out: dict = {}
    try:
        _F.round = lambda col, scale=0: col
        for name, dec in WATCH.items():
            out[name] = {}
            for sf in ("0.01", "0.1"):
                df = QUERIES[name](spark, f"/root/testdata/sf{sf}").toPandas()
                margin = 1.0
                for col in df.columns:
                    vals = df[col]
                    if vals.dtype.kind != "f":
                        continue
                    for v in vals.dropna():
                        # distance of the unrounded value from the
                        # nearest round(., dec) half-boundary — what
                        # the merge-order wobble must cross to flip
                        # the rounded output
                        scaled = abs(v) * (10 ** dec)
                        frac = scaled - int(scaled)
                        m = abs(frac - 0.5)
                        margin = min(margin, m)
                out[name][sf] = float(f"{margin:.3e}")
    finally:
        _F.round = real_round
    print(json.dumps({"probe": "determinism_watch", "margins": out}))
    spark.stop()


if __name__ == "__main__":
    main()
