"""Round-12 optimization probe: isolated warm timings + plan capture.

Usage:
  python tools/opt_probe.py QUERY [QUERY...] [--runs N] [--sf DIR]
      [--plans OUTDIR] [--suffix TAG]

For each named query:
  - warms it once on sf0.001 (codegen/Arrow init),
  - times `--runs` noop-sink executions at the bench SF (interleaved
    across the query list, so slow machine drift hits all queries
    equally — the PERFORMANCE.md arbitration method),
  - prints min/median/max,
  - when --plans is given, writes `<plans>/<query>_<suffix>.txt` with
    `.explain("formatted")` output (the judge-checkable artifact).

Methodology matches bench.py (same session confs, same noop sink,
median of runs); numbers here are for before/after isolation, the
committed BENCH numbers still come from bench.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_population_ml_spark.queries import QUERIES, load_all
from hive_population_ml_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    load_all()
    unknown = [n for n in args.names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("opt-probe", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in args.names:
            df = QUERIES[name](spark, args.sf)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = os.path.join(args.plans, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"plan -> {path}")

    # warmup on sf0.001
    for name in args.names:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        QUERIES[name](spark, "/root/testdata/sf0.001").write.format(
            "noop").mode("overwrite").save()

    times: dict[str, list[float]] = {n: [] for n in args.names}
    for r in range(args.runs):
        for name in args.names:
            spark.sparkContext.setJobDescription(f"probe:{name}:run{r}")
            t0 = time.perf_counter()
            QUERIES[name](spark, args.sf).write.format("noop").mode(
                "overwrite").save()
            times[name].append(time.perf_counter() - t0)

    for name in args.names:
        ts = sorted(times[name])
        med = ts[len(ts) // 2] if len(ts) % 2 else (
            ts[len(ts) // 2 - 1] + ts[len(ts) // 2]) / 2
        print(
            f"{name}: med={med:.3f}s min={ts[0]:.3f} max={ts[-1]:.3f} "
            f"runs={[round(x, 3) for x in times[name]]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
