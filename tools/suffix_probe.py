"""Exact-suffix-tier scale probe (VERDICT r10 #3 / #7): run the suffix
operators DIRECTLY on the full documents corpus (the registered
queries are doc-capped by design), with scale_probe's distinct-content
replication.

Scenarios:
  lrs   — longest_repeated_span at --mults (r10: 49.5 s @1x,
          1269 s @10x = 25.6x growth; round 11 adds seeded initial
          ranks + two-level doc offsets, this re-measures)
  spans — duplicated_spans (fixed L=16) at --mults (r10 had 1x/10x/
          100x rows; VERDICT #7 asks for the 1000x decade)

Usage: python tools/suffix_probe.py --scenario lrs --mults 1,10
Prints one JSON line per scenario.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", choices=["lrs", "spans"], required=True)
    ap.add_argument("--mults", default="1,10")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    from scale_probe import replicate_dir

    from hive_population_ml_spark.operators.suffixes import (
        duplicated_spans,
        longest_repeated_span,
    )
    from hive_population_ml_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("suffix-probe", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def run_once(sf_dir: str) -> dict:
        docs = spark.read.parquet(
            f"{sf_dir.rstrip('/')}/documents.parquet"
        ).select("doc_id", "text")
        t0 = time.time()
        if args.scenario == "lrs":
            rows = longest_repeated_span(
                docs, "doc_id", "text", top_k=5
            ).collect()
            extra = {"best_len": rows[0]["length"] if rows else 0}
        else:
            n = (
                duplicated_spans(docs, "doc_id", "text", min_len=16,
                                 min_count=3)
                .agg(F.count("*").alias("n"), F.sum("n_occurrences"))
                .collect()[0]
            )
            extra = {"n_spans": n[0]}
        return {"sec": round(time.time() - t0, 1), **extra}

    out: dict = {"probe": f"suffix_{args.scenario}", "mults": {}}
    for m in mults:
        if m == 1:
            out["mults"]["1"] = run_once(args.sf_dir)
        else:
            big = replicate_dir(spark, args.sf_dir, m, only={"documents"})
            try:
                out["mults"][str(m)] = run_once(big)
            finally:
                shutil.rmtree(big, ignore_errors=True)
        print(f"## x{m}: {out['mults'][str(m)]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
