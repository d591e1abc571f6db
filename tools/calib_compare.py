"""Mechanical round-over-round bench comparison, calibration-normalized
(VERDICT r11 #2 follow-through: make the r8/r10/r11-style drift
arbitration a one-command check instead of a judged diagnosis cycle).

Reads two BENCH_r{N}.json files, computes the pinned-kernel drift
ratios from their `calib` fields, and classifies every common query:

  ratio <= spark_1p drift x slack  -> "machine" (moved with the host)
  ratio  > that                    -> "investigate" (candidate code
                                      regression: arbitrate with warm
                                      interleaved runs, see
                                      PERFORMANCE.md round-12 method
                                      note, before believing it)

A BENCH file without `calib` (rounds before 11) falls back to raw
ratios with a warning. Exit code 0 always — this is a report, not a
gate; the per-query medians already carry `spread` on their own line.

Usage: python tools/calib_compare.py BENCH_r11.json BENCH_r12.json
       [--slack 1.25] [--top 15]
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> tuple[dict, dict]:
    with open(path) as fh:
        d = json.load(fh)
    parsed = d.get("parsed") or {}
    return parsed.get("queries") or {}, parsed.get("calib") or {}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--slack", type=float, default=1.25,
                    help="tolerance multiplier on the kernel drift")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    q_old, c_old = load(args.old)
    q_new, c_new = load(args.new)
    drift = {}
    for k in ("numpy_sort_sec", "spark_1p_sec"):
        if c_old.get(k) and c_new.get(k):
            drift[k] = round(c_new[k] / c_old[k], 3)
    if drift:
        budget = max(drift.values()) * args.slack
        print(f"kernel drift new/old: {drift} -> query-ratio budget "
              f"{budget:.2f} (max drift x slack {args.slack})")
    else:
        budget = args.slack
        print("WARNING: no calib field on one side (pre-r11 file?); "
              f"using raw budget {budget}")

    common = sorted(set(q_old) & set(q_new))
    rows = []
    for name in common:
        if not q_old[name]:
            continue
        ratio = q_new[name] / q_old[name]
        rows.append((ratio, name))
    rows.sort(reverse=True)
    flagged = [(r, n) for r, n in rows if r > budget]
    print(f"{len(common)} common queries; {len(flagged)} above budget")
    for ratio, name in rows[: args.top]:
        tag = "INVESTIGATE" if ratio > budget else "machine"
        print(f"  {ratio:5.2f}x  {name:35s} "
              f"{q_old[name]:7.3f}s -> {q_new[name]:7.3f}s  [{tag}]")
    print(json.dumps({
        "drift": drift,
        "budget": round(budget, 3),
        "n_common": len(common),
        "investigate": [n for _, n in flagged],
    }))


if __name__ == "__main__":
    main()
