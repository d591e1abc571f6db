"""Streaming state-pressure probe (VERDICT r9 #5): drive the three
driver-window streaming queries with a multiplied-KEY replay and record
state-store rows + memory + per-batch latency vs key count, straight
from the StreamingQueryProgress the engine emits.

What each scenario proves at 100 TB:
- session windows (`session_agg`): state rows track OPEN sessions
  (~distinct keys in complete-mode replay) — the probe shows rows/memory
  scaling linearly with keys and batch latency staying input-bound,
  i.e. no super-linear state blowup hiding in the merging-window store.
- CDC compaction (`cdc_upsert_stream`): foreachBatch latest-wins keeps
  NO state store at all — write cost is O(batch keys) per trigger; the
  probe records per-batch duration + compacted-log rows to show the log
  grows with keys, not with replay length.
- SpaceSaving heavy hitters (`streaming_heavy_hitters`): state is
  bounded by construction (m counters per language) — the probe feeds
  a replay whose DISTINCT-token count grows 100x and shows state rows
  and memory stay FLAT (the m-bound doing its job).

Replication is distinct-KEY (user_id/event_id shifted per replica;
document tokens suffixed per replica) so key cardinality — the state
dimension — is what multiplies.

Usage: python tools/streaming_state_probe.py [--mults 1,100]
       [--files 8] [--sf-dir /root/testdata/sf0.01]
Prints one JSON line:
  {"probe": "stream_state", "scenarios": {name: {mult: {...}}}}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from hive_population_ml_spark.streaming.pipeline import await_or_raise  # noqa: E402

KEY_SHIFT = 1_000_000_000


def build_events_dir(spark, sf_dir: str, mult: int, n_files: int) -> str:
    from hive_population_ml_spark.io.sources import load_table

    base = load_table(spark, sf_dir, "events")
    reps = [
        base.select(
            (F.col("event_id") + F.lit(k * KEY_SHIFT)).alias("event_id"),
            (F.col("user_id") + F.lit(k * KEY_SHIFT)).alias("user_id"),
            "event_type",
            "ts",
            "value",
        )
        for k in range(mult)
    ]
    df = reps[0]
    for r in reps[1:]:
        df = df.unionByName(r)
    out = tempfile.mkdtemp(prefix=f"sstate_ev{mult}_")
    df.repartition(n_files).write.mode("overwrite").parquet(out)
    return out


def build_docs_dir(spark, sf_dir: str, mult: int, n_files: int) -> str:
    """Documents with per-replica token suffix: 100 replicas -> 100x
    DISTINCT tokens (every token of replica k becomes token_k), same
    language set — exactly the growth SpaceSaving must stay flat under."""
    base = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    reps = [
        base.select(
            (F.col("doc_id") + F.lit(k * KEY_SHIFT)).alias("doc_id"),
            "lang",
            F.regexp_replace(
                F.col("text"), r"(\S+)", r"$1" + f"_{k}"
            ).alias("text"),
        )
        for k in range(mult)
    ]
    df = reps[0]
    for r in reps[1:]:
        df = df.unionByName(r)
    out = tempfile.mkdtemp(prefix=f"sstate_doc{mult}_")
    df.repartition(n_files).write.mode("overwrite").parquet(out)
    return out


def _progress_summary(q) -> dict:
    """Fold recentProgress into the numbers the table needs."""
    batches, state_rows, state_mem = 0, 0, 0
    dur = []
    for p in q.recentProgress:
        if p.get("numInputRows", 0) == 0 and not p.get("stateOperators"):
            continue
        batches += 1
        dur.append(p.get("durationMs", {}).get("triggerExecution", 0))
        for so in p.get("stateOperators", []) or []:
            state_rows = max(state_rows, so.get("numRowsTotal", 0))
            state_mem = max(state_mem, so.get("memoryUsedBytes", 0))
    return {
        "batches": batches,
        "max_state_rows": state_rows,
        "max_state_mb": round(state_mem / 1e6, 2),
        "batch_ms_med": sorted(dur)[len(dur) // 2] if dur else 0,
        "batch_ms_max": max(dur) if dur else 0,
    }


def _stream_events(spark, data_dir: str):
    schema = spark.read.parquet(data_dir).schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(data_dir)
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    )


def probe_session(spark, data_dir: str) -> dict:
    from hive_population_ml_spark.streaming.pipeline import session_agg

    name = "probe_sessions"
    q = (
        session_agg(_stream_events(spark, data_dir))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 600)
    out = _progress_summary(q)
    out["result_rows"] = spark.table(name).count()
    return out


def probe_cdc(spark, data_dir: str) -> dict:
    from hive_population_ml_spark.streaming.pipeline import (
        cdc_stream_state,
        cdc_upsert_stream,
    )

    log = tempfile.mkdtemp(prefix="sstate_cdclog_")
    ckpt = tempfile.mkdtemp(prefix="sstate_cdcckpt_")
    try:
        cdc_upsert_stream(
            _stream_events(spark, data_dir), log, ckpt, timeout_s=600
        )
        # the running query object is internal to cdc_upsert_stream;
        # read progress off the session's last active run is racy, so
        # measure the OUTPUT instead: compacted-log rows (O(keys x
        # batches)) and current-state rows (O(keys))
        log_rows = spark.read.parquet(log).count()
        state_rows = cdc_stream_state(spark, log).count()
        return {"log_rows": log_rows, "state_rows": state_rows}
    finally:
        shutil.rmtree(log, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def probe_heavy_hitters(spark, docs_dir: str, m: int = 16) -> dict:
    from hive_population_ml_spark.streaming.stateful import (
        streaming_heavy_hitters,
    )

    schema = spark.read.parquet(docs_dir).schema
    docs = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(docs_dir)
    )
    toks = docs.select("lang", F.explode(F.split("text", " ")).alias("token"))
    name = "probe_hh"
    q = (
        streaming_heavy_hitters(toks, m=m)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 600)
    out = _progress_summary(q)
    out["distinct_tokens"] = (
        spark.read.parquet(docs_dir)
        .select(F.explode(F.split("text", " ")).alias("t"))
        .distinct()
        .count()
    )
    return out


def probe_interval_join(spark, data_dir: str) -> dict:
    """Stream-stream interval join under key pressure (VERDICT r10 #6):
    clicks and purchases replay file-by-file as two independent
    streams through the SAME watermark+horizon join the driver-checked
    `stream_attribution_join` query runs; progress records the join
    state store's rows/bytes per batch. The claim under test: buffered
    state is bounded by (watermark + horizon) x per-key arrival — it
    scales with KEY cardinality (both sides buffer within the horizon)
    and never with total replay length, and per-batch latency stays
    input-bound."""
    from hive_population_ml_spark.streaming.pipeline import interval_join

    clicks = _stream_events(spark, data_dir).filter(
        F.col("event_type") == "click"
    )
    purchases = _stream_events(spark, data_dir).filter(
        F.col("event_type") == "purchase"
    )
    name = "probe_ij"
    q = (
        interval_join(
            clicks,
            purchases,
            key="user_id",
            horizon="30 minutes",
            watermark="2 days",
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 600)
    out = _progress_summary(q)
    out["result_rows"] = spark.table(name).count()
    return out


def probe_interval_join_outer(spark, data_dir: str) -> dict:
    """Left-outer variant (VERDICT r11 #7): the state-RELEASE path.
    Outer rows can only emit NULL-padded once the outcome watermark
    passes trigger_ts + horizon, so unmatched triggers are HELD in the
    state store until expiry — the row/byte numbers here measure that
    hold, and ``null_rows`` counts the watermark-released emissions.
    The claim: state stays linear in keys (same bound as inner), and
    the release path adds no super-linear latency."""
    from hive_population_ml_spark.streaming.pipeline import interval_join

    clicks = _stream_events(spark, data_dir).filter(
        F.col("event_type") == "click"
    )
    purchases = _stream_events(spark, data_dir).filter(
        F.col("event_type") == "purchase"
    )
    name = "probe_ij_outer"
    q = (
        interval_join(
            clicks,
            purchases,
            key="user_id",
            horizon="30 minutes",
            watermark="2 days",
            join_type="left_outer",
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, 600)
    out = _progress_summary(q)
    res = spark.table(name)
    out["result_rows"] = res.count()
    out["null_rows"] = res.filter(F.col("outcome_id").isNull()).count()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,100")
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--scenarios",
        default="sessions,cdc,heavy_hitters,interval_join,interval_join_outer",
        help="comma list of scenarios to run",
    )
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    scen_on = set(args.scenarios.split(","))

    from hive_population_ml_spark.session import get_spark

    spark = get_spark(app_name="streaming-state-probe")
    results: dict = {s: {} for s in
                     ("sessions", "cdc", "heavy_hitters", "interval_join",
                      "interval_join_outer")
                     if s in scen_on}
    for mult in mults:
        ev = build_events_dir(spark, args.sf_dir, mult, args.files)
        dc = (build_docs_dir(spark, args.sf_dir, mult, args.files)
              if "heavy_hitters" in scen_on else None)
        try:
            if "sessions" in scen_on:
                results["sessions"][mult] = probe_session(spark, ev)
            if "cdc" in scen_on:
                results["cdc"][mult] = probe_cdc(spark, ev)
            if "heavy_hitters" in scen_on:
                results["heavy_hitters"][mult] = probe_heavy_hitters(spark, dc)
            if "interval_join" in scen_on:
                results["interval_join"][mult] = probe_interval_join(spark, ev)
            if "interval_join_outer" in scen_on:
                results["interval_join_outer"][mult] = (
                    probe_interval_join_outer(spark, ev)
                )
        finally:
            shutil.rmtree(ev, ignore_errors=True)
            if dc:
                shutil.rmtree(dc, ignore_errors=True)
        for scen in results:
            if mult in results[scen]:
                print(f"## {scen} x{mult}: {results[scen][mult]}", flush=True)
    print(json.dumps({"probe": "stream_state", "scenarios": results}))


if __name__ == "__main__":
    main()
