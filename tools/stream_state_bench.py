#!/usr/bin/env python
"""Streaming STATE at scale: drive ≥10M events through the stateful
stream operators on the RocksDB state store and record state-store size
and per-batch wall — the evidence that the stream tier's state design
(not just its throughput) survives 100× volumes.

Two operators, chosen for opposite state laws:

- ``dedup_stream_within_watermark`` — state bounded by the EVENT-TIME
  horizon, not key cardinality: with a 10-minute watermark over a 10M-key
  stream, RocksDB must hold only the keys inside the horizon and evict
  the rest (the property that keeps state finite on an unbounded 100 TB
  keyspace). The harness asserts eviction actually happens: max
  numRowsTotal must stay well below the distinct-key count.
- ``lww_stateful`` — state is one row per LIVE key (the materialized-view
  law): numRowsTotal must converge to exactly the distinct pk count,
  through an Arrow-batched applyInPandasWithState with RocksDB backing.
- ``lww_tws`` — the same materialization on the Spark 4
  ``transformWithState`` API (typed ValueState over the state-server
  protocol), measured side by side so SCALE.md can state which variant
  is the recommended bulk path at which rate.
- ``session_agg`` — engine-native session windows (gaps-and-islands):
  state is the OPEN sessions inside the watermark horizon; closed
  sessions emit once (append mode) and their state evicts. The harness
  asserts both laws: emitted sessions land in the exact expected band
  and state stays at ~one wave of keys, never the full session count.

Usage: python tools/stream_state_bench.py [N_EVENTS] [N_KEYS] [ops]
Defaults: 10M events over 2M keys (5 versions/key for LWW; ~20% replay
duplicates for dedup); ops = comma list to run a subset, e.g.
``dedup,lww,lww_tws,session``. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def _harvest(q, batches: dict) -> None:
    for p in q.recentProgress:
        d = p if isinstance(p, dict) else json.loads(p.json)
        bid = d.get("batchId")
        if bid is None or not int(d.get("numInputRows") or 0):
            continue
        ops = []
        for so in d.get("stateOperators") or []:
            cm = so.get("customMetrics") or {}
            ops.append({
                "rows_total": so.get("numRowsTotal"),
                "rows_updated": so.get("numRowsUpdated"),
                "memory_bytes": so.get("memoryUsedBytes"),
                "sst_bytes": cm.get("rocksdbTotalSSTFilesBytes"),
            })
        batches[int(bid)] = {
            "rows": int(d["numInputRows"]),
            "out_rows": int((d.get("sink") or {}).get("numOutputRows") or 0),
            "trigger_secs": round(
                int((d.get("durationMs") or {}).get("triggerExecution", 0))
                / 1000, 3,
            ),
            "state": ops,
        }


def _stats(batches: dict, n_input: int) -> dict:
    walls = sorted(b["trigger_secs"] for b in batches.values())
    rows_total = [
        s["rows_total"] for b in batches.values() for s in b["state"]
        if s["rows_total"] is not None
    ]
    sst = [
        s["sst_bytes"] for b in batches.values() for s in b["state"]
        if s["sst_bytes"]
    ]
    mem = [
        s["memory_bytes"] for b in batches.values() for s in b["state"]
        if s["memory_bytes"]
    ]
    total_wall = sum(walls)
    return {
        "batches": len(batches),
        "out_rows": sum(b.get("out_rows", 0) for b in batches.values()),
        "rows": n_input,
        "total_trigger_secs": round(total_wall, 1),
        "rows_per_sec": round(n_input / max(total_wall, 1e-9), 1),
        "trigger_secs_p50": walls[len(walls) // 2] if walls else 0,
        "trigger_secs_max": walls[-1] if walls else 0,
        "state_rows_max": max(rows_total, default=0),
        "state_rows_final": rows_total[-1] if rows_total else 0,
        "rocksdb_sst_bytes_max": max(sst, default=0),
        "state_memory_bytes_max": max(mem, default=0),
    }


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    ops = set(
        (sys.argv[3] if len(sys.argv) > 3 else "dedup,lww,lww_tws,session")
        .split(",")
    )

    import pyspark.sql.functions as F

    from go_pq_cdc_kafka_spark.session import get_spark
    from go_pq_cdc_kafka_spark.streaming import windows as W

    spark = get_spark(app_name="stream-state-bench")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    # shuffle width = state-store instance count per stateful op; 32 is
    # this box's core count (a cluster would size it to total cores)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    work = tempfile.mkdtemp(prefix="state_bench_")
    out: dict = {"n_events": n_events, "n_keys": n_keys, "store": "rocksdb"}

    # --- fixture: each logical event emitted TWICE (50% replay dups);
    # version waves 20 event-minutes apart so a 10-minute watermark must
    # EVICT the previous wave's keys. Written as sequential appends so
    # file mtimes (FileStreamSource's processing order) follow event time
    # — the stream sees time advance the way a live CDC feed delivers it.
    src = os.path.join(work, "events")
    n_pairs = n_events // 2
    chunk = max(250_000, n_events // 20)
    for lo in range(0, n_events, chunk):
        pair = (F.col("id") / 2).cast("long")
        ver = (pair / n_keys).cast("long")
        (
            spark.range(lo, min(lo + chunk, n_events))
            .select(
                (pair % n_keys).alias("k"),
                F.col("id").alias("seq"),
                F.timestamp_seconds(
                    F.lit(1_700_000_000) + ver * 1200 + (pair % 600)
                ).alias("ts"),
                ver.alias("version"),
            )
            .coalesce(2)
            .write.mode("append")
            .parquet(src)
        )
    schema = spark.read.parquet(src).schema

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 4)
            .parquet(src)
        )

    # --- op 1: watermark-bounded streaming dedup -------------------------
    # every (k, version) arrives exactly twice within the horizon (replay
    # duplicate suppressed); across versions the key legitimately recurs
    # after the horizon passed and must be emitted again
    dd = None
    if "dedup" in ops:
        t0 = time.time()
        batches: dict = {}
        q = (
            W.dedup_stream_within_watermark(
                stream(), keys=["k", "version"], ts_col="ts",
                watermark="10 minutes",
            )
            .writeStream.format("noop")
            .option("checkpointLocation", os.path.join(work, "ck_dedup"))
            .start()
        )
        q.processAllAvailable()
        _harvest(q, batches)
        q.stop()
        dd = _stats(batches, n_events)
        dd["wall_secs"] = round(time.time() - t0, 1)
        out["dedup_within_watermark"] = dd

    # --- ops 2+3: LWW materialization, both stateful APIs ----------------
    def changelog():
        return (
            stream()
            .select(
                F.lit("events").alias("table_name"),
                F.when(F.col("version") == 0, F.lit("INSERT"))
                .otherwise(F.lit("UPDATE")).alias("op"),
                F.col("seq").alias("lsn"),
                F.struct(
                    F.col("k").cast("string").alias("id"),
                    F.col("version").alias("val"),
                ).alias("after"),
                F.lit(None).cast(
                    "struct<id:string,val:long>"
                ).alias("before"),
            )
        )

    def run_lww(tag: str, op_fn) -> dict:
        t0 = time.time()
        b: dict = {}
        q = (
            op_fn(changelog(), pk_field="id")
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", os.path.join(work, f"ck_{tag}"))
            .start()
        )
        q.processAllAvailable()
        _harvest(q, b)
        q.stop()
        st = _stats(b, n_events)
        st["wall_secs"] = round(time.time() - t0, 1)
        return st

    lw = tws = None
    if "lww" in ops:
        lw = run_lww("lww", W.lww_stateful)
        out["lww_stateful"] = lw
    if "lww_tws" in ops and W.tws_available():
        tws = run_lww("lww_tws", W.lww_tws)
        out["lww_tws"] = tws

    # --- op 4: session windows (engine-native gaps-and-islands) ----------
    # each (k, version) contributes ONE session (its two replay events
    # share a timestamp); waves sit 1200 s apart >> the 5-minute gap, so
    # session count == n_pairs, but STATE holds only the open wave —
    # closed sessions emit once (append) and evict. The last wave never
    # closes (nothing advances the watermark past it), hence the band.
    se = None
    if "session" in ops:
        t0 = time.time()
        batches = {}
        q = (
            W.session_agg(
                stream(), ts_col="ts", gap="5 minutes", keys=("k",),
                value_col="version", watermark="10 minutes",
            )
            .writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(work, "ck_sess"))
            .start()
        )
        q.processAllAvailable()
        _harvest(q, batches)
        q.stop()
        se = _stats(batches, n_events)
        se["wall_secs"] = round(time.time() - t0, 1)
        out["session_agg"] = se

    # --- contracts --------------------------------------------------------
    # dedup state must be horizon-bounded: far below the total distinct
    # (k, version) pairs — at most ~one wave (n_keys) stays live
    out["n_distinct_pairs"] = n_pairs
    if dd is not None:
        out["dedup_state_bounded"] = bool(
            dd["state_rows_max"] < 0.5 * n_pairs
        )
    # LWW state must converge to exactly one row per live pk — both APIs
    if lw is not None:
        out["lww_state_exact"] = bool(lw["state_rows_final"] == n_keys)
    if tws is not None:
        out["lww_tws_state_exact"] = bool(tws["state_rows_final"] == n_keys)
    if se is not None:
        waves = n_pairs // n_keys
        # all waves except the open last one MUST have emitted exactly
        # once; state never exceeds ~2 waves of open sessions
        out["session_emitted_band"] = [n_pairs - n_keys, n_pairs]
        out["session_emitted_ok"] = bool(
            n_pairs - n_keys <= se["out_rows"] <= n_pairs
        )
        out["session_state_bounded"] = bool(
            waves <= 1 or se["state_rows_max"] < 0.5 * n_pairs
        )

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
