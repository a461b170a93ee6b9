"""Execute every registry query at a given scale-factor directory.

Scale-evidence harness (round 6): the oracle gate proves VALUES at
sf0.01; this proves EXECUTION at a scale step — every query is run to
completion (noop sink, nothing collected to the driver beyond the row
count Spark reports) with its wall time recorded, so silent thresholds
(mis-broadcasts, heap blowups, eager materialization) surface the way
the sf10 step caught the MinHash index broadcast and the triangle
localCheckpoint. Usage::

    SPARK_GRAFT_DRIVER_MEM=32g python tools/sweep_sf.py /tmp/spark_graft_sf10 [out.json]

Prints one status line per query and a JSON summary; exit code 1 if any
query failed. Known-quadratic exact variants can be skipped with
SPARK_GRAFT_SWEEP_SKIP (comma-separated names), recorded as "skipped"
with the reason rather than silently dropped.

SPARK_GRAFT_SWEEP_RESUME_LOG=<path to a previous run's log> carries
forward that run's ``ok`` lines: those queries are recorded with their
prior wall time and ``"resumed": true`` instead of re-executing, so an
interrupted sweep (or one interrupted to fix a failure it found) only
re-runs what it must. Failures are never carried forward.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    skip = {
        s for s in os.environ.get("SPARK_GRAFT_SWEEP_SKIP", "").split(",") if s
    }
    # SPARK_GRAFT_SWEEP_ONLY=a,b,c restricts the sweep to a named subset
    # (e.g. the top-N most expensive queries for a skew/regression step)
    only = {
        s for s in os.environ.get("SPARK_GRAFT_SWEEP_ONLY", "").split(",") if s
    }

    resumed: dict[str, float] = {}
    resume_log = os.environ.get("SPARK_GRAFT_SWEEP_RESUME_LOG")
    if resume_log and os.path.exists(resume_log):
        for line in open(resume_log):
            if line.startswith("ok   ") and ": " in line:
                name, wall = line[5:].rsplit(": ", 1)
                wall = wall.replace("(resumed)", "").strip().rstrip("s")
                try:
                    resumed[name.strip()] = float(wall)
                except ValueError:
                    pass

    # box fingerprint before the JVM exists (see tools/boxscore.py) — a
    # sweep artifact on a swapped VM self-identifies instead of reading
    # as a code regression (round-10 lesson)
    from boxscore import box_score

    box = box_score()

    from go_pq_cdc_kafka_spark.queries import REGISTRY
    from go_pq_cdc_kafka_spark.session import get_spark

    spark = get_spark(app_name="sweep_sf")
    results: dict[str, dict] = {}
    failed = []
    for name in sorted(REGISTRY):
        if only and name not in only:
            continue
        if name in skip:
            results[name] = {"status": "skipped"}
            print(f"skip {name}", flush=True)
            continue
        if name in resumed:
            results[name] = {
                "status": "ok", "sec": resumed[name], "resumed": True
            }
            print(f"ok   {name}: {resumed[name]}s (resumed)", flush=True)
            continue
        t0 = time.time()
        try:
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = round(time.time() - t0, 1)
            results[name] = {"status": "ok", "sec": wall}
            print(f"ok   {name}: {wall}s", flush=True)
        except Exception as e:  # noqa: BLE001 — record and continue
            wall = round(time.time() - t0, 1)
            results[name] = {
                "status": "fail",
                "sec": wall,
                "err": f"{type(e).__name__}: {str(e)[:300]}",
            }
            failed.append(name)
            print(f"FAIL {name}: {type(e).__name__} ({wall}s)", flush=True)
        spark.catalog.clearCache()
        # clearCache() empties the SQL cache only. localCheckpoint blocks
        # (the valved pair index, CC/BFS per-round edge state, branch-reuse
        # rollups) live as persistent RDDs OUTSIDE the cache manager and,
        # having truncated lineage, cannot be evicted-and-recomputed — the
        # sf100 sweep caught them starving a later query's sorter
        # ("Unable to acquire 65536 bytes of memory, got 0" in
        # join_multiway_fact after the graph family ran). Drop them and
        # the module-level index cache that references them, so every
        # sweep entry is measured cold against a clean block manager.
        # py4j exposes the Java map as a dict-like view — iterate directly
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist()
        from go_pq_cdc_kafka_spark import queries as _q
        _q._PAIR_INDEX_CACHE.clear()
        # Force the ContextCleaner's reference-queue sweep NOW: local-mode
        # shuffle files persist on disk until the driver JVM garbage-
        # collects the shuffle objects, and the default periodic GC
        # (spark.cleaner.periodicGC.interval = 30min) lets a 60-query
        # sweep accumulate ~50 GB of dead shuffle files between sweeps —
        # the round-11 attempt-1 frozen pass lost join_multiway_fact and
        # quality_near_dup_rate_by_source to exactly that ENOSPC (the
        # disk freed itself minutes later when the periodic GC fired).
        # One System.gc() per query bounds the accumulation at one
        # query's footprint for 1-3 s of GC pause per entry.
        spark.sparkContext._jvm.System.gc()
    # value-level invariant tier for iterative operators (round-11: the
    # institutionalized fix for the CC silent-wrong-labels episode — the
    # sweep proves execution, these prove VALUES at the same scale).
    # On by default for full sweeps; SPARK_GRAFT_SWEEP_INVARIANTS=0 skips
    # (e.g. a quick subset re-run), =1 forces them for subset sweeps too.
    inv_flag = os.environ.get("SPARK_GRAFT_SWEEP_INVARIANTS", "")
    run_invariants = inv_flag == "1" or (not only and inv_flag != "0")
    invariants: dict[str, dict] = {}
    if run_invariants:
        from go_pq_cdc_kafka_spark import queries as _q
        from invariant_check import CHECKS

        for iname, ifn in CHECKS.items():
            t0 = time.time()
            try:
                ires = ifn(spark, sf_dir)
            except Exception as e:  # noqa: BLE001
                ires = {
                    "status": "fail",
                    "err": f"{type(e).__name__}: {str(e)[:300]}",
                }
            ires["sec"] = round(time.time() - t0, 1)
            invariants[iname] = ires
            if ires["status"] != "ok":
                failed.append(f"invariant:{iname}")
            print(f"inv-{ires['status']:4} {iname}: {json.dumps(ires)}", flush=True)
            spark.catalog.clearCache()
            for jrdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                jrdd.unpersist()
            _q._PAIR_INDEX_CACHE.clear()

    n_resumed = sum(1 for r in results.values() if r.get("resumed"))
    # registry-freeze stamp: the artifact carries the registry size it ran
    # against, and a FULL sweep (no SPARK_GRAFT_SWEEP_ONLY subset) must
    # cover exactly that many names — "223/225 + 2 landed later" can no
    # longer hide; a subset sweep is machine-distinguishable via "subset".
    if not only:
        assert len(results) == len(REGISTRY), (
            f"full sweep covered {len(results)} of {len(REGISTRY)} registry "
            "queries — registry changed mid-sweep; freeze it and re-run"
        )
    summary = {
        "sf_dir": sf_dir,
        "registry_size": len(REGISTRY),
        "subset": sorted(only) if only else None,
        # single-pass provenance: passes=1 means every ok above was
        # EXECUTED by this one cold run; a merged/resumed artifact is
        # distinguishable by passes>1 + the per-query "resumed" flags
        "passes": 1 if n_resumed == 0 else 2,
        "resumed_count": n_resumed,
        "total": len(results),
        "ok": sum(1 for r in results.values() if r["status"] == "ok"),
        "failed": failed,
        "skipped": sorted(skip & set(results)),
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "shuffle_partitions": os.environ.get(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", ""
        ) or None,
        **box,
        "invariants": invariants or None,
        "wall_total_sec": round(
            sum(r.get("sec", 0.0) for r in results.values()), 1
        ),
        "queries": results,
    }
    line = json.dumps(summary)
    print(line, flush=True)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
