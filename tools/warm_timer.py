#!/usr/bin/env python
"""Steady-state per-query timing in ONE warm session (round-12 tooling).

The sweep/bench protocols charge each query with fresh-JVM JIT and
session noise; this tool runs a list of registry queries in one warm
session, N times each (cache cleared between runs — persisting operators
still measured cold), and reports construct-time and min/median execute
wall per query. Use it to find the true steady-state tail and to A/B a
change without fresh-JVM variance.

Usage::

    python tools/warm_timer.py [sf_dir] q1 q2 ...            # default 3 runs
    SPARK_GRAFT_WARM_RUNS=5 python tools/warm_timer.py sf_dir q1 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    runs = int(os.environ.get("SPARK_GRAFT_WARM_RUNS", "3"))

    from go_pq_cdc_kafka_spark.queries import REGISTRY
    from go_pq_cdc_kafka_spark.session import get_spark

    spark = get_spark(app_name="warm-timer")
    # warm codegen/scan paths once
    spark.sparkContext.setJobDescription("warmup")
    REGISTRY["sort_global_topk"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict] = {}
    for name in names:
        ts, cs = [], []
        for _ in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} construct")
            t0 = time.time()
            df = REGISTRY[name].fn(spark, sf_dir)
            c = time.time() - t0
            spark.sparkContext.setJobDescription(name)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t1, 3))
            cs.append(round(c, 3))
        srt = sorted(ts)
        out[name] = {
            "construct": min(cs),
            "exec_min": srt[0],
            "exec_med": srt[len(srt) // 2],
            "runs": ts,
        }
        print(
            f"{name}: construct {min(cs):.2f}s exec min {srt[0]:.2f}s "
            f"med {srt[len(srt)//2]:.2f}s runs {ts}",
            flush=True,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
