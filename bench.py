#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Execution is forced with the noop sink (full computation, no driver
collect/serialization overhead in the measurement).

Each query is timed ``$SPARK_GRAFT_BENCH_RUNS`` times (default 2) and the
MINIMUM is reported: single runs on a shared box show up-to-4x outliers
from GC/scheduler contention (round-2 finding: same code measured 15.4s
then 3.99s back-to-back), and the minimum is the standard estimator for
the compute cost a dedicated cluster would see. The cache is cleared
between runs so operators that persist() internally are measured cold.

Load guard: pre-existing background load inflates every query uniformly
(round-4 finding: the driver recorded 11.1 s under load where idle re-runs
gave 9.5-10.2 s — a phantom 23% "regression"). The JSON therefore stamps
``load_1m`` (the 1-minute loadavg sampled BEFORE the Spark session starts)
and ``load_warning: true`` when load_1m/cpus exceeds 0.25, so a recorded
number taken on a busy box is self-identifying instead of silently
misleading round-over-round comparisons.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "agg_pricing_summary",
    "scan_filter_project",
    "join_equi_broadcast",
    "join_multiway_fact",
    "window_topk_per_group",
    "func_json",
    "cdc_lww_materialize",
    "cdc_sink_records",
    "dedup_minhash_lsh",  # training-data tier north star, perf-tracked
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # sample pre-existing load BEFORE Spark spins up its own threads
    try:
        load_1m = os.getloadavg()[0]
    except OSError:  # pragma: no cover - non-POSIX
        load_1m = -1.0
    ncpus = os.cpu_count() or 1
    load_warning = load_1m / ncpus > 0.25

    # box fingerprint BEFORE Spark exists (round-10 lesson: a silent VM
    # swap between rounds read as a +32% code regression until an A/B
    # re-run attributed it; the stamp makes the box delta visible in the
    # artifact itself — see tools/boxscore.py)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from boxscore import box_score

    box = box_score()

    from go_pq_cdc_kafka_spark.queries import REGISTRY
    from go_pq_cdc_kafka_spark.session import get_spark

    spark = get_spark(app_name="bench")
    timings: dict[str, float] = {}

    # warm the JVM/codegen once on the smallest query so q1 isn't charged
    # with session startup noise
    REGISTRY["sort_global_topk"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # warm the lineitem scan path too (footer decode + codegen for the
    # biggest table) with a one-column aggregate — NOT a full-width scan;
    # full-table warmups measurably hurt via GC pressure (round-1 finding),
    # but without this agg_pricing_summary absorbs first-scan cost.
    from go_pq_cdc_kafka_spark.catalog import load_table
    import pyspark.sql.functions as F

    load_table(spark, sf_dir, "lineitem").agg(F.sum("l_quantity")).write.format(
        "noop"
    ).mode("overwrite").save()

    # default 3: the shared box shows sustained multi-minute load spikes
    # (round-4 measurement: the same commit benched 9.9 s and 16.8 s an
    # hour apart); a third sample materially tightens the min-floor
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    all_runs: dict[str, list[float]] = {}

    def best_of(run, name: str) -> float:
        # every individual run is recorded in the JSON (`runs` key) so a
        # round-over-round diff can tell noise from regression; the min is
        # still the headline number (noise-floor estimator)
        times = []
        for _ in range(runs):
            spark.catalog.clearCache()  # persist()-ing operators run cold
            t0 = time.time()
            run()
            times.append(round(time.time() - t0, 3))
        all_runs[name] = times
        return min(times)

    for name in HEADLINE:
        timings[name] = best_of(
            lambda n=name: REGISTRY[n]
            .fn(spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            name,
        )

    # CDC end-to-end throughput at the same SF — directly comparable to the
    # reference's one published number (66.7k rows/s on 1 core, BASELINE.md):
    # full snapshot pipeline lineitem → envelope → handler transform →
    # routing → Kafka-shaped records, sunk to noop.
    from go_pq_cdc_kafka_spark.plans.routing import RoutingTable
    from go_pq_cdc_kafka_spark.sources.snapshot import snapshot_from_parquet
    from go_pq_cdc_kafka_spark.streaming.pipeline import CdcPipeline

    src = snapshot_from_parquet(spark, os.path.join(sf_dir, "lineitem.parquet"), "lineitem")
    pipe = CdcPipeline(
        source=src,
        routing=RoutingTable({"public.lineitem": "lineitem.cdc"}),
        pk_field="l_orderkey",
    )
    n_rows = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    cdc_wall = best_of(
        lambda: pipe.run_batch().write.format("noop").mode("overwrite").save(),
        "cdc_pipeline_snapshot",
    )
    cdc_rows_per_sec = round(n_rows / cdc_wall, 1)
    timings["cdc_pipeline_snapshot"] = cdc_wall

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cdc_rows_per_sec": cdc_rows_per_sec,
                "cdc_rows": n_rows,
                "runs_per_query": runs,
                "runs": all_runs,
                "load_1m": round(load_1m, 2),
                "load_warning": load_warning,
                **box,
                # provenance for scale steps: larger SFs are run with
                # SPARK_GRAFT_DRIVER_MEM sized to the data (the 8g default
                # is tuned for sf<=1 on this box)
                "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
