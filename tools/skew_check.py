#!/usr/bin/env python
"""Skew step verifier: on a `gen_sf.py --skew` fixture (8 hot keys/dim
holding ~20% of fact rows), EXECUTE the fact-fact-join queries and
inspect the FINAL adaptive plans for `skew=true` — proving AQE's
skew-join split actually fires on this engine's plans rather than being
assumed — and race the salted two-phase aggregation against the naive
one-shuffle groupBy on the hottest key.

Usage: python tools/skew_check.py <sf_dir> [out.json] [shuffle_partitions]
Prints one JSON line: per-query {secs, skew_split_fired}, salted-vs-
naive timings, and the hot-key row share measured from the fixture.

shuffle_partitions defaults to 256 — CLUSTER-width geometry, which is
the whole point: with 32 local partitions a hot key holding 2.5% of rows
is barely 2x the median partition and AQE's 5x-median rule correctly
stays quiet; at 256+ partitions (any real cluster) the same key is
8-10x the median and the skew machinery must engage. Skew behavior is a
function of partition-count geometry, not just data volume.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACT_FACT_QUERIES = [
    "join_multiway_fact",
    "join_anti",
    "composite_sole_late_suppliers",
]


def run_and_final_plan(df) -> tuple[float, str]:
    """Execute the DataFrame's OWN query execution and return (secs,
    post-execution adaptive plan). A `.write` action wraps the plan in a
    separate command execution, leaving df's executedPlan unexecuted
    (isFinalPlan=false) — so drive the AdaptiveSparkPlanExec directly with
    a JVM-side RDD count (no rows cross to Python) and read the final
    plan, where AQE's rewrites (skew=true splits, SMJ→BHJ) are visible."""
    jqe = df._jdf.queryExecution()
    t0 = time.time()
    jqe.executedPlan().execute().count()
    secs = round(time.time() - t0, 1)
    return secs, jqe.executedPlan().toString()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1skew"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    shuffle_parts = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    import pyspark.sql.functions as F

    from go_pq_cdc_kafka_spark import queries as Q
    from go_pq_cdc_kafka_spark.catalog import load_table
    from go_pq_cdc_kafka_spark.operators import skew as SK
    from go_pq_cdc_kafka_spark.session import get_spark

    spark = get_spark(app_name="skew-check", shuffle_partitions=shuffle_parts)
    out_geometry = {"shuffle_partitions": shuffle_parts}
    # Fixture-scaled AQE skew thresholds: the defaults (256 MB skewed-
    # partition floor / 64 MB advisory target) are sized for production
    # shuffles; a 1-2 GB fixture never crosses them even with 8 hot keys
    # holding 20% of rows. Scaling both down by ~16x makes the 5x-median
    # rule the binding constraint — the same geometry a 100 TB shuffle
    # hits with the defaults. (A real cluster keeps the defaults.)
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    out: dict = {"sf_dir": sf_dir, **out_geometry}

    # measured hot-key share (the fixture's contract, from the data itself)
    li = load_table(spark, sf_dir, "lineitem")
    total = li.count()
    top8 = (
        li.groupBy("l_orderkey").count()
        .orderBy(F.desc("count")).limit(8)
        .agg(F.sum("count").alias("s")).first()["s"]
    )
    out["lineitem_rows"] = total
    out["hot8_orderkey_share"] = round(top8 / total, 3)

    # --- fact-fact joins: does the AQE skew split fire? -------------------
    per_q = {}
    for name in FACT_FACT_QUERIES:
        df = Q.REGISTRY[name].fn(spark, sf_dir)
        secs, plan = run_and_final_plan(df)
        per_q[name] = {
            "secs": secs,
            "skew_split_fired": "skew=true" in plan,
            "final_plan_is_adaptive": "isFinalPlan=true" in plan,
        }
        print(f"{name}: {secs}s skew_split={'skew=true' in plan}", flush=True)
        spark.catalog.clearCache()
    out["fact_fact_joins"] = per_q

    # --- salted two-phase agg vs naive groupBy on a HOLISTIC aggregate ----
    # For algebraic aggs (sum/count) map-side partial aggregation already
    # neutralizes group skew — the interesting case is holistic aggs
    # (collect_list and friends), where the hot key's ENTIRE value set
    # must cross the shuffle to one reducer. l_orderkey: 8 hot keys hold
    # ~20% of all rows, so the naive plan funnels ~2.5% of the corpus
    # into a single reducer task; the salted plan fans it over 32.
    li = load_table(spark, sf_dir, "lineitem")
    naive = li.groupBy("l_orderkey").agg(
        F.size(F.collect_list("l_extendedprice")).alias("n_items")
    )
    salted = SK.salted_agg(
        li,
        keys=["l_orderkey"],
        aggs={"n_items": ("sum", F.size(F.collect_list("l_extendedprice")))},
        buckets=32,
        salt_on="l_quantity",
    )
    t_naive, _ = run_and_final_plan(naive)
    t_salted, _ = run_and_final_plan(salted)
    out["hot_holistic_agg"] = {
        "naive_one_reducer_secs": t_naive,
        "salted_two_phase_secs": t_salted,
        "salted_wins": t_salted < t_naive,
    }
    print(f"holistic agg naive={t_naive}s salted={t_salted}s", flush=True)

    line = json.dumps(out)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
