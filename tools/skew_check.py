#!/usr/bin/env python
"""Skew step verifier: on a `gen_sf.py --skew` fixture (8 hot keys/dim
holding ~20% of fact rows), EXECUTE the fact-fact-join queries and
inspect the FINAL adaptive plans for `skew=true` — proving AQE's
skew-join split actually fires on this engine's plans rather than being
assumed — and race the salted two-phase aggregation against the naive
one-shuffle groupBy on the hottest key.

Usage: python tools/skew_check.py /tmp/spark_graft_sf1skew [out.json]
Prints one JSON line: per-query {secs, skew_split_fired}, salted-vs-
naive timings, and the hot-key row share measured from the fixture.
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


def final_plan(df) -> str:
    """The POST-execution adaptive plan (isFinalPlan=true) — AQE rewrites
    (skew split, coalesce, SMJ→BHJ) only show here."""
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1skew"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    import pyspark.sql.functions as F

    from go_pq_cdc_kafka_spark import queries as Q
    from go_pq_cdc_kafka_spark.catalog import load_table
    from go_pq_cdc_kafka_spark.operators import skew as SK
    from go_pq_cdc_kafka_spark.session import get_spark

    spark = get_spark(app_name="skew-check")
    out: dict = {"sf_dir": sf_dir}

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
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        secs = round(time.time() - t0, 1)
        plan = final_plan(df)
        per_q[name] = {
            "secs": secs,
            "skew_split_fired": "skew=true" in plan,
            "final_plan_is_adaptive": "isFinalPlan=true" in plan,
        }
        print(f"{name}: {secs}s skew_split={'skew=true' in plan}", flush=True)
        spark.catalog.clearCache()
    out["fact_fact_joins"] = per_q

    # --- salted two-phase agg vs naive single-shuffle groupBy -------------
    # l_orderkey is the hot dimension: 8 keys hold ~20% of all rows.
    def run(df) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 1)

    li = load_table(spark, sf_dir, "lineitem")
    naive = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(27,6)")).alias("q"),
        F.count(F.lit(1)).alias("n"),
    )
    # AQE splits skewed SHUFFLE-JOIN partitions but not skewed AGGREGATION
    # groups — a hot group lands on one reducer; salting is the fix there.
    salted = SK.salted_agg(
        li,
        keys=["l_orderkey"],
        aggs={
            "q": ("sum", F.sum(F.col("l_quantity").cast("decimal(27,6)"))),
            "n": ("sum", F.count(F.lit(1))),
        },
        buckets=32,
        salt_on="l_quantity",
    )
    t_naive = run(naive)
    t_salted = run(salted)
    out["hot_agg"] = {
        "naive_one_shuffle_secs": t_naive,
        "salted_two_phase_secs": t_salted,
        "salted_wins": t_salted < t_naive,
    }
    print(f"agg naive={t_naive}s salted={t_salted}s", flush=True)

    line = json.dumps(out)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
