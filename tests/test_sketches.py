"""Mergeable HLL sketch operators: estimate accuracy vs exact distinct
counts, and the union/merge identity that makes per-cell materialization
sound (no oracle exists — DuckDB has no DataSketches implementation)."""

import pyspark.sql.functions as F

from go_pq_cdc_kafka_spark.catalog import load_table
from go_pq_cdc_kafka_spark.operators import sketches as SKCH

SF = "/root/testdata/sf0.01"


def test_hll_rollup_estimates_within_tolerance(spark):
    ev = load_table(spark, SF, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    cells = SKCH.hll_cell_sketches(ev, ["day", "event_type"], "user_id")
    approx = {
        r.event_type: r.approx_distinct
        for r in SKCH.hll_rollup(cells, ["event_type"]).collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.05 * n), (k, approx[k], n)


def test_hll_merge_identity(spark):
    """Estimating the union of per-day sketches equals sketching the
    undivided data — the property that makes append-only materialization
    correct (not just approximately so: same sketch state either way)."""
    ev = load_table(spark, SF, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    cells = SKCH.hll_cell_sketches(ev, ["day", "event_type"], "user_id")
    merged = {
        r.event_type: r.approx_distinct
        for r in SKCH.hll_rollup(cells, ["event_type"]).collect()
    }
    direct = {
        r.event_type: r.approx_distinct
        for r in SKCH.hll_rollup(
            SKCH.hll_cell_sketches(ev, ["event_type"], "user_id"),
            ["event_type"],
        ).collect()
    }
    assert merged == direct
