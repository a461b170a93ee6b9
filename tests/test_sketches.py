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


def test_histogram_sketch_merge_identity_and_quantiles(spark):
    """Histogram tier: merging cell sketches equals sketching undivided
    data (counts add exactly), bins clamp into [0, nbins), and quantile
    edges follow the integer cum*100 >= p*total rule."""
    rows = [("a", 50), ("a", 150), ("a", 250), ("b", 250), ("b", 99999)]
    df = spark.createDataFrame(rows, "g string, cents long")
    cells = SKCH.histogram_cell_sketches(
        df, ["g"], F.col("cents"), width_cents=100, nbins=10
    )
    got = {(r.g, r.bin): r.n for r in cells.collect()}
    # 99999 // 100 = 999 clamps into the last bin (9)
    assert got == {("a", 0): 1, ("a", 1): 1, ("a", 2): 1, ("b", 2): 1, ("b", 9): 1}

    merged = SKCH.histogram_rollup(cells, [])
    direct = SKCH.histogram_cell_sketches(
        df, [], F.col("cents"), width_cents=100, nbins=10
    )
    assert {(r.bin, r.n) for r in merged.collect()} == {
        (r.bin, r.n) for r in direct.collect()
    }

    q = SKCH.histogram_quantiles(
        merged.withColumn("g", F.lit("ALL")), ["g"], 100, pcts=(50, 100)
    ).collect()[0]
    # cum over bins 0,1,2,9 = 1,2,4,5 of 5: p50 needs cum*100 >= 250 -> the
    # first qualifying bin is 2 (cum 4); p100 -> bin 9
    assert q.p50_edge_cents == 200
    assert q.p100_edge_cents == 900
    assert q.n_rows == 5


def test_countmin_merge_identity_and_overestimate_property(spark):
    """CM tier: merged cell sketches equal the sketch of undivided data
    (counts add exactly), and every point estimate >= the true count —
    with equality for keys that dodge collisions on at least one row."""
    rows = [("a", i % 5) for i in range(50)] + [("b", 99)] * 7
    df = spark.createDataFrame(rows, "g string, k long")
    cells = SKCH.countmin_cell_sketches(df, ["g"], "k", d=4, w=64)
    merged = SKCH.countmin_rollup(cells, [])
    direct = SKCH.countmin_cell_sketches(df, [], "k", d=4, w=64)
    assert {(r.row, r.bucket, r.n) for r in merged.collect()} == {
        (r.row, r.bucket, r.n) for r in direct.collect()
    }

    cands = df.select("k").distinct()
    est = {r.k: r.cm_estimate for r in
           SKCH.countmin_estimate(merged, cands, "k", d=4, w=64).collect()}
    truth = {r.k: r.cnt for r in
             df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert set(est) == set(truth)
    assert all(est[k] >= truth[k] for k in truth)
    # 6 distinct keys in 64 buckets: at least one key must estimate exactly
    assert any(est[k] == truth[k] for k in truth)

    # an unseen key estimates 0 unless it collides everywhere
    ghost = spark.createDataFrame([(123456789,)], "k long")
    g = SKCH.countmin_estimate(merged, ghost, "k", d=4, w=64).collect()[0]
    assert g.cm_estimate >= 0
