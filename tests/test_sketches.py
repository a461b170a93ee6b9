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


def test_kmv_merge_identity_and_exact_below_k(spark):
    """Bottom-k sketches are EXACTLY mergeable: re-taking the k smallest of
    a union of bottom-k sketches equals sketching the union directly. And a
    cell with fewer than k distinct items estimates its exact count."""
    rows = [("a", i) for i in range(500)] + [("b", i) for i in range(400, 430)]
    df = spark.createDataFrame(rows, "cell string, v long")

    cells = SKCH.kmv_cell_sketches(df, ["cell"], "v", k=32)
    merged = SKCH.kmv_rollup(
        cells.withColumn("cell", F.lit("ALL")), ["cell"], k=32
    )
    direct = SKCH.kmv_cell_sketches(
        df.withColumn("cell", F.lit("ALL")), ["cell"], "v", k=32
    )
    assert merged.collect()[0].sketch == direct.collect()[0].sketch

    est = {r.cell: r for r in SKCH.kmv_estimate(cells, k=32).collect()}
    # cell b has 30 < k distinct values: exact
    assert est["b"].n_sample == 30
    assert est["b"].est_distinct == 30.0
    # cell a has 500 distinct: KMV estimate within a generous error band
    # (k=32 -> RSE ~ 1/sqrt(30) ~ 18%)
    assert 250 <= est["a"].est_distinct <= 1000
    # the sample median of a uniform 0..499 population lands mid-range
    assert 100 <= est["a"].sample_median <= 400


def test_kmv_sample_is_distinct_value_uniform_not_frequency_weighted(spark):
    """A value repeated a million-to-one must not dominate the sample: KMV
    samples the DISTINCT value set (hash order), not row frequency."""
    rows = [("a", 7)] * 1000 + [("a", i) for i in range(100, 140)]
    df = spark.createDataFrame(rows, "cell string, v long")
    sk = SKCH.kmv_cell_sketches(df, ["cell"], "v", k=16).collect()[0].sketch
    assert sum(1 for e in sk if e.v == 7) <= 1
    assert len(sk) == 16


def test_label_centroids_hand_computed(spark):
    from go_pq_cdc_kafka_spark.operators import similarity as SIM

    df = spark.createDataFrame(
        [
            (1, 0, [1.0, 2.0]),
            (2, 0, [3.0, 6.0]),
            (3, 1, [10.0, -10.0]),
        ],
        "vec_id long, label int, embedding array<float>",
    )
    got = {r.label: r.centroid for r in SIM.label_centroids(df).collect()}
    assert got[0] == [2.0, 4.0]
    assert got[1] == [10.0, -10.0]


def test_prototype_pruning_keeps_hardest_first(spark):
    """The outlier (lowest cosine to its label centroid) must rank as the
    hardest example; ties and ordering are deterministic."""
    from go_pq_cdc_kafka_spark.operators import similarity as SIM

    df = spark.createDataFrame(
        [
            (1, 0, [1.0, 0.0]),
            (2, 0, [1.0, 0.1]),
            (3, 0, [-1.0, 0.0]),  # points away from the centroid: hardest
        ],
        "vec_id long, label int, embedding array<float>",
    )
    got = SIM.prototype_pruning(df, keep_per_label=2).collect()
    assert [r.vec_id for r in got] == [3, 1] or [r.vec_id for r in got] == [3, 2]
    assert got[0].hardness_rank == 1 and got[0].vec_id == 3
