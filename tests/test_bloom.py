"""Bloom runtime-filter operator (operators/bloom.py): the no-false-negative
contract, the designed false-positive rate, and the reduction plan shape.

The correctness of join_bloom_prefilter never depends on the bitmap (the
exact join removes impostors — oracle-checked); these tests pin the two
properties the ORACLE CANNOT see: every true member passes the probe
(a false negative would silently DROP rows), and the geometry actually
filters (a saturated bitmap would silently degrade to a full-fact shuffle)."""

import pyspark.sql.functions as F
import pytest

from go_pq_cdc_kafka_spark.operators import bloom as BF


def test_geometry_word_aligned_and_capped():
    assert BF.bloom_geometry(0) == 64
    assert BF.bloom_geometry(1000) % 64 == 0
    assert BF.bloom_geometry(1000) >= 16_000
    assert BF.bloom_geometry(10**12) == 1 << 27


def test_no_false_negatives(spark):
    keys = spark.range(0, 2_000).select(F.col("id").alias("k"))
    m = BF.bloom_geometry(2_000)
    flt = BF.bloom_build(keys, "k", m)
    probed = BF.bloom_probe(keys, "k", flt, m)
    # every inserted key must pass its own filter — the Bloom contract
    assert probed.count() == 2_000


def test_false_positive_rate_near_design(spark):
    n = 2_000
    keys = spark.range(0, n).select(F.col("id").alias("k"))
    m = BF.bloom_geometry(n)  # 16 bits/key, k=3 → ~0.15% design FP
    flt = BF.bloom_build(keys, "k", m)
    # probe a disjoint id range: every survivor is a false positive
    outsiders = spark.range(1_000_000, 1_000_000 + 50_000).select(
        F.col("id").alias("k")
    )
    fp = BF.bloom_probe(outsiders, "k", flt, m).count()
    assert fp / 50_000 < 0.01, (
        f"false-positive rate {fp / 50_000:.4f} far above the ~0.0015 design"
    )


def test_probe_filters_without_shuffling_fact(spark):
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    m = BF.bloom_geometry(500)
    flt = BF.bloom_build(keys, "k", m)
    fact = spark.range(0, 100_000).select(F.col("id").alias("k"))
    probed = BF.bloom_probe(fact, "k", flt, m)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # the bloom row attaches via broadcast (the constant-key join folds to
    # a one-row BNLJ whose build side is the word aggregate — the bounded
    # shape the posture gate allows); the fact side must not shuffle: the
    # only exchange permitted is the build side's tiny word aggregation
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "CartesianProduct" not in plan


def test_probe_is_superset_of_members_and_subset_after_exact_join(spark):
    # sanity on a mixed population: member ids all survive; the surviving
    # set inner-joined back to keys equals exactly the member set
    keys = spark.range(0, 300).select(F.col("id").alias("k"))
    m = BF.bloom_geometry(300)
    flt = BF.bloom_build(keys, "k", m)
    pop = spark.range(0, 3_000).select(F.col("id").alias("k"))
    survivors = BF.bloom_probe(pop, "k", flt, m)
    assert survivors.filter(F.col("k") < 300).count() == 300
    exact = survivors.join(keys.withColumnRenamed("k", "k2"),
                           F.col("k") == F.col("k2"), "left_semi")
    assert exact.count() == 300


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
