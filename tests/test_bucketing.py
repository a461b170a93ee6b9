"""Bucketed co-located joins: the write-once-shuffle-never contract, verified
on the physical plan (no Exchange), plus bucket pruning on point lookups."""

import pyspark.sql.functions as F
import pytest

from go_pq_cdc_kafka_spark.operators import bucketing as B

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    B.write_bucketed(o, "t_orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    B.write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"],
    )
    yield "t_orders_b", "t_lineitem_b"
    for t in ("t_orders_b", "t_lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # sf0.001 fixtures are broadcast-sized, which would sidestep bucketing;
    # disable broadcast to get the plan a fact-fact join takes at scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = B.bucketed_join(spark, lt, rt, ["o_orderkey"])
        B.assert_colocated(j)  # zero Exchange in the physical plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # and it computes the right thing
    expected = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF}/lineitem.parquet"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert j.count() == expected


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    lt, _ = bucketed_tables
    plain = spark.read.parquet(f"{SF}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    j = spark.table(lt).join(plain, ["o_orderkey"])
    with pytest.raises(AssertionError):
        B.assert_colocated(j)


def test_bucket_pruning_on_point_filter(spark, bucketed_tables):
    lt, _ = bucketed_tables
    # autoBucketedScan turns bucketed reading off when no shuffle is saved;
    # disable it so the point filter demonstrates 1-of-8 bucket pruning
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        plan = (
            spark.table(lt)
            .filter(F.col("o_orderkey") == 42)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    assert "SelectedBucketsCount: 1 out of 8" in plan


def test_bucket_count_sizing():
    assert B.bucket_count_for(10 << 40) == (10 << 40) // (256 << 20)  # 10 TB
    assert B.bucket_count_for(1 << 20) == 1                # tiny table: 1
    assert B.bucket_count_for(1 << 60) == 100_000          # capped
