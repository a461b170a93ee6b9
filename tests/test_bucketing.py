"""Bucketed-table co-located joins and range-clustered file layout.

The write-side half of the scale story: a join between two tables
bucketed on the same key must plan with ZERO Exchange operators (the
shuffle was paid once at write time), and a range-clustered parquet
layout must produce disjoint per-file min/max envelopes so footer-stats
pruning can skip files. Both claims are asserted against the actual
physical plan / actual parquet footers, not just documented.
"""

import glob
import re

import pyspark.sql.functions as F
import pytest

from go_pq_cdc_kafka_spark.operators import bucketing as B


def _formatted_plan(df) -> str:
    qe = df._jdf.queryExecution()
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


def _node_count(plan: str, op: str) -> int:
    # \b: "Sort" must not count "SortMergeJoin" nodes
    return len(re.findall(rf"\(\d+\) {re.escape(op)}\b", plan))


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir):
    """orders + lineitem bucketed by orderkey into the test warehouse."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    B.write_bucketed(orders, "bt_orders", "o_orderkey", num_buckets=8)
    B.write_bucketed(li, "bt_lineitem", "l_orderkey", num_buckets=8)
    yield "bt_orders", "bt_lineitem"
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")


def test_bucketed_join_has_no_exchange_and_no_sort(spark, bucketed_pair):
    t_orders, t_li = bucketed_pair
    # disable auto-broadcast so the join would OTHERWISE be a shuffle SMJ —
    # the interesting case at 100 TB where neither side broadcasts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = B.bucketed_table(spark, t_orders).join(
            B.bucketed_table(spark, t_li),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = _formatted_plan(joined)
        assert _node_count(plan, "SortMergeJoin") == 1
        # the whole point: scans satisfy the join's DISTRIBUTION — the
        # 100 TB shuffle is gone unconditionally
        assert _node_count(plan, "Exchange") == 0, plan
        assert "SelectedBucketsCount" in plan

        # ORDERING elision additionally needs the sorted-scan conf (off by
        # default since Spark 3.0 because multi-file buckets break it; our
        # writer guarantees one file per bucket, making it safe)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )
        plan = _formatted_plan(
            B.bucketed_table(spark, t_orders).join(
                B.bucketed_table(spark, t_li),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
        )
        assert _node_count(plan, "Exchange") == 0, plan
        assert _node_count(plan, "Sort") == 0, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")


def test_bucketed_agg_on_bucket_key_has_no_exchange(spark, bucketed_pair):
    _, t_li = bucketed_pair
    agg = (
        B.bucketed_table(spark, t_li)
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    plan = _formatted_plan(agg)
    # hash aggregation on the bucket key reuses the storage distribution
    assert _node_count(plan, "Exchange") == 0, plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_pair):
    t_orders, t_li = bucketed_pair
    bucketed = (
        B.bucketed_table(spark, t_orders)
        .join(
            B.bucketed_table(spark, t_li),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_one_sided_bucketing_shuffles_only_the_other_side(
    spark, sf_dir, bucketed_pair
):
    """Joining a bucketed table against an UNBUCKETED frame with the
    matching partition count shuffles only the unbucketed side — half the
    exchange cost, still correct."""
    t_orders, _ = bucketed_pair
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # bucket-side scan only satisfies the join when the shuffle target
    # matches the bucket count
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        joined = B.bucketed_table(spark, t_orders).join(
            li, F.col("o_orderkey") == F.col("l_orderkey")
        )
        plan = _formatted_plan(joined)
        assert _node_count(plan, "Exchange") == 1, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.shuffle.partitions", "8")


def test_range_clustered_files_have_disjoint_minmax(spark, sf_dir, tmp_path):
    import pyarrow.parquet as pq

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    out = str(tmp_path / "clustered")
    B.write_range_clustered(li, out, "l_orderkey", num_files=6)
    envelopes = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i
            for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "l_orderkey"
        )
        lo = min(
            md.row_group(g).column(col_idx).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(col_idx).statistics.max
            for g in range(md.num_row_groups)
        )
        envelopes.append((lo, hi))
    envelopes.sort()
    assert len(envelopes) >= 4  # range partitioner actually spread the data
    for (_, prev_hi), (next_lo, _) in zip(envelopes, envelopes[1:]):
        # disjoint (at most touching at the boundary key): a range
        # predicate overlaps ~1 file instead of all of them
        assert next_lo >= prev_hi, envelopes


def test_unbucketed_join_does_shuffle(spark, sf_dir, bucketed_pair):
    """Contrast case: the same join against a NON-bucketed side must fail
    the co-location assertion — proves assert_colocated detects the
    reintroduced shuffle rather than passing vacuously."""
    t_orders, _ = bucketed_pair
    plain = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    j = B.bucketed_table(spark, t_orders).join(plain, ["o_orderkey"])
    with pytest.raises(AssertionError):
        B.assert_colocated(j)


def test_bucketed_join_helper_is_colocated(spark, sf_dir, bucketed_pair):
    """bucketed_join + assert_colocated round trip on a same-named key."""
    t_orders, _ = bucketed_pair
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    B.write_bucketed(li, "bt_lineitem_renamed", "o_orderkey", num_buckets=8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = B.bucketed_join(spark, t_orders, "bt_lineitem_renamed", ["o_orderkey"])
        B.assert_colocated(j)
        assert j.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bt_lineitem_renamed")


def test_bucket_pruning_on_point_filter(spark, bucketed_pair):
    t_orders, _ = bucketed_pair
    # autoBucketedScan turns bucketed reading off when no shuffle is saved;
    # disable it so the point filter demonstrates 1-of-8 bucket pruning
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    try:
        plan = (
            spark.table(t_orders)
            .filter(F.col("o_orderkey") == 42)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )
    assert "SelectedBucketsCount: 1 out of 8" in plan


def test_bucket_count_sizing():
    assert B.bucket_count_for(10 << 40) == (10 << 40) // (256 << 20)  # 10 TB
    assert B.bucket_count_for(1 << 20) == 1                # tiny table: 1
    assert B.bucket_count_for(1 << 60) == 100_000          # capped


def _file_envelopes(path, col):
    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = next(
            i
            for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == col
        )
        lo = min(
            md.row_group(g).column(idx).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(idx).statistics.max
            for g in range(md.num_row_groups)
        )
        out.append((lo, hi))
    return out


def test_zorder_bounds_every_dimension(spark, sf_dir, tmp_path):
    """Morton layout: EVERY clustered column's per-file envelope is a
    fraction of the global range, so footer stats prune on predicates
    over either column — where single-column clustering leaves the
    second column's envelopes at ~full range."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zpath = str(tmp_path / "zorder")
    B.write_zorder_clustered(li, zpath, ["l_orderkey", "l_partkey"], num_files=16)

    rng = {
        c: (r["mn"], r["mx"])
        for c, r in (
            (
                c,
                li.agg(
                    F.min(c).alias("mn"), F.max(c).alias("mx")
                ).collect()[0],
            )
            for c in ("l_orderkey", "l_partkey")
        )
    }

    def avg_frac(path, col):
        """Mean per-file envelope fraction = expected fraction of files a
        uniform point predicate on `col` fails to prune. The MEAN is the
        right statistic: a z-interval split at a quantile (non-prefix)
        boundary produces a few straddler files with wide envelopes —
        inherent to Morton layouts (Delta's OPTIMIZE has them too) — but
        they stay a small minority, which the mean captures and a max
        would not."""
        lo_g, hi_g = rng[col]
        spread = hi_g - lo_g
        envs = _file_envelopes(path, col)
        assert len(envs) >= 8
        return sum((hi - lo) / spread for lo, hi in envs) / len(envs)

    # 16 files in 2-d: typical file covers ~1/4 of each dimension; a point
    # predicate on EITHER column prunes most files
    assert avg_frac(zpath, "l_orderkey") < 0.5
    assert avg_frac(zpath, "l_partkey") < 0.5

    # contrast: single-column clustering leaves the OTHER column unpruned
    rpath = str(tmp_path / "range1d")
    B.write_range_clustered(li, rpath, "l_orderkey", num_files=16)
    assert avg_frac(rpath, "l_orderkey") < 0.2
    assert avg_frac(rpath, "l_partkey") > 0.85


def test_zorder_requires_two_columns():
    with pytest.raises(ValueError):
        B.write_zorder_clustered(None, "/tmp/x", ["one"])


def test_zorder_preserves_rows_and_schema(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zpath = str(tmp_path / "zorder_rows")
    B.write_zorder_clustered(li, zpath, ["l_orderkey", "l_partkey"], num_files=8)
    back = spark.read.parquet(zpath)
    assert back.columns == ["l_orderkey", "l_partkey", "l_quantity"]
    assert back.count() == li.count()
    assert back.agg(F.sum("l_orderkey")).collect()[0][0] == \
        li.agg(F.sum("l_orderkey")).collect()[0][0]
