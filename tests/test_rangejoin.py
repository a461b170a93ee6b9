"""Binned range join semantics: exact-predicate-in-join-condition means
left joins keep unmatched points; interval-preserving outer joins are
rejected (replication would duplicate them)."""

import pyspark.sql.functions as F
import pytest

from go_pq_cdc_kafka_spark.operators import rangejoin as RJ


@pytest.fixture()
def pts_ivs(spark):
    pts = spark.createDataFrame(
        [(1, 5.0), (2, 17.0), (3, 42.0), (4, 99.0)], "pid int, p double"
    )
    ivs = spark.createDataFrame(
        [(10, 0.0, 10.0), (11, 15.0, 30.0), (12, 16.0, 18.0)],
        "iid int, lo double, hi double",
    )
    return pts, ivs


def test_inner_matches_each_pair_once(spark, pts_ivs):
    pts, ivs = pts_ivs
    got = sorted(
        (r.pid, r.iid)
        for r in RJ.point_in_interval_join(pts, ivs, "p", "lo", "hi", 4.0).collect()
    )
    assert got == [(1, 10), (2, 11), (2, 12)]


def test_left_keeps_unmatched_points(spark, pts_ivs):
    pts, ivs = pts_ivs
    out = RJ.point_in_interval_join(pts, ivs, "p", "lo", "hi", 4.0, how="left")
    got = sorted((r.pid, r.iid) for r in out.collect())
    # points 3 and 4 match nothing → exactly one null-padded row each
    assert got == [(1, 10), (2, 11), (2, 12), (3, None), (4, None)]


def test_interval_preserving_outer_rejected(spark, pts_ivs):
    pts, ivs = pts_ivs
    for bad in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            RJ.point_in_interval_join(pts, ivs, "p", "lo", "hi", 4.0, how=bad)


def test_plan_is_equi_join_not_nested_loop(spark, pts_ivs):
    pts, ivs = pts_ivs
    out = RJ.point_in_interval_join(pts, ivs, "p", "lo", "hi", 4.0, how="left")
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_interval_overlap_join_matches_naive_theta(spark):
    """interval_overlap_join == the naive theta join (A.lo <= B.hi AND
    B.lo <= A.hi) on every edge case: touching endpoints, containment,
    identical intervals, disjoint, and pairs co-occurring in MANY buckets
    (the dedup-free guard must keep exactly one copy)."""
    import pyspark.sql.functions as F

    from go_pq_cdc_kafka_spark.operators.rangejoin import interval_overlap_join

    a = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 6), (3, 20, 21), (4, 0, 100)],
        "a_id int, a_lo long, a_hi long",
    )
    b = spark.createDataFrame(
        [(1, 10, 12), (2, 0, 4), (3, 7, 8), (4, 50, 60), (5, 101, 102)],
        "b_id int, b_lo long, b_hi long",
    )
    got = sorted(
        (r.a_id, r.b_id)
        for r in interval_overlap_join(
            a, b, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=3
        ).collect()
    )
    exp = sorted(
        (r.a_id, r.b_id)
        for r in a.join(
            b, (F.col("a_lo") <= F.col("b_hi")) & (F.col("b_lo") <= F.col("a_hi"))
        ).collect()
    )
    assert got == exp and len(got) == len(set(got))
