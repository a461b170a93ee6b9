"""Time-series operator tests: bucket alignment, gap-fill density + LOCF
semantics, and losslessness of the hierarchical rollup (fine partials
re-aggregated == direct coarse aggregation).

Reference context: the reference's TimescaleDB support is routing-side
(connector.go:204-209 maps hypertable chunks to the parent topic); the
analytics operators here (time_bucket / gapfill+locf / continuous-agg
rollup) are what those hypertable users run on the other end.
"""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from go_pq_cdc_kafka_spark.catalog import load_table
from go_pq_cdc_kafka_spark.operators import timeseries as TS

UTC = dt.timezone.utc


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        ("a", _ts("2024-03-01 00:07:13"), 1.0),
        ("a", _ts("2024-03-01 00:41:00"), 3.0),
        # gap: 01:00 bucket empty for key a
        ("a", _ts("2024-03-01 02:05:59"), 5.0),
        ("b", _ts("2024-03-01 01:59:59"), 7.0),
        ("b", _ts("2024-03-01 04:00:00"), 9.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_bucket_alignment(spark, series):
    out = series.select(TS.bucket(F.col("ts"), 3600).alias("b")).distinct()
    got = sorted(r.b for r in out.collect())
    assert got == [
        _ts("2024-03-01 00:00:00"),
        _ts("2024-03-01 01:00:00"),
        _ts("2024-03-01 02:00:00"),
        _ts("2024-03-01 04:00:00"),
    ]


def test_gapfill_locf_densifies_and_fills(spark, series):
    bucketed = series.groupBy(
        "k", TS.bucket(F.col("ts"), 3600).alias("bucket")
    ).agg(F.sum("v").alias("v"))
    out = TS.gapfill_locf(
        bucketed, "bucket", 3600, keys=("k",), value_cols=("v",)
    )
    rows = {(r.k, r.bucket): r.v for r in out.collect()}
    # key a spans 00:00..02:00 -> 3 grid points; key b 01:00..04:00 -> 4
    assert len(rows) == 7
    # observed buckets keep their aggregate
    assert rows[("a", _ts("2024-03-01 00:00:00"))] == 4.0  # 1+3
    # the empty 01:00 bucket is filled from 00:00 (LOCF), not NULL
    assert rows[("a", _ts("2024-03-01 01:00:00"))] == 4.0
    assert rows[("a", _ts("2024-03-01 02:00:00"))] == 5.0
    # key b: 02:00 and 03:00 forward-fill from 01:00
    assert rows[("b", _ts("2024-03-01 02:00:00"))] == 7.0
    assert rows[("b", _ts("2024-03-01 03:00:00"))] == 7.0
    assert rows[("b", _ts("2024-03-01 04:00:00"))] == 9.0
    # no leading NULLs: first grid point per key is observed by construction
    assert all(v is not None for v in rows.values())


def test_rollup_fine_to_coarse_is_lossless(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    fine = TS.rollup_fine(ev, "ts", 900, keys=("event_type",), value_col="value")
    coarse = TS.rollup_coarse(fine, 3600, keys=("event_type",))
    direct = (
        ev.groupBy(
            TS.bucket(F.col("ts"), 3600).alias("bucket"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(27,6)"))
            .cast("double")
            .alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    j = coarse.alias("c").join(
        direct.alias("d"), on=["bucket", "event_type"], how="full"
    )
    bad = j.filter(
        (F.col("c.n") != F.col("d.n"))
        | (F.col("c.sum_value") != F.col("d.sum_value"))
        | (F.col("c.min_value") != F.col("d.min_value"))
        | (F.col("c.max_value") != F.col("d.max_value"))
        | F.col("c.n").isNull()
        | F.col("d.n").isNull()
    )
    assert bad.count() == 0


def test_rollup_coarse_step_must_nest(spark):
    # a coarse step that is a multiple of the fine step nests exactly:
    # every fine bucket maps into exactly one coarse bucket
    ev = load_table(spark, "/root/testdata/sf0.001", "events").limit(500)
    fine = TS.rollup_fine(ev, "ts", 600, keys=(), value_col="value")
    coarse = TS.rollup_coarse(fine, 1800, keys=())
    n_fine = fine.agg(F.sum("n")).collect()[0][0]
    n_coarse = coarse.agg(F.sum("n")).collect()[0][0]
    assert n_fine == n_coarse == 500


def test_gapfill_interpolate_hand_computed(spark):
    """3600s grid, observations at t0 and t0+3h: the two missing buckets
    interpolate at exact thirds (truncating division), and buckets
    outside the span fill from the nearest observation."""
    import datetime

    from go_pq_cdc_kafka_spark.operators import timeseries as TS

    t0 = datetime.datetime(2024, 1, 1, 0, 0)
    rows = [
        ("a", t0, 100),
        ("a", t0 + datetime.timedelta(hours=3), 110),
    ]
    bucketed = spark.createDataFrame(
        rows, "k string, bucket timestamp_ntz, cents long"
    )
    out = {
        (r.bucket.hour, r.cents)
        for r in TS.gapfill_interpolate(
            bucketed, "bucket", 3600, keys=("k",), value_col="cents"
        ).collect()
    }
    # (110-100)*1//3 = 3, *2//3 = 6 — truncation, not rounding
    assert out == {(0, 100), (1, 103), (2, 106), (3, 110)}


def test_gapfill_interpolate_negative_slope_truncates_toward_zero(spark):
    import datetime

    from go_pq_cdc_kafka_spark.operators import timeseries as TS

    t0 = datetime.datetime(2024, 1, 1, 0, 0)
    rows = [
        ("a", t0, 10),
        ("a", t0 + datetime.timedelta(hours=3), 3),
    ]
    bucketed = spark.createDataFrame(
        rows, "k string, bucket timestamp_ntz, cents long"
    )
    out = {
        (r.bucket.hour, r.cents)
        for r in TS.gapfill_interpolate(
            bucketed, "bucket", 3600, keys=("k",), value_col="cents"
        ).collect()
    }
    # slope -7 over 3h: 10 + (-7*1)//3 = 10 + (-2) = 8 (trunc, not floor
    # which would give 7); 10 + (-7*2)//3 = 10 - 4 = 6
    assert out == {(0, 10), (1, 8), (2, 6), (3, 3)}


def test_ewma_hand_computed_and_order_sensitive(spark):
    from go_pq_cdc_kafka_spark.operators import timeseries as TS

    rows = [
        ("a", 1, 101, 8.0),
        ("a", 2, 102, 4.0),
        ("a", 3, 103, 0.0),
        ("b", 1, 201, 10.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts long, rid long, x double")
    got = {
        (r.k, r.ts): r.ewma
        for r in TS.ewma(df, "k", "ts", "x", "rid").collect()
    }
    # s1=8; s2=8+(4-8)/4=7; s3=7+(0-7)/4=5.25
    assert got[("a", 1)] == 8.0
    assert got[("a", 2)] == 7.0
    assert got[("a", 3)] == 5.25
    assert got[("b", 1)] == 10.0

    # order sensitivity: reversing the series changes the fold
    rev = spark.createDataFrame(
        [("a", 1, 1, 0.0), ("a", 2, 2, 4.0), ("a", 3, 3, 8.0)],
        "k string, ts long, rid long, x double",
    )
    got_rev = {
        r.ts: r.ewma for r in TS.ewma(rev, "k", "ts", "x", "rid").collect()
    }
    assert got_rev[3] != got[("a", 3)]
