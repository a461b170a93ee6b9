"""Stream-maintained incremental view over a CDC changelog: the merged
delta-partial store equals a from-scratch aggregate over the final table
state (the IVM correctness contract), independent of micro-batch
boundaries and event order within batches (commutative signed-delta
algebra — pre-images arrive on the event, REPLICA IDENTITY FULL)."""

import pyspark.sql.functions as F

from go_pq_cdc_kafka_spark.catalog import load_table
from go_pq_cdc_kafka_spark.streaming import ivm as IVM

SF = "/root/testdata/sf0.001"


def _orders_changelog_with_preimages(spark):
    """The fixture changelog (FIXTURES.md §2: snapshot all, update %10,
    delete %7) with the pre-image ON each event, as REPLICA IDENTITY FULL
    delivers it: update pre = snapshot price; delete pre = the price the
    row last had (updated if pk%10==0, else snapshot)."""
    o = load_table(spark, SF, "orders")
    snap = o.select(
        F.col("o_orderkey").alias("pk"),
        F.lit("SNAPSHOT").alias("op"),
        F.col("o_totalprice").alias("value"),
        F.lit(None).cast("double").alias("pre_value"),
        F.lit(0).cast("long").alias("lsn"),
    )
    upd = o.filter(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("pk"),
        F.lit("UPDATE").alias("op"),
        (F.col("o_totalprice") * 1.1).alias("value"),
        F.col("o_totalprice").alias("pre_value"),
        F.lit(1).cast("long").alias("lsn"),
    )
    dele = o.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("pk"),
        F.lit("DELETE").alias("op"),
        F.lit(None).cast("double").alias("value"),
        F.when(
            F.col("o_orderkey") % 10 == 0, F.col("o_totalprice") * 1.1
        ).otherwise(F.col("o_totalprice")).alias("pre_value"),
        F.lit(2).cast("long").alias("lsn"),
    )
    return snap.unionByName(upd).unionByName(dele)


def _final_state_recompute(log):
    """From-scratch aggregate over the final LWW state — the recompute the
    maintained view must equal (same shape as the cdc_incremental_agg
    registry oracle)."""
    from pyspark.sql import Window

    w = Window.partitionBy("pk").orderBy(F.col("lsn").desc())
    return (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "DELETE"))
        .groupBy((F.col("pk") % 50).alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("value").cast("decimal(27,6)"))
            .cast("decimal(27,6)")
            .alias("total"),
        )
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_streamed_ivm_equals_recompute(spark, tmp_path):
    log = _orders_changelog_with_preimages(spark).withColumn(
        "shard", F.col("pk") % 50
    )
    src = str(tmp_path / "src")
    # land in LSN order, one file per LSN tier -> 3 ordered micro-batches
    log.repartition(1, "lsn").sortWithinPartitions("lsn").write.partitionBy(
        "lsn"
    ).parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, ckpt = str(tmp_path / "view"), str(tmp_path / "ckpt")
    q = IVM.stream_ivm_view(stream, out, ckpt, keys=["shard"])
    q.processAllAvailable()
    q.stop()

    parts = spark.read.parquet(out)
    assert parts.select("_batch_id").distinct().count() >= 2, (
        "expected multiple micro-batches to exercise the merge"
    )

    merged = IVM.read_ivm_view(spark, out, keys=["shard"])
    recompute = _final_state_recompute(log)
    assert _rows(merged.select("shard", "n_rows", "total")) == _rows(
        recompute.select("shard", "n_rows", "total")
    )


def test_ivm_algebra_is_order_independent(spark, tmp_path):
    """Random (non-LSN) batch boundaries give the SAME merged view: with
    pre-images on the event, the signed-delta algebra is commutative, so
    the maintained aggregate never depends on delivery order — a stronger
    replay story than LWW materialization, which needs per-key order."""
    log = _orders_changelog_with_preimages(spark).withColumn(
        "shard", F.col("pk") % 50
    )
    src = str(tmp_path / "shuffled")
    log.repartition(5).write.parquet(src)  # arbitrary interleaving

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, ckpt = str(tmp_path / "view"), str(tmp_path / "ckpt")
    q = IVM.stream_ivm_view(stream, out, ckpt, keys=["shard"])
    q.processAllAvailable()
    q.stop()

    merged = IVM.read_ivm_view(spark, out, keys=["shard"])
    recompute = _final_state_recompute(log)
    assert _rows(merged.select("shard", "n_rows", "total")) == _rows(
        recompute.select("shard", "n_rows", "total")
    )


def test_ivm_fully_deleted_group_vanishes(spark):
    """A group whose rows are all deleted drops out of the merged view
    exactly as a recompute omits it (n_rows reaches 0 and is filtered)."""
    rows = [
        (1, "INSERT", 10.0, None, "g"),
        (2, "INSERT", 5.0, None, "g"),
        (1, "UPDATE", 12.0, 10.0, "g"),
        (1, "DELETE", None, 12.0, "g"),
        (2, "DELETE", None, 5.0, "g"),
        (3, "INSERT", 7.0, None, "h"),
    ]
    log = spark.createDataFrame(
        rows, "pk long, op string, value double, pre_value double, grp string"
    )
    part = IVM.changelog_delta_partials(log, keys=["grp"])
    merged = (
        part.groupBy("grp")
        .agg(
            F.sum("cnt_delta").alias("n_rows"),
            F.sum("sum_delta").cast("decimal(27,6)").alias("total"),
        )
        .filter(F.col("n_rows") > 0)
    )
    got = _rows(merged)
    assert len(got) == 1 and got[0][0] == "h" and float(got[0][2]) == 7.0


def test_ivm_null_transitions_retract_and_restore(spark):
    """UPDATE x→NULL must retract x (a recompute's SUM skips NULLs) and
    UPDATE NULL→y must add y; INSERT/DELETE of a NULL value contribute 0.
    Regression for the uncoalesced-value bug where `val - pre` went NULL
    and F.sum silently dropped the retraction, freezing the view at the
    pre-image."""
    rows = [
        (1, "INSERT", 10.0, None, "g"),
        (1, "UPDATE", None, 10.0, "g"),   # x -> NULL: retract 10
        (2, "INSERT", None, None, "g"),   # NULL insert: contributes 0
        (2, "UPDATE", 6.0, None, "g"),    # NULL -> y: add 6
        (3, "INSERT", None, None, "g"),
        (3, "DELETE", None, None, "g"),   # NULL delete: contributes 0
    ]
    log = spark.createDataFrame(
        rows, "pk long, op string, value double, pre_value double, grp string"
    )
    part = IVM.changelog_delta_partials(log, keys=["grp"]).collect()
    assert len(part) == 1
    assert part[0]["cnt_delta"] == 2  # rows 1 and 2 survive, row 3 deleted
    # final state: pk1=NULL, pk2=6.0 -> SUM skips the NULL -> 6.0
    assert float(part[0]["sum_delta"]) == 6.0


def test_ivm_accepts_debezium_single_char_ops(spark):
    rows = [
        (1, "c", 10.0, None, "g"),
        (1, "u", 11.0, 10.0, "g"),
        (2, "r", 4.0, None, "g"),
        (2, "d", None, 4.0, "g"),
    ]
    log = spark.createDataFrame(
        rows, "pk long, op string, value double, pre_value double, grp string"
    )
    part = IVM.changelog_delta_partials(log, keys=["grp"]).collect()
    assert len(part) == 1
    assert part[0]["cnt_delta"] == 1  # c + r - d
    assert float(part[0]["sum_delta"]) == 11.0  # 10 + (11-10) + 4 - 4
