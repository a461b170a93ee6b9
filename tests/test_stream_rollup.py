"""Stream-maintained continuous aggregate: the fine-partial store merged
back equals the batch rollup over the full history, and the coarse tier
derived from the streamed store equals the direct coarse aggregation."""

import pyspark.sql.functions as F

from go_pq_cdc_kafka_spark.catalog import load_table
from go_pq_cdc_kafka_spark.operators import timeseries as TS
from go_pq_cdc_kafka_spark.streaming import rollup as R

SF = "/root/testdata/sf0.001"


def _frames_equal(a, b, key_cols):
    j = a.alias("a").join(b.alias("b"), on=key_cols, how="full")
    non_keys = [c for c in a.columns if c not in key_cols]
    cond = F.lit(False)
    for c in non_keys:
        cond = (
            cond
            | (F.col(f"a.{c}") != F.col(f"b.{c}"))
            | (F.col(f"a.{c}").isNull() != F.col(f"b.{c}").isNull())
        )
    return j.filter(cond).count() == 0


def test_streamed_partials_merge_to_batch_rollup(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "src")
    # land the events as 3 files -> 3 micro-batches
    ev.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, ckpt = str(tmp_path / "fine"), str(tmp_path / "ckpt")
    q = R.stream_fine_rollup(stream, out, ckpt)
    q.processAllAvailable()
    q.stop()

    parts = spark.read.parquet(out)
    assert parts.select("_batch_id").distinct().count() >= 2, (
        "expected multiple micro-batches to exercise the merge"
    )

    merged = R.read_fine_rollup(spark, out)
    batch = TS.rollup_fine(ev, "ts", 900, keys=("event_type",), value_col="value")
    # nullability differs (count is non-null, a re-merged sum is nullable);
    # names and types must match exactly
    assert [(f.name, f.dataType) for f in merged.schema] == [
        (f.name, f.dataType) for f in batch.schema
    ]
    assert _frames_equal(merged, batch, ["bucket", "event_type"])

    # the coarse tier from the streamed store == direct coarse from batch fine
    coarse_streamed = TS.rollup_coarse(merged, 3600, keys=("event_type",))
    coarse_direct = TS.rollup_coarse(batch, 3600, keys=("event_type",))
    assert _frames_equal(coarse_streamed, coarse_direct, ["bucket", "event_type"])


def test_streamed_rollup_resumes_from_checkpoint(spark, tmp_path):
    """New files after a restart extend the partial store instead of
    recomputing it (checkpointed source offsets)."""
    ev = load_table(spark, SF, "events")
    first, second = ev.filter(F.col("event_id") % 2 == 0), ev.filter(
        F.col("event_id") % 2 == 1
    )
    src = str(tmp_path / "src")
    first.coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    out, ckpt = str(tmp_path / "fine"), str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = R.stream_fine_rollup(stream, out, ckpt)
        q.processAllAvailable()
        q.stop()

    run_once()
    n_parts_first = spark.read.parquet(out).count()
    second.coalesce(1).write.mode("append").parquet(src)
    run_once()

    parts = spark.read.parquet(out)
    # restart appended new partials (no rewrite of the old ones)
    assert parts.count() > n_parts_first
    merged = R.read_fine_rollup(spark, out)
    batch = TS.rollup_fine(ev, "ts", 900, keys=("event_type",), value_col="value")
    assert _frames_equal(merged, batch, ["bucket", "event_type"])


def test_streamed_histogram_sketches_merge_bit_exact(spark, tmp_path):
    """The streamed histogram store merged back equals the batch histogram
    of the undivided data BIT-FOR-BIT (integer counts — a stronger claim
    than the HLL tier's estimate identity)."""
    from go_pq_cdc_kafka_spark.operators import sketches as SKCH

    ev = load_table(spark, SF, "events").select(
        "event_type", (F.col("value").cast("bigint")).alias("cents")
    )
    src = str(tmp_path / "hsrc")
    ev.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, ckpt = str(tmp_path / "hist"), str(tmp_path / "hckpt")
    q = R.stream_histogram_sketches(
        stream, out, ckpt, ["event_type"], "cents", width_cents=50, nbins=100
    )
    q.processAllAvailable()
    q.stop()

    parts = spark.read.parquet(out)
    assert parts.select("_batch_id").distinct().count() >= 2

    merged = R.read_histogram_sketches(spark, out, ["event_type"])
    direct = SKCH.histogram_cell_sketches(
        ev, ["event_type"], F.col("cents"), width_cents=50, nbins=100
    )
    assert _frames_equal(merged, direct, ["event_type", "bin"])

    # quantiles from the streamed store match the direct histogram's
    qa = SKCH.histogram_quantiles(merged, ["event_type"], 50).collect()
    qb = SKCH.histogram_quantiles(direct, ["event_type"], 50).collect()
    assert sorted(map(tuple, qa)) == sorted(map(tuple, qb))


def test_streamed_countmin_partials_merge_bit_exact(spark, tmp_path):
    """CM partials appended per micro-batch merge to the exact sketch of
    the undivided stream — same append-only tier as the histogram, reusing
    stream_fine_rollup's landing shape via a foreachBatch reducer."""
    from go_pq_cdc_kafka_spark.operators import sketches as SKCH

    ev = load_table(spark, SF, "events").select("event_type", "user_id")
    src = str(tmp_path / "cmsrc")
    ev.repartition(3).write.parquet(src)

    out, ckpt = str(tmp_path / "cm"), str(tmp_path / "cmckpt")

    def _land(batch_df, batch_id):
        SKCH.countmin_cell_sketches(
            batch_df, ["event_type"], "user_id", d=4, w=64
        ).withColumn("_batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)

    q = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(_land)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    parts = spark.read.parquet(out)
    assert parts.select("_batch_id").distinct().count() >= 2
    merged = SKCH.countmin_rollup(parts, ["event_type"])
    direct = SKCH.countmin_cell_sketches(
        ev, ["event_type"], "user_id", d=4, w=64
    )
    assert _frames_equal(merged, direct, ["event_type", "row", "bucket"])
