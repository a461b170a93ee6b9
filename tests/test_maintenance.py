"""Storage-maintenance tests: compaction resizes without losing rows;
clustered writes produce disjoint per-file key ranges (the data-skipping
contract, verified from the parquet footers themselves)."""

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from go_pq_cdc_kafka_spark.operators import maintenance as MT


def _fragmented(spark, path, rows=20_000, files=64):
    (
        spark.range(rows)
        .select(F.col("id"), (F.col("id") % 7).alias("grp"))
        .repartition(files)
        .write.mode("overwrite")
        .parquet(path)
    )


def test_plan_compaction_flags_fragmented_dir(spark, tmp_path):
    path = str(tmp_path / "frag")
    _fragmented(spark, path)
    plan = MT.plan_compaction(spark, path, target_file_bytes=1 << 30)
    assert plan["n_files"] == 64
    assert plan["n_target_files"] == 1
    assert plan["needs_compaction"]


def test_compact_parquet_preserves_rows_and_resizes(spark, tmp_path):
    path = str(tmp_path / "compact_me")
    _fragmented(spark, path)
    before = spark.read.parquet(path)
    before_sum = before.agg(F.sum("id")).collect()[0][0]

    plan = MT.compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert plan["n_files"] == 64

    files = MT.list_data_files(spark, path)
    assert len(files) == 1
    after = spark.read.parquet(path)
    assert after.count() == 20_000
    assert after.agg(F.sum("id")).collect()[0][0] == before_sum


def test_compact_parquet_respects_target_size(spark, tmp_path):
    path = str(tmp_path / "sized")
    _fragmented(spark, path)
    total = sum(sz for _, sz in MT.list_data_files(spark, path))
    # ask for ~4 output files worth of bytes
    MT.compact_parquet(spark, path, target_file_bytes=max(1, total // 4))
    n = len(MT.list_data_files(spark, path))
    assert 2 <= n <= 6  # ceil division ±compression variance, not 64


def test_clustered_write_disjoint_file_ranges(spark, tmp_path):
    path = str(tmp_path / "clustered")
    df = spark.range(50_000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("payload")
    )
    MT.clustered_write(df, path, ["id"], num_files=8)

    ranges = []
    for fpath, _ in MT.list_data_files(spark, path):
        md = pq.ParquetFile(fpath.removeprefix("file:")).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "id"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) == 8
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a < lo_b  # footer stats: file ranges never overlap
    # whole domain covered
    assert ranges[0][0] == 0 and ranges[-1][1] == 49_999
