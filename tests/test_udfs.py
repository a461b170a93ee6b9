"""UDF-surface tiers (SURVEY §2.B): scalar pandas_udf, grouped-map
applyInPandas, Python UDTF. mapInPandas and applyInPandasWithState are
covered by test_training_ops / test_windows."""

import math

import pyspark.sql.functions as F
import pytest

from go_pq_cdc_kafka_spark.functions import udfs as U


def test_udtf_chunks_lateral(spark):
    spark.udtf.register("chunk_words_t", U.ChunkWordsUDTF)
    spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(45))), (2, "a b"), (3, None), (4, "")],
        "doc_id long, text string",
    ).createOrReplaceTempView("docs_t")
    rows = spark.sql(
        "SELECT d.doc_id, c.* FROM docs_t d, LATERAL chunk_words_t(d.text) c"
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [r.n_tokens for r in sorted(by_doc[1], key=lambda r: r.chunk_idx)] == [20, 20, 5]
    assert by_doc[2][0].chunk == "a b"
    assert 3 not in by_doc and 4 not in by_doc  # NULL and empty yield nothing


def test_char_entropy_pandas_udf(spark):
    df = spark.createDataFrame(
        [("aaaa",), ("abab",), ("", ), (None,)], "t string"
    ).select(U.char_entropy("t").alias("h"))
    got = [r.h for r in df.collect()]
    assert got[0] == 0.0           # single symbol: zero entropy
    assert got[1] == pytest.approx(1.0)  # two equiprobable symbols: 1 bit
    assert got[2] == 0.0
    assert got[3] is None


def test_zscore_applyinpandas_matches_window(spark):
    df = spark.createDataFrame(
        [(g, float(v)) for g in ("a", "b") for v in range(10)],
        "g string, v double",
    )
    got = {
        (r.g, r.v): r.zscore for r in U.zscore_per_group(df, "g", "v").collect()
    }
    from pyspark.sql import Window

    w = Window.partitionBy("g")
    want = {
        (r.g, r.v): r.z
        for r in df.withColumn(
            "z",
            (F.col("v") - F.avg("v").over(w)) / F.stddev_samp("v").over(w),
        ).collect()
    }
    assert got.keys() == want.keys()
    for k in got:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k
