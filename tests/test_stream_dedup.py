"""Streaming incremental MinHash-LSH dedup (streaming/dedup_stream.py):
the Python signature twin is pinned against the JVM implementation, and
the stateful operator is driven across micro-batch boundaries — the exact
case batch dedup cannot cover without rescanning history."""

import time

import pyspark.sql.functions as F
import pytest

from go_pq_cdc_kafka_spark.operators import dedup as D
from go_pq_cdc_kafka_spark.streaming import dedup_stream as DS


def test_python_signature_matches_jvm(spark):
    """The mapInPandas path re-implements tokens/shingles/hash64/minhash in
    Python; any drift from the JVM formulas would silently split the
    streaming and batch dedup universes — pin them element-for-element on
    the real fixture corpus."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    jvm = {
        r["doc_id"]: [r[f"mh{p}"] for p in range(16)]
        for r in D.minhash_signatures(docs).collect()
    }
    local = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(jvm) == set(local)
    for doc_id, text in local.items():
        assert DS._py_signature(text) == jvm[doc_id], doc_id


def test_python_shingles_edge_cases():
    # short docs collapse to one shingle; empty docs yield the '' shingle
    assert DS._py_shingles("") == [""]
    assert DS._py_shingles("  \t ") == [""]
    assert DS._py_shingles("one two") == ["one two"]
    assert DS._py_shingles("a b c d") == ["a b c", "b c d"]
    # distinct: repeated n-grams appear once
    assert DS._py_shingles("x y z x y z x y z") == [
        "x y z", "y z x", "z x y",
    ]


def test_streaming_dedup_flags_cross_batch_duplicates(spark, tmp_path):
    batches = [
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely different content about spark streaming state")],
        [(10, "the quick brown fox jumps over the lazy dog today"),  # dup of 1
         (11, "unrelated third document with its own words entirely")],
        [(20, "completely different content about spark streaming state"),  # dup of 2
         (21, "the quick brown fox jumps over the lazy dog tonight")],  # near 1
    ]
    path = str(tmp_path / "docs")
    schema = "doc_id long, text string"
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    # ground truth from the (JVM-pinned) python twin: a doc is flagged iff
    # it shares >=1 band key with an earlier doc, against the EARLIEST
    # holder of that band key
    all_docs = [r for b in batches for r in b]
    r = 16 // 4
    holders: dict = {}
    expected = {}
    for doc_id, text in all_docs:
        sig = DS._py_signature(text)
        reps = set()
        for b in range(4):
            key = (b, "|".join(str(sig[b * r + i]) for i in range(r)))
            if key in holders:
                reps.add(holders[key])
            else:
                holders[key] = doc_id
        if reps:
            expected[doc_id] = min(reps)
    assert expected.get(10) == 1 and expected.get(20) == 2  # planted exact dups

    stream = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        DS.streaming_minhash_dedup(stream)
        .writeStream.format("memory")
        .queryName("stream_dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.monotonic() + 120
        got = {}
        while time.monotonic() < deadline:
            q.processAllAvailable()
            rows = spark.sql(
                "select doc_id, min(dup_of) as rep from stream_dedup_sink group by doc_id"
            ).collect()
            got = {r.doc_id: r.rep for r in rows}
            if set(got) >= set(expected):
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert got == expected, (got, expected)


def test_streaming_dedup_replay_is_idempotent(spark, tmp_path):
    """Re-ingesting the same doc (same id, same text — an at-least-once
    replay) must not flag the representative against itself."""
    path = str(tmp_path / "docs")
    schema = "doc_id long, text string"
    rows = [(1, "alpha beta gamma delta epsilon zeta")]
    for _ in range(2):  # same file content appended twice = replay
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    stream = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        DS.streaming_minhash_dedup(stream)
        .writeStream.format("memory")
        .queryName("stream_dedup_replay_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.sql("select * from stream_dedup_replay_sink").count() == 0
