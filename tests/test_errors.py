"""B5 error fan-out: wire-size formula, oversize dead-lettering, fatal
classification, per-batch response callbacks (kafka/reponse_handler.go:13-48,
producer_batch.go:121-135,199-206)."""

import pyspark.sql.functions as F
import pytest

from go_pq_cdc_kafka_spark.streaming import errors as E


@pytest.fixture()
def records(spark):
    rows = [
        ("t1", b"k1", b"small", [("h", b"v")]),
        ("t1", b"k2", b"x" * 2000, []),
        ("t2", None, b"no-key", None),
    ]
    return spark.createDataFrame(
        rows,
        "topic string, key binary, value binary, "
        "headers array<struct<key:string,value:binary>>",
    )


def test_wire_size_matches_reference_formula(spark, records):
    got = {
        r.key: r.ws
        for r in records.select(
            F.col("key").cast("string").alias("key"), E.wire_size().alias("ws")
        ).collect()
    }
    # 14 + (4+len(key)) + (4+len(value)) + sum(2+len(hk)+len(hv))
    assert got["k1"] == 14 + (4 + 2) + (4 + 5) + (2 + 1 + 1)
    assert got["k2"] == 14 + (4 + 2) + (4 + 2000) + 0
    assert got[None] == 14 + (4 + 0) + (4 + 6) + 0  # NULLs count 0 bytes


def test_split_oversize_routes_dead_letters(spark, records):
    ok, dead = E.split_oversize(records, max_bytes=100)
    assert ok.count() == 2
    d = dead.collect()
    assert len(d) == 1
    assert d[0].error == "MessageTooLargeError"
    assert d[0].wire_size > 100
    # dead letters reshaped for the DLQ topic keep payload, move topic to header
    dlq = E.to_dead_letter_topic(dead, "dlq").collect()[0]
    assert dlq.topic == "dlq"
    assert bytes(dlq.value) == b"x" * 2000
    hdrs = {h.key: bytes(h.value) for h in dlq.headers}
    assert hdrs["original_topic"] == b"t1"
    assert hdrs["error"] == b"MessageTooLargeError"


def test_classify_error_mirrors_reference():
    assert E.classify_error(RuntimeError("Unknown Topic Or Partition")) == "fatal"
    assert E.classify_error(OSError("connection reset by peer")) == "transient"
    assert E.classify_error(ValueError("something else")) == "unknown"


def test_response_handler_fanout(spark, records):
    seen = {"ok": [], "err": []}
    handler = E.ResponseHandler(
        on_success=lambda n: seen["ok"].append(n),
        on_error=lambda exc, kind, df: seen["err"].append((str(exc), kind, df.count())),
        reraise_transient=False,
    )

    sink_calls = []
    wrapped = E.with_response_handler(
        lambda df, bid: sink_calls.append(bid), handler
    )
    wrapped(records, 7)
    assert sink_calls == [7] and seen["ok"] == [3] and seen["err"] == []

    def failing(df, bid):
        raise OSError("connection reset by peer")

    E.with_response_handler(failing, handler)(records, 8)
    assert seen["err"] == [("connection reset by peer", "transient", 3)]
    assert seen["ok"] == [3]  # no success callback on the failed batch

    def fatal(df, bid):
        raise RuntimeError("Invalid Topic")

    with pytest.raises(RuntimeError):
        E.with_response_handler(fatal, handler)(records, 9)


def test_response_handler_evaluates_batch_once(spark, tmp_path):
    """The success-count must not recompute the batch lineage: the sink's own
    pass populates the persisted batch, the count reads the cache. An
    accumulator inside a filter (count can't prune a filter) tallies actual
    evaluations — 10 means once, 20 would mean the old count-then-sink
    double-compute."""
    acc = spark.sparkContext.accumulator(0)

    def bump(x):
        acc.add(1)
        return True

    bump_udf = F.udf(bump, "boolean")
    df = spark.range(10).filter(bump_udf(F.col("id")))

    seen = []
    handler = E.ResponseHandler(on_success=seen.append)

    def sink(d, _bid):
        d.write.mode("overwrite").parquet(str(tmp_path / "once_out"))

    E.with_response_handler(sink, handler)(df, 1)
    assert seen == [10]
    assert acc.value == 10
