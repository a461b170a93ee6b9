"""CDC pipeline → kafka_wire sink → MiniBroker: the produce path EXECUTING
end-to-end in-sandbox — real TCP frames, broker-side CRC32C validation,
Fetch read-back — the closest sandbox analogue of the reference's
integration tier (integration_test/connector_test.go:24-648), which needs a
real Redpanda. The jar-backed sink (to_kafka) stays the production path for
TLS/SASL clusters; this proves the record contract over actual Kafka bytes.
"""

import json

import pytest

from go_pq_cdc_kafka_spark.plans.routing import RoutingTable
from go_pq_cdc_kafka_spark.sources import changelog as cl
from go_pq_cdc_kafka_spark.streaming.kafka import (
    Balancer,
    Compression,
    KafkaProducerConfig,
)
from go_pq_cdc_kafka_spark.streaming.minibroker import MiniBroker
from go_pq_cdc_kafka_spark.streaming.pipeline import CdcPipeline, write_kafka_wire


def _pipeline(spark, path):
    base = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C")], "id int, name string"
    )
    log = cl.generate_table_changelog(
        base, "id", "users", update_mod=2, delete_mod=3
    )
    cl.write_changelog(log, path, num_files=2)
    return CdcPipeline(
        source=cl.read_changelog_stream(spark, path),
        routing=RoutingTable({"public.users": "users.test"}),
        pk_field="id",
    )


def test_streaming_pipeline_to_kafka_wire_e2e(spark, tmp_path):
    """Same changelog as the fake-broker contract test, but through the wire
    producer into a broker that validates CRCs — record bytes, headers, and
    per-key completeness all round-trip."""
    pipe = _pipeline(spark, str(tmp_path / "log"))
    with MiniBroker(num_partitions=3) as broker:
        cfg = KafkaProducerConfig(brokers=[broker.bootstrap])
        q = pipe.to_kafka_wire(
            cfg,
            str(tmp_path / "ckpt"),
            trigger={"availableNow": True},
        )
        q.awaitTermination(120)
        assert not q.isActive
        records = broker.topic_records("users.test")

    assert len(records) == 8  # 3 SNAPSHOT + 3 INSERT + 1 UPDATE + 1 DELETE
    vals = [json.loads(r.value) for r in records]
    ops = sorted(v["operation"] for v in vals)
    assert ops == ["DELETE"] + ["INSERT"] * 3 + ["SNAPSHOT"] * 3 + ["UPDATE"]
    for r in records:
        hdr = {k: v for k, v in r.headers}
        assert hdr["table"] == b"users"
        assert hdr["operation"].decode() == json.loads(r.value)["operation"]
    # pk→partition stability: every record for one key sits on one partition
    with_part = {}
    for p in range(3):
        for rec in broker._logs[("users.test", p)].records:
            with_part.setdefault(bytes(rec.key), set()).add(p)
    assert all(len(parts) == 1 for parts in with_part.values())


def test_strict_order_wire_sink_preserves_wal_order(spark, tmp_path):
    """strict_order=True + single-partition topic ⇒ the consumer observes
    exact changelog (LSN) order — the reference's single-threaded listener
    contract over real wire bytes."""
    pipe = _pipeline(spark, str(tmp_path / "log"))
    with MiniBroker(num_partitions=1) as broker:
        cfg = KafkaProducerConfig(brokers=[broker.bootstrap])
        q = pipe.to_kafka_wire(
            cfg,
            str(tmp_path / "ckpt"),
            strict_order=True,
            trigger={"availableNow": True},
        )
        q.awaitTermination(120)
        records = broker.topic_records("users.test")

    ops = [json.loads(r.value)["operation"] for r in records]
    assert ops == ["SNAPSHOT"] * 3 + ["INSERT"] * 3 + ["UPDATE", "DELETE"]
    snap_keys = [bytes(r.key) for r in records[:3]]
    assert snap_keys == [b"1", b"2", b"3"]
    assert [r.offset for r in records] == list(range(8))


def test_write_kafka_wire_batch_helper(spark):
    df = spark.createDataFrame(
        [("t.batch", b"k1", b"v1"), ("t.batch", b"k2", b"v2")],
        "topic string, key binary, value binary",
    )
    with MiniBroker(num_partitions=2) as broker:
        cfg = KafkaProducerConfig(
            brokers=[broker.bootstrap], compression=Compression.GZIP
        )
        n = write_kafka_wire(df, cfg)
        got = sorted(
            (bytes(r.key), bytes(r.value)) for r in broker.topic_records("t.batch")
        )
    assert n == 2
    assert got == [(b"k1", b"v1"), (b"k2", b"v2")]


def test_wire_kwargs_loud_rejections():
    # TLS/SASL map through (see test_kafka_wire_security). Balancers all
    # map since round 8 (tests/test_kafka_balancers.py): RoundRobin is a
    # named wire strategy now, not a rejection.
    assert (
        KafkaProducerConfig(
            brokers=["b:9092"], balancer=Balancer.ROUND_ROBIN
        ).wire_kwargs()["balancer"]
        == "RoundRobin"
    )
    # the full reference codec surface now maps through (zstd was the last)
    from go_pq_cdc_kafka_spark.streaming import kafka_wire as kw

    assert (
        KafkaProducerConfig(
            brokers=["b:9092"], compression=Compression.ZSTD
        ).wire_kwargs()["compression"]
        == kw.COMPRESSION_ZSTD
    )


def test_wire_sink_failure_aborts_microbatch_no_commit(spark, tmp_path):
    """Broker down mid-stream ⇒ foreachBatch raises ⇒ checkpoint does not
    commit ⇒ restart replays the batch (at-least-once, B4). Then with the
    broker up, the SAME checkpoint delivers everything exactly once from the
    broker's point of view here (no prior successful produce to duplicate)."""
    pipe = _pipeline(spark, str(tmp_path / "log"))
    broker = MiniBroker(num_partitions=1).start()
    bootstrap = broker.bootstrap
    broker.stop()  # port now closed: produce must fail

    cfg = KafkaProducerConfig(brokers=[bootstrap], read_timeout_s=2.0)
    ckpt = str(tmp_path / "ckpt")
    q = pipe.to_kafka_wire(cfg, ckpt, trigger={"availableNow": True})
    with pytest.raises(Exception):
        q.awaitTermination(120)
        raise RuntimeError("query should have failed with broker down")
    assert q.exception() is not None

    # bring a broker back on the SAME port and resume from the checkpoint
    host, port = bootstrap.rsplit(":", 1)
    broker2 = MiniBroker(num_partitions=1, host=host, port=int(port)).start()
    try:
        pipe2 = CdcPipeline(
            source=cl.read_changelog_stream(spark, str(tmp_path / "log")),
            routing=RoutingTable({"public.users": "users.test"}),
            pk_field="id",
        )
        q2 = pipe2.to_kafka_wire(cfg, ckpt, trigger={"availableNow": True})
        q2.awaitTermination(120)
        records = broker2.topic_records("users.test")
        assert len(records) == 8  # full replay, no loss
    finally:
        broker2.stop()


def test_key_ordering_preserves_per_key_wal_order(spark, tmp_path):
    """ordering='key': every key's events land on ONE Kafka partition in
    LSN order even though the sink stays task-parallel — the reference's
    real delivery guarantee (single-threaded listener + key hashing),
    which the jar-backed sink cannot give across tasks."""
    import json

    import pyspark.sql.functions as F

    from go_pq_cdc_kafka_spark.envelope import insert_events, to_dynamic
    from go_pq_cdc_kafka_spark.streaming.kafka_wire import wire_balancer

    # 6 keys x 8 versions, LSNs interleaved across keys, written as 8
    # files so multiple tasks race on every key without the repartition
    rows = []
    lsn = 0
    for ver in range(8):
        for k in range(6):
            lsn += 1
            rows.append((k, f"v{ver}", lsn))
    base = spark.createDataFrame(rows, "id int, name string, lsn long")
    # lsn stays in the after-image (harmless for the assertions below)
    log = to_dynamic(insert_events(base, "users", lsn=F.col("lsn")))
    path = str(tmp_path / "log")
    cl.write_changelog(log, path, num_files=8)

    pipe = CdcPipeline(
        source=cl.read_changelog_stream(spark, path),
        routing=RoutingTable({"public.users": "users.keyed"}),
        pk_field="id",
    )
    with MiniBroker(num_partitions=4) as broker:
        q = pipe.to_kafka_wire(
            KafkaProducerConfig(brokers=[broker.bootstrap]),
            str(tmp_path / "ckpt"),
            ordering="key",
            trigger={"availableNow": True},
        )
        q.awaitTermination(120)
        by_key: dict = {}
        for p in range(4):
            for rec in broker._logs[("users.keyed", p)].records:
                by_key.setdefault(bytes(rec.key), []).append(
                    (p, json.loads(rec.value)["name"])
                )
    assert len(by_key) == 6
    hash_bal = wire_balancer("Hash")  # config default = kafka-go FNV-1a
    for key, seq in by_key.items():
        parts = {p for p, _ in seq}
        # one partition per key, at kafka-go's exact Hash placement
        assert parts == {hash_bal.partition(key, None, [0, 1, 2, 3])}
        assert [v for _, v in seq] == [f"v{i}" for i in range(8)]  # WAL order


def test_write_kafka_wire_snappy_e2e(spark):
    """compression=snappy through the from-spec block codec + xerial
    stream framing (what the Java clients emit), validated by the
    conformance broker's decode path (attributes bits, CRC32C over the
    compressed payload). Round-trips a payload big enough to span several
    32 KiB xerial blocks and compressible enough to exercise copies."""
    big = (b"abcdefgh" * 5000, b"x" * 70000, b"unique-tail-%d" % 7)
    df = spark.createDataFrame(
        [("t.snap", b"k%d" % i, v) for i, v in enumerate(big)],
        "topic string, key binary, value binary",
    )
    with MiniBroker(num_partitions=1) as broker:
        cfg = KafkaProducerConfig(
            brokers=[broker.bootstrap], compression=Compression.SNAPPY
        )
        n = write_kafka_wire(df, cfg)
        got = sorted(
            (bytes(r.key), bytes(r.value))
            for r in broker.topic_records("t.snap")
        )
    assert n == 3
    assert got == sorted((b"k%d" % i, v) for i, v in enumerate(big))


def test_snappy_xerial_framing_roundtrip_and_bare_block():
    from go_pq_cdc_kafka_spark.streaming.kafka_wire import (
        _XERIAL_MAGIC,
        _snappy_xerial_compress,
        _snappy_xerial_decompress,
    )

    data = b"the quick brown fox " * 4000 + bytes(range(256)) * 10
    framed = _snappy_xerial_compress(data)
    assert framed.startswith(_XERIAL_MAGIC)
    assert len(framed) < len(data) // 2  # actually compresses
    assert _snappy_xerial_decompress(framed) == data
    # bare-block fallback (non-java producers)
    from go_pq_cdc_kafka_spark.sources.avro import _snappy_compress

    assert _snappy_xerial_decompress(_snappy_compress(data)) == data
    with pytest.raises(ValueError, match="truncated"):
        _snappy_xerial_decompress(framed[:-3])


def test_write_kafka_wire_lz4_e2e(spark):
    """compression=lz4 through the from-spec block+frame codec (xxh32
    header checksum included), validated by the conformance broker's
    decode path. Payloads span compressible and incompressible shapes."""
    import os as _os

    big = (b"lz4lz4lz" * 6000, _os.urandom(30000), b"tail-%d" % 3)
    df = spark.createDataFrame(
        [("t.lz4", b"k%d" % i, v) for i, v in enumerate(big)],
        "topic string, key binary, value binary",
    )
    with MiniBroker(num_partitions=1) as broker:
        cfg = KafkaProducerConfig(
            brokers=[broker.bootstrap], compression=Compression.LZ4
        )
        n = write_kafka_wire(df, cfg)
        got = sorted(
            (bytes(r.key), bytes(r.value))
            for r in broker.topic_records("t.lz4")
        )
    assert n == 3
    assert got == sorted((b"k%d" % i, v) for i, v in enumerate(big))


def test_write_kafka_wire_zstd_e2e(spark):
    """compression=zstd through the from-spec RFC 8878 frame codec
    (raw-block frames + XXH64 checksum on produce; the broker's decode
    path handles any conforming frame), attributes bits 0x4. Closes the
    last wire-path codec gap vs the reference's config surface
    (config/config.go:59-64)."""
    import os as _os

    big = (b"zstdzstd" * 6000, _os.urandom(30000), b"tail-%d" % 4)
    df = spark.createDataFrame(
        [("t.zst", b"k%d" % i, v) for i, v in enumerate(big)],
        "topic string, key binary, value binary",
    )
    with MiniBroker(num_partitions=1) as broker:
        cfg = KafkaProducerConfig(
            brokers=[broker.bootstrap], compression=Compression.ZSTD
        )
        n = write_kafka_wire(df, cfg)
        got = sorted(
            (bytes(r.key), bytes(r.value))
            for r in broker.topic_records("t.zst")
        )
    assert n == 3
    assert got == sorted((b"k%d" % i, v) for i, v in enumerate(big))


def test_to_kafka_wire_eos_replay_contributes_nothing(spark, tmp_path):
    """Exactly-once across micro-batch replay: run the EOS streaming sink
    over a changelog, then re-run the SAME data with a FRESH checkpoint
    (the worst-case replay — every batch re-executes). The committed
    lineage watermarks staged via TxnOffsetCommit must mask the whole
    second pass: a read_committed audit sees every record exactly once,
    while the non-transactional sink would have doubled them."""
    import json

    import pyspark.sql.functions as F

    from go_pq_cdc_kafka_spark.envelope import insert_events, to_dynamic
    from go_pq_cdc_kafka_spark.streaming.kafka_wire import KafkaWireConsumer

    rows = [(i, f"v{i}", i + 100) for i in range(1, 41)]
    base = spark.createDataFrame(rows, "id int, name string, lsn long")
    log = to_dynamic(insert_events(base, "users", lsn=F.col("lsn")))
    path = str(tmp_path / "log")
    cl.write_changelog(log, path, num_files=4)

    def run(ck: str) -> None:
        pipe = CdcPipeline(
            source=cl.read_changelog_stream(spark, path),
            routing=RoutingTable({"public.users": "users.eos"}),
            pk_field="id",
        )
        q = pipe.to_kafka_wire_eos(
            KafkaProducerConfig(
                brokers=[broker.bootstrap],
                transactional_id="eos-replay-test",
                idempotent=True,
            ),
            ck,
            group="eos-replay-group",
            progress_partitions=8,
            trigger={"availableNow": True},
        )
        q.awaitTermination(120)

    with MiniBroker(num_partitions=4) as broker:
        run(str(tmp_path / "ckpt1"))
        run(str(tmp_path / "ckpt2"))  # full replay: fresh checkpoint
        seen: dict[int, int] = {}
        with KafkaWireConsumer(broker.bootstrap) as cons:
            for p in range(4):
                off = 0
                while True:
                    recs, hwm = cons.fetch(
                        "users.eos", p, offset=off, isolation_level=1
                    )
                    if not recs:
                        if off >= hwm:
                            break
                        off += 1
                        continue
                    for r in recs:
                        k = json.loads(bytes(r.value))["id"]
                        seen[int(k)] = seen.get(int(k), 0) + 1
                    off = recs[-1].offset + 1
    assert sorted(seen) == list(range(1, 41))
    assert all(v == 1 for v in seen.values()), {
        k: v for k, v in seen.items() if v != 1
    }
