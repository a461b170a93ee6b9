"""Streaming-tier tests mirroring the reference's E2E suite (SURVEY §5):
replay a deterministic change log, assert sink payloads; restart-recovery
mirrors TestConnector_AckMechanism (connector_test.go:416-648)."""

import json
import time

import pyspark.sql.functions as F
import pytest

from go_pq_cdc_kafka_spark.envelope import snapshot_events, to_dynamic
from go_pq_cdc_kafka_spark.plans.routing import RoutingTable
from go_pq_cdc_kafka_spark.sources import changelog as cl
from go_pq_cdc_kafka_spark.sources.snapshot import (
    SnapshotConfig,
    plan_partitions,
    snapshot_from_parquet,
)
from go_pq_cdc_kafka_spark.streaming.kafka import (
    Balancer,
    Compression,
    KafkaProducerConfig,
    parse_size,
)
from go_pq_cdc_kafka_spark.streaming.metrics import EngineMetrics, MetricsServer
from go_pq_cdc_kafka_spark.streaming.pipeline import CdcPipeline


def users(spark, start=1, n=5):
    return spark.range(start, start + n).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("User-"), F.col("id")).alias("name"),
    )


ROUTING = RoutingTable({"public.users": "users.test"})


def test_snapshot_only_batch_pipeline(spark, sf_dir):
    """snapshot_only mode (connector.go:80-94): bounded scan → records."""
    src = snapshot_from_parquet(spark, f"{sf_dir}/customer.parquet", "customer")
    pipe = CdcPipeline(
        source=src,
        routing=RoutingTable({"public.customer": "customer.snap"}),
        pk_field="c_custkey",
    )
    recs = pipe.run_batch().collect()
    n = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert len(recs) == n
    assert all(r.topic == "customer.snap" for r in recs)
    payload = json.loads(bytes(recs[0].value))
    assert payload["operation"] == "SNAPSHOT"


def test_changelog_replay_to_memory(spark, tmp_path):
    """insert/update/delete/snapshot replay ⇒ correct per-op payload counts
    (mirrors TestConnector_{Insert,Update,Delete}Operation +
    TestConnector_SnapshotMode)."""
    base = users(spark, 1, 10)  # pk 1..10
    log = cl.generate_table_changelog(base, "id", "users")
    path = str(tmp_path / "log")
    cl.write_changelog(log, path, num_files=3)

    pipe = CdcPipeline(
        source=cl.read_changelog_stream(spark, path),
        routing=ROUTING,
        pk_field="id",
    )
    q = pipe.to_memory("replay_sink")
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("select * from replay_sink").collect()
    ops = {}
    for r in rows:
        op = json.loads(bytes(r.value))["operation"]
        ops[op] = ops.get(op, 0) + 1
    # 10 snapshots, 10 inserts (re-keyed), updates for id%10==0 → 1,
    # deletes for id%7==0 → 1
    assert ops == {"SNAPSHOT": 10, "INSERT": 10, "UPDATE": 1, "DELETE": 1}
    headers = {h.key: bytes(h.value).decode() for h in rows[0].headers}
    assert set(headers) == {"operation", "table", "source"}


def test_restart_recovery_exactly_once(spark, tmp_path):
    """The ack-mechanism test (connector_test.go:416-648) re-expressed:
    batch 1 processed and committed → pipeline down → batch 2 arrives →
    restart from the same checkpoint → exactly 10 keys, no dupes, no loss."""
    path = str(tmp_path / "log")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = to_dynamic(snapshot_events(users(spark, 1, 5), "users", lsn=F.col("id")))
    cl.write_changelog(batch1, path, num_files=2)

    def run_until_drained():
        pipe = CdcPipeline(
            source=cl.read_changelog_stream(spark, path),
            routing=ROUTING,
            pk_field="id",
        )
        q = pipe.to_parquet(out, ckpt)
        q.processAllAvailable()
        q.stop()

    run_until_drained()
    assert spark.read.parquet(out).count() == 5

    # connector down; 5 more rows arrive
    batch2 = to_dynamic(snapshot_events(users(spark, 6, 5), "users", lsn=F.col("id")))
    cl.append_batch(batch2, path)

    run_until_drained()  # restart from same checkpoint
    result = spark.read.parquet(out)
    keys = [bytes(r.key).decode() for r in result.collect()]
    assert len(keys) == 10 and len(set(keys)) == 10  # no loss, no dupes


def test_metrics_listener(spark, tmp_path):
    m = EngineMetrics()
    spark.streams.addListener(m)
    try:
        base = users(spark, 1, 4)
        log = cl.generate_table_changelog(base, "id", "users")
        path = str(tmp_path / "log")
        cl.write_changelog(log, path, num_files=2)
        pipe = CdcPipeline(
            source=cl.read_changelog_stream(spark, path),
            routing=ROUTING,
            pk_field="id",
        )
        q = pipe.to_memory("metrics_sink")
        q.processAllAvailable()
        q.stop()
        deadline = time.time() + 10
        while time.time() < deadline and not m.counters:
            time.sleep(0.2)
        text = m.prometheus_text()
        assert "go_pq_cdc_kafka_spark_query_started_total" in text
        assert m.status()["counters"]
    finally:
        spark.streams.removeListener(m)


def test_kafka_config_parity():
    """config/config.go defaults + option mapping."""
    cfg = KafkaProducerConfig(brokers=["b1:9092", "b2:9092"])
    assert cfg.producer_batch_size == 2000  # config/config.go:70-72
    assert parse_size(cfg.producer_batch_bytes) == 1 << 20  # "1mb"
    assert cfg.producer_batch_ticker_duration_s == 10.0
    assert cfg.required_acks == 1
    opts = cfg.sink_options("/tmp/ckpt")
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["kafka.acks"] == "1"
    assert opts["kafka.compression.type"] == "none"
    assert opts["checkpointLocation"] == "/tmp/ckpt"
    assert cfg.trigger_kwargs() == {"processingTime": "10.0 seconds"}

    scram = KafkaProducerConfig(
        brokers=["b:9092"],
        sasl_enabled=True,
        tls_enabled=True,
        sasl_username="u",
        sasl_password="p",
        compression=Compression.ZSTD,
        required_acks=-1,
    )
    o = scram.sink_options("/tmp/c")
    assert o["kafka.security.protocol"] == "SASL_SSL"
    assert "SCRAM-SHA-512" == o["kafka.sasl.mechanism"]
    assert o["kafka.compression.type"] == "zstd"
    assert o["kafka.acks"] == "all"


def test_metrics_http_endpoints(spark, tmp_path):
    """The reference HTTP API (README.md:272-276): /metrics serves Prometheus
    text; /status answers 200 while the source is healthy, 503 after."""
    import urllib.error
    import urllib.request

    m = EngineMetrics()
    spark.streams.addListener(m)
    srv = None
    try:
        base = users(spark, 1, 4)
        log = cl.generate_table_changelog(base, "id", "users")
        path = str(tmp_path / "log")
        cl.write_changelog(log, path, num_files=2)
        pipe = CdcPipeline(
            source=cl.read_changelog_stream(spark, path),
            routing=ROUTING,
            pk_field="id",
        )
        q = pipe.to_memory("http_metrics_sink")
        srv = MetricsServer(m, readiness=lambda: q.isActive).start()
        q.processAllAvailable()
        deadline = time.time() + 10
        while time.time() < deadline and not m.counters:
            time.sleep(0.2)

        url = f"http://127.0.0.1:{srv.port}"
        text = urllib.request.urlopen(f"{url}/metrics").read().decode()
        assert "go_pq_cdc_kafka_spark_query_started_total" in text
        assert "# TYPE" in text  # Prometheus exposition format

        st = json.loads(urllib.request.urlopen(f"{url}/status").read())
        assert st["ready"] is True and st["counters"]

        q.stop()
        with pytest.raises(urllib.error.HTTPError) as not_ready:
            urllib.request.urlopen(f"{url}/status")
        assert not_ready.value.code == 503
        with pytest.raises(urllib.error.HTTPError) as missing:
            urllib.request.urlopen(f"{url}/nope")
        assert missing.value.code == 404
    finally:
        if srv is not None:
            srv.stop()
        spark.streams.removeListener(m)


def test_balancer_partitioner_parity():
    """config/config.go:40-57 GetBalancer, over every enum member: mappable
    balancers set kafka.partitioner.class (or use the client default);
    unmappable ones raise at config time like the reference's panic."""
    default_opts = KafkaProducerConfig(brokers=["b"]).sink_options("/c")
    assert "kafka.partitioner.class" not in default_opts  # HASH → client default

    m2 = KafkaProducerConfig(brokers=["b"], balancer=Balancer.MURMUR2)
    assert "kafka.partitioner.class" not in m2.sink_options("/c")

    rr = KafkaProducerConfig(brokers=["b"], balancer=Balancer.ROUND_ROBIN)
    assert (
        rr.sink_options("/c")["kafka.partitioner.class"]
        == "org.apache.kafka.clients.producer.RoundRobinPartitioner"
    )

    for unmappable in (Balancer.LEAST_BYTES, Balancer.REFERENCE_HASH, Balancer.CRC32):
        cfg = KafkaProducerConfig(brokers=["b"], balancer=unmappable)
        with pytest.raises(ValueError):
            cfg.sink_options("/c")


def test_checkpoint_guard_refuses_second_writer(spark, tmp_path):
    """One checkpoint dir admits one writer (the reference's slot-takeover
    rule, README.md:36-42): a concurrent second pipeline raises; after the
    first stops, the checkpoint is free again."""
    path = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    base = users(spark, 1, 6)
    cl.write_changelog(cl.generate_table_changelog(base, "id", "users"), path)

    def pipe():
        return CdcPipeline(
            source=cl.read_changelog_stream(spark, path),
            routing=ROUTING,
            pk_field="id",
        )

    q1 = pipe().to_parquet(str(tmp_path / "out1"), ckpt)
    try:
        with pytest.raises(RuntimeError, match="active writer"):
            pipe().to_parquet(str(tmp_path / "out2"), ckpt)
    finally:
        q1.processAllAvailable()
        q1.stop()

    # takeover after the holder stops
    q2 = pipe().to_parquet(str(tmp_path / "out1"), ckpt)
    q2.processAllAvailable()
    q2.stop()


def test_size_parsing_reference_styles():
    """internal/bytes/bytes.go:57-82 capability."""
    assert parse_size("1mb") == 1048576
    assert parse_size("512KB") == 524288
    assert parse_size("2gb") == 2147483648
    assert parse_size("100") == 100
    assert parse_size(42) == 42
    with pytest.raises(ValueError):
        parse_size("1parsec")


def test_snapshot_chunk_planning():
    """README.md:242-248: chunkSize 8000 default → partition count."""
    assert plan_partitions(50, SnapshotConfig().chunk_size) == 1
    assert plan_partitions(16001, 8000) == 3
    assert plan_partitions(10**9, 8000, max_partitions=2000) == 2000


def test_snapshot_jdbc_dry_run_pins_reader_options(spark):
    """No Postgres exists in the sandbox, so pin the EXACT options
    snapshot_from_jdbc hands Spark's JDBC reader for a given chunk plan
    (the reference's chunked-scan contract, README.md:242-248): partition
    column = pk, bounds = caller's key range, numPartitions = ceil(rows /
    chunk_size), Postgres driver class. A fake reader records the call and
    returns a real DataFrame so the envelope lineage downstream stays the
    production one."""
    from go_pq_cdc_kafka_spark.sources.snapshot import (
        SnapshotConfig,
        snapshot_from_jdbc,
    )

    rows_df = spark.createDataFrame([(1, "A"), (2, "B")], "id long, name string")
    calls = []

    class RecordingReader:
        def jdbc(self, **kw):
            calls.append(kw)
            return rows_df

    class FakeSpark:
        read = RecordingReader()

    events = snapshot_from_jdbc(
        FakeSpark(),
        url="jdbc:postgresql://db:5432/orders",
        table="public.users",
        pk_col="id",
        lower=1,
        upper=16001,
        row_count=16001,
        cfg=SnapshotConfig(chunk_size=8000),
        properties={"user": "repl"},
    )
    assert calls == [
        {
            "url": "jdbc:postgresql://db:5432/orders",
            "table": "public.users",
            "column": "id",
            "lowerBound": 1,
            "upperBound": 16001,
            "numPartitions": 3,  # ceil(16001 / 8000) — the chunk contract
            "properties": {"driver": "org.postgresql.Driver", "user": "repl"},
        }
    ]
    # the fake rows flowed through the real SNAPSHOT envelope lineage
    got = events.collect()
    assert {r.op for r in got} == {"SNAPSHOT"}
    assert {r.table_name for r in got} == {"users"}
    assert sorted(int(r.after["id"]) for r in got) == [1, 2]


def test_idempotent_sink_effectively_once_and_partial_invisibility(spark, tmp_path):
    """foreach_batch_idempotent_parquet: a replayed batchId is a no-op (the
    effectively-once upgrade over plain appends), a partial directory
    without its marker is invisible to readers, and the replay of a
    crashed batch overwrites the partial output."""
    import os

    from go_pq_cdc_kafka_spark.streaming import sinks as SK

    out = str(tmp_path / "eo_out")
    write = SK.foreach_batch_idempotent_parquet(out)
    b0 = spark.range(5).selectExpr("id", "id * 2 AS v")
    b1 = spark.range(5, 8).selectExpr("id", "id * 2 AS v")

    write(b0, 0)
    write(b1, 1)
    write(b0, 0)  # checkpoint replay of batch 0: must not duplicate
    got = SK.read_committed(spark, out)
    assert got.count() == 8
    assert got.select("batch").distinct().count() == 2

    # crash mid-batch-2: files land but no marker → invisible to readers
    partial = os.path.join(out, "batch=2")
    spark.range(100).write.mode("overwrite").parquet(partial)
    assert SK.read_committed(spark, out).count() == 8
    # the replay overwrites the partial directory and commits it
    write(spark.range(8, 10).selectExpr("id", "id * 2 AS v"), 2)
    assert SK.read_committed(spark, out).count() == 10


def test_available_now_catchup_drains_then_stops_and_resumes(spark, tmp_path):
    """Trigger(availableNow): the operational catch-up mode — drain
    everything the source has, terminate on its own, and a later run from
    the same checkpoint picks up ONLY what arrived in between. This is
    how a periodic (cron) backfill job runs the same pipeline code the
    24/7 stream uses."""
    import pyspark.sql.functions as F

    from go_pq_cdc_kafka_spark.sources import changelog as cl

    users = spark.range(1, 6).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("U"), F.col("id")).alias("name"),
    )
    from go_pq_cdc_kafka_spark.streaming import sinks as SK

    log_dir = str(tmp_path / "log")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    log = cl.generate_table_changelog(users, "id", "users")
    cl.write_changelog(log, log_dir, num_files=2)
    total = log.count()

    def drain() -> int:
        q = (
            cl.read_changelog_stream(spark, log_dir)
            .writeStream.foreachBatch(SK.foreach_batch_idempotent_parquet(out))
            .trigger(availableNow=True)
            .option("checkpointLocation", ck)
            .start()
        )
        assert q.awaitTermination(120), "availableNow query failed to stop"
        return SK.read_committed(spark, out).count()

    assert drain() == total

    # nothing new: second catch-up run lands nothing further
    assert drain() == total

    # append more change files; third run picks up exactly those
    more = spark.range(100, 103).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("V"), F.col("id")).alias("name"),
    )
    log2 = cl.generate_table_changelog(more, "id", "users").withColumn(
        "lsn", F.col("lsn") + 10_000
    )
    # append without clobbering the existing range files
    log2.coalesce(1).write.mode("append").parquet(log_dir)
    assert drain() == total + log2.count()


def test_vacuum_uncommitted_removes_only_old_markerless_dirs(spark, tmp_path):
    import os
    import time

    from go_pq_cdc_kafka_spark.streaming import sinks as SK

    out = str(tmp_path / "out")
    for bid, committed in ((0, True), (1, False), (2, False)):
        d = os.path.join(out, f"batch={bid}")
        os.makedirs(d)
        with open(os.path.join(d, "part-0.parquet"), "w") as f:
            f.write("x")
        if committed:
            open(os.path.join(d, "_COMMITTED"), "w").close()
    # age batch=1 past the cutoff; batch=2 stays fresh (in-flight)
    old = time.time() - 7200
    os.utime(os.path.join(out, "batch=1"), (old, old))

    removed = SK.vacuum_uncommitted(out, min_age_seconds=3600)
    assert removed == [os.path.join(out, "batch=1")]
    assert sorted(os.listdir(out)) == ["batch=0", "batch=2"]
