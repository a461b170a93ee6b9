"""Live-Kafka integration tier: the record contract the fake-producer test
(tests/test_strict_order.py) pins, written through Spark's real Kafka sink
and read back. Gated on ``SPARK_GRAFT_LIVE_KAFKA`` (broker list); also
needs the spark-sql-kafka connector on the classpath (skips loudly if
absent — the sandbox ships without it).
"""

import json
import os
import uuid

import pytest

BROKERS = os.environ.get("SPARK_GRAFT_LIVE_KAFKA")
pytestmark = pytest.mark.skipif(
    not BROKERS, reason="SPARK_GRAFT_LIVE_KAFKA not set"
)


def _write_kafka(df, opts):
    try:
        (df.write.format("kafka").options(**opts).save())
    except Exception as e:  # pragma: no cover - classpath-dependent
        if "kafka" in str(e).lower() and (
            "Failed to find data source" in str(e) or "ClassNotFound" in str(e)
        ):
            pytest.skip(
                "spark-sql-kafka connector not on the classpath; set "
                "PYSPARK_SUBMIT_ARGS='--packages "
                "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-ver> "
                "pyspark-shell'"
            )
        raise


def test_live_kafka_record_roundtrip(spark):
    """CDC records (topic/key/value/headers) produced through the engine's
    KafkaProducerConfig option mapping land on a real broker and read back
    byte-identical."""
    from go_pq_cdc_kafka_spark.streaming.kafka import KafkaProducerConfig

    topic = f"sg_live_{uuid.uuid4().hex[:8]}"
    cfg = KafkaProducerConfig(
        brokers=BROKERS.split(","), allow_auto_topic_creation=True
    )
    opts = cfg.sink_options(checkpoint_location="unused")
    opts.pop("checkpointLocation")  # batch write needs no checkpoint

    payload = json.dumps({"operation": "INSERT", "id": 1}).encode()
    df = spark.createDataFrame(
        [(topic, b"key-1", payload)], "topic string, key binary, value binary"
    )
    _write_kafka(df, opts)

    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
        .collect()
    )
    assert len(back) == 1
    assert bytes(back[0].key) == b"key-1"
    assert json.loads(bytes(back[0].value)) == {"operation": "INSERT", "id": 1}


def test_live_kafka_pipeline_end_to_end(spark, tmp_path):
    """Full lineage against live infra: envelope fixture → handler →
    routing → records → real broker, exactly the reference's E2E
    (integration_test/connector_test.go publish path)."""
    from go_pq_cdc_kafka_spark.plans.routing import RoutingTable
    from go_pq_cdc_kafka_spark.sources.snapshot import snapshot_from_parquet
    from go_pq_cdc_kafka_spark.streaming.kafka import KafkaProducerConfig
    from go_pq_cdc_kafka_spark.streaming.pipeline import CdcPipeline

    topic = f"sg_pipe_{uuid.uuid4().hex[:8]}"
    src = snapshot_from_parquet(
        spark, "/root/testdata/sf0.001/nation.parquet", "nation"
    )
    pipe = CdcPipeline(
        source=src,
        routing=RoutingTable({"public.nation": topic}),
        pk_field="n_nationkey",
    )
    records = pipe.run_batch()
    n = records.count()
    assert n == 25

    cfg = KafkaProducerConfig(
        brokers=BROKERS.split(","), allow_auto_topic_creation=True
    )
    opts = cfg.sink_options(checkpoint_location="unused")
    opts.pop("checkpointLocation")
    _write_kafka(records, opts)

    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
        .collect()
    )
    assert len(back) == n
    ops = {json.loads(bytes(r.value))["operation"] for r in back}
    assert ops == {"SNAPSHOT"}


def test_live_kafka_wire_producer_roundtrip_real_broker():
    """The from-scratch wire client against a REAL broker (no Spark jar
    involved): produce with CRC32C record batches + murmur2 placement,
    read back through real Fetch frames."""
    import uuid as _uuid

    from go_pq_cdc_kafka_spark.streaming.kafka_wire import (
        KafkaWireConsumer,
        KafkaWireProducer,
    )

    topic = f"sg_wire_{_uuid.uuid4().hex[:8]}"
    with KafkaWireProducer(BROKERS.split(",")) as prod:
        offsets = prod.send_records(
            [
                (topic, b"k1", b"v1", [("h", b"x")]),
                (topic, b"k1", b"v2", []),
            ]
        )
    assert offsets
    with KafkaWireConsumer(BROKERS.split(",")) as cons:
        got = cons.read_all(topic)
    assert [r.value for r in got] == [b"v1", b"v2"]  # same key: one partition
    assert got[0].headers == [("h", b"x")]


def test_live_kafka_wire_source_reads_real_broker(spark):
    """The kafkawire Spark source against a real broker."""
    import uuid as _uuid

    from go_pq_cdc_kafka_spark.sources import kafka_source as KS
    from go_pq_cdc_kafka_spark.streaming.kafka_wire import KafkaWireProducer

    topic = f"sg_wsrc_{_uuid.uuid4().hex[:8]}"
    with KafkaWireProducer(BROKERS.split(",")) as prod:
        prod.send_records([(topic, b"k", f"v{i}".encode(), []) for i in range(5)])
    KS.register(spark)
    rows = (
        spark.read.format("kafkawire")
        .option("bootstrap", BROKERS)
        .option("topic", topic)
        .load()
        .collect()
    )
    assert sorted(bytes(r.value) for r in rows) == [b"v0", b"v1", b"v2", b"v3", b"v4"]
