"""Reference-config parity: a go-pq-cdc-kafka YAML config (the example/simple
+ example/snapshot shape, yaml keys per config/config.go:12-33) drives this
engine's routing, publication filter, snapshot config, and Kafka producer
options."""

import pyspark.sql.functions as F
import pytest

from go_pq_cdc_kafka_spark.config import ConnectorConfig, parse_go_duration
from go_pq_cdc_kafka_spark.envelope import insert_events, to_dynamic
from go_pq_cdc_kafka_spark.sources.snapshot import SnapshotMode
from go_pq_cdc_kafka_spark.streaming.kafka import Balancer, Compression

YAML_CFG = """
cdc:
  host: 127.0.0.1
  username: cdc_user
  password: cdc_pass
  database: cdc_db
  publication:
    createIfNotExists: true
    name: cdc_publication
    operations: [INSERT, UPDATE, DELETE]
    tables:
      - name: users
        replicaIdentity: Full
      - name: books
        replicaIdentity: Full
  slot:
    createIfNotExists: true
    name: cdc_slot
    slotActivityCheckerInterval: 3000
  snapshot:
    enabled: true
    mode: initial
    chunkSize: 1000
    claimTimeout: 30s
    heartbeatInterval: 5s
  metric:
    port: 8081
kafka:
  tableTopicMapping:
    public.users: users.0
    public.books: books.0
  brokers: ["localhost:19092"]
  allowAutoTopicCreation: true
  producerBatchTickerDuration: 200ms
  compression: 4
  balancer: RoundRobin
  requiredAcks: -1
  scramUsername: u
  scramPassword: p
  secureConnection: true
"""


def test_go_duration_parsing():
    assert parse_go_duration("200ms") == pytest.approx(0.2)
    assert parse_go_duration("1m30s") == pytest.approx(90.0)
    assert parse_go_duration("1.5h") == pytest.approx(5400.0)
    assert parse_go_duration(3_000_000_000) == pytest.approx(3.0)  # Go ns int
    assert parse_go_duration(None, 10.0) == 10.0
    with pytest.raises(ValueError):
        parse_go_duration("eleventy")


def test_yaml_config_round_trip(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(YAML_CFG)
    cfg = ConnectorConfig.from_yaml(str(p))

    assert cfg.cdc.database == "cdc_db"
    assert cfg.cdc.slot.name == "cdc_slot"
    assert cfg.cdc.publication.name == "cdc_publication"
    assert [t.name for t in cfg.cdc.publication.tables] == ["users", "books"]
    assert cfg.cdc.publication.tables[0].replica_identity == "FULL"
    assert cfg.cdc.snapshot.mode is SnapshotMode.INITIAL
    assert cfg.cdc.snapshot.chunk_size == 1000
    assert cfg.cdc.metric_port == 8081
    assert cfg.cdc.jdbc_url() == "jdbc:postgresql://127.0.0.1:5432/cdc_db"

    k = cfg.kafka
    assert k.brokers == ["localhost:19092"]
    assert k.producer_batch_ticker_duration_s == pytest.approx(0.2)
    assert k.compression is Compression.ZSTD
    assert k.balancer is Balancer.ROUND_ROBIN
    assert k.required_acks == -1
    opts = k.sink_options("/tmp/c")
    assert opts["kafka.acks"] == "all"
    assert opts["kafka.compression.type"] == "zstd"
    assert (
        opts["kafka.partitioner.class"]
        == "org.apache.kafka.clients.producer.RoundRobinPartitioner"
    )
    assert opts["kafka.security.protocol"] == "SASL_SSL"  # scram + secure

    assert cfg.routing().table_topic_mapping["public.users"] == "users.0"


def test_publication_filter_ops_and_tables(spark, tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(YAML_CFG)
    cfg = ConnectorConfig.from_yaml(str(p))

    users = spark.createDataFrame([(1, "A")], "id int, name string")
    cats = spark.createDataFrame([(9, "x")], "id int, tag string")
    log = (
        to_dynamic(insert_events(users, "users", lsn=F.lit(1)))
        .unionByName(to_dynamic(insert_events(cats, "cats", lsn=F.lit(2))))
        # TRUNCATE is NOT in the configured operations
        .unionByName(
            to_dynamic(insert_events(users, "users", lsn=F.lit(3))).withColumn(
                "op", F.lit("TRUNCATE")
            )
        )
    )
    kept = cfg.publication_filter(log).collect()
    assert [(r.table_name, r.op) for r in kept] == [("users", "INSERT")]


def test_full_reference_config_key_parity():
    """Every key in the reference's README configuration table round-trips
    (README.md:220-268); the four rarely-used ones added last: logger
    level, snapshot instanceId, inline rootCA/interCA PEM."""
    from go_pq_cdc_kafka_spark.config import ConnectorConfig

    cfg = ConnectorConfig.from_dict(
        {
            "cdc": {
                "host": "h",
                "username": "u",
                "password": "p",
                "database": "db",
                "logger": {"logLevel": "DEBUG"},
                "publication": {"name": "pub", "operations": ["INSERT"]},
                "slot": {"name": "s"},
                "snapshot": {
                    "enabled": True,
                    "mode": "initial",
                    "instanceId": "worker-7",
                },
            },
            "kafka": {
                "brokers": ["b:9092"],
                "tableTopicMapping": {"public.t": "t.cdc"},
                "secureConnection": True,
                "rootCA": "-----BEGIN CERTIFICATE-----\nAAA\n-----END CERTIFICATE-----",
                "interCA": "-----BEGIN CERTIFICATE-----\nBBB\n-----END CERTIFICATE-----",
            },
        }
    )
    assert cfg.cdc.log_level == "debug"
    assert cfg.cdc.snapshot.instance_id == "worker-7"
    opts = cfg.kafka.sink_options("/tmp/ckpt")
    assert opts["kafka.security.protocol"] == "SSL"
    assert opts["kafka.ssl.truststore.type"] == "PEM"
    # both CAs land in one inline PEM bundle
    assert "AAA" in opts["kafka.ssl.truststore.certificates"]
    assert "BBB" in opts["kafka.ssl.truststore.certificates"]
