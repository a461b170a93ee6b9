"""Reference-config loader: run a go-pq-cdc-kafka deployment's config here.

A user of the reference drives it with a ``config.Connector`` value —
CDC connection + publication + slot + snapshot + metric settings
(go-pq-cdc's config surface, example/simple/main.go:51-98) and a Kafka
producer block whose YAML keys are pinned in config/config.go:12-33. This
module parses that same YAML/JSON shape into this engine's pieces:

- ``kafka`` → :class:`~go_pq_cdc_kafka_spark.streaming.kafka.KafkaProducerConfig`
- ``cdc.publication`` → an envelope filter (operations + tables, S3)
- ``kafka.tableTopicMapping`` → :class:`~go_pq_cdc_kafka_spark.plans.routing.RoutingTable`
- ``cdc.snapshot`` → :class:`~go_pq_cdc_kafka_spark.sources.snapshot.SnapshotConfig`
- ``cdc.metric.port`` → the :class:`MetricsServer` port

Durations accept Go syntax ("200ms", "1m30s") or raw integers
(nanoseconds, Go's ``time.Duration`` serialization) — both occur in real
config files.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from go_pq_cdc_kafka_spark.plans.routing import RoutingTable
from go_pq_cdc_kafka_spark.sources.snapshot import SnapshotConfig, SnapshotMode
from go_pq_cdc_kafka_spark.streaming.kafka import (
    Balancer,
    Compression,
    KafkaProducerConfig,
)

_GO_DUR = re.compile(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h)")
_DUR_S = {"ns": 1e-9, "us": 1e-6, "µs": 1e-6, "ms": 1e-3, "s": 1.0, "m": 60.0, "h": 3600.0}


def parse_go_duration(v, default_s: float = 0.0) -> float:
    """Go time.Duration → seconds: "200ms"/"1m30s" strings, or a bare int
    (nanoseconds — how Go serializes Duration to YAML/JSON numbers)."""
    if v is None:
        return default_s
    if isinstance(v, (int, float)):
        return float(v) / 1e9
    parts = _GO_DUR.findall(str(v))
    if not parts:
        raise ValueError(f"unparseable Go duration: {v!r}")
    return sum(float(n) * _DUR_S[u] for n, u in parts)


#: publication.Operations values → envelope op names.
_PUB_OPS = {
    "INSERT": "INSERT",
    "UPDATE": "UPDATE",
    "DELETE": "DELETE",
    "TRUNCATE": "TRUNCATE",
}


@dataclass
class PublicationTable:
    name: str
    replica_identity: str = "DEFAULT"  # FULL | DEFAULT | NOTHING | INDEX
    namespace: str = "public"


@dataclass
class PublicationConfig:
    name: str = ""
    create_if_not_exists: bool = False
    operations: list[str] = field(default_factory=lambda: list(_PUB_OPS))
    tables: list[PublicationTable] = field(default_factory=list)


@dataclass
class SlotConfig:
    name: str = ""
    create_if_not_exists: bool = False
    activity_checker_interval_ms: int = 1000


@dataclass
class CdcSourceConfig:
    host: str = "127.0.0.1"
    port: int = 5432
    username: str = ""
    password: str = ""
    database: str = ""
    debug_mode: bool = False
    log_level: str = "info"  # cdc.logger.logLevel (README.md:231)
    publication: PublicationConfig = field(default_factory=PublicationConfig)
    slot: SlotConfig = field(default_factory=SlotConfig)
    snapshot: SnapshotConfig = field(default_factory=SnapshotConfig)
    metric_port: int | None = None

    def jdbc_url(self) -> str:
        return f"jdbc:postgresql://{self.host}:{self.port}/{self.database}"


@dataclass
class ConnectorConfig:
    cdc: CdcSourceConfig
    kafka: KafkaProducerConfig

    # -- the engine-facing projections --------------------------------------

    def routing(self) -> RoutingTable:
        return RoutingTable(dict(self.kafka.table_topic_mapping))

    def publication_filter(self, df: DataFrame) -> DataFrame:
        """S3 publication semantics as a plan-side predicate: only the
        configured operations and tables pass (SNAPSHOT always passes — it
        is produced by the snapshot path, not the publication)."""
        ops = [
            _PUB_OPS[o.upper()] for o in self.cdc.publication.operations
        ] + ["SNAPSHOT"]
        out = df.filter(F.col("op").isin(ops))
        tables = self.cdc.publication.tables
        if tables:
            full = [f"{t.namespace}.{t.name}" for t in tables]
            out = out.filter(
                F.concat_ws(
                    ".", F.col("table_namespace"), F.col("table_name")
                ).isin(full)
            )
        return out

    # -- parsing ------------------------------------------------------------

    @classmethod
    def from_dict(cls, d: dict) -> "ConnectorConfig":
        c = d.get("cdc", d.get("CDC", {})) or {}
        k = d.get("kafka", {}) or {}

        pub = c.get("publication", {}) or {}
        tables = [
            PublicationTable(
                name=t["name"],
                replica_identity=str(t.get("replicaIdentity", "DEFAULT")).upper(),
                namespace=t.get("namespace", "public"),
            )
            for t in pub.get("tables", []) or []
        ]
        snap = c.get("snapshot", {}) or {}
        cdc_cfg = CdcSourceConfig(
            host=c.get("host", "127.0.0.1"),
            port=int(c.get("port", 5432)),
            username=c.get("username", ""),
            password=c.get("password", ""),
            database=c.get("database", ""),
            debug_mode=bool(c.get("debugMode", False)),
            log_level=str(
                (c.get("logger", {}) or {}).get("logLevel", "info")
            ).lower(),
            publication=PublicationConfig(
                name=pub.get("name", ""),
                create_if_not_exists=bool(pub.get("createIfNotExists", False)),
                operations=[str(o) for o in pub.get("operations", list(_PUB_OPS))],
                tables=tables,
            ),
            slot=SlotConfig(
                name=(c.get("slot", {}) or {}).get("name", ""),
                create_if_not_exists=bool(
                    (c.get("slot", {}) or {}).get("createIfNotExists", False)
                ),
                activity_checker_interval_ms=int(
                    (c.get("slot", {}) or {}).get("slotActivityCheckerInterval", 1000)
                ),
            ),
            snapshot=SnapshotConfig(
                mode=SnapshotMode(str(snap.get("mode", "never")).lower())
                if snap.get("enabled", False)
                else SnapshotMode.NEVER,
                chunk_size=int(snap.get("chunkSize", 8000)),
                heartbeat_interval_s=int(
                    parse_go_duration(snap.get("heartbeatInterval"), 5.0)
                ),
                claim_timeout_s=int(parse_go_duration(snap.get("claimTimeout"), 30.0)),
                instance_id=snap.get("instanceId"),
            ),
            metric_port=(c.get("metric", {}) or {}).get("port"),
        )

        kafka_cfg = KafkaProducerConfig(
            brokers=list(k.get("brokers", [])),
            table_topic_mapping=dict(k.get("tableTopicMapping", {})),
            producer_batch_size=int(k.get("producerBatchSize", 2000)),
            producer_batch_bytes=k.get("producerBatchBytes", "1mb"),
            producer_batch_ticker_duration_s=parse_go_duration(
                k.get("producerBatchTickerDuration"), 10.0
            ),
            required_acks=int(k.get("requiredAcks", 1)),
            max_attempts=int(k.get("producerMaxAttempts", 3)),
            read_timeout_s=parse_go_duration(k.get("readTimeout"), 30.0),
            write_timeout_s=parse_go_duration(k.get("writeTimeout"), 30.0),
            compression=Compression(int(k.get("compression", 0))),
            balancer=Balancer(k["balancer"]) if k.get("balancer") else Balancer.HASH,
            metadata_ttl_s=parse_go_duration(k.get("metadataTTL"), 60.0),
            metadata_topics=list(k.get("metadataTopics", [])),
            allow_auto_topic_creation=bool(k.get("allowAutoTopicCreation", False)),
            client_id=k.get("clientID", "go-pq-cdc-kafka-spark"),
            sasl_enabled=bool(k.get("scramUsername")),
            sasl_username=k.get("scramUsername", ""),
            sasl_password=k.get("scramPassword", ""),
            tls_enabled=bool(k.get("secureConnection", False)),
            root_ca_pem=k.get("rootCA"),
            inter_ca_pem=k.get("interCA"),
        )
        return cls(cdc=cdc_cfg, kafka=kafka_cfg)

    @classmethod
    def from_yaml(cls, path: str) -> "ConnectorConfig":
        import yaml

        with open(path, "r", encoding="utf-8") as f:
            return cls.from_dict(yaml.safe_load(f))

    @classmethod
    def from_json(cls, path: str) -> "ConnectorConfig":
        with open(path, "r", encoding="utf-8") as f:
            return cls.from_dict(json.load(f))
