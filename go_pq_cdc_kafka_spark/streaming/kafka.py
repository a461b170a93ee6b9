"""Kafka sink configuration — the reference's producer config surface
(config/config.go:1-98, kafka/client.go:36-125) mapped onto the Spark Kafka
sink's ``kafka.*`` producer options.

Reference batching (B2, producer_batch.go:73-104) is a triple trigger:
flush at ≥ producerBatchSize messages OR ≥ producerBatchBytes OR on a ticker.
Spark's equivalents:

- ticker               → ``trigger(processingTime=...)`` per micro-batch
- byte cap             → producer ``kafka.batch.size`` / ``kafka.max.request.size``
- count cap            → micro-batch size (``maxOffsetsPerTrigger`` /
                         ``maxFilesPerTrigger`` on the source side) + producer
                         batching; the broker write itself is already batched
- ack coalescing (B4)  → the checkpoint commit: offsets are committed only
                         after the sink succeeds, one commit per micro-batch —
                         the same at-least-once contract as the reference's
                         single ``Ack()`` per flush (producer_batch.go:141-151)

Delivery-level options (B8) pass through as ``kafka.*`` producer settings.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum, IntEnum


class Compression(IntEnum):
    """0..4 wire order matches the reference enum (config/config.go:59-64)."""

    NONE = 0
    GZIP = 1
    SNAPPY = 2
    LZ4 = 3
    ZSTD = 4

    @property
    def kafka_name(self) -> str:
        return ["none", "gzip", "snappy", "lz4", "zstd"][int(self)]


class Balancer(str, Enum):
    """Partitioner selection (config/config.go:40-57 GetBalancer). The Spark
    sink produces through the Java client, so each member either maps to a
    Java-client partitioner or is rejected loudly (matching the reference's
    panic on an invalid balancer):

    - HASH (the reference default, kafka-go FNV-1a on key) → Java default
      partitioner. The hash FUNCTION differs (murmur2), so a key may land on
      a different partition NUMBER than kafka-go would pick, but the contract
      the reference documents — stable key→partition, per-key ordering —
      holds identically.
    - MURMUR2 (kafka-go's Java-compat balancer) → Java default partitioner,
      byte-for-byte the same placement.
    - ROUND_ROBIN → org.apache.kafka.clients.producer.RoundRobinPartitioner.
    - LEAST_BYTES / REFERENCE_HASH / CRC32 have no Java-client equivalent
      (kafka-go-only / librdkafka-compat): ValueError at config time on the
      JVM sink, not a silent fallback to a different placement policy. The
      WIRE sink (to_kafka_wire) implements all three from kafka-go's
      public algorithms — kafka_wire.WIRE_BALANCERS — so a migrating
      config that names them keeps its exact placement there."""

    HASH = "Hash"
    LEAST_BYTES = "LeastBytes"
    ROUND_ROBIN = "RoundRobin"
    REFERENCE_HASH = "ReferenceHash"
    CRC32 = "CRC32Balancer"
    MURMUR2 = "Murmur2Balancer"

    @property
    def partitioner_class(self) -> str | None:
        """Value for ``kafka.partitioner.class`` (None = client default);
        raises for members the Java client cannot express."""
        if self in (Balancer.HASH, Balancer.MURMUR2):
            return None  # Java default partitioner: murmur2 on key
        if self is Balancer.ROUND_ROBIN:
            return "org.apache.kafka.clients.producer.RoundRobinPartitioner"
        raise ValueError(
            f"balancer {self.value!r} has no Java-client partitioner; "
            "use Hash/Murmur2Balancer/RoundRobin, or implement a custom "
            "org.apache.kafka.clients.producer.Partitioner and set "
            "kafka.partitioner.class yourself"
        )


_SIZE_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(b|kb|mb|gb|tb)?\s*$", re.IGNORECASE)
_MULT = {"b": 1, "kb": 1 << 10, "mb": 1 << 20, "gb": 1 << 30, "tb": 1 << 40}


def parse_size(s: str | int) -> int:
    """'1mb'-style size strings (capability of internal/bytes/bytes.go:57-82)."""
    if isinstance(s, int):
        return s
    m = _SIZE_RE.match(s)
    if not m:
        raise ValueError(f"unparseable size: {s!r}")
    num, unit = m.groups()
    return int(float(num) * _MULT[(unit or "b").lower()])


@dataclass
class KafkaProducerConfig:
    """Field-for-field parity with the reference Kafka config
    (config/config.go; defaults applied in SetDefault, config/config.go:66-98)."""

    brokers: list[str] = field(default_factory=list)
    table_topic_mapping: dict[str, str] = field(default_factory=dict)
    producer_batch_size: int = 2000            # default, config/config.go:70-72
    producer_batch_bytes: str | int = "1mb"    # default, config/config.go:76-78
    producer_batch_ticker_duration_s: float = 10.0  # default, config/config.go:73-75
    required_acks: int = 1                     # default, config/config.go:87-89
    max_attempts: int = 3
    read_timeout_s: float = 30.0
    write_timeout_s: float = 30.0
    compression: Compression = Compression.NONE
    balancer: Balancer = Balancer.HASH
    # KIP-98 idempotent produce: broker-side dedup of replayed batches —
    # stronger than the reference's at-least-once replay
    # (producer_batch.go:141-151); requires acks=all semantics
    idempotent: bool = False
    # KIP-98 transactions on the wire path: a non-None PREFIX makes every
    # produce task run inside its own transaction (id = prefix-<task
    # partition>), so a failed/retried task never leaks partial writes to
    # read_committed consumers — the retry's InitProducerId fences and
    # aborts the stale attempt. Wire path only: the jar sink has no
    # transaction support to map onto.
    transactional_id: str | None = None
    metadata_ttl_s: float = 60.0
    metadata_topics: list[str] = field(default_factory=list)
    allow_auto_topic_creation: bool = False
    client_id: str = "go-pq-cdc-kafka-spark"
    # TLS / SASL-SCRAM (kafka/client.go:53-75)
    sasl_enabled: bool = False
    sasl_username: str = ""
    sasl_password: str = ""
    sasl_mechanism: str = "SCRAM-SHA-512"
    tls_enabled: bool = False
    root_ca_path: str | None = None
    # reference accepts raw PEM bytes (kafka.rootCA / kafka.interCA,
    # kafka/client.go:77-125); the Java client takes inline PEM via
    # ssl.truststore.type=PEM + ssl.truststore.certificates (Kafka >= 2.7)
    root_ca_pem: str | None = None
    inter_ca_pem: str | None = None

    def sink_options(self, checkpoint_location: str) -> dict[str, str]:
        """Options for ``writeStream.format('kafka')`` (or batch write)."""
        opts = {
            "kafka.bootstrap.servers": ",".join(self.brokers),
            "kafka.acks": str(self.required_acks if self.required_acks != -1 else "all"),
            "kafka.retries": str(self.max_attempts),
            "kafka.request.timeout.ms": str(int(self.write_timeout_s * 1000)),
            "kafka.compression.type": self.compression.kafka_name,
            "kafka.batch.size": str(min(parse_size(self.producer_batch_bytes), 1 << 20)),
            "kafka.max.request.size": str(parse_size(self.producer_batch_bytes)),
            "kafka.metadata.max.age.ms": str(int(self.metadata_ttl_s * 1000)),
            "kafka.allow.auto.create.topics": str(self.allow_auto_topic_creation).lower(),
            "kafka.enable.idempotence": str(self.idempotent).lower(),
            "kafka.client.id": self.client_id,
            "includeHeaders": "true",
            "checkpointLocation": checkpoint_location,
        }
        partitioner = self.balancer.partitioner_class  # raises on unmappable
        if partitioner is not None:
            opts["kafka.partitioner.class"] = partitioner
        if self.sasl_enabled:
            proto = "SASL_SSL" if self.tls_enabled else "SASL_PLAINTEXT"
            opts.update(
                {
                    "kafka.security.protocol": proto,
                    "kafka.sasl.mechanism": self.sasl_mechanism,
                    "kafka.sasl.jaas.config": (
                        "org.apache.kafka.common.security.scram.ScramLoginModule "
                        f'required username="{self.sasl_username}" '
                        f'password="{self.sasl_password}";'
                    ),
                }
            )
        elif self.tls_enabled:
            opts["kafka.security.protocol"] = "SSL"
        if self.tls_enabled:
            if self.root_ca_pem:
                pem = self.root_ca_pem + (
                    "\n" + self.inter_ca_pem if self.inter_ca_pem else ""
                )
                opts["kafka.ssl.truststore.type"] = "PEM"
                opts["kafka.ssl.truststore.certificates"] = pem
            elif self.root_ca_path:
                opts["kafka.ssl.truststore.location"] = self.root_ca_path
        return opts

    def trigger_kwargs(self) -> dict[str, str]:
        """The ticker (B2) as a processing-time trigger."""
        return {"processingTime": f"{self.producer_batch_ticker_duration_s} seconds"}

    def wire_kwargs(self) -> dict:
        """Constructor kwargs for the from-scratch producer
        (kafka_wire.KafkaWireProducer) — the jar-free produce path that can
        execute in environments without the spark-sql-kafka connector.

        Security maps 1:1 with the reference surface (kafka/client.go:53-125):
        ``sasl_*`` → SCRAM-SHA-256/512 over SaslHandshake/SaslAuthenticate,
        ``tls_*`` → verified TLS with rootCA/interCA as file path or inline
        PEM. The wire producer picks partitions itself, so EVERY reference
        balancer (config/config.go:40-57) maps: HASH/MURMUR2 keep the
        Java-default murmur2 placement (byte-identical to the JVM sink, so
        switching paths never re-shuffles keys), and the three kafka-go-only
        strategies the JVM sink rejects — LeastBytes / ReferenceHash /
        CRC32Balancer — run their documented kafka-go algorithms
        (kafka_wire.WIRE_BALANCERS). Compression covers the full surface
        none/gzip/snappy/lz4/zstd (snappy via the from-spec block codec +
        xerial stream framing, lz4 via the from-spec block+frame codec,
        zstd via the from-spec RFC 8878 frame codec — raw-block frames on
        produce, full entropy decode on fetch)."""
        from go_pq_cdc_kafka_spark.streaming import kafka_wire as kw

        codec = {
            Compression.NONE: kw.COMPRESSION_NONE,
            Compression.GZIP: kw.COMPRESSION_GZIP,
            Compression.SNAPPY: kw.COMPRESSION_SNAPPY,
            Compression.LZ4: kw.COMPRESSION_LZ4,
            Compression.ZSTD: kw.COMPRESSION_ZSTD,
        }.get(self.compression)
        if codec is None:
            raise ValueError(
                f"compression {self.compression.kafka_name!r} has no "
                "pure-Python codec here; kafka_wire supports "
                "none/gzip/snappy/lz4/zstd"
            )
        out = {
            "bootstrap": list(self.brokers),
            "client_id": self.client_id,
            "acks": self.required_acks,
            "timeout_ms": int(self.write_timeout_s * 1000),
            "compression": codec,
            "timeout_s": self.read_timeout_s,
            "idempotent": self.idempotent,
            "transactional_id": self.transactional_id,
            # every reference name maps to its kafka-go algorithm by name
            # (config/config.go:40-57): Hash = FNV-1a trunc-mod, Murmur2 =
            # kafka-go's Java-compat hash with RANDOM keyless placement —
            # exact reference placement parity. (balancer=None — murmur2 +
            # sticky keyless, byte-compatible with the JVM sink — remains
            # available on KafkaWireProducer directly, it is just not a
            # reference config name.)
            "balancer": self.balancer.value,
        }
        if self.sasl_enabled:
            kw._scram_hash(self.sasl_mechanism)  # validate loudly, not on executors
            out["sasl"] = (
                self.sasl_mechanism, self.sasl_username, self.sasl_password
            )
        if self.tls_enabled:
            out["tls"] = {
                "root_ca_path": self.root_ca_path,
                "root_ca_pem": self.root_ca_pem,
                "inter_ca_pem": self.inter_ca_pem,
            }
        return out
