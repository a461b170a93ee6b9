"""Kafka source — executor-parallel PySpark ``DataSource`` over the
from-scratch wire client (streaming/kafka_wire.py), format ``"kafkawire"``.

The reference is a one-way Postgres→Kafka connector; consuming the topics
it produces is the other half every deployment needs (audit readers,
re-materialization, backfills into the lake). Spark's own Kafka source
needs the spark-sql-kafka jar; this one needs nothing beyond the package.

Spark-first shape — this is NOT a driver-side reader:

- ``partitions(start, end)`` emits ONE InputPartition per Kafka partition;
  ``read()`` runs ON THE EXECUTORS, each task fetching only its partition's
  offset range over its own broker connection. Parallelism = topic
  partition count, exactly like the jar-backed source.
- offsets are ``{partition(str): next_offset}`` dicts; ``latestOffset`` is
  the broker high watermark via ListOffsets v1 (TS_LATEST), optionally
  clamped by ``maxoffsetspertrigger`` for bounded micro-batches.
- schema mirrors the jar-backed source (key/value binary, topic, partition,
  offset, timestamp, headers), so pipelines written against one run on the
  other unchanged.

Options: ``bootstrap`` (required), ``topic`` (required),
``startingoffsets`` = earliest|latest (default earliest),
``maxoffsetspertrigger``, ``sasl.mechanism``/``sasl.username``/
``sasl.password``, ``tls`` = true + ``tls.rootca`` (path) /
``tls.rootcapem`` (inline PEM).
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def kafka_record_schema() -> StructType:
    """The jar-backed Kafka source's schema, headers included."""
    return StructType(
        [
            StructField("key", BinaryType()),
            StructField("value", BinaryType()),
            StructField("topic", StringType()),
            StructField("partition", IntegerType()),
            StructField("offset", LongType()),
            StructField("timestamp", TimestampType()),
            StructField(
                "headers",
                ArrayType(
                    StructType(
                        [
                            StructField("key", StringType()),
                            StructField("value", BinaryType()),
                        ]
                    )
                ),
            ),
        ]
    )


def _client_kwargs(options: dict) -> dict:
    kw: dict = {"bootstrap": options["bootstrap"]}
    mech = options.get("sasl.mechanism")
    if mech:
        kw["sasl"] = (
            mech,
            options.get("sasl.username", ""),
            options.get("sasl.password", ""),
        )
    if options.get("tls", "").lower() in ("true", "1", "yes"):
        kw["tls"] = {
            "root_ca_path": options.get("tls.rootca") or None,
            "root_ca_pem": options.get("tls.rootcapem") or None,
        }
    return kw


class _RangePartition(InputPartition):
    def __init__(self, topic: str, partition: int, start: int, end: int,
                 client_kwargs: dict):
        self.topic = topic
        self.partition = partition
        self.start = start
        self.end = end
        self.client_kwargs = client_kwargs


def _read_range(part: _RangePartition) -> Iterator[tuple]:
    """Executor-side fetch loop over [start, end)."""
    from go_pq_cdc_kafka_spark.streaming.kafka_wire import KafkaWireConsumer

    if part.end <= part.start:
        return
    with KafkaWireConsumer(**part.client_kwargs) as cons:
        pos = part.start
        while pos < part.end:
            recs, hwm = cons.fetch(part.topic, part.partition, pos)
            if not recs:
                if hwm <= pos:
                    break  # range ran past a shrunk log: emit what exists
                continue
            for rec in recs:
                if rec.offset >= part.end:
                    return
                ts = datetime.fromtimestamp(
                    rec.timestamp_ms / 1000.0, tz=timezone.utc
                )
                yield (
                    rec.key,
                    rec.value,
                    part.topic,
                    part.partition,
                    rec.offset,
                    ts,
                    rec.headers,
                )
            pos = max(r.offset for r in recs) + 1


class KafkaWireStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self.topic = options["topic"]
        self.client_kwargs = _client_kwargs(options)
        self.max_per_trigger = int(options.get("maxoffsetspertrigger", 0)) or None
        self._driver_client = None
        self._position: dict | None = None  # last planned end (rate limiting)

    def _client(self):
        from go_pq_cdc_kafka_spark.streaming.kafka_wire import KafkaWireConsumer

        if self._driver_client is None:
            self._driver_client = KafkaWireConsumer(**self.client_kwargs)
        return self._driver_client

    def initialOffset(self) -> dict:
        import json

        c = self._client()
        ts = self.options.get("startingtimestamp")
        starting = self.options.get("startingoffsets", "earliest")
        if ts is not None:
            # first offset with record timestamp >= ts (epoch millis);
            # partitions with nothing that recent start at their watermark
            offs = c.offsets_for_timestamp(self.topic, int(ts))
        elif starting.lstrip().startswith("{"):
            # explicit per-partition positions, jar-source style:
            # {"0": 12, "1": 0, ...}; unlisted partitions start earliest
            explicit = {int(p): int(o) for p, o in json.loads(starting).items()}
            offs = c.earliest_offsets(self.topic)
            offs.update(explicit)
        elif starting.lower() == "latest":
            offs = c.latest_offsets(self.topic)
        else:
            offs = c.earliest_offsets(self.topic)
        return {str(p): o for p, o in offs.items()}

    def latestOffset(self) -> dict:
        latest = self._client().latest_offsets(self.topic)
        out = {str(p): o for p, o in latest.items()}
        if self.max_per_trigger:
            if self._position is None:
                # First probe (start OR restart — the Python source API
                # never surfaces the checkpoint position): seed the clamp
                # base with the broker's CURRENT latest. A clamped end must
                # never sit below a restarted query's committed offset —
                # Spark would regress its offset log and re-read — so the
                # one catch-up batch runs unclamped and every batch after
                # it honors the budget (partitions() advances the base).
                self._position = dict(out)
            else:
                budget = max(self.max_per_trigger // max(len(out), 1), 1)
                for p, o in out.items():
                    lo = int(self._position.get(p, 0))
                    out[p] = min(o, lo + budget)
        return out

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        self._position = {p: int(end[p]) for p in end}
        return [
            _RangePartition(
                self.topic, int(p), int(start.get(p, 0)), int(end[p]),
                self.client_kwargs,
            )
            for p in sorted(end, key=int)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        return _read_range(partition)

    def commit(self, end: dict) -> None:
        pass  # positions live in the Spark checkpoint, nowhere else

    def stop(self) -> None:
        if self._driver_client is not None:
            self._driver_client.close()
            self._driver_client = None


class KafkaWireBatchReader(DataSourceReader):
    """Batch read: a consistent earliest→latest snapshot taken at plan
    time, fetched executor-parallel."""

    def __init__(self, options: dict):
        self.topic = options["topic"]
        self.client_kwargs = _client_kwargs(options)

    def partitions(self) -> Sequence[InputPartition]:
        from go_pq_cdc_kafka_spark.streaming.kafka_wire import KafkaWireConsumer

        with KafkaWireConsumer(**self.client_kwargs) as c:
            earliest = c.earliest_offsets(self.topic)
            latest = c.latest_offsets(self.topic)
        return [
            _RangePartition(self.topic, p, earliest.get(p, 0), latest[p],
                            self.client_kwargs)
            for p in sorted(latest)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        return _read_range(partition)


class KafkaWireDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kafkawire"

    def schema(self) -> StructType:
        return kafka_record_schema()

    def reader(self, schema: StructType) -> KafkaWireBatchReader:
        return KafkaWireBatchReader(self.options)

    def streamReader(self, schema: StructType) -> KafkaWireStreamReader:
        return KafkaWireStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(KafkaWireDataSource)
