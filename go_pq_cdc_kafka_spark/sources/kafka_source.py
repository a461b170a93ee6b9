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
``startingoffsets`` = earliest|latest|committed|{"part": offset} JSON
(default earliest; JSON sentinels match the jar source: -1 = that
partition's latest, -2 = earliest; ``committed`` resumes from the
group's broker-stored OffsetCommit positions — checkpoint-free restart —
and requires ``group.id``), ``group.id`` (commit each batch's end
offsets broker-side via OffsetCommit, for lag monitoring and
``committed`` resume), ``auto.offset.reset`` = earliest|latest (fallback
for partitions the group never committed), ``startingtimestamp`` (epoch
millis; partitions with nothing at-or-after it start at their latest —
the broker's -1 answer is normalized), ``maxoffsetspertrigger`` (honored
from batch 0 on a fresh query, distributed across partitions
proportionally to their lag like the jar source; a restart's WAL-replay
batch is Spark's, not ours),
``sasl.mechanism``/``sasl.username``/``sasl.password``,
``tls`` = true + ``tls.rootca`` (path) / ``tls.rootcapem`` (inline PEM).
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
        self.group_id = options.get("group.id")
        self._driver_client = None
        self._position: dict | None = None  # last planned end (rate limiting)

    def _client(self):
        from go_pq_cdc_kafka_spark.streaming.kafka_wire import KafkaWireConsumer

        if self._driver_client is None:
            self._driver_client = KafkaWireConsumer(**self.client_kwargs)
        return self._driver_client

    def _starting_offsets(self) -> dict:
        """The CONFIGURED start position, {partition(int): offset} — shared
        by initialOffset and the fresh-start rate-limit seed."""
        import json

        c = self._client()
        ts = self.options.get("startingtimestamp")
        starting = self.options.get("startingoffsets", "earliest")
        if starting.lower() == "committed":
            # resume from the group's broker-stored commits (OffsetFetch):
            # checkpoint-free restart, the consumer-group migration shape.
            # Partitions the group never committed fall back to
            # auto.offset.reset (earliest default, like the jar source).
            if not self.group_id:
                raise ValueError(
                    'startingoffsets="committed" requires the group.id option'
                )
            reset = self.options.get("auto.offset.reset", "earliest").lower()
            offs = (
                c.latest_offsets(self.topic)
                if reset == "latest"
                else c.earliest_offsets(self.topic)
            )
            committed = c.fetch_committed(
                self.group_id, self.topic, sorted(offs)
            )
            for p, o in committed.items():
                if o >= 0:
                    offs[p] = o
            return offs
        if ts is not None:
            # first offset with record timestamp >= ts (epoch millis).
            # A REAL broker's ListOffsets v1 answers -1 for partitions with
            # nothing that recent (MiniBroker conforms) — normalize -1 to
            # the latest offset so the first fetch never runs at offset -1.
            offs = c.offsets_for_timestamp(self.topic, int(ts))
            if any(o < 0 for o in offs.values()):
                latest = c.latest_offsets(self.topic)
                offs = {p: (latest[p] if o < 0 else o) for p, o in offs.items()}
        elif starting.lstrip().startswith("{"):
            # explicit per-partition positions, jar-source style:
            # {"0": 12, "1": 0, ...}; unlisted partitions start earliest.
            # Jar-source sentinel semantics: -1 = latest, -2 = earliest.
            explicit = {int(p): int(o) for p, o in json.loads(starting).items()}
            offs = c.earliest_offsets(self.topic)
            latest = None
            for p, o in explicit.items():
                if o == -2:
                    continue  # earliest — already the default fill
                if o == -1:
                    if latest is None:
                        latest = c.latest_offsets(self.topic)
                    offs[p] = latest.get(p, 0)
                else:
                    offs[p] = o
        elif starting.lower() == "latest":
            offs = c.latest_offsets(self.topic)
        else:
            offs = c.earliest_offsets(self.topic)
        return offs

    def initialOffset(self) -> dict:
        offs = self._starting_offsets()
        if self._position is None:
            self._position = {str(p): int(o) for p, o in offs.items()}
        return {str(p): o for p, o in offs.items()}

    def latestOffset(self) -> dict:
        latest = self._client().latest_offsets(self.topic)
        out = {str(p): o for p, o in latest.items()}
        if self.max_per_trigger:
            if self._position is None:
                # First probe of a FRESH query: the runner asks for the
                # first batch's end BEFORE calling initialOffset (observed
                # call order), so clamp from the CONFIGURED start — batch 0
                # must honor maxoffsetspertrigger too (startingoffsets=
                # earliest on a big topic otherwise reads the whole log in
                # one unclamped micro-batch). This cannot regress a
                # RESTARTED query's offset log: on restart Spark replays
                # the checkpointed batch through partitions(start, end)
                # before ever calling latestOffset, which seeds _position
                # with the checkpoint position (see partitions()).
                self._position = {
                    str(p): int(o) for p, o in self._starting_offsets().items()
                }
            # distribute the trigger budget PROPORTIONALLY to each
            # partition's lag (jar-source semantics) — an even split
            # starves the laggy partition while idle partitions waste
            # their share. Every lagging partition advances by >= 1 so
            # none can be starved entirely by rounding.
            lags = {
                p: max(o - int(self._position.get(p, 0)), 0)
                for p, o in out.items()
            }
            total_lag = sum(lags.values())
            if total_lag > self.max_per_trigger:
                for p, o in out.items():
                    if lags[p] == 0:
                        continue
                    share = max(
                        lags[p] * self.max_per_trigger // total_lag, 1
                    )
                    out[p] = min(o, int(self._position.get(p, 0)) + share)
        return out

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # Doubles as the restart position seed: Spark re-plans the last
        # checkpointed batch through here before the first post-restart
        # latestOffset, so the rate-limit clamp base is always the
        # authoritative WAL end from then on.
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
        # Positions live in the Spark checkpoint; with group.id set they
        # are ALSO committed broker-side, so external monitoring sees lag
        # and startingoffsets="committed" can resume without the
        # checkpoint. Spark delivers commit(N) only when batch N+1 is
        # planned, so broker commits lag one batch and the final batch
        # before a stop is never committed — committed-resume is
        # AT-LEAST-ONCE (re-reads that tail), the same contract a plain
        # Kafka consumer group gives. Commit failure must not fail the
        # query — the checkpoint stays authoritative.
        if self.group_id:
            try:
                self._client().commit_offsets(
                    self.group_id,
                    self.topic,
                    {int(p): int(o) for p, o in end.items()},
                )
            except Exception:
                pass

    def stop(self) -> None:
        if self._driver_client is not None:
            self._driver_client.close()
            self._driver_client = None


class KafkaWireBatchReader(DataSourceReader):
    """Batch read: a consistent snapshot taken at plan time, fetched
    executor-parallel. ``startingoffsets``/``endingoffsets`` bound the
    range like the jar source's batch mode: earliest|latest|
    {"part": offset} JSON with the -1/-2 sentinels, default
    earliest→latest."""

    def __init__(self, options: dict):
        self.topic = options["topic"]
        self.options = dict(options)
        self.client_kwargs = _client_kwargs(options)

    def partitions(self) -> Sequence[InputPartition]:
        import json

        from go_pq_cdc_kafka_spark.streaming.kafka_wire import KafkaWireConsumer

        with KafkaWireConsumer(**self.client_kwargs) as c:
            earliest = c.earliest_offsets(self.topic)
            latest = c.latest_offsets(self.topic)

            def resolve(opt: str, default: dict) -> dict:
                spec = self.options.get(opt)
                if spec is None:
                    return dict(default)
                if spec.lstrip().startswith("{"):
                    out = dict(default)
                    for p, o in json.loads(spec).items():
                        p, o = int(p), int(o)
                        if o == -2:
                            out[p] = earliest.get(p, 0)
                        elif o == -1:
                            out[p] = latest.get(p, 0)
                        else:
                            out[p] = o
                    return out
                if spec.lower() == "latest":
                    return dict(latest)
                if spec.lower() == "earliest":
                    return dict(earliest)
                raise ValueError(f"invalid {opt}: {spec!r}")

            start = resolve("startingoffsets", earliest)
            end = resolve("endingoffsets", latest)
        return [
            _RangePartition(self.topic, p, start.get(p, 0), end[p],
                            self.client_kwargs)
            for p in sorted(end)
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
