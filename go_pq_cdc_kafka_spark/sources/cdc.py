"""CDC stream source — PySpark ``DataSource`` with LSN offset bookkeeping.

Reference S1 (connector.go:51-56, 129-184): a single subscriber on a Postgres
logical-replication slot receives decoded WAL events; the slot LSN is the
source offset, advanced by acks. Spark has no native CDC source (SURVEY
§2.A), so this module provides:

- :class:`WalFileDataSource` (format name ``"pgwal"``) — a registered Spark 4
  Python streaming source that tails a WAL-shaped JSONL log with the LSN as
  the stream offset. ``initialOffset``/``read``/``readBetweenOffsets`` give
  Spark's checkpoint exactly the reference's ack contract: an offset range is
  committed only after the micro-batch lands, replay re-reads the same LSN
  range deterministically (at-least-once end to end, effectively-once with
  idempotent sinks).
- :class:`PgWireDataSource` (format name ``"pgwire"``) — the LIVE production
  source: the in-repo walsender wire client (sources/wire.py) pumped through
  the same offset contract, with micro-batch commits acked back to the slot.
- :class:`PostgresReplicationClient` — the transport-pluggable client both
  paths share (defaults to the wire client; tests inject file/scripted-socket
  frame sources since no Postgres server ships in this environment).

Like the reference's listener, the tail read is a single logical reader
(SimpleDataSourceStreamReader runs driver-side): one WAL stream has no
intra-source parallelism to exploit; Spark distributes everything downstream.
"""

from __future__ import annotations

import json
import os
import sys
from datetime import datetime
from typing import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from go_pq_cdc_kafka_spark.envelope import dynamic_envelope_schema

FORMAT_NAME = "pgwal"


_TS_CACHE: dict = {}


def _parse_ts(v: str | None) -> datetime | None:
    """Memoized ISO parse: every event of a transaction carries the SAME
    commit-timestamp string, so the hot path re-parsed one value per event
    (~1µs each at replication rates). Bounded: cleared at 4096 entries."""
    if not v:
        return None
    ts = _TS_CACHE.get(v)
    if ts is None:
        if len(_TS_CACHE) >= 4096:
            _TS_CACHE.clear()
        ts = datetime.fromisoformat(v)
        _TS_CACHE[v] = ts
    return ts


def _rows_to_arrow(rows: list[tuple]):
    """Envelope tuples → ONE pyarrow RecordBatch matching the dynamic
    envelope schema. Spark's python-data-source runner accepts RecordBatch
    iterators verbatim (pyspark plan_data_source_read.records_to_arrow_
    batches) — handing it a prebuilt columnar batch skips the per-row
    tuple→Arrow conversion that otherwise caps streaming throughput at a
    few 10k rows/s (the dominant E2E cost measured by tools/live_bench.py;
    column-building here is ~4x faster)."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    schema = to_arrow_schema(dynamic_envelope_schema())
    cols = list(zip(*rows)) if rows else [[] for _ in schema]

    def map_array(col, field_type):
        # flat (offsets, keys, values) construction: pa.array over
        # per-row lists of item-tuples boxes every pair through Python
        # objects (~3x slower at replication rates)
        # offsets[i] = start of entry i (None ⇒ entry i is null);
        # offsets[-1] = total item count and must be non-null
        offsets: list = []
        keys: list = []
        vals: list = []
        n = 0
        for d in col:
            if d is None:
                offsets.append(None)
                continue
            offsets.append(n)
            keys.extend(d.keys())
            vals.extend(d.values())
            n += len(d)
        offsets.append(n)
        return pa.MapArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(keys, type=field_type.key_type),
            pa.array(vals, type=field_type.item_type),
        )

    arrays = []
    for i, field in enumerate(schema):
        col = list(cols[i])
        if pa.types.is_map(field.type):
            arrays.append(map_array(col, field.type))
        else:
            arrays.append(pa.array(col, type=field.type))
    return pa.RecordBatch.from_arrays(arrays, schema=schema)


class WalFileStreamReader(SimpleDataSourceStreamReader):
    """Offset = ``{"lsn": <last consumed>}``; a micro-batch is the next
    ``maxEventsPerBatch`` events with lsn > offset, in file order (the file is
    append-only with monotone LSNs, like the WAL itself)."""

    def __init__(self, schema: StructType, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pgwal source requires option 'path'")
        self.max_events = int(options.get("maxeventsperbatch", 1000))
        self.start_lsn = int(options.get("startlsn", -1))

    def initialOffset(self) -> dict:
        # "start from LSN recorded before snapshot" = option startlsn
        # (the no-gap snapshot→CDC handoff, README.md:50-54)
        return {"lsn": self.start_lsn}

    def _scan(self, after_lsn: int, limit: int | None) -> list[tuple]:
        rows: list[tuple] = []
        if not os.path.exists(self.path):
            return rows
        with open(self.path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                e = json.loads(line)
                if e["lsn"] <= after_lsn:
                    continue
                rows.append(
                    (
                        e["op"],
                        _parse_ts(e.get("event_time")),
                        e["lsn"],
                        e.get("table_namespace", "public"),
                        e["table_name"],
                        e.get("before"),
                        e.get("after"),
                    )
                )
                if limit is not None and len(rows) >= limit:
                    break
        return rows

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        rows = self._scan(start["lsn"], self.max_events)
        if not rows:
            # empty MUST be a truly empty iterator: the wrapper probes
            # no-progress results with next() and a 0-row batch would trip
            # its offset-did-not-advance guard
            return iter([]), {"lsn": start["lsn"]}
        return iter([_rows_to_arrow(rows)]), {"lsn": rows[-1][2]}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # deterministic replay of a committed range after restart
        rows = [r for r in self._scan(start["lsn"], None) if r[2] <= end["lsn"]]
        return iter([_rows_to_arrow(rows)]) if rows else iter([])


class WalFileDataSource(DataSource):
    """``spark.readStream.format("pgwal").option("path", ...)`` source."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return dynamic_envelope_schema()

    def simpleStreamReader(self, schema: StructType) -> WalFileStreamReader:
        return WalFileStreamReader(schema, self.options)


class PgWireStreamReader(SimpleDataSourceStreamReader):
    """LIVE replication tail over the wire client (sources/wire.py): the
    production S1 path, socket to DataFrame with no file in between.

    A background thread pumps decoded envelope events from the replication
    connection into a bounded queue; ``read`` drains whatever arrived
    within one poll interval (events don't wait for a full batch — the
    reference flushes on a ticker for the same reason, producer_batch
    go:53-60). ``commit`` acks the flushed LSN back to the server, which
    is what advances the slot (B4's contract; Spark calls commit only
    after the micro-batch is durable, so the server never discards WAL
    the checkpoint hasn't secured). ``readBetweenOffsets`` replays a
    committed-but-lost range over a FRESH connection — sound because the
    un-acked slot still retains that WAL."""

    def __init__(self, schema: StructType, options: dict) -> None:
        self.dsn = options.get("dsn")
        self.slot = options.get("slot")
        self.publication = options.get("publication")
        if not (self.dsn and self.slot and self.publication):
            raise ValueError("pgwire source requires options dsn, slot, publication")
        self.max_events = int(options.get("maxeventsperbatch", 10_000))
        self.start_lsn = int(options.get("startlsn", 0))
        self.poll_secs = float(options.get("pollms", 200)) / 1000.0
        self.create_slot = options.get("createslot", "true") == "true"
        self.max_retries = int(options.get("maxretries", 3))
        self.proto_version = int(options.get("protoversion", 1))
        # protocol v2 in-progress-transaction streaming (decoder buffers
        # per-xid until Stream Commit; aborted streams never surface)
        self.streaming = options.get("streaming", "false") == "true"
        self._queue = None
        self._thread = None
        self._conn = None
        self._err: Exception | None = None
        self._retries = 0

    def initialOffset(self) -> dict:
        return {"lsn": self.start_lsn}

    def _client(self, start_lsn: int, keep_conn: bool):
        from go_pq_cdc_kafka_spark.sources import wire

        def on_connect(conn):
            if keep_conn:
                self._conn = conn

        fs = wire.frame_source_from_dsn(
            self.dsn,
            self.slot,
            self.publication,
            create_slot=self.create_slot,
            on_connect=on_connect,
            proto_version=self.proto_version,
            streaming=self.streaming,
        )
        return PostgresReplicationClient(
            self.dsn, self.slot, self.publication, frame_source=fs
        )

    def _ensure_pump(self, after_lsn: int) -> None:
        if self._thread is not None:
            return
        import collections
        import threading
        import time as _time

        client = self._client(after_lsn, keep_conn=True)
        # a GIL-atomic deque, NOT queue.Queue: Queue.get(timeout=...) costs
        # ~30µs/event in lock/condvar machinery, capping the drain at
        # ~30k events/s (measured as the E2E bottleneck by live_bench);
        # deque.append/popleft are lock-free. Backpressure is a soft cap
        # polled by the producer — it must hold at least one full
        # micro-batch or read() can never assemble max_events rows.
        dq: "collections.deque" = collections.deque()
        cap = max(100_000, 2 * self.max_events)

        def pump() -> None:
            try:
                for ev in client.events(after_lsn):
                    while len(dq) >= cap:
                        _time.sleep(0.005)
                    dq.append(ev)
            except Exception as e:  # surfaced on the next read()
                self._err = e

        t = threading.Thread(target=pump, name="pgwire-pump", daemon=True)
        t.start()
        self._queue, self._thread = dq, t

    @staticmethod
    def _row(e: dict) -> tuple:
        return (
            e["op"],
            _parse_ts(e.get("event_time")),
            e["lsn"],
            e.get("table_namespace", "public"),
            e["table_name"],
            e.get("before"),
            e.get("after"),
        )

    #: server-side SQLSTATEs that mean "the connection went away, not that
    #: the request was wrong" — a real walsender sends these as FATAL
    #: ErrorResponses (so they surface as WireError, not ConnectionError):
    #: 57P01 admin_shutdown (pg_terminate_backend / fast shutdown),
    #: 57P02 crash_shutdown, 57P03 cannot_connect_now (startup/recovery),
    #: 53300 too_many_connections. The reference reconnects on all of
    #: them (go-pq-cdc's connection bootstrap retry); auth/protocol/SQL
    #: errors stay fatal.
    _RETRYABLE_SQLSTATES = frozenset({"57P01", "57P02", "57P03", "53300"})

    def _maybe_restart_pump(self, start_lsn: int) -> None:
        """Transient-vs-fatal classing on a dead pump (the reference's B5
        contract, kafka/reponse_handler.go:13-48): connection drops —
        including server-initiated terminations like pg_terminate_backend,
        which arrive as FATAL 57P01 ErrorResponses — reconnect and RESUME
        from the batch-start LSN, sound because the un-acked slot retains
        that WAL; protocol/auth errors and retry exhaustion fail the query
        loudly."""
        from go_pq_cdc_kafka_spark.sources import wire

        if self._thread is None or self._thread.is_alive() or len(self._queue):
            return
        err, self._err = self._err, None
        if err is None:
            return  # clean stream end (CopyDone): stay ended
        fatal_wire = isinstance(err, wire.WireError) and (
            err.sqlstate not in self._RETRYABLE_SQLSTATES
        )
        if fatal_wire or self._retries >= self.max_retries:
            raise err
        self._retries += 1
        self._thread = None
        self._conn = None

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        import time

        if self._thread is not None:
            self._maybe_restart_pump(start["lsn"])
        self._ensure_pump(start["lsn"])
        rows: list[tuple] = []
        deadline = time.monotonic() + self.poll_secs
        dq, row = self._queue, self._row
        while len(rows) < self.max_events:
            try:
                ev = dq.popleft()
            except IndexError:
                if time.monotonic() >= deadline:
                    break
                time.sleep(0.005)
                continue
            rows.append(row(ev))
        if rows:
            self._retries = 0  # progress resets the transient budget
        elif self._err is not None:
            self._maybe_restart_pump(start["lsn"])
        if not rows:
            return iter([]), {"lsn": start["lsn"]}
        return iter([_rows_to_arrow(rows)]), {"lsn": rows[-1][2]}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # Spark plans a (start == end) batch whenever an offset didn't
        # advance (batch 0 of a fresh query, idle ticks) and the simple-
        # reader prefetch cache never holds empty batches — so this replay
        # path IS reached with an empty range, on the executor. Answer it
        # without dialing: connecting would contend for the slot the
        # driver-side pump is holding (live PG: ERROR 55006) for zero rows.
        if start["lsn"] >= end["lsn"]:
            return iter([])
        client = self._client(start["lsn"], keep_conn=False)
        out = []
        events = client.events(start["lsn"])
        try:
            for ev in events:
                if ev["lsn"] > end["lsn"]:
                    break
                out.append(self._row(ev))
        finally:
            # close the generator NOW (not at GC) so the walsender drops
            # the slot before the driver pump (re)dials it
            events.close()
        return iter([_rows_to_arrow(out)]) if out else iter([])

    def commit(self, end: dict) -> None:
        # micro-batch durable ⇒ advance the slot (sent with the next
        # keepalive reply; wire.ReplicationConnection.ack is monotone)
        if self._conn is not None and end.get("lsn", 0) > 0:
            self._conn.ack(end["lsn"])

    def stop(self) -> None:
        """Query teardown: release the slot NOW (see PgRawStreamReader.stop
        — a lingering pump connection blocks same-slot checkpoint restarts
        with `replication slot ... is active`)."""
        conn, self._conn = self._conn, None
        if conn is not None:
            try:
                conn.close()
            except Exception:
                pass
        self._thread = None
        self._queue = None


class PgWireDataSource(DataSource):
    """``spark.readStream.format("pgwire").option("dsn", ...)
    .option("slot", ...).option("publication", ...)`` — live logical
    replication as a streaming DataFrame (same envelope schema and offset
    contract as ``pgwal``; only the byte transport differs)."""

    @classmethod
    def name(cls) -> str:
        return "pgwire"

    def schema(self) -> StructType:
        return dynamic_envelope_schema()

    def simpleStreamReader(self, schema: StructType) -> PgWireStreamReader:
        return PgWireStreamReader(schema, self.options)


def register(spark) -> None:
    """Register the ``pgwal`` format. The DataSource class is pickled into
    Spark's Python planner/executor workers, which import it by module path —
    sessions built with :func:`~go_pq_cdc_kafka_spark.session.get_spark` set
    PYTHONPATH for those workers before the JVM starts; for a foreign session
    whose JVM env lacks the package, we additionally pickle this module (and
    the envelope schema) by value so the class travels self-contained where
    cloudpickle is the serializer."""
    import cloudpickle

    from go_pq_cdc_kafka_spark import envelope
    from go_pq_cdc_kafka_spark.session import ship_package

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    cloudpickle.register_pickle_by_value(envelope)
    ship_package(spark)  # executor-side UDF imports on real clusters
    spark.dataSource.register(WalFileDataSource)
    spark.dataSource.register(PgWireDataSource)


class PostgresReplicationClient:
    """Production client for a real logical-replication tail.

    Both layers are implemented in-repo: DECODING by
    :mod:`~go_pq_cdc_kafka_spark.sources.pgoutput` and TRANSPORT by
    :mod:`~go_pq_cdc_kafka_spark.sources.wire` (protocol-v3 walsender
    client: SCRAM auth, slot DDL, START_REPLICATION, keepalive acks) —
    together the role go-pq-cdc plays for the reference (go.mod:6,
    connector.go:51-56). By default ``events()`` dials the DSN over the
    wire client; pass ``frame_source`` to substitute any other byte
    transport (tests use file replay and scripted sockets — no live
    Postgres exists in this sandbox). The Spark-side plumbing (offsets,
    checkpointing, schema) is identical to :class:`WalFileStreamReader`;
    only the byte source differs.
    """

    def __init__(
        self,
        dsn: str,
        slot: str,
        publication: str,
        frame_source=None,  # Callable[[int], Iterator[bytes]] | None
        socket_factory=None,  # forwarded to sources.wire when dialing
    ) -> None:
        self.dsn, self.slot, self.publication = dsn, slot, publication
        self.socket_factory = socket_factory
        if frame_source is None:
            from go_pq_cdc_kafka_spark.sources import wire

            frame_source = wire.frame_source_from_dsn(
                dsn, slot, publication, socket_factory=socket_factory
            )
        self.frame_source = frame_source

    def events(self, start_lsn: int) -> Iterator[dict]:
        from go_pq_cdc_kafka_spark.sources import pgoutput as PO

        for ev in PO.decode_replication_stream(self.frame_source(start_lsn)):
            if ev["lsn"] > start_lsn:
                yield ev


def write_wal_jsonl(events: list[dict], path: str, append: bool = True) -> None:
    """Test/fixture helper: append envelope events to a WAL-shaped JSONL log."""
    mode = "a" if append else "w"
    with open(path, mode, encoding="utf-8") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
