"""Raw-frame replication source + executor-side pgoutput decode.

The ``pgwire`` source decodes pgoutput ON THE DRIVER (inside the python
data-source runner): correct, but every event pays Python decode + row
build + Arrow conversion under one GIL — measured ceiling ~50k rows/s
E2E (tools/live_bench.py). This module is the scale tier: the driver
pump only READS FRAMES off the socket (a tag peek and a header unpack
per message — I/O bound), ships them as an Arrow binary column, and the
pgoutput decode runs in EXECUTOR python workers via ``mapInPandas`` —
parallel across transaction groups, off the driver's GIL.

Design contracts:

- **Commit-aligned offsets**: ``read()`` only releases frames up to the
  last Commit in the drained window (the remainder carries over), so an
  offset is always a transaction boundary — exactly the resume points
  the slot protocol supports (mid-transaction offsets are not safe).
- **Relation preamble**: pgoutput sends each Relation message once per
  connection, but executor workers are stateless per micro-batch, so the
  pump keeps a registry of raw Relation payloads and PREPENDS one copy
  per transaction group to every batch (lsn 0 ⇒ sorts first).
- **Transaction groups**: each committed transaction gets a group id
  (round-robin); ``decode_raw_frames`` repartitions by group and sorts
  by (lsn, seq) within partitions, so every decoder instance sees
  well-formed transactions in WAL order — decode parallelism without
  breaking the sequential-decode requirement. Downstream consumers
  already order by ``lsn`` (LWW / SCD2), same as with the serial tier.
- **Large-transaction split**: a bulk load arrives as ONE transaction
  per batch, which whole-transaction grouping would pin to a single
  core. Transactions with >= ``splitframes`` frames therefore fan their
  DML body round-robin across ALL groups, replicating the Begin and
  Commit frames into each group — every partition still decodes a
  well-formed Begin..DML..Commit slice, and since non-streamed DML
  decode is stateless given the relation registry + Begin's timestamp
  state, the decoded events are identical, only their worker placement
  changes. Streamed (protocol-v2) transactions always stay whole.

The decoded output is bit-identical to the ``pgwire`` source's envelope
(tests/live/test_live_pg.py asserts parity on a real server).

Known limitation: every transaction in a batch decodes against the
relation versions as of the batch END (the preamble carries the latest
registry). If a table's schema evolves MID-batch (a DDL commit between
two transactions of the same ~1s micro-batch), rows from before the
change decode with the new column list. The serial ``pgwire`` tier
preserves exact in-stream relation ordering — use it when intra-batch
DDL fidelity matters more than throughput.
"""

from __future__ import annotations

import sys
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

RAW_FORMAT_NAME = "pgwire-raw"

_RAW_SCHEMA = StructType(
    [
        StructField("lsn", LongType(), True),
        StructField("seq", LongType(), True),
        StructField("txgrp", IntegerType(), True),
        StructField("msg", BinaryType(), True),
    ]
)


def raw_schema() -> StructType:
    return _RAW_SCHEMA


def _cols_to_arrow(
    relations: dict[int, bytes],
    lsns: list[int],
    grps: list[int],
    msgs: list[bytes],
    groups: int,
):
    """Columnar batch assembly: the relation preamble (lsn/seq 0, one copy
    per group) is prepended, data seq is a numpy arange — no per-frame
    tuple or Python seq counter on the driver hot path."""
    import numpy as np
    import pyarrow as pa

    rel_msgs = list(relations.values())
    pre_n = groups * len(rel_msgs)
    n = len(lsns)
    lsn_arr = np.empty(pre_n + n, dtype=np.int64)
    lsn_arr[:pre_n] = 0
    lsn_arr[pre_n:] = lsns
    seq_arr = np.empty(pre_n + n, dtype=np.int64)
    seq_arr[:pre_n] = 0
    seq_arr[pre_n:] = np.arange(1, n + 1)
    grp_arr = np.empty(pre_n + n, dtype=np.int32)
    grp_arr[:pre_n] = np.repeat(np.arange(groups, dtype=np.int32), len(rel_msgs))
    grp_arr[pre_n:] = grps
    all_msgs = [m for g in range(groups) for m in rel_msgs] + msgs
    return pa.RecordBatch.from_arrays(
        [
            pa.array(lsn_arr, type=pa.int64()),
            pa.array(seq_arr, type=pa.int64()),
            pa.array(grp_arr, type=pa.int32()),
            pa.array(all_msgs, type=pa.binary()),
        ],
        names=["lsn", "seq", "txgrp", "msg"],
    )


def _emit_transaction(
    open_tx: list,
    lsns: list,
    grps: list,
    msgs: list,
    groups: int,
    split_frames: int,
    txgrp: int,
) -> int:
    """Append (lsn, seq, grp, msg) rows for ONE committed transaction.

    Small transactions stay whole on one round-robin group (WAL-ordered
    sequential decode). A large NON-STREAMED transaction (>= split_frames
    frames) is the bulk-load shape — released alone it would pin executor
    decode to a single core, capping the raw tier at serial speed — so its
    DML body fans out round-robin across ALL groups with the Begin and
    Commit frames REPLICATED into every group: each partition then decodes
    a well-formed Begin..DML-slice..Commit transaction. Non-streamed DML
    decode is stateless given the relation registry plus Begin's
    commit-timestamp state, so slicing cannot change any decoded event —
    only which worker emits it. Protocol-v2 streamed transactions carry
    per-message xids and abort semantics; they always stay whole.

    ``open_tx`` holds RAW XLogData frames (round 11): wal_start is
    unpacked here in one pass, and the 25-byte header is NOT stripped —
    the msg column ships whole frames and the executor decoders strip
    (decode_raw_frames), so the per-frame bytes copy leaves the driver
    GIL entirely."""
    import struct

    unpack = struct.unpack_from
    first_tag = open_tx[0][25]
    n = len(open_tx)
    if (
        split_frames
        and groups > 1
        and n >= split_frames
        and first_tag == 0x42  # 'B' — non-streamed Begin
    ):
        (b_lsn,) = unpack(">q", open_tx[0], 1)
        (c_lsn,) = unpack(">q", open_tx[-1], 1)
        b_msg, c_msg = open_tx[0], open_tx[-1]
        body = open_tx[1:-1]
        # append order IS seq order (seq = arange at batch assembly):
        # Begins first, body, then Commits — each group's slice sorts to
        # Begin..DMLs..Commit under the in-partition (lsn, seq) sort
        lsns.extend([b_lsn] * groups)
        grps.extend(range(groups))
        msgs.extend([b_msg] * groups)
        lsns.extend([unpack(">q", f, 1)[0] for f in body])
        grps.extend(i % groups for i in range(len(body)))
        msgs.extend(body)
        lsns.extend([c_lsn] * groups)
        grps.extend(range(groups))
        msgs.extend([c_msg] * groups)
        return txgrp
    grp = txgrp % groups
    lsns.extend([unpack(">q", f, 1)[0] for f in open_tx])
    grps.extend([grp] * n)
    msgs.extend(open_tx)
    return txgrp + 1


class PgRawStreamReader(SimpleDataSourceStreamReader):
    """Offset = ``{"lsn": <last committed>}`` — always a Commit boundary."""

    def __init__(self, schema: StructType, options: dict) -> None:
        self.dsn = options.get("dsn")
        self.slot = options.get("slot")
        self.publication = options.get("publication")
        if not (self.dsn and self.slot and self.publication):
            raise ValueError(
                "pgwire-raw source requires options dsn, slot, publication"
            )
        self.start_lsn = int(options.get("startlsn", 0))
        self.poll_secs = float(options.get("pollms", 200)) / 1000.0
        self.max_frames = int(options.get("maxframesperbatch", 500_000))
        self.groups = int(options.get("groups", 8))
        #: transactions with >= this many frames fan out across ALL groups
        #: (bulk-load shape: one huge tx per batch must not pin decode to
        #: a single core); 0 disables splitting
        self.split_frames = int(options.get("splitframes", 4096))
        self.create_slot = options.get("createslot", "true") == "true"
        self.max_retries = int(options.get("maxretries", 3))
        self._dq = None
        self._thread = None
        self._conn = None
        self._err: Exception | None = None
        self._retries = 0
        #: created lazily in _ensure_pump — a threading.Event here would
        #: break the reader's cloudpickle (Spark pickles the fresh reader
        #: at stream start; only None/thread-free attrs may exist then).
        #: Set by stop(): lets the pump exit its backpressure loop even
        #: when the deque is full (a closed socket is only observed on the
        #: NEXT read, so a full-queue pump would otherwise spin forever)
        self._stopping = None
        #: raw Relation payloads by relid (replayed to every batch)
        self._relations: dict[int, bytes] = {}
        #: frames of the currently-open transaction (not yet committed)
        self._open_tx: list[tuple[int, bytes]] = []
        self._txgrp = 0

    def initialOffset(self) -> dict:
        return {"lsn": self.start_lsn}

    def _ensure_pump(self, after_lsn: int) -> None:
        if self._thread is not None:
            return
        import collections
        import struct
        import threading
        import time as _time

        from go_pq_cdc_kafka_spark.sources import wire

        if self._stopping is None:
            self._stopping = threading.Event()
        stopping = self._stopping

        def on_connect(conn):
            self._conn = conn

        fs = wire.frame_source_from_dsn(
            self.dsn,
            self.slot,
            self.publication,
            create_slot=self.create_slot,
            on_connect=on_connect,
        )
        dq: "collections.deque" = collections.deque()
        cap = max(100_000, 2 * self.max_frames)

        def pump() -> None:
            # HOT LOOP — this single thread must keep realtime pace with
            # the replication socket, and every Python op here is paid per
            # frame under the driver GIL. The round-11 stream profile
            # attributed the ~96-106k rows/s ceiling to exactly this path,
            # so the loop does the MINIMUM per frame: one byte test for
            # keepalives, one byte test for Relation, one deque append of
            # the RAW frame. wal_start unpack, the 25-byte header strip,
            # and tuple packing all moved off this thread (unpack to
            # read()'s release loop, the strip all the way into the
            # executor decoders — see decode_raw_frames).
            append = dq.append
            try:
                for frame in fs(after_lsn):
                    if frame[0] != 119:  # not XLogData ('w'): keepalive
                        continue
                    if frame[25] == 82:  # Relation: registry only — the
                        # batch preamble replays it to every group, so the
                        # data path would only duplicate it into one group
                        (relid,) = struct.unpack_from(">i", frame, 26)
                        self._relations[relid] = bytes(frame[25:])
                        continue
                    # NO per-frame lsn filter here: the first records of a
                    # transaction share wal_start with the PREVIOUS commit
                    # (live-PG-verified), so frame-level `<= offset`
                    # filtering silently drops the head of the first fresh
                    # transaction after a resume. Replayed history is
                    # discarded per-TRANSACTION at release time instead
                    # (read() compares the commit lsn to the resume
                    # offset).
                    if len(dq) >= cap:
                        while len(dq) >= cap:
                            if stopping.is_set():
                                return  # stop() with a full queue: exit
                            _time.sleep(0.005)
                    append(frame)
            except Exception as e:  # surfaced on the next read()
                self._err = e

        t = threading.Thread(target=pump, name="pgraw-pump", daemon=True)
        t.start()
        self._dq, self._thread = dq, t
        #: resume boundary: transactions whose COMMIT lsn is <= this are
        #: replayed history and must be discarded at release time
        self._pump_start_lsn = after_lsn

    def _drain(self, deadline: float) -> list[bytes]:
        import time

        out: list[bytes] = []
        dq = self._dq
        while len(out) < self.max_frames:
            try:
                out.append(dq.popleft())
            except IndexError:
                if time.monotonic() >= deadline:
                    break
                time.sleep(0.005)
        return out

    def _maybe_restart_pump(self) -> None:
        """Same transient-vs-fatal classing as the pgwire reader
        (cdc.PgWireStreamReader): connection drops and server-initiated
        terminations (57P01 etc.) reconnect and resume from the
        commit-aligned batch-start offset; partial open transactions are
        discarded — the slot replays them whole."""
        from go_pq_cdc_kafka_spark.sources import cdc, wire

        if self._thread is None or self._thread.is_alive() or len(self._dq):
            return
        err, self._err = self._err, None
        if err is None:
            return
        fatal_wire = isinstance(err, wire.WireError) and (
            err.sqlstate not in cdc.PgWireStreamReader._RETRYABLE_SQLSTATES
        )
        if fatal_wire or self._retries >= self.max_retries:
            raise err
        self._retries += 1
        self._thread = None
        self._conn = None
        self._open_tx = []  # replayed whole by the slot on reconnect

    def read(self, start: dict):
        import struct
        import time

        if self._thread is not None:
            self._maybe_restart_pump()
        self._ensure_pump(start["lsn"])
        drained = self._drain(time.monotonic() + self.poll_secs)

        lsns: list[int] = []
        grps: list[int] = []
        msgs: list[bytes] = []
        end_lsn = start["lsn"]
        for frame in drained:
            self._open_tx.append(frame)
            if frame[25] == 67:  # Commit: release (or discard) the txn
                (wal_start,) = struct.unpack_from(">q", frame, 1)
                if wal_start <= self._pump_start_lsn:
                    # replayed history below the resume offset
                    self._open_tx = []
                    continue
                self._txgrp = _emit_transaction(
                    self._open_tx,
                    lsns,
                    grps,
                    msgs,
                    self.groups,
                    self.split_frames,
                    self._txgrp,
                )
                self._open_tx = []
                end_lsn = wal_start
        if not lsns:
            return iter([]), {"lsn": start["lsn"]}
        self._retries = 0  # progress resets the transient budget
        return (
            iter([_cols_to_arrow(self._relations, lsns, grps, msgs, self.groups)]),
            {"lsn": end_lsn},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        if start["lsn"] >= end["lsn"]:
            return iter([])
        import struct

        from go_pq_cdc_kafka_spark.sources import wire

        fs = wire.frame_source_from_dsn(
            self.dsn, self.slot, self.publication, create_slot=False
        )
        relations: dict[int, bytes] = {}
        lsns: list[int] = []
        grps: list[int] = []
        msgs: list[bytes] = []
        open_tx: list[bytes] = []
        txgrp = 0
        frames = fs(start["lsn"])
        try:
            for frame in frames:
                if frame[0] != 119:
                    continue
                if frame[25] == 82:
                    (relid,) = struct.unpack_from(">i", frame, 26)
                    relations[relid] = bytes(frame[25:])
                    continue
                open_tx.append(frame)
                if frame[25] == 67:
                    (wal_start,) = struct.unpack_from(">q", frame, 1)
                    # per-TRANSACTION replay window (frame-level lsn
                    # filtering is wrong: a tx's first records share
                    # wal_start with the previous commit)
                    if wal_start <= start["lsn"]:
                        open_tx = []
                        continue
                    txgrp = _emit_transaction(
                        open_tx, lsns, grps, msgs,
                        self.groups, self.split_frames, txgrp,
                    )
                    open_tx = []
                    if wal_start >= end["lsn"]:
                        break
        finally:
            frames.close()
        return (
            iter([_cols_to_arrow(relations, lsns, grps, msgs, self.groups)])
            if lsns
            else iter([])
        )

    def commit(self, end: dict) -> None:
        if self._conn is not None and end.get("lsn", 0) > 0:
            self._conn.ack(end["lsn"])

    def stop(self) -> None:
        """Query teardown: close the walsender connection so the slot is
        released immediately. Without this the daemon pump thread holds
        the slot until process exit and a checkpoint-restart of the SAME
        query (same slot) fails with `replication slot ... is active`."""
        if self._stopping is not None:
            self._stopping.set()
        conn, self._conn = self._conn, None
        if conn is not None:
            try:
                conn.close()
            except Exception:
                pass
        self._thread = None
        self._dq = None


class PgRawDataSource(DataSource):
    """``spark.readStream.format("pgwire-raw")`` — raw pgoutput frames as
    (lsn, seq, txgrp, msg); pair with :func:`decode_raw_frames`."""

    @classmethod
    def name(cls) -> str:
        return RAW_FORMAT_NAME

    def schema(self) -> StructType:
        return _RAW_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> PgRawStreamReader:
        return PgRawStreamReader(schema, self.options)


def decode_raw_frames(
    frames: DataFrame, groups: int = 8, partitions: int | None = None
) -> DataFrame:
    """Raw (lsn, seq, txgrp, msg) frames → the dynamic envelope, decoded
    in EXECUTOR python workers: repartition by transaction group, restore
    WAL order within each partition, run the pgoutput decoder per
    partition. Each group sees whole transactions plus the Relation
    preamble, so decode state never crosses partitions."""
    import pandas as pd

    from go_pq_cdc_kafka_spark import envelope as ENV
    from go_pq_cdc_kafka_spark.sources import pgoutput as PO

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # streaming plans forbid sortWithinPartitions, and a shuffle's
        # within-partition order is not contractual anyway — collect the
        # partition's chunks and restore WAL order here (bounded by
        # maxframesperbatch / groups rows)
        chunks = [p for p in batches if len(p)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["lsn", "seq"], kind="mergesort"
        )
        decoder = PO.PgOutputDecoder()
        events: list[dict] = []
        for lsn, msg in zip(pdf["lsn"], pdf["msg"]):
            m = bytes(msg)
            # data rows arrive as WHOLE XLogData frames ('w' + 24-byte
            # header) since round 11 — the strip happens here, in
            # executor parallel, not under the driver GIL. The byte test
            # is exact because of what the pump puts in the msg column,
            # NOT tag case (protocol v2's Stream Commit tag is a
            # lowercase 'c'): the only bare pgoutput rows emitted are
            # Relation preambles ('R'); every data row ships as a whole
            # 'w' frame, so first-byte 'w' ⇔ strip-needed.
            if m and m[0] == 119:
                m = m[25:]
            events.extend(decoder.decode(int(lsn), m))
        if not events:
            return
        yield pd.DataFrame(
            {
                "op": [e["op"] for e in events],
                "event_time": pd.to_datetime(
                    [e["event_time"] for e in events], utc=True
                ),
                "lsn": [e["lsn"] for e in events],
                "table_namespace": [
                    e.get("table_namespace", "public") for e in events
                ],
                "table_name": [e["table_name"] for e in events],
                "before": [e.get("before") for e in events],
                "after": [e.get("after") for e in events],
            }
        )

    # hash-partitioning G group ids into G partitions leaves ~1/e of the
    # partitions empty (collisions); running with groups > partitions >
    # cores keeps every core fed — each partition may receive several
    # groups, which the in-partition (lsn, seq) sort already handles
    return frames.repartition(partitions or groups, "txgrp").mapInPandas(
        decode, schema=ENV.dynamic_envelope_schema()
    )


def register(spark) -> None:
    """Register the ``pgwire-raw`` format (same pickling story as
    :func:`go_pq_cdc_kafka_spark.sources.cdc.register`)."""
    import cloudpickle

    from go_pq_cdc_kafka_spark import envelope
    from go_pq_cdc_kafka_spark.session import ship_package

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    cloudpickle.register_pickle_by_value(envelope)
    ship_package(spark)
    spark.dataSource.register(PgRawDataSource)
