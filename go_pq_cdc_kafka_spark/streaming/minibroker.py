"""MiniBroker — an in-process, single-node Kafka broker speaking the same
fixed-layout protocol versions the kafka_wire client emits.

Purpose: protocol-conformance fixture. The sandbox has no real broker, so
the live-Kafka tier (tests/live/test_live_kafka.py) is env-gated; this
broker lets the produce path EXECUTE — full TCP framing, Metadata
leader discovery, record-batch v2 decode with mandatory CRC32C validation
(rejecting a corrupt batch with CORRUPT_MESSAGE exactly as a real broker
would), offset assignment, and Fetch read-back. It is intentionally not a
durability layer: storage is in-memory. :class:`MiniCluster` runs N
brokers over one shared store with partition leaders and group/txn
coordinators spread across nodes — wrong-node requests answer
NOT_LEADER_FOR_PARTITION / NOT_COORDINATOR like a real cluster.

The test value is the byte format: everything the producer sends is parsed
by an *independent decoder path* (decode_record_batches) and everything
read back travels through real Fetch frames, so a client bug in varint
zigzag, CRC coverage, or batch layout fails loudly instead of round-
tripping through shared in-memory objects.

APIs served: ApiVersions v0, Metadata v0-v1, Produce v3, Fetch v4,
ListOffsets v1, FindCoordinator v0, OffsetCommit v2, OffsetFetch v1
(broker-stored group offsets; no group-membership/rebalance protocol).
"""

from __future__ import annotations

import os
import pickle
import signal
import socket
import socketserver
import struct
import threading
import time
from dataclasses import dataclass, field

from .kafka_wire import (
    API_ADD_OFFSETS_TO_TXN,
    API_ADD_PARTITIONS_TO_TXN,
    API_END_TXN,
    API_FETCH,
    API_FIND_COORDINATOR,
    API_HEARTBEAT,
    API_INIT_PRODUCER_ID,
    API_JOIN_GROUP,
    API_LEAVE_GROUP,
    API_LIST_OFFSETS,
    API_DELETE_RECORDS,
    API_METADATA,
    API_OFFSET_COMMIT,
    API_OFFSET_FETCH,
    API_PRODUCE,
    API_SASL_AUTHENTICATE,
    API_SASL_HANDSHAKE,
    API_SYNC_GROUP,
    API_TXN_OFFSET_COMMIT,
    API_VERSIONS,
    ERR_CORRUPT_MESSAGE,
    ERR_DUPLICATE_SEQUENCE_NUMBER,
    ERR_ILLEGAL_GENERATION,
    ERR_ILLEGAL_SASL_STATE,
    ERR_NONE,
    ERR_NOT_COORDINATOR,
    ERR_NOT_LEADER,
    ERR_OFFSET_OUT_OF_RANGE,
    ERR_REBALANCE_IN_PROGRESS,
    ERR_UNKNOWN_MEMBER_ID,
    ERR_INVALID_PRODUCER_EPOCH,
    ERR_INVALID_TXN_STATE,
    ERR_OUT_OF_ORDER_SEQUENCE_NUMBER,
    ERR_SASL_AUTHENTICATION_FAILED,
    ERR_UNKNOWN_TOPIC_OR_PARTITION,
    ERR_UNSUPPORTED_SASL_MECHANISM,
    Record,
    _Reader,
    _bytes,
    _recv_exact,
    _scram_hash,
    _str,
    crc32c,
    decode_record_batches,
    encode_record_batch,
    scram_salted_password,
)


class _ScramServer:
    """Server half of one SCRAM conversation (RFC 5802). A real broker
    stores StoredKey/ServerKey per user; deriving them from the configured
    plaintext at salt time is equivalent for a conformance fixture."""

    def __init__(self, mechanism: str, credentials: dict[str, str]):
        import base64
        import os

        self.hash_name = _scram_hash(mechanism)
        self.credentials = credentials
        self.salt = os.urandom(16)
        self.iterations = 4096
        self.snonce_extra = base64.b64encode(os.urandom(12)).decode()
        self._client_first_bare = None
        self._server_first = None
        self._username = None

    def server_first(self, client_first: bytes) -> bytes:
        import base64

        text = client_first.decode("utf-8")
        if not text.startswith("n,,"):
            raise ValueError("gs2 header must be n,, (no channel binding)")
        self._client_first_bare = text[3:]
        attrs = dict(
            p.split("=", 1) for p in self._client_first_bare.split(",")
        )
        self._username = attrs["n"].replace("=2C", ",").replace("=3D", "=")
        rnonce = attrs["r"] + self.snonce_extra
        self._server_first = (
            f"r={rnonce},s={base64.b64encode(self.salt).decode()},"
            f"i={self.iterations}"
        )
        return self._server_first.encode("utf-8")

    def server_final(self, client_final: bytes) -> bytes | None:
        """Returns the v=... message on success, None on bad credentials."""
        import base64
        import hashlib
        import hmac

        text = client_final.decode("utf-8")
        parts = dict(p.split("=", 1) for p in text.split(","))
        without_proof = text.rsplit(",p=", 1)[0]
        auth_message = ",".join(
            [self._client_first_bare, self._server_first, without_proof]
        ).encode("utf-8")
        password = self.credentials.get(self._username)
        if password is None:
            return None
        salted = scram_salted_password(
            password, self.salt, self.iterations, self.hash_name
        )
        client_key = hmac.digest(salted, b"Client Key", self.hash_name)
        stored_key = hashlib.new(self.hash_name, client_key).digest()
        signature = hmac.digest(stored_key, auth_message, self.hash_name)
        proof = base64.b64decode(parts["p"])
        recovered = bytes(a ^ b for a, b in zip(proof, signature))
        if not hmac.compare_digest(
            hashlib.new(self.hash_name, recovered).digest(), stored_key
        ):
            return None
        server_key = hmac.digest(salted, b"Server Key", self.hash_name)
        v = base64.b64encode(
            hmac.digest(server_key, auth_message, self.hash_name)
        ).decode()
        return f"v={v}".encode("utf-8")


class _ConnState:
    """Per-connection SASL progress: None mechanism → handshake pending."""

    def __init__(self, required: bool):
        self.required = required
        self.authenticated = not required
        self.scram: _ScramServer | None = None


class _Disconnect(Exception):
    """Close the connection without replying (pre-auth API on a SASL
    listener — what a real broker does)."""


@dataclass
class _PartitionLog:
    """Append-only in-memory log of RAW record batches, stored the way a
    real broker stores them: CRC-validated on append, base-offset field
    rewritten to the assigned position (legal without re-CRC — baseOffset
    sits outside the v2 CRC coverage, which is exactly why Kafka moved it
    there), decoded lazily only when something reads records."""

    batches: list[tuple[int, int, bytes]] = field(default_factory=list)
    next_offset: int = 0
    #: first offset still present — advances when retention/DeleteRecords
    #: drops old batches (a real log's logStartOffset)
    log_start: int = 0

    @property
    def high_watermark(self) -> int:
        return self.next_offset

    def truncate_before(self, offset: int) -> None:
        """Retention/DeleteRecords semantics: drop every batch whose LAST
        record sits below ``offset`` (whole batches only, like segment
        deletion) and advance logStartOffset. Fetches below it must then
        answer OFFSET_OUT_OF_RANGE."""
        kept = []
        for base, count, blob in self.batches:
            if base + count - 1 >= offset:
                kept.append((base, count, blob))
        self.batches = kept
        self.log_start = max(self.log_start, offset)

    @property
    def records(self) -> list[Record]:
        out: list[Record] = []
        for _base, _count, raw in self.batches:
            # CRC verified on append; skip re-verification on read
            out.extend(decode_record_batches(raw, verify_crc=False))
        return out

    def append(self, record_set: bytes) -> int:
        """Validate every batch in the set, assign offsets, store raw.
        Raises ValueError on CRC mismatch / wrong magic (CORRUPT_MESSAGE)."""
        return self.append_scanned(record_set, scan_record_set(record_set))

    def append_scanned(
        self, record_set: bytes, windows: list[tuple[int, int, int]]
    ) -> int:
        """Offset assignment + store for an ALREADY-VALIDATED record set
        (``windows`` = :func:`scan_record_set` output, computed in the
        listener process so the store's critical section is pure memcpy +
        base-offset rewrite — legal without re-CRC because baseOffset sits
        outside the v2 CRC coverage, which is exactly why Kafka moved it
        there)."""
        base = self.next_offset
        nxt = base
        staged: list[tuple[int, int, bytes]] = []
        for pos, end, count in windows:
            raw = bytearray(record_set[pos:end])
            struct.pack_into(">q", raw, 0, nxt)
            staged.append((nxt, count, bytes(raw)))
            nxt += count
        self.batches.extend(staged)
        self.next_offset = nxt
        return base

    def raw_from(self, offset: int, end: int | None = None) -> bytes:
        """Concatenated stored batches covering ``offset`` onward (a batch
        straddling the offset is returned whole — consumers filter by
        record offset, as real Kafka consumers must). ``end`` caps the
        window at the last stable offset for read_committed fetches:
        batches starting at or past it are withheld."""
        return b"".join(
            raw
            for base, count, raw in self.batches
            if base + count > offset and (end is None or base < end)
        )


class _GroupState:
    """Classic-protocol group coordination state (one per group id).

    States: Empty → Joining (a rebalance round is collecting JoinGroups)
    → AwaitingSync (generation bumped, leader must SyncGroup) → Stable.
    Blocking happens on this object's own condition — never on the
    broker-wide lock — because JoinGroup/SyncGroup handlers park their
    connection thread until the round completes, like a real coordinator.
    """

    def __init__(self):
        self.lock = threading.Lock()
        self.cond = threading.Condition(self.lock)
        self.state = "Empty"
        self.generation = 0
        # member_id -> {"meta": subscription bytes, "hb": monotonic,
        #               "timeout": session seconds}
        self.members: dict[str, dict] = {}
        self.pending: set[str] = set()   # members re-joined this round
        self.deadline = 0.0
        self.initial_round = True        # empty-group join waits the full
        self.leader: str | None = None   # initial-delay window for peers
        self.assignments: dict[str, bytes] = {}
        self.next_member = 1


def scan_record_set(record_set: bytes) -> list[tuple[int, int, int]]:
    """Validate a produce record set WITHOUT mutating any state: every
    batch's framing, magic and CRC32C are checked and the batch windows
    returned as (start, end, record_count). Runs in the LISTENER process
    so the multi-process cluster spreads CRC work across cores; the store
    only assigns offsets and memcpys. Raises ValueError on corruption
    (CORRUPT_MESSAGE), exactly like the previous in-append validation."""
    pos = 0
    staged: list[tuple[int, int, int]] = []
    while pos + 12 <= len(record_set):
        (batch_len,) = struct.unpack_from(">i", record_set, pos + 8)
        end = pos + 12 + batch_len
        if end > len(record_set):
            raise ValueError("truncated record batch")
        magic = record_set[pos + 16]
        if magic != 2:
            raise ValueError(f"unsupported record batch magic {magic}")
        (crc,) = struct.unpack_from(">I", record_set, pos + 17)
        if crc32c(record_set[pos + 21:end]) != crc:
            raise ValueError("record batch CRC32C mismatch")
        (count,) = struct.unpack_from(">i", record_set, pos + 57)
        staged.append((pos, end, count))
        pos = end
    if pos != len(record_set):
        raise ValueError("trailing garbage after record batches")
    return staged


class _BrokerState:
    """The broker-side STATE MACHINE, split from the protocol listeners:
    logs, idempotent-producer state, transactions, group offsets, group
    membership, and cluster topology/liveness — everything brokers of one
    cluster share. Thread-safe behind its own lock.

    Three deployments:

    - single ``MiniBroker``: the broker owns a private instance (direct
      method calls, no extra hops — the default conformance tier).
    - threaded ``MiniCluster``: N listeners in one process share one
      instance (unit-test tier; instant ``set_alive`` failover).
    - ``MiniClusterProc``: the instance lives in a store PROCESS behind
      :class:`StoreServer`; N broker processes reach it through
      :class:`_RemoteState` (pickle-RPC) and prove liveness with
      heartbeats — the stand-in for replication + controller, with the
      per-batch CPU (frame parse, CRC, response encode) genuinely
      parallel across broker processes.
    """

    def __init__(
        self, num_partitions: int = 3, hb_timeout: float | None = None
    ):
        self.num_partitions = num_partitions
        self.lock = threading.Lock()
        self._logs: dict[tuple[str, int], _PartitionLog] = {}
        self._topics: set[str] = set()
        self._group_offsets: dict[tuple[str, str, int], int] = {}
        self._producer_state: dict[
            tuple[int, str, int], tuple[int, dict[int, int], int]
        ] = {}
        self._txn_producers: dict[str, tuple[int, int]] = {}
        self._txns: dict[int, dict] = {}
        self._aborted: dict[tuple[str, int], list[tuple[int, int]]] = {}
        self._groups: dict[str, _GroupState] = {}
        # per-node producer-id ranges: node 0 of a single-broker topology
        # allocates from 1000 unbounded; MiniCluster/Proc stride per node
        self._next_pid: dict[int, int] = {0: 1000}
        self._pid_limit: dict[int, int | None] = {0: None}
        # topology/liveness: node_id -> (host, port); alive flags flipped
        # directly (threaded tiers) or reaped from heartbeat age (process
        # tier, hb_timeout seconds)
        self._nodes: dict[int, tuple[str, int]] = {}
        self._alive: dict[int, bool] = {}
        self._last_hb: dict[int, float] = {}
        self._hb_timeout = hb_timeout

    # -- topology / liveness ----------------------------------------------
    def register_node(
        self, node_id: int, host: str, port: int, stride: bool = False
    ) -> None:
        with self.lock:
            self._nodes[node_id] = (host, port)
            self._alive[node_id] = True
            self._last_hb[node_id] = time.monotonic()
            if stride:
                self._next_pid.setdefault(node_id, 1000 + node_id * 1_000_000)
                self._pid_limit[node_id] = (node_id + 1) * 1_000_000

    def set_alive(self, node_id: int, alive: bool) -> None:
        with self.lock:
            self._alive[node_id] = alive
            if alive:
                self._last_hb[node_id] = time.monotonic()

    def node_heartbeat(self, node_id: int) -> None:
        with self.lock:
            self._last_hb[node_id] = time.monotonic()
            self._alive[node_id] = True

    def alive_nodes(self) -> list[tuple[int, str, int]]:
        """(node_id, host, port) of every live node, node-id order. With
        a heartbeat timeout configured, staleness IS death — the process
        tier's failure detector (a SIGKILLed broker stops heartbeating
        and drops out within ~timeout seconds, like a session-expired
        broker leaving the controller's view)."""
        with self.lock:
            now = time.monotonic()
            out = []
            for nid in sorted(self._nodes):
                alive = self._alive.get(nid, False)
                if (
                    alive
                    and self._hb_timeout is not None
                    and now - self._last_hb.get(nid, 0.0) > self._hb_timeout
                ):
                    alive = False
                    self._alive[nid] = False
                if alive:
                    out.append((nid, *self._nodes[nid]))
            return out

    def registered_count(self) -> int:
        with self.lock:
            return len(self._nodes)

    # -- producer ids ------------------------------------------------------
    def _alloc_producer_id_locked(self, node_id: int) -> int:
        pid = self._next_pid.setdefault(node_id, 1000 + node_id * 1_000_000)
        limit = self._pid_limit.get(node_id)
        if limit is not None and pid >= limit:
            raise AssertionError(
                f"node {node_id} exhausted its producer-id stride "
                f"(limit {limit}); widen the per-node stride"
            )
        self._next_pid[node_id] = pid + 1
        return pid

    def get_next_pid(self, node_id: int) -> int:
        with self.lock:
            return self._next_pid.setdefault(
                node_id, 1000 + node_id * 1_000_000
            )

    def set_next_pid(self, node_id: int, value: int) -> None:
        with self.lock:
            self._next_pid[node_id] = value

    def get_pid_limit(self, node_id: int) -> int | None:
        with self.lock:
            return self._pid_limit.get(node_id)

    # -- topics ------------------------------------------------------------
    def _ensure_topic_locked(self, topic: str) -> None:
        self._topics.add(topic)
        for p in range(self.num_partitions):
            self._logs.setdefault((topic, p), _PartitionLog())

    def ensure_topic(self, topic: str) -> None:
        with self.lock:
            self._ensure_topic_locked(topic)

    def topics_snapshot(self, requested: list[str] | None) -> list[str]:
        """Metadata's topic list; requesting a topic auto-creates it
        (auto.create.topics.enable=true parity)."""
        with self.lock:
            if not requested:
                return sorted(self._topics)
            for t in requested:
                self._ensure_topic_locked(t)
            return list(requested)

    # -- produce -----------------------------------------------------------
    def produce_many(
        self,
        items: list[tuple[str, int, bytes, list[tuple[int, int, int]] | None]],
    ) -> list[tuple[int, int]]:
        """(topic, pid, record_set, staged_windows|None) per partition of
        one Produce request → (err_code, base_offset). ``staged`` is the
        listener-side :func:`scan_record_set` result; None = the scan
        failed (CORRUPT_MESSAGE). One lock hold for the whole request,
        like the previous in-handler section."""
        out: list[tuple[int, int]] = []
        with self.lock:
            for topic, pid, record_set, staged in items:
                if topic not in self._topics:
                    self._ensure_topic_locked(topic)
                log = self._logs.get((topic, pid))
                if log is None:
                    out.append((ERR_UNKNOWN_TOPIC_OR_PARTITION, -1))
                    continue
                if staged is None:
                    out.append((ERR_CORRUPT_MESSAGE, -1))
                    continue
                seq_info = _parse_producer_seq(record_set)
                cache: dict[int, int] = {}
                known_epoch = 0
                if seq_info is not None:
                    prod_id, p_epoch, base_seq, count = seq_info
                    key = (prod_id, topic, pid)
                    next_seq, cache, known_epoch = self._producer_state.get(
                        key, (0, {}, p_epoch)
                    )
                    if p_epoch > known_epoch:
                        # epoch bump (KIP-98 fencing): new instance starts
                        # sequences from 0 — drop the fenced dedup state
                        next_seq, cache, known_epoch = 0, {}, p_epoch
                    elif p_epoch < known_epoch:
                        out.append((ERR_INVALID_PRODUCER_EPOCH, -1))
                        continue
                    if base_seq in cache:
                        # replayed batch still in the 5-batch window: ack
                        # with the ORIGINAL offset, no append
                        out.append((ERR_NONE, cache[base_seq]))
                        continue
                    if base_seq < next_seq:
                        out.append((ERR_DUPLICATE_SEQUENCE_NUMBER, -1))
                        continue
                    if base_seq > next_seq:
                        out.append((ERR_OUT_OF_ORDER_SEQUENCE_NUMBER, -1))
                        continue
                base = log.append_scanned(record_set, staged)
                out.append((ERR_NONE, base))
                if seq_info is not None and seq_info[0] in self._txns:
                    txn = self._txns[seq_info[0]]
                    if (topic, pid) in txn["partitions"]:
                        txn["first_offsets"].setdefault((topic, pid), base)
                if seq_info is not None:
                    cache[base_seq] = base
                    while len(cache) > 5:  # real broker keeps last 5
                        cache.pop(min(cache))
                    self._producer_state[(seq_info[0], topic, pid)] = (
                        seq_info[2] + seq_info[3], cache, known_epoch
                    )
        return out

    # -- fetch / offsets ---------------------------------------------------
    def fetch_many(
        self, parts: list[tuple[str, int, int]], isolation: int
    ) -> list[tuple[int, int, int, list[tuple[int, int]], bytes]]:
        """(topic, pid, offset) → (err, hwm, lso, aborted, record_set)."""
        out = []
        with self.lock:
            for topic, pid, offset in parts:
                log = self._logs.get((topic, pid))
                if log is None:
                    out.append(
                        (ERR_UNKNOWN_TOPIC_OR_PARTITION, -1, -1, [], b"")
                    )
                    continue
                hwm = log.high_watermark
                if offset < log.log_start or offset > hwm:
                    out.append((ERR_OFFSET_OUT_OF_RANGE, hwm, hwm, [], b""))
                    continue
                lso = hwm
                for txn in self._txns.values():
                    first = txn["first_offsets"].get((topic, pid))
                    if first is not None:
                        lso = min(lso, first)
                end = lso if isolation == 1 else hwm
                record_set = log.raw_from(offset, end) if offset < end else b""
                aborted = (
                    list(self._aborted.get((topic, pid), []))
                    if isolation == 1
                    else []
                )
                out.append((ERR_NONE, hwm, lso, aborted, record_set))
        return out

    def list_offsets_many(
        self, parts: list[tuple[str, int, int]], isolation: int
    ) -> list[tuple[int, int]]:
        from .kafka_wire import TS_EARLIEST, TS_LATEST

        out = []
        with self.lock:
            for topic, pid, ts in parts:
                log = self._logs.get((topic, pid))
                if log is None:
                    out.append((ERR_UNKNOWN_TOPIC_OR_PARTITION, -1))
                    continue
                if ts == TS_LATEST:
                    offset = log.high_watermark
                    if isolation == 1:
                        # read_committed: answer the LAST STABLE OFFSET so
                        # planners stop at open txns
                        for txn in self._txns.values():
                            first = txn["first_offsets"].get((topic, pid))
                            if first is not None:
                                offset = min(offset, first)
                elif ts == TS_EARLIEST:
                    offset = log.log_start  # advances on truncation
                else:  # first offset with timestamp >= ts; real broker
                    # answers -1 when none exists (consumers normalize)
                    offset = next(
                        (
                            rec.offset
                            for rec in log.records
                            if rec.timestamp_ms >= ts
                        ),
                        -1,
                    )
                out.append((ERR_NONE, offset))
        return out

    def delete_records_many(
        self, parts: list[tuple[str, int, int]]
    ) -> list[tuple[int, int]]:
        out = []
        with self.lock:
            for topic, pid, offset in parts:
                log = self._logs.get((topic, pid))
                if log is None:
                    out.append((ERR_UNKNOWN_TOPIC_OR_PARTITION, -1))
                    continue
                target = log.high_watermark if offset == -1 else offset
                if target > log.high_watermark:
                    out.append((ERR_OFFSET_OUT_OF_RANGE, -1))
                    continue
                log.truncate_before(target)
                out.append((ERR_NONE, log.log_start))
        return out

    def offset_commit_many(
        self, group: str, parts: list[tuple[str, int, int]]
    ) -> None:
        with self.lock:
            for topic, pid, off in parts:
                self._group_offsets[(group, topic, pid)] = off

    def offset_fetch_many(
        self, group: str, parts: list[tuple[str, int]]
    ) -> list[int]:
        with self.lock:
            return [
                self._group_offsets.get((group, topic, pid), -1)
                for topic, pid in parts
            ]

    # -- transactions ------------------------------------------------------
    def _check_txn_epoch_locked(
        self, txn_id: str | None, pid: int, epoch: int
    ) -> int:
        known = self._txn_producers.get(txn_id or "")
        if known is None or known[0] != pid:
            return ERR_INVALID_TXN_STATE
        if known[1] != epoch:
            return ERR_INVALID_PRODUCER_EPOCH
        return ERR_NONE

    def init_producer_id(
        self, node_id: int, txn_id: str | None
    ) -> tuple[int, int, int]:
        """→ (err, producer_id, epoch)."""
        with self.lock:
            if txn_id is None:
                return ERR_NONE, self._alloc_producer_id_locked(node_id), 0
            # transactional: stable pid per transactional id, epoch BUMP
            # fences earlier instances (KIP-98); a still-open transaction
            # from the fenced instance is aborted coordinator-side
            if txn_id in self._txn_producers:
                pid, epoch = self._txn_producers[txn_id]
                epoch += 1
            else:
                pid = self._alloc_producer_id_locked(node_id)
                epoch = 0
            self._txn_producers[txn_id] = (pid, epoch)
            if pid in self._txns:
                self._finish_txn_locked(pid, committed=False)
            return ERR_NONE, pid, epoch

    def add_partitions_to_txn(
        self,
        txn_id: str | None,
        pid: int,
        epoch: int,
        topics: list[tuple[str, list[int]]],
    ) -> int:
        with self.lock:
            code = self._check_txn_epoch_locked(txn_id, pid, epoch)
            if code == ERR_NONE:
                txn = self._txns.setdefault(
                    pid,
                    {"txn_id": txn_id, "epoch": epoch,
                     "partitions": set(), "first_offsets": {},
                     "pending_offsets": {}},
                )
                for topic, parts in topics:
                    self._ensure_topic_locked(topic)
                    for p in parts:
                        txn["partitions"].add((topic, p))
            return code

    def add_offsets_to_txn(
        self, txn_id: str | None, pid: int, epoch: int
    ) -> int:
        with self.lock:
            code = self._check_txn_epoch_locked(txn_id, pid, epoch)
            if code == ERR_NONE:
                self._txns.setdefault(
                    pid,
                    {"txn_id": txn_id, "epoch": epoch,
                     "partitions": set(), "first_offsets": {},
                     "pending_offsets": {}},
                )
            return code

    def txn_offset_commit(
        self,
        txn_id: str | None,
        group: str | None,
        pid: int,
        epoch: int,
        offsets: list[tuple[str, int, int]],
    ) -> int:
        with self.lock:
            code = self._check_txn_epoch_locked(txn_id, pid, epoch)
            txn = self._txns.get(pid)
            if code == ERR_NONE and txn is None:
                # TxnOffsetCommit without a preceding AddOffsetsToTxn —
                # the coordinator never opened this transaction for the
                # group (real brokers answer INVALID_TXN_STATE)
                code = ERR_INVALID_TXN_STATE
            if code == ERR_NONE:
                for topic, p, off in offsets:
                    txn["pending_offsets"][(group, topic, p)] = off
            return code

    def _finish_txn_locked(self, pid: int, committed: bool) -> None:
        """Write commit/abort control markers to every partition of the
        open transaction, apply offsets staged by TxnOffsetCommit (commit
        only — aborts drop them), and (on abort) extend the aborted-txn
        index. Caller holds self.lock."""
        txn = self._txns.pop(pid, None)
        if txn is None:
            return
        if committed:
            for key, off in txn.get("pending_offsets", {}).items():
                self._group_offsets[key] = off
        # the marker carries the coordinator's CURRENT epoch (bumped when
        # this finish is an InitProducerId fence-abort) and, like real
        # Kafka's WriteTxnMarkers, updates each partition's producer state
        # to it — so a fenced zombie's later raw Produce to a partition it
        # had already registered is rejected with INVALID_PRODUCER_EPOCH
        # instead of sliding past the stale partition-side epoch.
        cur = self._txn_producers.get(txn["txn_id"] or "")
        marker_epoch = max(txn["epoch"], cur[1] if cur else txn["epoch"])
        key = struct.pack(">hh", 0, 1 if committed else 0)  # version, type
        value = struct.pack(">hi", 0, 0)  # version, coordinator_epoch
        for topic, p in sorted(txn["partitions"]):
            log = self._logs.get((topic, p))
            if log is None:
                continue
            state = self._producer_state.get((pid, topic, p))
            if state is not None and marker_epoch > state[2]:
                self._producer_state[(pid, topic, p)] = (0, {}, marker_epoch)
            marker = encode_record_batch(
                [Record(key=key, value=value)],
                producer_id=pid,
                producer_epoch=marker_epoch,
                transactional=True,
                control=True,
            )
            log.append(marker)
            if not committed and (topic, p) in txn["first_offsets"]:
                self._aborted.setdefault((topic, p), []).append(
                    (pid, txn["first_offsets"][(topic, p)])
                )

    def end_txn(
        self, txn_id: str | None, pid: int, epoch: int, committed: bool
    ) -> int:
        with self.lock:
            code = self._check_txn_epoch_locked(txn_id, pid, epoch)
            if code == ERR_NONE and pid not in self._txns:
                code = ERR_INVALID_TXN_STATE  # EndTxn with nothing open
            if code == ERR_NONE:
                self._finish_txn_locked(pid, committed)
            return code

    # -- classic-protocol group membership ---------------------------------
    def _group(self, gid: str) -> _GroupState:
        with self.lock:
            g = self._groups.get(gid)
            if g is None:
                g = self._groups[gid] = _GroupState()
            return g

    @staticmethod
    def _purge_expired(g: _GroupState, now: float) -> bool:
        """g.lock held: drop members whose session timed out."""
        dead = [
            m for m, st in g.members.items() if now - st["hb"] > st["timeout"]
        ]
        for m in dead:
            del g.members[m]
            g.pending.discard(m)
            g.assignments.pop(m, None)
        return bool(dead)

    @staticmethod
    def _begin_rebalance(
        g: _GroupState,
        now: float,
        initial_delay: float,
        rebalance_timeout: float,
        initial: bool = False,
    ) -> None:
        """g.lock held: open a new join round. An empty-group round waits
        the full initial delay (group.initial.rebalance.delay.ms) so
        concurrently-starting peers land in one generation; a re-join
        round completes as soon as every known member re-joined."""
        g.state = "Joining"
        g.pending = set()
        g.initial_round = initial
        g.deadline = now + (initial_delay if initial else rebalance_timeout)
        g.cond.notify_all()

    def group_join(
        self,
        gid: str,
        session_ms: int,
        member_id: str,
        meta: bytes,
        initial_delay: float,
        rebalance_timeout: float,
    ) -> tuple[int, int, str, str, list[tuple[str, bytes]]]:
        """Blocking join (parks until the round completes, like a real
        coordinator parks the connection) →
        (err, generation, leader, member_id, members[leader only])."""
        g = self._group(gid)
        with g.lock:
            now = time.monotonic()
            if self._purge_expired(g, now) and g.state == "Stable":
                self._begin_rebalance(g, now, initial_delay, rebalance_timeout)
            if member_id == "":
                member_id = f"{gid}-member-{g.next_member}"
                g.next_member += 1
            elif member_id not in g.members:
                # an id from a generation the coordinator already dropped
                return ERR_UNKNOWN_MEMBER_ID, -1, "", "", []
            g.members[member_id] = {
                "meta": meta, "hb": now, "timeout": session_ms / 1000.0
            }
            if g.state in ("Empty", "Stable", "AwaitingSync"):
                self._begin_rebalance(
                    g, now, initial_delay, rebalance_timeout,
                    initial=g.state == "Empty",
                )
            g.pending.add(member_id)
            g.cond.notify_all()
            while g.state == "Joining":
                now = time.monotonic()
                done = (
                    now >= g.deadline
                    if g.initial_round
                    else (g.pending >= set(g.members) or now >= g.deadline)
                )
                if done:  # first waker finalizes the round
                    g.members = {
                        m: st for m, st in g.members.items() if m in g.pending
                    }
                    g.generation += 1
                    g.leader = min(g.members) if g.members else None
                    g.assignments = {}
                    g.state = "AwaitingSync" if g.members else "Empty"
                    g.cond.notify_all()
                    break
                g.cond.wait(timeout=max(g.deadline - now, 0.01))
            if member_id not in g.members:
                return ERR_UNKNOWN_MEMBER_ID, -1, "", "", []
            members = (
                [(mid, g.members[mid]["meta"]) for mid in sorted(g.members)]
                if member_id == g.leader
                else []
            )
            return ERR_NONE, g.generation, g.leader or "", member_id, members

    def group_sync(
        self,
        gid: str,
        gen: int,
        member_id: str,
        provided: dict[str, bytes],
        rebalance_timeout: float,
    ) -> tuple[int, bytes]:
        g = self._group(gid)
        with g.lock:
            if member_id not in g.members:
                return ERR_UNKNOWN_MEMBER_ID, b""
            if gen != g.generation:
                return ERR_ILLEGAL_GENERATION, b""
            if provided and member_id == g.leader:
                g.assignments = provided
                g.state = "Stable"
                g.cond.notify_all()
            deadline = time.monotonic() + rebalance_timeout
            while g.state == "AwaitingSync" and g.generation == gen:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                g.cond.wait(timeout=min(remaining, 0.05))
            if g.generation != gen or g.state != "Stable":
                return ERR_REBALANCE_IN_PROGRESS, b""
            g.members[member_id]["hb"] = time.monotonic()
            return ERR_NONE, g.assignments.get(member_id, b"")

    def group_heartbeat(
        self,
        gid: str,
        gen: int,
        member_id: str,
        initial_delay: float,
        rebalance_timeout: float,
    ) -> int:
        g = self._group(gid)
        with g.lock:
            now = time.monotonic()
            if self._purge_expired(g, now) and g.state == "Stable":
                self._begin_rebalance(g, now, initial_delay, rebalance_timeout)
            if member_id not in g.members:
                return ERR_UNKNOWN_MEMBER_ID
            g.members[member_id]["hb"] = now
            if gen != g.generation:
                return ERR_ILLEGAL_GENERATION
            if g.state != "Stable":
                return ERR_REBALANCE_IN_PROGRESS
            return ERR_NONE

    def group_leave(
        self,
        gid: str,
        member_id: str,
        initial_delay: float,
        rebalance_timeout: float,
    ) -> int:
        g = self._group(gid)
        with g.lock:
            if member_id not in g.members:
                return ERR_UNKNOWN_MEMBER_ID
            del g.members[member_id]
            g.pending.discard(member_id)
            g.assignments.pop(member_id, None)
            if not g.members:
                g.state = "Empty"
            elif g.state in ("Stable", "AwaitingSync"):
                self._begin_rebalance(
                    g, time.monotonic(), initial_delay, rebalance_timeout
                )
            g.cond.notify_all()
            return ERR_NONE

    # -- test/assertion helpers -------------------------------------------
    def topic_raw(self, topic: str, num_partitions: int) -> list[bytes]:
        """Per-partition raw batch bytes (decoded caller-side so Record
        objects never cross the RPC boundary)."""
        with self.lock:
            return [
                self._logs.get((topic, p), _PartitionLog()).raw_from(0)
                for p in range(num_partitions)
            ]

    def topic_hwm_sum(self, topic: str) -> int:
        with self.lock:
            return sum(
                log.high_watermark
                for (t, _p), log in self._logs.items()
                if t == topic
            )


def _parse_producer_seq(
    record_set: bytes,
) -> tuple[int, int, int, int] | None:
    """(producerId, epoch, baseSequence, recordCount) of a single-batch
    record set, or None for non-idempotent batches. Offsets per the v2
    batch layout: producerId at +43, epoch at +51, baseSequence at
    +53, count at +57."""
    if len(record_set) < 61:
        return None
    (prod_id,) = struct.unpack_from(">q", record_set, 43)
    if prod_id < 0:
        return None
    (epoch,) = struct.unpack_from(">h", record_set, 51)
    (base_seq,) = struct.unpack_from(">i", record_set, 53)
    (count,) = struct.unpack_from(">i", record_set, 57)
    if base_seq < 0:
        return None
    return prod_id, epoch, base_seq, count


class MiniBroker:
    """``with MiniBroker() as b: ... b.bootstrap`` → ``"127.0.0.1:<port>"``."""

    def __init__(
        self,
        num_partitions: int = 3,
        host: str = "127.0.0.1",
        port: int = 0,
        sasl_credentials: dict[str, str] | None = None,
        ssl_context=None,
        node_id: int = 0,
        state: "_BrokerState | None" = None,
        clustered: bool = False,
    ):
        self.num_partitions = num_partitions
        self.node_id = node_id
        #: set by MiniCluster for back-compat introspection — all brokers
        #: of the threaded cluster (self included)
        self.cluster: "list[MiniBroker] | None" = None
        #: toggled by start()/stop(); dead nodes drop out of leadership
        #: and coordination (topology lives in the shared state)
        self.alive = False
        self.host = host
        self.sasl_credentials = sasl_credentials
        self.ssl_context = ssl_context
        #: the state machine — private by default; a MiniCluster shares
        #: one across brokers, a MiniClusterProc broker gets a
        #: _RemoteState proxy to the store process
        self.state = state if state is not None else _BrokerState(num_partitions)
        #: clustered=True: this broker ENFORCES topology (NOT_LEADER /
        #: NOT_COORDINATOR on wrong-node requests); False: classic
        #: single-node mode leading every partition and key
        self.clustered = clustered
        # brief topology cache for remote state (metadata-propagation
        # delay stand-in); local state is read directly for instant
        # failover semantics in the threaded tiers
        self._topo_cache: tuple[float, list[tuple[int, str, int]]] | None = None
        self._topo_ttl = 0.05 if isinstance(state, _RemoteState) else 0.0
        # initial_rebalance_delay_s is the empty-group join window
        # (group.initial.rebalance.delay.ms)
        self.initial_rebalance_delay_s = 0.3
        self.rebalance_timeout_s = 3.0
        self._conn_lock = threading.Lock()
        self._active: set[socket.socket] = set()
        broker = self

        class _Handler(socketserver.BaseRequestHandler):
            def handle(self):  # one connection, many requests
                sock = self.request
                with broker._conn_lock:
                    broker._active.add(sock)
                sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                if broker.ssl_context is not None:
                    try:
                        sock = broker.ssl_context.wrap_socket(
                            sock, server_side=True
                        )
                    except OSError:
                        return
                state = _ConnState(required=broker.sasl_credentials is not None)
                try:
                    while True:
                        raw = sock.recv(4)
                        if len(raw) < 4:
                            return
                        (size,) = struct.unpack(">i", raw)
                        frame = _recv_exact(sock, size)
                        resp = broker._dispatch(frame, state)
                        if resp is not None:
                            sock.sendall(struct.pack(">i", len(resp)) + resp)
                except (ConnectionError, OSError):
                    return
                except _Disconnect:
                    return  # real-broker behavior: drop the connection
                finally:
                    with broker._conn_lock:
                        broker._active.discard(sock)

        class _Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = _Server((host, port), _Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    # -- lifecycle --------------------------------------------------------
    @property
    def bootstrap(self) -> str:
        return f"{self.host}:{self.port}"

    def start(self) -> "MiniBroker":
        # alive BEFORE the listener serves: a request racing startup must
        # never compute leader/coordinator placement over a partial alive
        # set (clients would recover via NOT_LEADER retry, but the routing
        # should be consistent from the first byte served)
        self.alive = True
        if self.clustered:
            self.state.register_node(self.node_id, self.host, self.port,
                                     stride=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.alive = False
        if self.clustered:
            try:
                self.state.set_alive(self.node_id, False)
            except Exception:
                pass  # store already gone (process-tier teardown order)
        self._server.shutdown()
        self._server.server_close()
        with self._conn_lock:  # sever connections like a real process exit
            for s in list(self._active):
                try:
                    s.shutdown(socket.SHUT_RDWR)
                except OSError:
                    pass
                try:
                    s.close()
                except OSError:
                    pass
            self._active.clear()

    def __enter__(self) -> "MiniBroker":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- test-compat accessors (single-broker/threaded tiers reach into
    # the state store directly; the process tier uses the RPC helpers) ----
    @property
    def _logs(self) -> dict:
        return self.state._logs

    @property
    def _topics(self) -> set:
        return self.state._topics

    @property
    def _next_producer_id(self) -> int:
        return self.state.get_next_pid(self.node_id)

    @_next_producer_id.setter
    def _next_producer_id(self, value: int) -> None:
        self.state.set_next_pid(self.node_id, value)

    @property
    def _producer_id_limit(self) -> int | None:
        return self.state.get_pid_limit(self.node_id)

    def _alloc_producer_id(self) -> int:
        with self.state.lock:
            return self.state._alloc_producer_id_locked(self.node_id)

    # -- storage helpers (test assertions may use these directly) ---------
    def topic_records(self, topic: str) -> list[Record]:
        out: list[Record] = []
        for raw in self.state.topic_raw(topic, self.num_partitions):
            out.extend(decode_record_batches(raw, verify_crc=False))
        return out

    def topic_count(self, topic: str) -> int:
        """Record count without decoding (cheap enough for poll loops)."""
        return self.state.topic_hwm_sum(topic)

    def _ensure_topic(self, topic: str) -> None:
        self.state.ensure_topic(topic)

    # -- cluster topology --------------------------------------------------
    #
    # Brokers of a cluster share ONE state store (the stand-in for
    # replication + WriteTxnMarkers — a conformance fixture needs correct
    # ROUTING, not durability), but every broker ENFORCES the topology:
    # partitions it does not lead answer NOT_LEADER_FOR_PARTITION, groups
    # and transactional ids it does not coordinate answer NOT_COORDINATOR
    # — so a client that assumes bootstrap==leader==coordinator (true on
    # every single-broker test) fails loudly here, like on a real cluster.

    def _topology(self) -> list[tuple[int, str, int]]:
        """ALIVE cluster members (node_id, host, port) — a dead node's
        partitions and coordinated keys deterministically move to the
        survivors (the stand-in for leader re-election / coordinator
        migration; the shared store means the new leader serves the full
        log). Remote state is cached for ``_topo_ttl`` seconds — the
        metadata-propagation window a real cluster also has."""
        if not self.clustered:
            return [(self.node_id, self.host, self.port)]
        if self._topo_ttl > 0.0:
            now = time.monotonic()
            if self._topo_cache is not None and now - self._topo_cache[0] < self._topo_ttl:
                nodes = self._topo_cache[1]
            else:
                nodes = self.state.alive_nodes()
                self._topo_cache = (now, nodes)
        else:
            nodes = self.state.alive_nodes()
        return nodes or [(self.node_id, self.host, self.port)]

    def _leader_node(self, topic: str, pid: int) -> tuple[int, str, int]:
        import zlib as _zlib

        nodes = self._topology()
        return nodes[(_zlib.crc32(topic.encode()) + pid) % len(nodes)]

    def _coord_node(self, key: str, key_type: int) -> tuple[int, str, int]:
        import zlib as _zlib

        nodes = self._topology()
        return nodes[_zlib.crc32(f"{key_type}:{key}".encode()) % len(nodes)]

    def _leads(self, topic: str, pid: int) -> bool:
        return (
            not self.clustered
            or self._leader_node(topic, pid)[0] == self.node_id
        )

    def _coordinates(self, key: str, key_type: int) -> bool:
        return (
            not self.clustered
            or self._coord_node(key, key_type)[0] == self.node_id
        )

    # -- protocol ---------------------------------------------------------
    def _dispatch(self, frame: bytes, state: _ConnState) -> bytes | None:
        api_key, api_version, corr = struct.unpack_from(">hhi", frame, 0)
        r = _Reader(frame[8:])
        r.string()  # client_id
        if api_key == API_SASL_HANDSHAKE:
            out = self._sasl_handshake(api_version, r, state)
        elif api_key == API_SASL_AUTHENTICATE:
            out = self._sasl_authenticate(api_version, r, state)
        elif api_key == API_VERSIONS:
            out = self._api_versions(api_version, r)  # allowed pre-auth
        elif not state.authenticated:
            # a SASL listener drops clients that skip authentication
            raise _Disconnect()
        else:
            body = {
                API_VERSIONS: self._api_versions,
                API_METADATA: self._metadata,
                API_DELETE_RECORDS: self._delete_records,
                API_PRODUCE: self._produce,
                API_FETCH: self._fetch,
                API_LIST_OFFSETS: self._list_offsets,
                API_FIND_COORDINATOR: self._find_coordinator,
                API_OFFSET_COMMIT: self._offset_commit,
                API_OFFSET_FETCH: self._offset_fetch,
                API_INIT_PRODUCER_ID: self._init_producer_id,
                API_ADD_PARTITIONS_TO_TXN: self._add_partitions_to_txn,
                API_ADD_OFFSETS_TO_TXN: self._add_offsets_to_txn,
                API_TXN_OFFSET_COMMIT: self._txn_offset_commit,
                API_END_TXN: self._end_txn,
                API_JOIN_GROUP: self._join_group,
                API_SYNC_GROUP: self._sync_group,
                API_HEARTBEAT: self._heartbeat,
                API_LEAVE_GROUP: self._leave_group,
            }.get(api_key)
            if body is None:
                raise ValueError(f"MiniBroker: unsupported api_key {api_key}")
            out = body(api_version, r)
        if out is None:
            return None
        return struct.pack(">i", corr) + out

    def _sasl_handshake(self, version: int, r: _Reader, state: _ConnState) -> bytes:
        mechanism = r.string()
        offered = ["SCRAM-SHA-256", "SCRAM-SHA-512"]
        if self.sasl_credentials is None:
            return struct.pack(">hi", ERR_ILLEGAL_SASL_STATE, 0)
        if mechanism not in offered:
            out = bytearray(
                struct.pack(">hi", ERR_UNSUPPORTED_SASL_MECHANISM, len(offered))
            )
            for m in offered:
                out += _str(m)
            return bytes(out)
        state.scram = _ScramServer(mechanism, self.sasl_credentials)
        out = bytearray(struct.pack(">hi", ERR_NONE, len(offered)))
        for m in offered:
            out += _str(m)
        return bytes(out)

    def _sasl_authenticate(self, version: int, r: _Reader, state: _ConnState) -> bytes:
        auth = r.bytes_() or b""

        def resp(code: int, msg: str | None, payload: bytes) -> bytes:
            return struct.pack(">h", code) + _str(msg) + _bytes(payload)

        if state.scram is None:
            return resp(ERR_ILLEGAL_SASL_STATE, "handshake first", b"")
        try:
            if state.scram._client_first_bare is None:
                return resp(ERR_NONE, None, state.scram.server_first(auth))
            final = state.scram.server_final(auth)
        except (ValueError, KeyError) as e:
            return resp(ERR_SASL_AUTHENTICATION_FAILED, str(e), b"")
        if final is None:
            return resp(
                ERR_SASL_AUTHENTICATION_FAILED, "invalid credentials", b""
            )
        state.authenticated = True
        return resp(ERR_NONE, None, final)

    def _api_versions(self, version: int, r: _Reader) -> bytes:
        apis = [(API_PRODUCE, 3, 3), (API_FETCH, 4, 4),
                (API_LIST_OFFSETS, 1, 2),
                (API_METADATA, 0, 1), (API_VERSIONS, 0, 0),
                (API_DELETE_RECORDS, 0, 0),
                (API_FIND_COORDINATOR, 0, 1), (API_OFFSET_COMMIT, 2, 2),
                (API_OFFSET_FETCH, 1, 1), (API_INIT_PRODUCER_ID, 0, 0),
                (API_JOIN_GROUP, 0, 0), (API_SYNC_GROUP, 0, 0),
                (API_HEARTBEAT, 0, 0), (API_LEAVE_GROUP, 0, 0),
                (API_SASL_HANDSHAKE, 0, 1), (API_SASL_AUTHENTICATE, 0, 0),
                (API_ADD_OFFSETS_TO_TXN, 0, 0),
                (API_TXN_OFFSET_COMMIT, 0, 0),
                (API_ADD_PARTITIONS_TO_TXN, 0, 0),
                (API_END_TXN, 0, 0)]
        out = bytearray(struct.pack(">hi", ERR_NONE, len(apis)))
        for k, lo, hi in apis:
            out += struct.pack(">hhh", k, lo, hi)
        return bytes(out)

    def _metadata(self, version: int, r: _Reader) -> bytes:
        n = r.i32()
        requested = [r.string() for _ in range(n)] if n > 0 else None
        topics = self.state.topics_snapshot(requested)
        nodes = self._topology()
        out = bytearray()
        out += struct.pack(">i", len(nodes))  # brokers
        for nid, host, port in nodes:
            out += struct.pack(">i", nid) + _str(host)
            out += struct.pack(">i", port)
            if version >= 1:
                out += _str(None)    # rack
        if version >= 1:
            out += struct.pack(">i", nodes[0][0])  # controller_id
        out += struct.pack(">i", len(topics))
        for t in topics:
            out += struct.pack(">h", ERR_NONE)
            out += _str(t)
            if version >= 1:
                out += struct.pack(">b", 0)  # is_internal
            out += struct.pack(">i", self.num_partitions)
            for p in range(self.num_partitions):
                leader = self._leader_node(t, p)[0]
                # error, partition, leader, replicas[1]={leader},
                # isr[1]={leader}
                out += struct.pack(">hiii", ERR_NONE, p, leader, 1)
                out += struct.pack(">i", leader)
                out += struct.pack(">ii", 1, leader)
        return bytes(out)

    def _init_producer_id(self, version: int, r: _Reader) -> bytes:
        txn_id = r.string()  # null = idempotence only
        r.i32()              # transaction_timeout_ms
        if txn_id is not None and not self._coordinates(txn_id, 1):
            return struct.pack(">ihqh", 0, ERR_NOT_COORDINATOR, -1, -1)
        code, pid, epoch = self.state.init_producer_id(self.node_id, txn_id)
        return struct.pack(">ihqh", 0, code, pid, epoch)

    def _add_partitions_to_txn(self, version: int, r: _Reader) -> bytes:
        txn_id = r.string()
        pid = r.i64()
        epoch = r.i16()
        topics: list[tuple[str, list[int]]] = []
        for _ in range(r.i32()):
            topic = r.string()
            parts = [r.i32() for _ in range(r.i32())]
            topics.append((topic, parts))
        if not self._coordinates(txn_id or "", 1):
            code = ERR_NOT_COORDINATOR
        else:
            code = self.state.add_partitions_to_txn(txn_id, pid, epoch, topics)
        out = bytearray(struct.pack(">ii", 0, len(topics)))
        for topic, parts in topics:
            out += _str(topic)
            out += struct.pack(">i", len(parts))
            for p in parts:
                out += struct.pack(">ih", p, code)
        return bytes(out)

    def _add_offsets_to_txn(self, version: int, r: _Reader) -> bytes:
        """AddOffsetsToTxn v0: register a consumer group with the open
        transaction so a later TxnOffsetCommit may stage offsets into it
        (KIP-98 consume-transform-produce)."""
        txn_id = r.string()
        pid = r.i64()
        epoch = r.i16()
        r.string()  # group_id — the TXN coordinator serves this RPC
        if not self._coordinates(txn_id or "", 1):
            code = ERR_NOT_COORDINATOR
        else:
            code = self.state.add_offsets_to_txn(txn_id, pid, epoch)
        return struct.pack(">ih", 0, code)

    def _txn_offset_commit(self, version: int, r: _Reader) -> bytes:
        """TxnOffsetCommit v0: stage group offsets inside the open
        transaction. They reach the group-offsets store only when the
        transaction commits; an abort (or epoch fence) drops them."""
        txn_id = r.string()
        group = r.string()
        pid = r.i64()
        epoch = r.i16()
        requests: list[tuple[str, list[tuple[int, int]]]] = []
        for _ in range(r.i32()):
            topic = r.string()
            parts = []
            for _ in range(r.i32()):
                p = r.i32()
                off = r.i64()
                r.string()  # metadata
                parts.append((p, off))
            requests.append((topic, parts))
        if not self._coordinates(group or "", 0):
            # TxnOffsetCommit lands in __consumer_offsets — the GROUP
            # coordinator serves it (clients that send it to the txn
            # coordinator only pass on single-broker clusters)
            code = ERR_NOT_COORDINATOR
        else:
            code = self.state.txn_offset_commit(
                txn_id, group, pid, epoch,
                [(t, p, off) for t, parts in requests for p, off in parts],
            )
        out = bytearray(struct.pack(">ii", 0, len(requests)))
        for topic, parts in requests:
            out += _str(topic)
            out += struct.pack(">i", len(parts))
            for p, _off in parts:
                out += struct.pack(">ih", p, code)
        return bytes(out)

    def _end_txn(self, version: int, r: _Reader) -> bytes:
        txn_id = r.string()
        pid = r.i64()
        epoch = r.i16()
        committed = r.i8() != 0
        if not self._coordinates(txn_id or "", 1):
            code = ERR_NOT_COORDINATOR
        else:
            code = self.state.end_txn(txn_id, pid, epoch, committed)
        return struct.pack(">ih", 0, code)

    # -- classic-protocol group membership --------------------------------

    @staticmethod
    def _join_error(code: int) -> bytes:
        return (
            struct.pack(">hi", code, -1)
            + _str("") + _str("") + _str("")
            + struct.pack(">i", 0)
        )

    def _join_group(self, version: int, r: _Reader) -> bytes:
        gid = r.string()
        if not self._coordinates(gid or "", 0):
            return self._join_error(ERR_NOT_COORDINATOR)
        session_ms = r.i32()
        member_id = r.string() or ""
        r.string()  # protocol_type ("consumer")
        meta = b""
        for _ in range(r.i32()):
            name = r.string()
            m = r.bytes_() or b""
            if name == "range" or not meta:
                meta = m
        code, generation, leader, member_id, members = self.state.group_join(
            gid, session_ms, member_id, meta,
            self.initial_rebalance_delay_s, self.rebalance_timeout_s,
        )
        if code != ERR_NONE:
            return self._join_error(code)
        out = bytearray(struct.pack(">hi", ERR_NONE, generation))
        out += _str("range")
        out += _str(leader)
        out += _str(member_id)
        out += struct.pack(">i", len(members))
        for mid, mmeta in members:
            out += _str(mid)
            out += _bytes(mmeta)
        return bytes(out)

    def _sync_group(self, version: int, r: _Reader) -> bytes:
        gid = r.string()
        if not self._coordinates(gid or "", 0):
            return struct.pack(">h", ERR_NOT_COORDINATOR) + _bytes(b"")
        gen = r.i32()
        member_id = r.string() or ""
        provided: dict[str, bytes] = {}
        for _ in range(r.i32()):
            mid = r.string()
            provided[mid] = r.bytes_() or b""
        code, assignment = self.state.group_sync(
            gid, gen, member_id, provided, self.rebalance_timeout_s
        )
        return struct.pack(">h", code) + _bytes(assignment)

    def _heartbeat(self, version: int, r: _Reader) -> bytes:
        gid = r.string()
        if not self._coordinates(gid or "", 0):
            return struct.pack(">h", ERR_NOT_COORDINATOR)
        gen = r.i32()
        member_id = r.string() or ""
        code = self.state.group_heartbeat(
            gid, gen, member_id,
            self.initial_rebalance_delay_s, self.rebalance_timeout_s,
        )
        return struct.pack(">h", code)

    def _leave_group(self, version: int, r: _Reader) -> bytes:
        gid = r.string()
        if not self._coordinates(gid or "", 0):
            return struct.pack(">h", ERR_NOT_COORDINATOR)
        member_id = r.string() or ""
        code = self.state.group_leave(
            gid, member_id,
            self.initial_rebalance_delay_s, self.rebalance_timeout_s,
        )
        return struct.pack(">h", code)

    def _produce(self, version: int, r: _Reader) -> bytes | None:
        r.string()  # transactional_id
        acks = r.i16()
        r.i32()  # timeout_ms
        # parse + leader-check + CRC-scan LISTENER-side (parallel across
        # broker processes in the process tier), then ONE state call for
        # the whole request — idempotence (KIP-98) sequence validation and
        # the append itself run in the store's critical section, replays
        # dedup to the original offset instead of appending twice.
        shape: list[tuple[str, list[tuple[int, int]]]] = []
        to_store: list[
            tuple[str, int, bytes, list[tuple[int, int, int]] | None]
        ] = []
        for _ in range(r.i32()):
            topic = r.string()
            parts: list[tuple[int, int]] = []  # (pid, to_store idx | -err)
            for _ in range(r.i32()):
                pid = r.i32()
                record_set = r.bytes_() or b""
                if not self._leads(topic, pid):
                    parts.append((pid, -ERR_NOT_LEADER))
                    continue
                try:
                    staged = scan_record_set(record_set)
                except ValueError:  # CRC mismatch / undecodable batch
                    staged = None
                parts.append((pid, len(to_store)))
                to_store.append((topic, pid, record_set, staged))
            shape.append((topic, parts))
        stored = self.state.produce_many(to_store) if to_store else []
        results: list[tuple[str, list[tuple[int, int, int]]]] = []
        for topic, parts in shape:
            rp: list[tuple[int, int, int]] = []
            for pid, idx in parts:
                if idx < 0:
                    rp.append((pid, -idx, -1))
                else:
                    code, base = stored[idx]
                    rp.append((pid, code, base))
            results.append((topic, rp))
        if acks == 0:
            return None
        out = bytearray(struct.pack(">i", len(results)))
        for topic, parts in results:
            out += _str(topic)
            out += struct.pack(">i", len(parts))
            for pid, code, base in parts:
                out += struct.pack(">ihqq", pid, code, base, -1)
        out += struct.pack(">i", 0)  # throttle_time_ms
        return bytes(out)

    def _delete_records(self, version: int, r: _Reader) -> bytes:
        """DeleteRecords v0: whole-batch truncation up to the requested
        offset per partition (offset -1 = high watermark, per protocol),
        answering the new low watermark."""
        requests: list[tuple[str, list[tuple[int, int]]]] = []
        for _ in range(r.i32()):
            topic = r.string()
            parts = []
            for _ in range(r.i32()):
                parts.append((r.i32(), r.i64()))
            requests.append((topic, parts))
        r.i32()  # timeout_ms
        flat = [(t, pid, off) for t, parts in requests for pid, off in parts]
        answers = self.state.delete_records_many(flat)
        it = iter(answers)
        out = bytearray(struct.pack(">i", 0))  # throttle_time_ms
        out += struct.pack(">i", len(requests))
        for topic, parts in requests:
            out += _str(topic)
            out += struct.pack(">i", len(parts))
            for pid, _offset in parts:
                code, low = next(it)
                out += struct.pack(
                    ">iqh", pid, low if code == ERR_NONE else -1, code
                )
        return bytes(out)

    def _list_offsets(self, version: int, r: _Reader) -> bytes:
        from .kafka_wire import TS_EARLIEST, TS_LATEST

        r.i32()  # replica_id
        isolation = r.i8() if version >= 2 else 0
        requests: list[tuple[str, list[tuple[int, int]]]] = []
        for _ in range(r.i32()):
            topic = r.string()
            parts = []
            for _ in range(r.i32()):
                pid = r.i32()
                ts = r.i64()
                parts.append((pid, ts))
            requests.append((topic, parts))
        flat, flags = [], []
        for topic, parts in requests:
            for pid, ts in parts:
                if not self._leads(topic, pid):
                    flags.append(ERR_NOT_LEADER)
                    flat.append(None)
                else:
                    flags.append(None)
                    flat.append((topic, pid, ts))
        answers = iter(
            self.state.list_offsets_many(
                [x for x in flat if x is not None], isolation
            )
        )
        out = bytearray()
        if version >= 2:
            out += struct.pack(">i", 0)  # throttle_time_ms
        out += struct.pack(">i", len(requests))
        i = 0
        for topic, parts in requests:
            out += _str(topic)
            out += struct.pack(">i", len(parts))
            for pid, _ts in parts:
                if flags[i] is not None:
                    out += struct.pack(">ihqq", pid, flags[i], -1, -1)
                else:
                    code, offset = next(answers)
                    out += struct.pack(
                        ">ihqq", pid, code,
                        -1, offset if code == ERR_NONE else -1,
                    )
                i += 1
        return bytes(out)

    def _find_coordinator(self, version: int, r: _Reader) -> bytes:
        key = r.string() or ""
        key_type = 0
        if version >= 1:
            key_type = r.i8()  # 0 = group, 1 = transaction
        # any broker answers the lookup; the ANSWER is the owning node
        # (single-node mode: self)
        nid, host, port = self._coord_node(key, key_type)
        out = bytearray()
        if version >= 1:
            out += struct.pack(">i", 0)  # throttle_time_ms
        out += struct.pack(">h", ERR_NONE)
        if version >= 1:
            out += _str(None)  # error_message
        out += struct.pack(">i", nid) + _str(host)
        out += struct.pack(">i", port)
        return bytes(out)

    def _offset_commit(self, version: int, r: _Reader) -> bytes:
        group = r.string()
        r.i32()     # generation_id (-1: manual assignment)
        r.string()  # member_id
        r.i64()     # retention_time_ms
        coordinates = self._coordinates(group or "", 0)
        requests: list[tuple[str, list[int]]] = []
        flat: list[tuple[str, int, int]] = []
        n_topics = r.i32()
        for _ in range(n_topics):
            topic = r.string()
            pids = []
            for _ in range(r.i32()):
                pid = r.i32()
                off = r.i64()
                r.string()  # metadata
                pids.append(pid)
                if coordinates:
                    flat.append((topic, pid, off))
            requests.append((topic, pids))
        if coordinates and flat:
            self.state.offset_commit_many(group, flat)
        out = bytearray(struct.pack(">i", n_topics))
        code = ERR_NONE if coordinates else ERR_NOT_COORDINATOR
        for topic, pids in requests:
            out += _str(topic) + struct.pack(">i", len(pids))
            for pid in pids:
                out += struct.pack(">ih", pid, code)
        return bytes(out)

    def _offset_fetch(self, version: int, r: _Reader) -> bytes:
        group = r.string()
        coordinates = self._coordinates(group or "", 0)
        requests: list[tuple[str, list[int]]] = []
        n_topics = r.i32()
        for _ in range(n_topics):
            topic = r.string()
            pids = [r.i32() for _ in range(r.i32())]
            requests.append((topic, pids))
        flat = [(t, pid) for t, pids in requests for pid in pids]
        offs = iter(self.state.offset_fetch_many(group, flat))
        out = bytearray(struct.pack(">i", n_topics))
        code = ERR_NONE if coordinates else ERR_NOT_COORDINATOR
        for topic, pids in requests:
            out += _str(topic) + struct.pack(">i", len(pids))
            for pid in pids:
                out += struct.pack(">iq", pid, next(offs))
                out += _str(None)  # metadata
                out += struct.pack(">h", code)
        return bytes(out)

    def _fetch(self, version: int, r: _Reader) -> bytes:
        r.i32()  # replica_id
        r.i32()  # max_wait_ms
        r.i32()  # min_bytes
        r.i32()  # max_bytes
        isolation = r.i8()  # 0 read_uncommitted, 1 read_committed
        requests: list[tuple[str, list[tuple[int, int]]]] = []
        for _ in range(r.i32()):
            topic = r.string()
            parts = []
            for _ in range(r.i32()):
                pid = r.i32()
                offset = r.i64()
                r.i32()  # partition max_bytes
                parts.append((pid, offset))
            requests.append((topic, parts))
        flat, flags = [], []
        for topic, parts in requests:
            for pid, offset in parts:
                if not self._leads(topic, pid):
                    flags.append(ERR_NOT_LEADER)
                    flat.append(None)
                else:
                    flags.append(None)
                    flat.append((topic, pid, offset))
        answers = iter(
            self.state.fetch_many(
                [x for x in flat if x is not None], isolation
            )
        )
        out = bytearray(struct.pack(">i", 0))  # throttle_time_ms
        out += struct.pack(">i", len(requests))
        i = 0
        for topic, parts in requests:
            out += _str(topic)
            out += struct.pack(">i", len(parts))
            for pid, _offset in parts:
                if flags[i] is not None:
                    out += struct.pack(">ihqqi", pid, flags[i], -1, -1, 0)
                    out += _bytes(b"")
                    i += 1
                    continue
                code, hwm, lso, aborted, record_set = next(answers)
                # OFFSET_OUT_OF_RANGE carries (hwm, hwm): the data-loss
                # signal failOnDataLoss handles; UNKNOWN carries (-1, -1)
                out += struct.pack(
                    ">ihqqi", pid, code, hwm, lso, len(aborted)
                )
                for a_pid, a_first in aborted:
                    out += struct.pack(">qq", a_pid, a_first)
                out += _bytes(record_set)
                i += 1
        return bytes(out)


class MiniCluster:
    """Multi-broker MiniBroker topology: N TCP listeners, one shared state
    store, partition leaders and group/txn coordinators SPREAD across
    nodes by stable hash. The point is the client-side blind spot every
    single-broker test has — there, bootstrap == every partition's leader
    == every coordinator, so a client that never routes is still green.
    Here, a Produce to the wrong node answers NOT_LEADER_FOR_PARTITION
    and a coordinator RPC to the wrong node answers NOT_COORDINATOR, the
    same way a real cluster does (reference integration tests run against
    a real single-node Redpanda and never cover this either).

    Shared storage stands in for replication and WriteTxnMarkers — a
    conformance fixture needs correct ROUTING, not durability. Producer
    ids are spaced per node so two brokers' InitProducerId never collide.

        with MiniCluster(num_brokers=3) as cluster:
            producer = KafkaWireProducer([cluster.bootstrap])
            ...
            cluster.brokers[1].stop()   # coordinator/leader failover tests
    """

    def __init__(
        self,
        num_brokers: int = 3,
        num_partitions: int = 3,
        **broker_kwargs,
    ) -> None:
        if num_brokers < 1:
            raise ValueError("num_brokers must be >= 1")
        # one shared state machine; _active (live sockets) stays per-node
        # so stop() only severs its own connections
        self.state = _BrokerState(num_partitions)
        self.brokers = [
            MiniBroker(
                num_partitions=num_partitions, node_id=i,
                state=self.state, clustered=True, **broker_kwargs,
            )
            for i in range(num_brokers)
        ]
        for b in self.brokers:
            b.cluster = self.brokers

    @property
    def bootstrap(self) -> str:
        """All nodes, comma-separated — clients may bootstrap anywhere."""
        return ",".join(b.bootstrap for b in self.brokers)

    def start(self) -> "MiniCluster":
        # register the whole topology before ANY listener serves, so the
        # first request ever answered already sees the full alive set
        for b in self.brokers:
            b.alive = True
            self.state.register_node(b.node_id, b.host, b.port, stride=True)
        for b in self.brokers:
            b.start()
        return self

    def stop(self) -> None:
        for b in self.brokers:
            b.stop()

    def __enter__(self) -> "MiniCluster":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- assertions helpers ----------------------------------------------
    def leader_of(self, topic: str, pid: int) -> MiniBroker:
        nid = self.brokers[0]._leader_node(topic, pid)[0]
        return self.brokers[nid]

    def coordinator_of(self, key: str, key_type: int) -> MiniBroker:
        nid = self.brokers[0]._coord_node(key, key_type)[0]
        return self.brokers[nid]

    def topic_records(self, topic: str) -> list[Record]:
        return self.brokers[0].topic_records(topic)

    def topic_count(self, topic: str) -> int:
        return self.brokers[0].topic_count(topic)


# ---------------------------------------------------------------------------
# Out-of-process cluster: store process + N broker processes
# ---------------------------------------------------------------------------


class StoreServer:
    """Hosts a :class:`_BrokerState` behind a length-prefixed pickle RPC
    (request = (method, args), response = (ok, value | exception)). One
    server thread per connection, so a BLOCKING state call (group_join
    parking on its condition) parks only its own broker's connection —
    the same concurrency a real coordinator has."""

    def __init__(self, state: _BrokerState, host: str = "127.0.0.1",
                 port: int = 0):
        self.state = state
        store = self

        class _Handler(socketserver.BaseRequestHandler):
            def handle(self):
                sock = self.request
                sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                try:
                    while True:
                        raw = sock.recv(4)
                        if len(raw) < 4:
                            return
                        (size,) = struct.unpack(">i", raw)
                        method, args, kwargs = pickle.loads(
                            _recv_exact(sock, size)
                        )
                        try:
                            value = getattr(store.state, method)(
                                *args, **kwargs
                            )
                            payload = pickle.dumps((True, value))
                        except Exception as e:  # noqa: BLE001 — ship back
                            payload = pickle.dumps((False, e))
                        sock.sendall(struct.pack(">i", len(payload)) + payload)
                except (ConnectionError, OSError, EOFError):
                    return

        class _Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = _Server((host, port), _Handler)
        self.host = host
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    @property
    def address(self) -> str:
        return f"{self.host}:{self.port}"

    def start(self) -> "StoreServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()


class _RemoteState:
    """Client proxy for a :class:`StoreServer`: every `_BrokerState`
    method becomes one pickle round-trip. Connections are per-thread
    (listener handler threads block independently — a parked group_join
    must not serialize a concurrent produce)."""

    def __init__(self, host: str, port: int):
        self._addr = (host, port)
        self._local = threading.local()

    def _sock(self) -> socket.socket:
        s = getattr(self._local, "sock", None)
        if s is None:
            s = socket.create_connection(self._addr, timeout=30)
            s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            self._local.sock = s
        return s

    def _call(self, method: str, *args, **kwargs):
        payload = pickle.dumps((method, args, kwargs))
        s = self._sock()
        try:
            s.sendall(struct.pack(">i", len(payload)) + payload)
            raw = _recv_exact(s, 4)
            (size,) = struct.unpack(">i", raw)
            ok, value = pickle.loads(_recv_exact(s, size))
        except (ConnectionError, OSError, EOFError):
            # drop the broken socket so the next call reconnects
            try:
                s.close()
            finally:
                self._local.sock = None
            raise
        if not ok:
            raise value
        return value

    def __getattr__(self, method: str):
        if method.startswith("__"):
            raise AttributeError(method)
        return lambda *args, **kwargs: self._call(method, *args, **kwargs)


def _broker_process_main(
    node_id: int, store_host: str, store_port: int, num_partitions: int
) -> None:
    """Entry point of one broker process of a MiniClusterProc: connect to
    the store, serve the Kafka protocol, prove liveness with heartbeats.
    Killed with SIGKILL by the harness — no graceful teardown path, which
    is the point (the store's failure detector must notice)."""
    state = _RemoteState(store_host, store_port)
    broker = MiniBroker(
        num_partitions=num_partitions, node_id=node_id,
        state=state, clustered=True,
    ).start()

    def heartbeat() -> None:
        hb = _RemoteState(store_host, store_port)  # own socket
        while True:
            try:
                hb.node_heartbeat(node_id)
            except Exception:
                os._exit(1)  # store gone → cluster is down
            time.sleep(0.15)

    threading.Thread(target=heartbeat, daemon=True).start()
    stop = threading.Event()
    signal.signal(signal.SIGTERM, lambda *_: stop.set())
    stop.wait()
    broker.stop()


class MiniClusterProc:
    """N broker PROCESSES + one store process-boundary (the state machine
    lives in THIS process behind a :class:`StoreServer`; brokers are
    spawned children reaching it over pickle-RPC).

    vs the threaded :class:`MiniCluster`: listener CPU (frame parse,
    CRC32C validation, response encode) no longer shares one GIL — the
    engine's cluster throughput measures the engine, not the fixture.
    Liveness is heartbeat-based: SIGKILL a broker child (``kill_node``)
    and the store's failure detector drops it from the topology within
    ~``hb_timeout`` seconds, after which survivors serve its partitions
    and coordinated keys (shared store = replication stand-in), exactly
    the leader-election window a real cluster pays.
    """

    def __init__(self, num_brokers: int = 3, num_partitions: int = 3,
                 hb_timeout: float = 0.7):
        if num_brokers < 1:
            raise ValueError("num_brokers must be >= 1")
        self.num_brokers = num_brokers
        self.num_partitions = num_partitions
        self.state = _BrokerState(num_partitions, hb_timeout=hb_timeout)
        self.store = StoreServer(self.state)
        self.procs: list = []

    def start(self) -> "MiniClusterProc":
        import multiprocessing as mp

        self.store.start()
        ctx = mp.get_context("fork")
        for i in range(self.num_brokers):
            p = ctx.Process(
                target=_broker_process_main,
                args=(i, self.store.host, self.store.port,
                      self.num_partitions),
                daemon=True,
            )
            p.start()
            self.procs.append(p)
        deadline = time.monotonic() + 30
        while self.state.registered_count() < self.num_brokers:
            if time.monotonic() > deadline:
                raise RuntimeError("broker processes failed to register")
            time.sleep(0.05)
        return self

    @property
    def bootstrap(self) -> str:
        with self.state.lock:
            return ",".join(
                f"{h}:{p}" for _n, (h, p) in sorted(self.state._nodes.items())
            )

    def kill_node(self, node_id: int) -> None:
        """SIGKILL — no goodbye to the store; the failure detector earns
        its keep."""
        self.procs[node_id].kill()

    def stop(self) -> None:
        for p in self.procs:
            if p.is_alive():
                p.terminate()
        for p in self.procs:
            p.join(timeout=5)
        self.store.stop()

    def __enter__(self) -> "MiniClusterProc":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # assertion helpers (direct state access — we ARE the store process)
    def topic_count(self, topic: str) -> int:
        return self.state.topic_hwm_sum(topic)


def _main() -> None:
    """Standalone broker process: `python -m go_pq_cdc_kafka_spark.
    streaming.minibroker --port 19092 --partitions 8`.

    Benchmarks run the broker OUT OF PROCESS so its socket handling does
    not share the Spark driver's GIL — in-process threading understates
    the produce path by serializing broker CRC validation against driver
    batch planning (a real deployment's broker is always a separate
    process on separate cores). Prints one `READY host:port` line, then
    serves until SIGTERM/SIGINT."""
    import argparse
    import signal
    import sys

    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--partitions", type=int, default=3)
    ap.add_argument(
        "--cluster", type=int, default=1,
        help="N>1: run an N-node MiniClusterProc — the store lives in "
        "THIS process, the N brokers are separate child PROCESSES (no "
        "shared GIL on the listener hot path) — and accept 'kill <node>' "
        "lines on stdin for mid-run failover drills (SIGKILL + "
        "heartbeat-timeout failure detection)",
    )
    ap.add_argument(
        "--cluster-threads", action="store_true",
        help="with --cluster: use the legacy single-process threaded "
        "MiniCluster instead of broker processes",
    )
    args = ap.parse_args()

    stop = threading.Event()
    signal.signal(signal.SIGTERM, lambda *_: stop.set())
    signal.signal(signal.SIGINT, lambda *_: stop.set())

    if args.cluster > 1:
        cluster = (
            MiniCluster(num_brokers=args.cluster,
                        num_partitions=args.partitions)
            if args.cluster_threads
            else MiniClusterProc(num_brokers=args.cluster,
                                 num_partitions=args.partitions)
        ).start()
        print(f"READY {cluster.bootstrap}", flush=True)

        def control() -> None:
            # 'kill <node>' severs that broker (SIGKILL of its process in
            # the default proc topology; listener stop in --cluster-
            # threads) — leaders/coordinators fail over to survivors;
            # 'quit' or EOF (parent exit) shuts the cluster down
            for line in sys.stdin:
                parts = line.split()
                if parts[:1] == ["kill"] and len(parts) == 2:
                    node = int(parts[1])
                    if isinstance(cluster, MiniClusterProc):
                        cluster.kill_node(node)
                    else:
                        cluster.brokers[node].stop()
                    print(f"KILLED {node}", flush=True)
                elif parts[:1] == ["quit"]:
                    break
            stop.set()

        threading.Thread(target=control, daemon=True).start()
        stop.wait()
        cluster.stop()
        return

    broker = MiniBroker(
        num_partitions=args.partitions, host=args.host, port=args.port
    ).start()
    print(f"READY {broker.bootstrap}", flush=True)
    stop.wait()
    broker.stop()


if __name__ == "__main__":
    _main()
