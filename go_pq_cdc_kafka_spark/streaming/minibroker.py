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
        base = self.next_offset
        pos = 0
        staged: list[tuple[int, int, bytes]] = []
        nxt = base
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
            raw = bytearray(record_set[pos:end])
            struct.pack_into(">q", raw, 0, nxt)
            staged.append((nxt, count, bytes(raw)))
            nxt += count
            pos = end
        if pos != len(record_set):
            raise ValueError("trailing garbage after record batches")
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
    ):
        self.num_partitions = num_partitions
        self.node_id = node_id
        #: set by MiniCluster — all brokers of the cluster (self included),
        #: sharing one state store; None = classic single-node mode where
        #: this broker leads every partition and coordinates every key
        self.cluster: "list[MiniBroker] | None" = None
        #: toggled by start()/stop(); dead nodes drop out of leadership
        #: and coordination (see _nodes)
        self.alive = False
        self.host = host
        self.sasl_credentials = sasl_credentials
        self.ssl_context = ssl_context
        self._logs: dict[tuple[str, int], _PartitionLog] = {}
        self._topics: set[str] = set()
        # broker-stored consumer-group offsets: (group, topic, part) -> off
        self._group_offsets: dict[tuple[str, str, int], int] = {}
        # idempotent-produce state (KIP-98): monotonically assigned
        # producer ids, and per (producerId, topic, partition) the next
        # expected sequence plus a cache of the last 5 appended batches'
        # (baseSequence -> baseOffset) for replay dedup — the same window
        # a real broker keeps (ProducerStateManager).
        self._next_producer_id = 1000
        # exclusive upper bound for this node's id range; MiniCluster sets
        # a per-node stride so ids never collide across nodes, and the
        # allocator asserts rather than silently crossing into a
        # neighbour's range in a very long-lived fixture
        self._producer_id_limit: int | None = None
        # value: (next expected sequence, {baseSequence -> baseOffset}
        # replay cache, last seen producer epoch — a bump resets both)
        self._producer_state: dict[
            tuple[int, str, int], tuple[int, dict[int, int], int]
        ] = {}
        # transactions (KIP-98): a transactional id maps to a STABLE
        # producer id whose epoch bumps on every InitProducerId (fencing
        # earlier instances); an open transaction tracks its partitions
        # and the first offset it wrote to each (the aborted-txn index
        # entry read_committed consumers filter on)
        self._txn_producers: dict[str, tuple[int, int]] = {}
        self._txns: dict[int, dict] = {}  # pid -> open-txn state
        self._aborted: dict[tuple[str, int], list[tuple[int, int]]] = {}
        # classic-protocol group membership; initial_rebalance_delay_s is
        # the empty-group join window (group.initial.rebalance.delay.ms)
        self._groups: dict[str, _GroupState] = {}
        self.initial_rebalance_delay_s = 0.3
        self.rebalance_timeout_s = 3.0
        self._lock = threading.Lock()
        self._active: set[socket.socket] = set()
        broker = self

        class _Handler(socketserver.BaseRequestHandler):
            def handle(self):  # one connection, many requests
                sock = self.request
                with broker._lock:
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
                    with broker._lock:
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
        self._thread.start()
        return self

    def stop(self) -> None:
        self.alive = False
        self._server.shutdown()
        self._server.server_close()
        with self._lock:  # sever live connections like a real process exit
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

    # -- storage helpers (test assertions may use these directly) ---------
    def topic_records(self, topic: str) -> list[Record]:
        with self._lock:
            out: list[Record] = []
            for p in range(self.num_partitions):
                out.extend(self._logs.get((topic, p), _PartitionLog()).records)
            return out

    def topic_count(self, topic: str) -> int:
        """Record count without decoding (cheap enough for poll loops)."""
        with self._lock:
            return sum(
                log.high_watermark
                for (t, _p), log in self._logs.items()
                if t == topic
            )

    def _ensure_topic(self, topic: str) -> None:
        self._topics.add(topic)
        for p in range(self.num_partitions):
            self._logs.setdefault((topic, p), _PartitionLog())

    # -- cluster topology (MiniCluster mode) ------------------------------
    #
    # Brokers of a MiniCluster share ONE state store (the stand-in for
    # replication + WriteTxnMarkers — a conformance fixture needs correct
    # ROUTING, not durability), but every broker ENFORCES the topology:
    # partitions it does not lead answer NOT_LEADER_FOR_PARTITION, groups
    # and transactional ids it does not coordinate answer NOT_COORDINATOR
    # — so a client that assumes bootstrap==leader==coordinator (true on
    # every single-broker test) fails loudly here, like on a real cluster.

    def _nodes(self) -> "list[MiniBroker]":
        """ALIVE cluster members — a stopped node's partitions and
        coordinated keys deterministically move to the survivors (the
        stand-in for leader re-election / coordinator migration; the
        shared store means the new leader serves the full log)."""
        if not self.cluster:
            return [self]
        alive = [b for b in self.cluster if b.alive]
        return alive or [self]

    def _leader_node(self, topic: str, pid: int) -> "MiniBroker":
        import zlib as _zlib

        nodes = self._nodes()
        return nodes[(_zlib.crc32(topic.encode()) + pid) % len(nodes)]

    def _coord_node(self, key: str, key_type: int) -> "MiniBroker":
        import zlib as _zlib

        nodes = self._nodes()
        return nodes[_zlib.crc32(f"{key_type}:{key}".encode()) % len(nodes)]

    def _leads(self, topic: str, pid: int) -> bool:
        return self._leader_node(topic, pid) is self or self.cluster is None

    def _coordinates(self, key: str, key_type: int) -> bool:
        return self._coord_node(key, key_type) is self or self.cluster is None

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
        with self._lock:
            if n <= 0:
                topics = sorted(self._topics)
            else:
                topics = []
                for _ in range(n):
                    t = r.string()
                    self._ensure_topic(t)  # auto-create on metadata, like
                    topics.append(t)       # auto.create.topics.enable=true
            nodes = self._nodes()
            out = bytearray()
            out += struct.pack(">i", len(nodes))  # brokers
            for b in nodes:
                out += struct.pack(">i", b.node_id) + _str(b.host)
                out += struct.pack(">i", b.port)
                if version >= 1:
                    out += _str(None)    # rack
            if version >= 1:
                out += struct.pack(">i", nodes[0].node_id)  # controller_id
            out += struct.pack(">i", len(topics))
            for t in topics:
                out += struct.pack(">h", ERR_NONE)
                out += _str(t)
                if version >= 1:
                    out += struct.pack(">b", 0)  # is_internal
                out += struct.pack(">i", self.num_partitions)
                for p in range(self.num_partitions):
                    leader = self._leader_node(t, p).node_id
                    # error, partition, leader, replicas[1]={leader},
                    # isr[1]={leader}
                    out += struct.pack(">hiii", ERR_NONE, p, leader, 1)
                    out += struct.pack(">i", leader)
                    out += struct.pack(">ii", 1, leader)
        return bytes(out)

    @staticmethod
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

    def _alloc_producer_id(self) -> int:
        pid = self._next_producer_id
        if self._producer_id_limit is not None and pid >= self._producer_id_limit:
            raise AssertionError(
                f"node {self.node_id} exhausted its producer-id stride "
                f"(limit {self._producer_id_limit}); widen the per-node "
                "stride in MiniCluster"
            )
        self._next_producer_id = pid + 1
        return pid

    def _init_producer_id(self, version: int, r: _Reader) -> bytes:
        txn_id = r.string()  # null = idempotence only
        r.i32()              # transaction_timeout_ms
        if txn_id is not None and not self._coordinates(txn_id, 1):
            return struct.pack(">ihqh", 0, ERR_NOT_COORDINATOR, -1, -1)
        with self._lock:
            if txn_id is None:
                pid = self._alloc_producer_id()
                return struct.pack(">ihqh", 0, ERR_NONE, pid, 0)
            # transactional: stable pid per transactional id, epoch BUMP
            # fences earlier instances (KIP-98); a still-open transaction
            # from the fenced instance is aborted coordinator-side
            if txn_id in self._txn_producers:
                pid, epoch = self._txn_producers[txn_id]
                epoch += 1
            else:
                pid = self._alloc_producer_id()
                epoch = 0
            self._txn_producers[txn_id] = (pid, epoch)
            if pid in self._txns:
                self._finish_txn_locked(pid, committed=False)
        return struct.pack(">ihqh", 0, ERR_NONE, pid, epoch)

    def _check_txn_epoch(self, txn_id: str | None, pid: int, epoch: int) -> int:
        """ERR code for a transactional request's (id, pid, epoch) triple."""
        known = self._txn_producers.get(txn_id or "")
        if known is None or known[0] != pid:
            return ERR_INVALID_TXN_STATE
        if known[1] != epoch:
            return ERR_INVALID_PRODUCER_EPOCH
        return ERR_NONE

    def _add_partitions_to_txn(self, version: int, r: _Reader) -> bytes:
        txn_id = r.string()
        pid = r.i64()
        epoch = r.i16()
        topics: list[tuple[str, list[int]]] = []
        for _ in range(r.i32()):
            topic = r.string()
            parts = [r.i32() for _ in range(r.i32())]
            topics.append((topic, parts))
        with self._lock:
            code = self._check_txn_epoch(txn_id, pid, epoch)
            if not self._coordinates(txn_id or "", 1):
                code = ERR_NOT_COORDINATOR
            if code == ERR_NONE:
                txn = self._txns.setdefault(
                    pid,
                    {"txn_id": txn_id, "epoch": epoch,
                     "partitions": set(), "first_offsets": {},
                     "pending_offsets": {}},
                )
                for topic, parts in topics:
                    self._ensure_topic(topic)
                    for p in parts:
                        txn["partitions"].add((topic, p))
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
        with self._lock:
            code = self._check_txn_epoch(txn_id, pid, epoch)
            if not self._coordinates(txn_id or "", 1):
                code = ERR_NOT_COORDINATOR
            if code == ERR_NONE:
                self._txns.setdefault(
                    pid,
                    {"txn_id": txn_id, "epoch": epoch,
                     "partitions": set(), "first_offsets": {},
                     "pending_offsets": {}},
                )
        return struct.pack(">ih", 0, code)

    def _txn_offset_commit(self, version: int, r: _Reader) -> bytes:
        """TxnOffsetCommit v0: stage group offsets inside the open
        transaction. They reach the group-offsets store only when
        _finish_txn_locked commits; an abort (or epoch fence) drops them."""
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
        with self._lock:
            code = self._check_txn_epoch(txn_id, pid, epoch)
            if not self._coordinates(group or "", 0):
                # TxnOffsetCommit lands in __consumer_offsets — the GROUP
                # coordinator serves it (clients that send it to the txn
                # coordinator only pass on single-broker clusters)
                code = ERR_NOT_COORDINATOR
            txn = self._txns.get(pid)
            if code == ERR_NONE and txn is None:
                # TxnOffsetCommit without a preceding AddOffsetsToTxn —
                # the coordinator never opened this transaction for the
                # group (real brokers answer INVALID_TXN_STATE)
                code = ERR_INVALID_TXN_STATE
            if code == ERR_NONE:
                for topic, parts in requests:
                    for p, off in parts:
                        txn["pending_offsets"][(group, topic, p)] = off
        out = bytearray(struct.pack(">ii", 0, len(requests)))
        for topic, parts in requests:
            out += _str(topic)
            out += struct.pack(">i", len(parts))
            for p, _off in parts:
                out += struct.pack(">ih", p, code)
        return bytes(out)

    def _finish_txn_locked(self, pid: int, committed: bool) -> None:
        """Write commit/abort control markers to every partition of the
        open transaction, apply offsets staged by TxnOffsetCommit (commit
        only — aborts drop them), and (on abort) extend the aborted-txn
        index. Caller holds self._lock."""
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

    def _end_txn(self, version: int, r: _Reader) -> bytes:
        txn_id = r.string()
        pid = r.i64()
        epoch = r.i16()
        committed = r.i8() != 0
        with self._lock:
            code = self._check_txn_epoch(txn_id, pid, epoch)
            if not self._coordinates(txn_id or "", 1):
                code = ERR_NOT_COORDINATOR
            if code == ERR_NONE and pid not in self._txns:
                code = ERR_INVALID_TXN_STATE  # EndTxn with nothing open
            if code == ERR_NONE:
                self._finish_txn_locked(pid, committed)
        return struct.pack(">ih", 0, code)

    # -- classic-protocol group membership --------------------------------

    def _group(self, gid: str) -> _GroupState:
        with self._lock:
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

    def _begin_rebalance(
        self, g: _GroupState, now: float, initial: bool = False
    ) -> None:
        """g.lock held: open a new join round. An empty-group round waits
        the full initial delay (group.initial.rebalance.delay.ms) so
        concurrently-starting peers land in one generation; a re-join
        round completes as soon as every known member re-joined."""
        g.state = "Joining"
        g.pending = set()
        g.initial_round = initial
        g.deadline = now + (
            self.initial_rebalance_delay_s if initial
            else self.rebalance_timeout_s
        )
        g.cond.notify_all()

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
        g = self._group(gid)
        with g.lock:
            now = time.monotonic()
            if self._purge_expired(g, now) and g.state == "Stable":
                self._begin_rebalance(g, now)
            if member_id == "":
                member_id = f"{gid}-member-{g.next_member}"
                g.next_member += 1
            elif member_id not in g.members:
                # an id from a generation the coordinator already dropped
                return self._join_error(ERR_UNKNOWN_MEMBER_ID)
            g.members[member_id] = {
                "meta": meta, "hb": now, "timeout": session_ms / 1000.0
            }
            if g.state in ("Empty", "Stable", "AwaitingSync"):
                self._begin_rebalance(g, now, initial=g.state == "Empty")
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
                return self._join_error(ERR_UNKNOWN_MEMBER_ID)
            out = bytearray(struct.pack(">hi", ERR_NONE, g.generation))
            out += _str("range")
            out += _str(g.leader or "")
            out += _str(member_id)
            if member_id == g.leader:
                out += struct.pack(">i", len(g.members))
                for mid in sorted(g.members):
                    out += _str(mid)
                    out += _bytes(g.members[mid]["meta"])
            else:
                out += struct.pack(">i", 0)
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
        g = self._group(gid)
        with g.lock:
            if member_id not in g.members:
                return struct.pack(">h", ERR_UNKNOWN_MEMBER_ID) + _bytes(b"")
            if gen != g.generation:
                return struct.pack(">h", ERR_ILLEGAL_GENERATION) + _bytes(b"")
            if provided and member_id == g.leader:
                g.assignments = provided
                g.state = "Stable"
                g.cond.notify_all()
            deadline = time.monotonic() + self.rebalance_timeout_s
            while g.state == "AwaitingSync" and g.generation == gen:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                g.cond.wait(timeout=min(remaining, 0.05))
            if g.generation != gen or g.state != "Stable":
                return (
                    struct.pack(">h", ERR_REBALANCE_IN_PROGRESS) + _bytes(b"")
                )
            g.members[member_id]["hb"] = time.monotonic()
            return struct.pack(">h", ERR_NONE) + _bytes(
                g.assignments.get(member_id, b"")
            )

    def _heartbeat(self, version: int, r: _Reader) -> bytes:
        gid = r.string()
        if not self._coordinates(gid or "", 0):
            return struct.pack(">h", ERR_NOT_COORDINATOR)
        gen = r.i32()
        member_id = r.string() or ""
        g = self._group(gid)
        with g.lock:
            now = time.monotonic()
            if self._purge_expired(g, now) and g.state == "Stable":
                self._begin_rebalance(g, now)
            if member_id not in g.members:
                return struct.pack(">h", ERR_UNKNOWN_MEMBER_ID)
            g.members[member_id]["hb"] = now
            if gen != g.generation:
                return struct.pack(">h", ERR_ILLEGAL_GENERATION)
            if g.state != "Stable":
                return struct.pack(">h", ERR_REBALANCE_IN_PROGRESS)
            return struct.pack(">h", ERR_NONE)

    def _leave_group(self, version: int, r: _Reader) -> bytes:
        gid = r.string()
        if not self._coordinates(gid or "", 0):
            return struct.pack(">h", ERR_NOT_COORDINATOR)
        member_id = r.string() or ""
        g = self._group(gid)
        with g.lock:
            if member_id not in g.members:
                return struct.pack(">h", ERR_UNKNOWN_MEMBER_ID)
            del g.members[member_id]
            g.pending.discard(member_id)
            g.assignments.pop(member_id, None)
            if not g.members:
                g.state = "Empty"
            elif g.state in ("Stable", "AwaitingSync"):
                self._begin_rebalance(g, time.monotonic())
            g.cond.notify_all()
            return struct.pack(">h", ERR_NONE)

    def _produce(self, version: int, r: _Reader) -> bytes | None:
        r.string()  # transactional_id
        acks = r.i16()
        r.i32()  # timeout_ms
        results: list[tuple[str, list[tuple[int, int, int]]]] = []
        with self._lock:
            for _ in range(r.i32()):
                topic = r.string()
                parts: list[tuple[int, int, int]] = []
                for _ in range(r.i32()):
                    pid = r.i32()
                    record_set = r.bytes_() or b""
                    if topic not in self._topics:
                        self._ensure_topic(topic)  # auto-create on produce
                    log = self._logs.get((topic, pid))
                    if log is None:
                        parts.append((pid, ERR_UNKNOWN_TOPIC_OR_PARTITION, -1))
                        continue
                    if not self._leads(topic, pid):
                        parts.append((pid, ERR_NOT_LEADER, -1))
                        continue
                    # idempotence (KIP-98): batches carrying a producerId
                    # are validated against the per-partition sequence
                    # state BEFORE appending — replays dedup to the
                    # original offset instead of appending twice.
                    seq_info = self._parse_producer_seq(record_set)
                    if seq_info is not None:
                        prod_id, p_epoch, base_seq, count = seq_info
                        key = (prod_id, topic, pid)
                        next_seq, cache, known_epoch = self._producer_state.get(
                            key, (0, {}, p_epoch)
                        )
                        if p_epoch > known_epoch:
                            # epoch bump (KIP-98 fencing): the new producer
                            # instance starts its sequences from 0 — drop
                            # the fenced instance's dedup state entirely
                            next_seq, cache, known_epoch = 0, {}, p_epoch
                        elif p_epoch < known_epoch:
                            # a fenced (zombie) instance writing after its
                            # successor registered — reject, never append
                            parts.append(
                                (pid, ERR_INVALID_PRODUCER_EPOCH, -1)
                            )
                            continue
                        if base_seq in cache:
                            # replayed batch still in the 5-batch window:
                            # ack with the ORIGINAL offset, no append
                            parts.append((pid, ERR_NONE, cache[base_seq]))
                            continue
                        if base_seq < next_seq:
                            # duplicate older than the cache window
                            parts.append(
                                (pid, ERR_DUPLICATE_SEQUENCE_NUMBER, -1)
                            )
                            continue
                        if base_seq > next_seq:
                            # gap: a prior batch was lost — fatal for the
                            # producer's ordering guarantee
                            parts.append(
                                (pid, ERR_OUT_OF_ORDER_SEQUENCE_NUMBER, -1)
                            )
                            continue
                    try:
                        base = log.append(record_set)
                        parts.append((pid, ERR_NONE, base))
                    except ValueError:  # CRC mismatch / undecodable batch
                        parts.append((pid, ERR_CORRUPT_MESSAGE, -1))
                        continue
                    # transactional append: remember the txn's FIRST offset
                    # in this partition — the aborted-txn index entry
                    if seq_info is not None and seq_info[0] in self._txns:
                        txn = self._txns[seq_info[0]]
                        if (topic, pid) in txn["partitions"]:
                            txn["first_offsets"].setdefault(
                                (topic, pid), base
                            )
                    if seq_info is not None:
                        cache[base_seq] = base
                        while len(cache) > 5:  # real broker keeps last 5
                            cache.pop(min(cache))
                        self._producer_state[key] = (
                            base_seq + count, cache, known_epoch
                        )
                results.append((topic, parts))
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
        out = bytearray(struct.pack(">i", 0))  # throttle_time_ms
        out += struct.pack(">i", len(requests))
        with self._lock:
            for topic, parts in requests:
                out += _str(topic)
                out += struct.pack(">i", len(parts))
                for pid, offset in parts:
                    log = self._logs.get((topic, pid))
                    if log is None:
                        out += struct.pack(
                            ">iqh", pid, -1, ERR_UNKNOWN_TOPIC_OR_PARTITION
                        )
                        continue
                    target = log.high_watermark if offset == -1 else offset
                    if target > log.high_watermark:
                        out += struct.pack(
                            ">iqh", pid, -1, ERR_OFFSET_OUT_OF_RANGE
                        )
                        continue
                    log.truncate_before(target)
                    out += struct.pack(">iqh", pid, log.log_start, ERR_NONE)
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
        out = bytearray()
        if version >= 2:
            out += struct.pack(">i", 0)  # throttle_time_ms
        out += struct.pack(">i", len(requests))
        with self._lock:
            for topic, parts in requests:
                out += _str(topic)
                out += struct.pack(">i", len(parts))
                for pid, ts in parts:
                    log = self._logs.get((topic, pid))
                    if log is None:
                        out += struct.pack(
                            ">ihqq", pid, ERR_UNKNOWN_TOPIC_OR_PARTITION, -1, -1
                        )
                        continue
                    if not self._leads(topic, pid):
                        out += struct.pack(
                            ">ihqq", pid, ERR_NOT_LEADER, -1, -1
                        )
                        continue
                    if ts == TS_LATEST:
                        offset = log.high_watermark
                        if isolation == 1:
                            # read_committed: answer the LAST STABLE
                            # OFFSET so planners stop at open txns
                            for txn in self._txns.values():
                                first = txn["first_offsets"].get(
                                    (topic, pid)
                                )
                                if first is not None:
                                    offset = min(offset, first)
                    elif ts == TS_EARLIEST:
                        offset = log.log_start  # advances on truncation
                    else:  # first offset with timestamp >= ts; a REAL
                        # broker answers -1 when no such record exists
                        # (consumers must normalize) — conform to that.
                        offset = next(
                            (
                                rec.offset
                                for rec in log.records
                                if rec.timestamp_ms >= ts
                            ),
                            -1,
                        )
                    out += struct.pack(">ihqq", pid, ERR_NONE, -1, offset)
        return bytes(out)

    def _find_coordinator(self, version: int, r: _Reader) -> bytes:
        key = r.string() or ""
        key_type = 0
        if version >= 1:
            key_type = r.i8()  # 0 = group, 1 = transaction
        # any broker answers the lookup; the ANSWER is the owning node
        # (single-node mode: self)
        coord = self._coord_node(key, key_type)
        out = bytearray()
        if version >= 1:
            out += struct.pack(">i", 0)  # throttle_time_ms
        out += struct.pack(">h", ERR_NONE)
        if version >= 1:
            out += _str(None)  # error_message
        out += struct.pack(">i", coord.node_id) + _str(coord.host)
        out += struct.pack(">i", coord.port)
        return bytes(out)

    def _offset_commit(self, version: int, r: _Reader) -> bytes:
        group = r.string()
        r.i32()     # generation_id (-1: manual assignment)
        r.string()  # member_id
        r.i64()     # retention_time_ms
        out = bytearray()
        n_topics = r.i32()
        out += struct.pack(">i", n_topics)
        with self._lock:
            for _ in range(n_topics):
                topic = r.string()
                n_parts = r.i32()
                out += _str(topic) + struct.pack(">i", n_parts)
                for _ in range(n_parts):
                    pid = r.i32()
                    off = r.i64()
                    r.string()  # metadata
                    if not self._coordinates(group or "", 0):
                        out += struct.pack(">ih", pid, ERR_NOT_COORDINATOR)
                        continue
                    self._group_offsets[(group, topic, pid)] = off
                    out += struct.pack(">ih", pid, ERR_NONE)
        return bytes(out)

    def _offset_fetch(self, version: int, r: _Reader) -> bytes:
        group = r.string()
        out = bytearray()
        n_topics = r.i32()
        out += struct.pack(">i", n_topics)
        with self._lock:
            for _ in range(n_topics):
                topic = r.string()
                n_parts = r.i32()
                out += _str(topic) + struct.pack(">i", n_parts)
                for _ in range(n_parts):
                    pid = r.i32()
                    off = self._group_offsets.get((group, topic, pid), -1)
                    out += struct.pack(">iq", pid, off)
                    out += _str(None)  # metadata
                    out += struct.pack(
                        ">h",
                        ERR_NONE
                        if self._coordinates(group or "", 0)
                        else ERR_NOT_COORDINATOR,
                    )
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
        out = bytearray(struct.pack(">i", 0))  # throttle_time_ms
        out += struct.pack(">i", len(requests))
        with self._lock:
            for topic, parts in requests:
                out += _str(topic)
                out += struct.pack(">i", len(parts))
                for pid, offset in parts:
                    log = self._logs.get((topic, pid))
                    if log is None:
                        out += struct.pack(
                            ">ihqqi", pid, ERR_UNKNOWN_TOPIC_OR_PARTITION,
                            -1, -1, 0
                        )
                        out += _bytes(b"")
                        continue
                    if not self._leads(topic, pid):
                        out += struct.pack(
                            ">ihqqi", pid, ERR_NOT_LEADER, -1, -1, 0
                        )
                        out += _bytes(b"")
                        continue
                    hwm = log.high_watermark
                    if offset < log.log_start or offset > hwm:
                        # a real broker rejects fetches outside
                        # [logStartOffset, highWatermark] — this is the
                        # data-loss signal failOnDataLoss handles
                        out += struct.pack(
                            ">ihqqi", pid, ERR_OFFSET_OUT_OF_RANGE,
                            hwm, hwm, 0
                        )
                        out += _bytes(b"")
                        continue
                    # LSO = first offset still inside an OPEN transaction
                    # (KIP-98); read_committed fetches stop there
                    lso = hwm
                    for txn in self._txns.values():
                        first = txn["first_offsets"].get((topic, pid))
                        if first is not None:
                            lso = min(lso, first)
                    end = lso if isolation == 1 else hwm
                    record_set = (
                        log.raw_from(offset, end) if offset < end else b""
                    )
                    aborted = (
                        self._aborted.get((topic, pid), [])
                        if isolation == 1
                        else []
                    )
                    out += struct.pack(
                        ">ihqqi", pid, ERR_NONE, hwm, lso, len(aborted)
                    )
                    for a_pid, a_first in aborted:
                        out += struct.pack(">qq", a_pid, a_first)
                    out += _bytes(record_set)
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
        self.brokers = [
            MiniBroker(
                num_partitions=num_partitions, node_id=i, **broker_kwargs
            )
            for i in range(num_brokers)
        ]
        primary = self.brokers[0]
        for b in self.brokers[1:]:
            # alias the whole state store onto node 0's objects; _active
            # (live sockets) stays per-node so stop() only severs its own
            for attr in (
                "_logs", "_topics", "_group_offsets", "_producer_state",
                "_txn_producers", "_txns", "_aborted", "_groups", "_lock",
            ):
                setattr(b, attr, getattr(primary, attr))
            b._next_producer_id = 1000 + b.node_id * 1_000_000
            b._producer_id_limit = (b.node_id + 1) * 1_000_000
        primary._producer_id_limit = 1_000_000
        for b in self.brokers:
            b.cluster = self.brokers

    @property
    def bootstrap(self) -> str:
        """All nodes, comma-separated — clients may bootstrap anywhere."""
        return ",".join(b.bootstrap for b in self.brokers)

    def start(self) -> "MiniCluster":
        # mark the whole topology alive before ANY listener serves, so the
        # first request ever answered already sees the full alive set
        for b in self.brokers:
            b.alive = True
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
        return self.brokers[0]._leader_node(topic, pid)

    def coordinator_of(self, key: str, key_type: int) -> MiniBroker:
        return self.brokers[0]._coord_node(key, key_type)

    def topic_records(self, topic: str) -> list[Record]:
        return self.brokers[0].topic_records(topic)

    def topic_count(self, topic: str) -> int:
        return self.brokers[0].topic_count(topic)


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
        help="N>1: run an N-node MiniCluster (one process — the shared "
        "store requires it) and accept 'kill <node>' lines on stdin for "
        "mid-run failover drills",
    )
    args = ap.parse_args()

    stop = threading.Event()
    signal.signal(signal.SIGTERM, lambda *_: stop.set())
    signal.signal(signal.SIGINT, lambda *_: stop.set())

    if args.cluster > 1:
        cluster = MiniCluster(
            num_brokers=args.cluster, num_partitions=args.partitions
        ).start()
        print(f"READY {cluster.bootstrap}", flush=True)

        def control() -> None:
            # 'kill <node>' severs that broker (alive=False + socket
            # close) — leaders/coordinators fail over to survivors;
            # 'quit' or EOF (parent exit) shuts the cluster down
            for line in sys.stdin:
                parts = line.split()
                if parts[:1] == ["kill"] and len(parts) == 2:
                    node = int(parts[1])
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
