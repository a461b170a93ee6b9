"""MiniBroker — an in-process, single-node Kafka broker speaking the same
fixed-layout protocol versions the kafka_wire client emits.

Purpose: protocol-conformance fixture. The sandbox has no real broker, so
the live-Kafka tier (tests/live/test_live_kafka.py) is env-gated; this
broker lets the produce path EXECUTE — full TCP framing, Metadata
leader discovery, record-batch v2 decode with mandatory CRC32C validation
(rejecting a corrupt batch with CORRUPT_MESSAGE exactly as a real broker
would), offset assignment, and Fetch read-back. It is intentionally not a
durability layer: storage is in-memory, one node, no consumer groups.

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
from dataclasses import dataclass, field

from .kafka_wire import (
    API_FETCH,
    API_FIND_COORDINATOR,
    API_LIST_OFFSETS,
    API_METADATA,
    API_OFFSET_COMMIT,
    API_OFFSET_FETCH,
    API_PRODUCE,
    API_SASL_AUTHENTICATE,
    API_SASL_HANDSHAKE,
    API_VERSIONS,
    ERR_CORRUPT_MESSAGE,
    ERR_ILLEGAL_SASL_STATE,
    ERR_NONE,
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

    @property
    def high_watermark(self) -> int:
        return self.next_offset

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

    def raw_from(self, offset: int) -> bytes:
        """Concatenated stored batches covering ``offset`` onward (a batch
        straddling the offset is returned whole — consumers filter by
        record offset, as real Kafka consumers must)."""
        return b"".join(
            raw
            for base, count, raw in self.batches
            if base + count > offset
        )


class MiniBroker:
    """``with MiniBroker() as b: ... b.bootstrap`` → ``"127.0.0.1:<port>"``."""

    def __init__(
        self,
        num_partitions: int = 3,
        host: str = "127.0.0.1",
        port: int = 0,
        sasl_credentials: dict[str, str] | None = None,
        ssl_context=None,
    ):
        self.num_partitions = num_partitions
        self.host = host
        self.sasl_credentials = sasl_credentials
        self.ssl_context = ssl_context
        self._logs: dict[tuple[str, int], _PartitionLog] = {}
        self._topics: set[str] = set()
        # broker-stored consumer-group offsets: (group, topic, part) -> off
        self._group_offsets: dict[tuple[str, str, int], int] = {}
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
        self._thread.start()
        return self

    def stop(self) -> None:
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
                API_PRODUCE: self._produce,
                API_FETCH: self._fetch,
                API_LIST_OFFSETS: self._list_offsets,
                API_FIND_COORDINATOR: self._find_coordinator,
                API_OFFSET_COMMIT: self._offset_commit,
                API_OFFSET_FETCH: self._offset_fetch,
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
                (API_LIST_OFFSETS, 1, 1),
                (API_METADATA, 0, 1), (API_VERSIONS, 0, 0),
                (API_FIND_COORDINATOR, 0, 0), (API_OFFSET_COMMIT, 2, 2),
                (API_OFFSET_FETCH, 1, 1),
                (API_SASL_HANDSHAKE, 0, 1), (API_SASL_AUTHENTICATE, 0, 0)]
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
            out = bytearray()
            out += struct.pack(">i", 1)  # brokers
            out += struct.pack(">i", 0) + _str(self.host) + struct.pack(
                ">i", self.port
            )
            if version >= 1:
                out += _str(None)        # rack
            if version >= 1:
                out += struct.pack(">i", 0)  # controller_id
            out += struct.pack(">i", len(topics))
            for t in topics:
                out += struct.pack(">h", ERR_NONE)
                out += _str(t)
                if version >= 1:
                    out += struct.pack(">b", 0)  # is_internal
                out += struct.pack(">i", self.num_partitions)
                for p in range(self.num_partitions):
                    out += struct.pack(">hiii", ERR_NONE, p, 0, 1)
                    out += struct.pack(">i", 0)  # replicas: [0]
                    out += struct.pack(">ii", 1, 0)  # isr: [0]
        return bytes(out)

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
                    try:
                        base = log.append(record_set)
                        parts.append((pid, ERR_NONE, base))
                    except ValueError:  # CRC mismatch / undecodable batch
                        parts.append((pid, ERR_CORRUPT_MESSAGE, -1))
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

    def _list_offsets(self, version: int, r: _Reader) -> bytes:
        from .kafka_wire import TS_EARLIEST, TS_LATEST

        r.i32()  # replica_id
        requests: list[tuple[str, list[tuple[int, int]]]] = []
        for _ in range(r.i32()):
            topic = r.string()
            parts = []
            for _ in range(r.i32()):
                pid = r.i32()
                ts = r.i64()
                parts.append((pid, ts))
            requests.append((topic, parts))
        out = bytearray(struct.pack(">i", len(requests)))
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
                    if ts == TS_LATEST:
                        offset = log.high_watermark
                    elif ts == TS_EARLIEST:
                        offset = 0  # nothing is ever truncated here
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
        r.string()  # coordinator key (group id) — single node IS the
        # coordinator for every group
        return (struct.pack(">hi", ERR_NONE, 0) + _str(self.host)
                + struct.pack(">i", self.port))

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
                    out += struct.pack(">h", ERR_NONE)
        return bytes(out)

    def _fetch(self, version: int, r: _Reader) -> bytes:
        r.i32()  # replica_id
        r.i32()  # max_wait_ms
        r.i32()  # min_bytes
        r.i32()  # max_bytes
        r.i8()   # isolation_level
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
                    hwm = log.high_watermark
                    record_set = log.raw_from(offset) if offset < hwm else b""
                    out += struct.pack(
                        ">ihqqi", pid, ERR_NONE, hwm, hwm, 0
                    )
                    out += _bytes(record_set)
        return bytes(out)
