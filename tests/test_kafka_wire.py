"""kafka_wire protocol stack: public test vectors for the primitives, batch
round-trips through the independent decoder, and socket-level E2E against
MiniBroker (real TCP frames, broker-side CRC validation)."""

import struct

import pytest

from go_pq_cdc_kafka_spark.streaming.kafka_wire import (
    COMPRESSION_GZIP,
    COMPRESSION_LZ4,
    COMPRESSION_SNAPPY,
    KafkaProtocolError,
    KafkaWireConsumer,
    KafkaWireProducer,
    Record,
    crc32c,
    decode_record_batches,
    encode_record_batch,
    murmur2,
    partition_for_key,
    read_varint,
    write_varint,
)
from go_pq_cdc_kafka_spark.streaming.minibroker import MiniBroker


# -- primitives -------------------------------------------------------------

def test_crc32c_public_vectors():
    from go_pq_cdc_kafka_spark.streaming.kafka_wire import crc32c_py

    # RFC 3720 appendix B.4 / common published Castagnoli vectors, pinned
    # for BOTH the active implementation (native accelerator when libext2fs
    # is present) and the portable fallback
    for impl in (crc32c, crc32c_py):
        assert impl(b"") == 0
        assert impl(b"a") == 0xC1D04330
        assert impl(b"123456789") == 0xE3069283
        assert impl(b"\x00" * 32) == 0x8A9136AA
        assert impl(b"\xff" * 32) == 0x62A8AB43


def test_crc32c_native_and_fallback_agree_on_random_buffers():
    import random

    from go_pq_cdc_kafka_spark.streaming.kafka_wire import (
        _native_crc32c,
        crc32c_py,
    )

    if _native_crc32c is None:
        pytest.skip("no native crc32c library on this system")
    rng = random.Random(42)
    for n in (1, 7, 64, 1023, 65536):
        buf = bytes(rng.getrandbits(8) for _ in range(n))
        assert _native_crc32c(buf) == crc32c_py(buf)


def test_murmur2_matches_java_client_vectors():
    # Signed-int32 outputs of org.apache.kafka.common.utils.Utils.murmur2,
    # as published in kafka-python's partitioner tests.
    def signed(x):
        v = murmur2(x)
        return v - (1 << 32) if v >= (1 << 31) else v

    assert signed(b"21") == -973932308
    assert signed(b"foobar") == -790332482
    assert signed(b"a-little-bit-long-string") == -985981536
    assert signed(b"a-little-bit-longer-string") == -1486304829
    assert signed(b"lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8") == -58897971
    assert signed(b"abc") == 479470107


def test_partition_for_key_java_placement():
    # murmur2(b"abc") = 479470107; 479470107 % 12 = 3
    assert partition_for_key(b"abc", 12) == 479470107 % 12
    # keyless: round-robin on the counter
    assert [partition_for_key(None, 3, i) for i in range(5)] == [0, 1, 2, 0, 1]


def test_varint_zigzag_roundtrip():
    for v in [0, 1, -1, 63, -64, 64, 300, -301, 2**31 - 1, -(2**31), 2**40]:
        buf = bytearray()
        write_varint(buf, v)
        got, pos = read_varint(bytes(buf), 0)
        assert got == v and pos == len(buf), v


# -- record batch v2 --------------------------------------------------------

def _sample_records():
    return [
        Record(key=b"k1", value=b"v1", headers=[("op", b"INSERT")],
               timestamp_ms=1_700_000_000_000),
        Record(key=None, value=b"v2", headers=[], timestamp_ms=1_700_000_000_500),
        Record(key=b"k3", value=None,
               headers=[("a", b"x"), ("b", None)], timestamp_ms=1_700_000_001_000),
    ]


@pytest.mark.parametrize("codec", [0, COMPRESSION_GZIP])
def test_record_batch_roundtrip(codec):
    batch = encode_record_batch(_sample_records(), compression=codec,
                                base_offset=7)
    out = decode_record_batches(batch)
    assert [(r.key, r.value, r.headers) for r in out] == [
        (b"k1", b"v1", [("op", b"INSERT")]),
        (None, b"v2", []),
        (b"k3", None, [("a", b"x"), ("b", None)]),
    ]
    assert [r.offset for r in out] == [7, 8, 9]
    assert [r.timestamp_ms for r in out] == [
        1_700_000_000_000, 1_700_000_000_500, 1_700_000_001_000
    ]


def test_record_batch_crc_detects_corruption():
    batch = bytearray(encode_record_batch(_sample_records()))
    batch[-1] ^= 0xFF  # flip a payload byte; crc must catch it
    with pytest.raises(ValueError, match="CRC32C mismatch"):
        decode_record_batches(bytes(batch))


def test_record_batch_layout_constants():
    """Pin the fixed header layout (KIP-98): magic byte at offset 16,
    batchLength covers everything after it."""
    batch = encode_record_batch([Record(key=b"k", value=b"v")],
                                base_timestamp_ms=0)
    base_offset, batch_len = struct.unpack_from(">qi", batch, 0)
    assert base_offset == 0
    assert batch_len == len(batch) - 12
    assert batch[16] == 2  # magic


# -- socket E2E against MiniBroker -----------------------------------------

def test_produce_fetch_roundtrip_over_tcp():
    with MiniBroker(num_partitions=3) as broker:
        with KafkaWireProducer(broker.bootstrap) as prod:
            offsets = prod.send_records(
                [
                    ("t1", b"key-a", b"val-a", [("h", b"1")]),
                    ("t1", b"key-b", b"val-b", []),
                    ("t1", None, b"val-c", []),
                ],
                timestamp_ms=1_700_000_000_000,
            )
        assert offsets  # every partition produced reported base offset 0
        assert all(base == 0 for base in offsets.values())

        with KafkaWireConsumer(broker.bootstrap) as cons:
            got = cons.read_all("t1")
        key = lambda t: (t[0] is None, t)  # noqa: E731 — None keys sort last
        assert sorted(
            ((r.key, r.value, tuple(r.headers)) for r in got), key=key
        ) == sorted([
            (b"key-a", b"val-a", (("h", b"1"),)),
            (b"key-b", b"val-b", ()),
            (None, b"val-c", ()),
        ], key=key)


def test_keyed_records_land_on_java_partition():
    with MiniBroker(num_partitions=3) as broker:
        with KafkaWireProducer(broker.bootstrap) as prod:
            prod.send_records([("t", b"abc", b"v", [])])
        expected = partition_for_key(b"abc", 3)
        for p in range(3):
            recs = broker._logs[("t", p)].records
            assert len(recs) == (1 if p == expected else 0)


def test_same_key_same_partition_ordering_contract():
    """The reference's per-key ordering contract: one key, one partition,
    arrival order preserved."""
    with MiniBroker(num_partitions=5) as broker:
        with KafkaWireProducer(broker.bootstrap) as prod:
            for i in range(4):  # separate produce calls, same key
                prod.send_records([("t", b"pk-42", str(i).encode(), [])])
        with KafkaWireConsumer(broker.bootstrap) as cons:
            got = cons.read_all("t")
        assert [r.value for r in got] == [b"0", b"1", b"2", b"3"]
        assert len({partition_for_key(b"pk-42", 5)}) == 1


def test_produce_offsets_accumulate_and_fetch_from_offset():
    with MiniBroker(num_partitions=1) as broker:
        with KafkaWireProducer(broker.bootstrap) as prod:
            o1 = prod.send_records([("t", b"k", b"v0", []), ("t", b"k", b"v1", [])])
            o2 = prod.send_records([("t", b"k", b"v2", [])])
        assert o1[("t", 0)] == 0 and o2[("t", 0)] == 2
        with KafkaWireConsumer(broker.bootstrap) as cons:
            recs, hwm = cons.fetch("t", 0, offset=1)
        assert hwm == 3
        assert [r.value for r in recs] == [b"v1", b"v2"]
        assert [r.offset for r in recs] == [1, 2]


def test_acks_zero_fire_and_forget():
    with MiniBroker(num_partitions=1) as broker:
        with KafkaWireProducer(broker.bootstrap, acks=0) as prod:
            assert prod.send_records([("t", b"k", b"v", [])]) == {}
            # connection stays usable for the next (acked) request
            prod.acks = -1
            prod.send_records([("t", b"k", b"v2", [])])
        with KafkaWireConsumer(broker.bootstrap) as cons:
            got = cons.read_all("t")
        assert [r.value for r in got] == [b"v", b"v2"]


def test_broker_rejects_corrupt_batch_like_real_kafka(monkeypatch):
    """Flip a byte after CRC computation: the broker must answer
    CORRUPT_MESSAGE, and the producer must surface it."""
    import go_pq_cdc_kafka_spark.streaming.kafka_wire as kw

    real = kw.encode_record_batch

    def corrupted(*a, **k):
        b = bytearray(real(*a, **k))
        b[-1] ^= 0xFF
        return bytes(b)

    with MiniBroker(num_partitions=1) as broker:
        with KafkaWireProducer(broker.bootstrap) as prod:
            monkeypatch.setattr(kw, "encode_record_batch", corrupted)
            with pytest.raises(KafkaProtocolError, match="CORRUPT_MESSAGE"):
                prod.send_records([("t", b"k", b"v", [])])
        assert broker.topic_records("t") == []


def test_gzip_compressed_produce_roundtrip():
    with MiniBroker(num_partitions=1) as broker:
        with KafkaWireProducer(
            broker.bootstrap, compression=COMPRESSION_GZIP
        ) as prod:
            prod.send_records([("t", b"k", b"payload" * 100, [])])
        with KafkaWireConsumer(broker.bootstrap) as cons:
            got = cons.read_all("t")
        assert got[0].value == b"payload" * 100


def test_api_versions_handshake():
    with MiniBroker() as broker:
        with KafkaWireProducer(broker.bootstrap) as prod:
            versions = prod.api_versions()
        assert versions[0][1] >= 3   # Produce up to v3
        assert versions[1][1] >= 4   # Fetch up to v4


def test_broker_rewrites_base_offset_without_breaking_crc():
    """Offset assignment rewrites only the baseOffset field of the stored
    raw batch (it sits outside v2 CRC coverage), so the consumer's CRC
    verification still passes on fetched bytes — the same mechanics a real
    broker relies on."""
    with MiniBroker(num_partitions=1) as broker:
        with KafkaWireProducer(broker.bootstrap) as prod:
            prod.send_records([("t", b"k", b"v0", []), ("t", b"k", b"v1", [])])
            prod.send_records([("t", b"k", b"v2", [])])
        log = broker._logs[("t", 0)]
        assert [(b, c) for b, c, _raw in log.batches] == [(0, 2), (2, 1)]
        with KafkaWireConsumer(broker.bootstrap) as cons:
            recs, hwm = cons.fetch("t", 0, offset=0)  # decode verifies CRC
        assert hwm == 3
        assert [(r.offset, r.value) for r in recs] == [
            (0, b"v0"), (1, b"v1"), (2, b"v2")
        ]
        assert broker.topic_count("t") == 3


def test_producer_redials_after_broker_bounce():
    """Transient classing (reference B5): a connection dropped by a broker
    bounce is redialed and the produce replayed; fatal protocol errors
    still raise (CORRUPT_MESSAGE test above)."""
    broker = MiniBroker(num_partitions=1).start()
    host, port = broker.host, broker.port
    prod = KafkaWireProducer(broker.bootstrap)
    try:
        prod.send_records([("t", b"k", b"before", [])])
        broker.stop()  # kills the producer's cached connection
        broker2 = MiniBroker(num_partitions=1, host=host, port=port).start()
        try:
            prod.send_records([("t", b"k", b"after", [])])
            assert [r.value for r in broker2.topic_records("t")] == [b"after"]
        finally:
            broker2.stop()
    finally:
        prod.close()


# -- property tests -----------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_blobs = st.one_of(st.none(), st.binary(max_size=200))
_headers = st.lists(
    st.tuples(st.text(max_size=20), st.one_of(st.none(), st.binary(max_size=50))),
    max_size=4,
)
_records = st.lists(
    st.builds(
        Record,
        key=_blobs,
        value=_blobs,
        headers=_headers,
        timestamp_ms=st.integers(min_value=0, max_value=2**41),
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=60, deadline=None)
@given(recs=_records,
       codec=st.sampled_from(
           [0, COMPRESSION_GZIP, COMPRESSION_SNAPPY, COMPRESSION_LZ4]),
       base=st.integers(min_value=0, max_value=2**40))
def test_record_batch_roundtrip_property(recs, codec, base):
    """Any record list survives encode→decode bit-exactly: keys, values,
    headers (order + null vs empty), timestamps, absolute offsets."""
    out = decode_record_batches(
        encode_record_batch(recs, compression=codec, base_offset=base)
    )
    assert [(r.key, r.value, r.headers, r.timestamp_ms) for r in out] == [
        (r.key, r.value, r.headers, r.timestamp_ms) for r in recs
    ]
    assert [r.offset for r in out] == [base + i for i in range(len(recs))]


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_crc32c_implementations_agree_property(buf):
    from go_pq_cdc_kafka_spark.streaming.kafka_wire import (
        _native_crc32c,
        crc32c_py,
    )

    if _native_crc32c is None:
        pytest.skip("no native crc32c library on this system")
    assert _native_crc32c(buf) == crc32c_py(buf)


class _AckLossBroker(MiniBroker):
    """Conformance broker that APPENDS a produce but drops the connection
    before acking, for the first ``drop_acks`` produce requests — the
    exact window where a retrying producer duplicates records unless the
    broker dedups by (producerId, sequence)."""

    def __init__(self, drop_acks: int = 1, **kw):
        super().__init__(**kw)
        self.drop_acks = drop_acks

    def _produce(self, version, r):
        from go_pq_cdc_kafka_spark.streaming.minibroker import _Disconnect

        resp = super()._produce(version, r)
        if self.drop_acks > 0:
            self.drop_acks -= 1
            raise _Disconnect()
        return resp


def test_idempotent_produce_dedups_ack_lost_replay():
    """Kill-and-retry: the broker appends, the ack is lost, the producer
    replays the same batch — with idempotent=True the replay resolves to
    the ORIGINAL offsets and no duplicate records exist; sequences keep
    advancing so later produces append normally."""
    with _AckLossBroker(drop_acks=1, num_partitions=1) as b:
        with KafkaWireProducer(b.bootstrap, idempotent=True) as prod:
            offs = prod.send_records(
                [("t.idem", b"k", b"v-%d" % i, []) for i in range(4)],
                timestamp_ms=1_700_000_000_000,
            )
            assert offs == {("t.idem", 0): 0}
            # follow-up batch: sequence advanced past the replayed batch
            offs2 = prod.send_records(
                [("t.idem", b"k", b"w-%d" % i, []) for i in range(2)],
                timestamp_ms=1_700_000_000_000,
            )
            assert offs2 == {("t.idem", 0): 4}
        values = [bytes(r.value) for r in b.topic_records("t.idem")]
    assert values == [b"v-0", b"v-1", b"v-2", b"v-3", b"w-0", b"w-1"]


def test_non_idempotent_replay_duplicates_control():
    """The same ack-loss scenario WITHOUT idempotence duplicates the batch
    (the reference's at-least-once contract) — proving the dedup above is
    the producer-id/sequence machinery, not an accident of the broker."""
    with _AckLossBroker(drop_acks=1, num_partitions=1) as b:
        with KafkaWireProducer(b.bootstrap) as prod:
            prod.send_records(
                [("t.dup", b"k", b"v-%d" % i, []) for i in range(3)],
                timestamp_ms=1_700_000_000_000,
            )
        values = [bytes(r.value) for r in b.topic_records("t.dup")]
    assert values == [b"v-0", b"v-1", b"v-2"] * 2  # appended twice


def test_idempotent_sequence_gap_is_fatal():
    """A sequence jump (a batch the broker never saw) is
    OUT_OF_ORDER_SEQUENCE_NUMBER — raised loudly, never silently
    reordered."""
    with MiniBroker(num_partitions=1) as b:
        with KafkaWireProducer(b.bootstrap, idempotent=True) as prod:
            prod.send_records([("t.gap", b"k", b"v", [])])
            prod._sequences[("t.gap", 0)] = 99  # simulate a lost batch
            with pytest.raises(KafkaProtocolError) as ei:
                prod.send_records([("t.gap", b"k", b"v2", [])])
            assert ei.value.code == 45


def test_idempotent_requires_acks():
    with pytest.raises(ValueError, match="acks"):
        KafkaWireProducer("b:9092", idempotent=True, acks=0)


def test_duplicate_sequence_error_treated_as_success():
    """A replay that fell out of the broker's 5-batch cache answers
    DUPLICATE_SEQUENCE_NUMBER — the producer treats it as delivered
    (KIP-98 client semantics), not as a query-failing error."""
    with MiniBroker(num_partitions=1) as b:
        with KafkaWireProducer(b.bootstrap, idempotent=True) as prod:
            prod.send_records([("t.oldseq", b"k", b"v", [])])
            # rewind the producer's sequence below the broker's window
            prod._sequences[("t.oldseq", 0)] = 0
            # broker state: next_seq=1, cache={0: 0} — seq 0 IS cached, so
            # force it out by pushing 5 more batches through
            for i in range(5):
                prod._sequences[("t.oldseq", 0)] = i + 1
                prod.send_records([("t.oldseq", b"k", b"f-%d" % i, [])])
            prod._sequences[("t.oldseq", 0)] = 0  # now out of the window
            offs = prod.send_records([("t.oldseq", b"k", b"late", [])])
            assert offs == {("t.oldseq", 0): -1}  # no offset info, no raise
        vals = [bytes(r.value) for r in b.topic_records("t.oldseq")]
    assert vals == [b"v"] + [b"f-%d" % i for i in range(5)]  # no re-append


def test_delete_records_advances_log_start_and_low_watermark():
    """DeleteRecords v0 (API 21): the protocol-level retention trigger.
    Log start advances, earliest offsets follow, fetches below the new
    start answer OFFSET_OUT_OF_RANGE, and -1 means 'everything'."""
    from go_pq_cdc_kafka_spark.streaming.kafka_wire import (
        KafkaProtocolError,
        KafkaWireConsumer,
        KafkaWireProducer,
    )
    from go_pq_cdc_kafka_spark.streaming.minibroker import MiniBroker

    with MiniBroker(num_partitions=1) as b:
        with KafkaWireProducer(b.bootstrap) as prod:
            prod.send_records(
                [("t.del", b"k", b"v%d" % i, []) for i in range(8)],
                timestamp_ms=1,
            )
        with KafkaWireConsumer(b.bootstrap) as c:
            low = c.delete_records("t.del", {0: 3})
            assert low == {0: 3}
            assert c.earliest_offsets("t.del") == {0: 3}
            with pytest.raises(KafkaProtocolError):
                c.fetch("t.del", 0, 0)
            recs, hwm = c.fetch("t.del", 0, 3)
            assert hwm == 8
            assert [bytes(r.value) for r in recs] == [
                b"v%d" % i for i in range(3, 8)
            ]
            # -1 = truncate to the high watermark (delete everything)
            assert c.delete_records("t.del", {0: -1}) == {0: 8}
            assert c.earliest_offsets("t.del") == {0: 8}
            # beyond the high watermark is a per-partition error
            with pytest.raises(KafkaProtocolError):
                c.delete_records("t.del", {0: 99})


def test_list_offsets_v2_response_carries_throttle_time():
    """ListOffsets v2 prepends throttle_time_ms to the response (absent in
    v0/v1). Regression for the silent-empty bug: a client that skips the
    field reads throttle=0 as a 0-length topic array and plans empty
    batches with no error — so pin the raw bytes, not just the parse."""
    from go_pq_cdc_kafka_spark.streaming.kafka_wire import (
        API_LIST_OFFSETS,
        TS_LATEST,
        _str,
    )

    with MiniBroker(num_partitions=1) as broker:
        with KafkaWireProducer(broker.bootstrap) as p:
            p.send_records([("t.lo", None, b"v", [])])
        with KafkaWireConsumer(broker.bootstrap) as c:
            # the parsed path (what planners use)
            assert c.latest_offsets("t.lo") == {0: 1}
            # the raw path: v2 leads with throttle_time_ms, then topics
            body = bytearray(struct.pack(">ib", -1, 0))
            body += struct.pack(">i", 1) + _str("t.lo")
            body += struct.pack(">i", 1) + struct.pack(">iq", 0, TS_LATEST)
            r = c._bootstrap_conn().request(API_LIST_OFFSETS, 2, bytes(body))
            assert r.i32() == 0        # throttle_time_ms
            assert r.i32() == 1        # topic array length follows it
            assert r.string() == "t.lo"
            assert r.i32() == 1
            assert r.i32() == 0        # partition id
            assert r.i16() == 0        # error
            r.i64()                    # timestamp
            assert r.i64() == 1        # high watermark


def test_api_versions_advertises_txn_and_list_offsets_v2():
    """A conforming client negotiates via ApiVersions — every API the
    broker handles must be advertised at the versions it accepts."""
    from go_pq_cdc_kafka_spark.streaming.kafka_wire import (
        API_ADD_PARTITIONS_TO_TXN,
        API_END_TXN,
        API_FIND_COORDINATOR,
        API_LIST_OFFSETS,
    )

    with MiniBroker(num_partitions=1) as broker:
        with KafkaWireConsumer(broker.bootstrap) as c:
            vers = c.api_versions()
            assert vers[API_LIST_OFFSETS] == (1, 2)
            assert vers[API_ADD_PARTITIONS_TO_TXN] == (0, 0)
            assert vers[API_END_TXN] == (0, 0)
            assert vers[API_FIND_COORDINATOR] == (0, 1)
