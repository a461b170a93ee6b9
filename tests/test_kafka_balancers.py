"""Wire-producer balancer strategies — the reference's full GetBalancer
surface (config/config.go:40-57) reproduced from segmentio/kafka-go's
public algorithms. Unit vectors pin each hash/placement rule; the
MiniBroker tier proves the strategy drives actual partition routing over
real Produce frames; the config tier proves a migrating YAML that names
CRC32Balancer/LeastBytes/ReferenceHash now works on the wire sink while
the JVM sink still rejects them loudly."""

import zlib

import pytest

from go_pq_cdc_kafka_spark.streaming.kafka import (
    Balancer,
    KafkaProducerConfig,
)
from go_pq_cdc_kafka_spark.streaming.kafka_wire import (
    CRC32WireBalancer,
    HashWireBalancer,
    KafkaWireProducer,
    LeastBytesWireBalancer,
    Murmur2WireBalancer,
    ReferenceHashWireBalancer,
    RoundRobinWireBalancer,
    WIRE_BALANCERS,
    fnv1a32,
    murmur2,
    wire_balancer,
)
from go_pq_cdc_kafka_spark.streaming.minibroker import MiniBroker


def test_fnv1a32_public_vectors():
    """Published FNV-1a 32-bit vectors (the hash kafka-go's default Hash
    and ReferenceHash balancers use via Go's hash/fnv New32a)."""
    assert fnv1a32(b"") == 0x811C9DC5
    assert fnv1a32(b"a") == 0xE40C292C
    assert fnv1a32(b"foobar") == 0xBF9CF968


def test_hash_balancer_go_semantics():
    """kafka-go Hash: abs(int32(fnv1a(key))) % n over the sorted partition
    list; nil keys round-robin."""
    b = HashWireBalancer()
    parts = [0, 1, 2, 3, 4]
    for key in (b"pk-1", b"pk-2", b"foobar", b"a", b"x" * 100):
        v = fnv1a32(key)
        s = v - 0x100000000 if v >= 0x80000000 else v
        assert b.partition(key, b"v", parts) == parts[abs(s) % 5]
    # fnv1a32(b"foobar") = 0xBF9CF968 -> int32 is negative -> abs path
    assert fnv1a32(b"foobar") >= 0x80000000
    # nil key: round-robin cycles
    seq = [b.partition(None, b"v", [3, 5, 7]) for _ in range(6)]
    assert seq == [3, 5, 7, 3, 5, 7]


def test_reference_hash_balancer_masks_to_31_bits():
    b = ReferenceHashWireBalancer()
    parts = [0, 1, 2, 3, 4, 5, 6]
    for key in (b"pk-1", b"foobar", b"abc"):
        assert b.partition(key, None, parts) == parts[
            (fnv1a32(key) & 0x7FFFFFFF) % 7
        ]
    # for a key whose hash has the sign bit set, Hash and ReferenceHash
    # legitimately differ (abs vs mask) — pin that they are both defined
    assert (abs(fnv1a32(b"foobar") - 0x100000000) % 7) != (
        (fnv1a32(b"foobar") & 0x7FFFFFFF) % 7
    )


def test_crc32_balancer_librdkafka_placement():
    b = CRC32WireBalancer(consistent=True)
    parts = [0, 1, 2, 3]
    for key in (b"", b"pk-1", b"order-42"):
        assert b.partition(key, None, parts) == zlib.crc32(key) % 4
    # non-consistent: empty/nil keys go random but stay in range
    rnd = CRC32WireBalancer()
    assert rnd.partition(None, b"v", parts) in parts
    assert rnd.partition(b"", b"v", parts) in parts


def test_murmur2_balancer_matches_java_default_partitioner():
    """Murmur2Balancer must place keyed records byte-identically to the
    Java default partitioner (murmur2 & 0x7fffffff % n) — the property
    that makes JVM-sink and wire-sink placements interchangeable."""
    b = Murmur2WireBalancer(consistent=True)
    parts = [0, 1, 2, 3, 4]
    for key in (b"", b"1", b"pk-9", b"abcdef"):
        assert b.partition(key, None, parts) == (murmur2(key) & 0x7FFFFFFF) % 5


def test_least_bytes_balancer_tracks_cumulative_bytes():
    b = LeastBytesWireBalancer()
    parts = [0, 1, 2]
    # equal counters: ties break to the lowest partition id, then bytes
    # steer subsequent records to the emptiest partition
    assert b.partition(b"k", b"xxxxxxxx", parts) == 0      # 9 bytes -> p0
    assert b.partition(b"k", b"x", parts) == 1             # 2 bytes -> p1
    assert b.partition(b"k", b"x", parts) == 2             # 2 bytes -> p2
    assert b.partition(b"k", b"x", parts) == 1             # p1 has 2 < p2 2? tie -> p1
    # p0 carries 9 bytes; everything routes away from it until others catch up
    for _ in range(3):
        assert b.partition(b"k", b"x", parts) != 0
    # partition-set change resets counters (kafka-go re-makes them)
    assert b.partition(b"k", b"x", [7, 8]) == 7


def test_round_robin_balancer_ignores_keys():
    b = RoundRobinWireBalancer()
    assert [b.partition(b"same-key", None, [2, 4, 6]) for _ in range(4)] == [
        2, 4, 6, 2,
    ]


def test_factory_covers_reference_names_and_rejects_unknown():
    for name in ("", "Hash", "LeastBytes", "RoundRobin", "ReferenceHash",
                 "CRC32Balancer", "Murmur2Balancer"):
        assert wire_balancer(name) is not None
    assert set(WIRE_BALANCERS) >= {
        "Hash", "LeastBytes", "RoundRobin", "ReferenceHash",
        "CRC32Balancer", "Murmur2Balancer",
    }
    with pytest.raises(ValueError, match="invalid kafka balancer"):
        wire_balancer("LeastRecords")  # config.go:54-56 panic parity


def test_config_maps_all_balancers_to_wire_path():
    """Every reference balancer name maps to ITS OWN kafka-go algorithm on
    the wire path — a migrated config naming 'Hash' reproduces kafka-go's
    FNV-1a placement exactly (not the JVM sink's murmur2), and
    'Murmur2Balancer' gets kafka-go's random keyless placement. The JVM
    sink keeps its loud rejection for the kafka-go-only three."""
    for bal in Balancer:
        cfg = KafkaProducerConfig(brokers=["h:9092"], balancer=bal)
        kwargs = cfg.wire_kwargs()
        assert kwargs["balancer"] == bal.value
        prod = KafkaWireProducer(**{**kwargs, "bootstrap": ["h:9092"]})
        assert type(prod.balancer) is WIRE_BALANCERS[bal.value]
    with pytest.raises(ValueError):
        KafkaProducerConfig(
            brokers=["h:9092"], balancer=Balancer.LEAST_BYTES
        ).sink_options("/tmp/ck")


def test_balancers_route_over_real_wire():
    """MiniBroker E2E: the selected strategy decides actual placement.
    CRC32 keys land on crc32(key)%n; LeastBytes spreads a hot key across
    partitions (the anti-hash strategy); RoundRobin cycles."""
    with MiniBroker(num_partitions=4) as broker:
        crc = KafkaWireProducer([broker.bootstrap], balancer="CRC32Balancer")
        crc.balancer.consistent = True
        keys = [f"k{i}".encode() for i in range(12)]
        crc.send_records([("t.crc", k, b"v", []) for k in keys])
        crc.close()
        for k in keys:
            expect = zlib.crc32(k) % 4
            recs = broker._logs[("t.crc", expect)].records
            assert any(bytes(r.key) == k for r in recs), k

        lb = KafkaWireProducer([broker.bootstrap], balancer="LeastBytes")
        lb.send_records([("t.lb", b"hot", b"x" * 10, []) for _ in range(8)])
        lb.close()
        counts = [
            len(broker._logs[("t.lb", p)].records)
            for p in range(4)
        ]
        assert counts == [2, 2, 2, 2]  # one hot key, perfectly spread

        rr = KafkaWireProducer([broker.bootstrap], balancer="RoundRobin")
        rr.send_records([("t.rr", b"same", b"v", []) for _ in range(8)])
        rr.close()
        counts = [
            len(broker._logs[("t.rr", p)].records)
            for p in range(4)
        ]
        assert counts == [2, 2, 2, 2]
