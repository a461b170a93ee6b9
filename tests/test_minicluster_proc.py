"""MiniClusterProc: the out-of-process broker topology.

What the threaded MiniCluster cannot prove: here every broker's listener
(frame parse, CRC32C validation, response encode) runs in its OWN
process, and node death is a real SIGKILL detected by the store's
heartbeat failure detector — not an in-process flag flip. The reference
posture is integration_test/main_test.go:95-101 (a real broker out of
process); this tier matches it while staying sandbox-runnable.
"""

import time

from go_pq_cdc_kafka_spark.streaming.kafka_wire import (
    KafkaWireConsumer,
    KafkaWireProducer,
)
from go_pq_cdc_kafka_spark.streaming.minibroker import MiniClusterProc


def _produce(bootstrap: str, topic: str, n: int, key_prefix: str = "k"):
    with KafkaWireProducer(bootstrap) as p:
        p.send_records(
            [
                (topic, f"{key_prefix}{i}".encode(), b"v%d" % i, [])
                for i in range(n)
            ]
        )


def _count(bootstrap: str, topic: str) -> int:
    with KafkaWireConsumer(bootstrap) as c:
        return sum(c.latest_offsets(topic).values())


def test_proc_cluster_roundtrip_and_store_count():
    with MiniClusterProc(num_brokers=3, num_partitions=3) as c:
        assert len(c.bootstrap.split(",")) == 3
        _produce(c.bootstrap, "proc.rt", 60)
        assert _count(c.bootstrap, "proc.rt") == 60
        assert c.topic_count("proc.rt") == 60


def test_proc_cluster_sigkill_failover():
    """SIGKILL one broker mid-topology: the heartbeat detector drops it,
    survivors take over its partitions/keys, and a fresh produce lands
    without loss — the window is the detector timeout, like a real
    leader election."""
    with MiniClusterProc(num_brokers=3, num_partitions=3,
                         hb_timeout=0.5) as c:
        _produce(c.bootstrap, "proc.kill", 30)
        before = c.topic_count("proc.kill")
        c.kill_node(1)
        deadline = time.monotonic() + 5
        while len(c.state.alive_nodes()) != 2:
            assert time.monotonic() < deadline, "failure detector stuck"
            time.sleep(0.05)
        # survivors serve the shared store: nothing lost, new writes land
        assert c.topic_count("proc.kill") == before == 30
        _produce(c.bootstrap, "proc.kill", 30, key_prefix="post")
        assert c.topic_count("proc.kill") == 60


def test_proc_cluster_transactional_eos():
    """KIP-98 transactional produce through process brokers: commit
    visible read_committed, abort invisible, marker offsets counted."""
    with MiniClusterProc(num_brokers=3, num_partitions=1) as c:
        with KafkaWireProducer(
            c.bootstrap, transactional_id="proc-eos"
        ) as p:
            p.begin_transaction()
            p.send_records([("proc.txn", b"a", b"committed", [])])
            p.commit_transaction()
            p.begin_transaction()
            p.send_records([("proc.txn", b"b", b"aborted", [])])
            p.abort_transaction()
        with KafkaWireConsumer(c.bootstrap) as cons:
            recs, _ = cons.fetch("proc.txn", 0, isolation_level=1)
        assert [bytes(r.value) for r in recs] == [b"committed"]


def test_proc_cluster_enforces_routing():
    """A produce sent to a NON-leader process answers NOT_LEADER (the
    client-side blind spot single-broker tests have); the wire client
    routes around it, so a keyed produce via the full bootstrap works
    while a direct wrong-node call is refused."""
    from go_pq_cdc_kafka_spark.streaming.kafka_wire import (
        ERR_NOT_LEADER,
        BrokerConnection,
        encode_record_batch,
        Record,
        _bytes as wire_bytes,
        _str as wire_str,
        API_PRODUCE,
    )
    import struct

    with MiniClusterProc(num_brokers=3, num_partitions=3) as c:
        _produce(c.bootstrap, "proc.route", 10)  # creates + routes fine
        # find a (partition, non-leader node) pair via metadata from node 0
        with KafkaWireConsumer(c.bootstrap.split(",")[0]) as probe:
            meta = probe.await_topics(["proc.route"])
        part = meta.topics["proc.route"][0]
        wrong_host, wrong_port = next(
            hp for nid, hp in meta.brokers.items() if nid != part.leader
        )
        batch = encode_record_batch([Record(key=b"x", value=b"y")])
        body = (
            wire_str(None) + struct.pack(">hi", 1, 5000)
            + struct.pack(">i", 1) + wire_str("proc.route")
            + struct.pack(">i", 1) + struct.pack(">i", part.partition)
            + wire_bytes(batch)
        )
        conn = BrokerConnection(wrong_host, wrong_port, "routing-probe")
        try:
            r = conn.request(API_PRODUCE, 3, body)
        finally:
            conn.close()
        # topic[0] partitions[0]: partition(i32) error(i16)
        assert r.i32() == 1  # n_topics
        r.string()           # topic name
        assert r.i32() == 1  # n_partitions
        _pid = r.i32()
        code = r.i16()
        assert code == ERR_NOT_LEADER
