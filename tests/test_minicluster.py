"""MiniCluster: multi-broker topology over the from-scratch protocol
stack. Single-broker tests cannot catch a client that assumes bootstrap
== partition leader == coordinator (on one node all three coincide);
these prove the client actually ROUTES: produce goes to the partition's
leader, transactional RPCs to the txn coordinator, TxnOffsetCommit to the
GROUP coordinator, and a wrong/moved coordinator answers NOT_COORDINATOR
which the client recovers from by re-resolving (reference parity target:
the kafka-go/Java clients' coordinator re-discovery; the reference's own
integration tier runs one Redpanda node and never exercises this)."""

import threading

import pytest

from go_pq_cdc_kafka_spark.streaming.kafka_wire import (
    ERR_NOT_COORDINATOR,
    KafkaGroupMember,
    KafkaProtocolError,
    KafkaWireConsumer,
    KafkaWireProducer,
)
from go_pq_cdc_kafka_spark.streaming.minibroker import MiniBroker, MiniCluster


def test_metadata_spreads_leaders_and_lists_all_brokers():
    with MiniCluster(num_brokers=3, num_partitions=6) as cluster:
        with KafkaWireConsumer([b.bootstrap for b in cluster.brokers]) as c:
            meta = c.await_topics(["spread.topic"])
            assert len(meta.brokers) == 3
            leaders = {p.leader for p in meta.topics["spread.topic"]}
            # 6 partitions over 3 nodes: every node leads some partition
            assert leaders == {0, 1, 2}


def test_produce_routes_to_leaders_and_fetch_reads_back():
    """Records produced through a single bootstrap node land on their
    partitions' LEADER nodes (the producer groups requests per leader);
    fetch reads every partition back through its leader too."""
    with MiniCluster(num_brokers=3, num_partitions=6) as cluster:
        prod = KafkaWireProducer([cluster.brokers[0].bootstrap])
        items = [
            ("route.topic", f"k{i}".encode(), f"v{i}".encode(), [])
            for i in range(60)
        ]
        offsets = prod.send_records(items)
        prod.close()
        assert sum(offsets is not None for _ in [0]) == 1
        total = cluster.topic_count("route.topic")
        assert total == 60
        with KafkaWireConsumer([cluster.brokers[1].bootstrap]) as c:
            got = []
            for p in range(6):
                recs, _hwm = c.fetch("route.topic", p, 0)
                got.extend(bytes(r.key) for r in recs)
            assert sorted(got) == sorted(k for _, k, _v, _h in items)


def test_wrong_node_produce_answers_not_leader():
    """A Produce sent directly to a non-leader node must be refused with
    NOT_LEADER_FOR_PARTITION — the enforcement that makes the routing
    tests above meaningful."""
    import struct

    from go_pq_cdc_kafka_spark.streaming.kafka_wire import (
        ERR_NOT_LEADER,
        Record,
        _bytes,
        _str,
        encode_record_batch,
    )

    with MiniCluster(num_brokers=3, num_partitions=3) as cluster:
        leader = cluster.leader_of("enforce.topic", 0)
        wrong = next(b for b in cluster.brokers if b is not leader)
        batch = encode_record_batch([Record(key=b"k", value=b"v")])
        body = bytearray(_str(None))
        body += struct.pack(">hi", -1, 5000)
        body += struct.pack(">i", 1) + _str("enforce.topic")
        body += struct.pack(">i", 1) + struct.pack(">i", 0) + _bytes(batch)
        with KafkaWireConsumer([wrong.bootstrap]) as c:
            r = c._bootstrap_conn().request(0, 3, bytes(body))  # Produce v3
            r.i32()  # topic count
            r.string()
            r.i32()  # partition count
            r.i32()  # partition id
            assert r.i16() == ERR_NOT_LEADER


def test_eos_loop_across_brokers():
    """The KIP-98 consume-transform-produce loop on a 3-node cluster:
    InitProducerId/AddPartitions/EndTxn go to the TXN coordinator,
    TxnOffsetCommit to the GROUP coordinator (different nodes here),
    records to their partition leaders — and the committed offsets+records
    become visible atomically."""
    with MiniCluster(num_brokers=3, num_partitions=3) as cluster:
        group, txn_id = "eos-cluster-group", "eos-cluster-txn"
        # make the interesting case explicit: distinct coordinator nodes
        tc = cluster.coordinator_of(txn_id, 1)
        gc = cluster.coordinator_of(group, 0)
        assert tc is not gc, "fixture hash placed both on one node"

        prod = KafkaWireProducer(
            [cluster.brokers[0].bootstrap], transactional_id=txn_id
        )
        prod.begin_transaction()
        prod.send_records([("eos.out", b"k1", b"v1", [])])
        prod.send_offsets_to_transaction(group, "eos.in", {0: 42})
        prod.commit_transaction()

        # aborted txn: neither records nor offsets surface
        prod.begin_transaction()
        prod.send_records([("eos.out", b"k2", b"dead", [])])
        prod.send_offsets_to_transaction(group, "eos.in", {0: 99})
        prod.abort_transaction()
        prod.close()

        with KafkaWireConsumer([cluster.brokers[2].bootstrap]) as c:
            committed = c.fetch_committed(group, "eos.in", [0])
            assert committed == {0: 42}
            seen = []
            for p in range(3):
                recs, _ = c.fetch("eos.out", p, 0, isolation_level=1)
                seen.extend(bytes(r.value) for r in recs)
            assert seen == [b"v1"]


def test_not_coordinator_retry_recovers_stale_cache():
    """Seed the producer's coordinator cache with the WRONG node; the
    broker answers NOT_COORDINATOR and the client must drop the stale
    entry, re-resolve via FindCoordinator, and complete the transaction."""
    with MiniCluster(num_brokers=3, num_partitions=3) as cluster:
        txn_id = "moving-coordinator"
        right = cluster.coordinator_of(txn_id, 1)
        wrong = next(b for b in cluster.brokers if b is not right)
        prod = KafkaWireProducer(
            [cluster.brokers[0].bootstrap], transactional_id=txn_id
        )
        # poison the cache: point the txn-coordinator entry at a non-
        # coordinator node (simulates a coordinator that moved after dial)
        prod._coord_conns[(1, txn_id)] = prod._dial(wrong.host, wrong.port)
        prod.begin_transaction()
        prod.send_records([("nc.topic", b"k", b"v", [])])
        prod.commit_transaction()
        prod.close()
        with KafkaWireConsumer([cluster.brokers[0].bootstrap]) as c:
            vals = []
            for p in range(3):
                recs, _ = c.fetch("nc.topic", p, 0, isolation_level=1)
                vals.extend(bytes(r.value) for r in recs)
            assert vals == [b"v"]


def test_not_coordinator_without_retry_is_loud():
    """The broker-side guard itself: a txn RPC hand-delivered to the
    wrong node answers NOT_COORDINATOR (not silent success)."""
    import struct

    from go_pq_cdc_kafka_spark.streaming.kafka_wire import (
        API_INIT_PRODUCER_ID,
        _str,
    )

    with MiniCluster(num_brokers=3) as cluster:
        txn_id = "loud-check"
        right = cluster.coordinator_of(txn_id, 1)
        wrong = next(b for b in cluster.brokers if b is not right)
        with KafkaWireConsumer([wrong.bootstrap]) as c:
            body = _str(txn_id) + struct.pack(">i", 30000)
            r = c._bootstrap_conn().request(API_INIT_PRODUCER_ID, 0, body)
            r.i32()
            assert r.i16() == ERR_NOT_COORDINATOR


def test_group_membership_on_cluster_with_member_failover():
    """Two members join a group whose coordinator is a specific node; the
    assignment covers all partitions exactly once. A member whose cached
    coordinator connection points at the wrong node recovers inside
    join() (NOT_COORDINATOR → drop conn → re-resolve)."""
    with MiniCluster(num_brokers=3, num_partitions=4) as cluster:
        group = "cluster-members"
        c1 = KafkaWireConsumer([cluster.brokers[0].bootstrap])
        c2 = KafkaWireConsumer([cluster.brokers[1].bootstrap])
        c1.await_topics(["member.topic"])
        m1 = KafkaGroupMember(c1, group, ["member.topic"])
        m2 = KafkaGroupMember(c2, group, ["member.topic"])
        # poison m2's cached coordinator connection with a wrong node
        right = cluster.coordinator_of(group, 0)
        wrong = next(b for b in cluster.brokers if b is not right)
        m2._conn = c2._dial(wrong.host, wrong.port)

        a1: dict = {}
        t = threading.Thread(target=lambda: a1.update(m1.join()))
        t.start()
        a2 = m2.join()
        t.join(10)
        while not m1.heartbeat() or not m2.heartbeat():
            a1 = m1.join()
            a2 = m2.join()
        parts = sorted(
            a1.get("member.topic", []) + a2.get("member.topic", [])
        )
        assert parts == [0, 1, 2, 3]
        m1.leave()
        m2.leave()
        c1.close()
        c2.close()


def test_single_broker_mode_unchanged():
    """node-less MiniBroker keeps the old behavior: it leads everything
    and coordinates everything (no NOT_LEADER / NOT_COORDINATOR)."""
    with MiniBroker(num_partitions=3) as broker:
        prod = KafkaWireProducer([broker.bootstrap], transactional_id="solo")
        prod.begin_transaction()
        prod.send_records([("solo.topic", b"k", b"v", [])])
        prod.send_offsets_to_transaction("solo-group", "in", {0: 1})
        prod.commit_transaction()
        prod.close()
        with KafkaWireConsumer([broker.bootstrap]) as c:
            vals = []
            for p in range(3):
                recs, _ = c.fetch("solo.topic", p, 0, isolation_level=1)
                vals.extend(bytes(r.value) for r in recs)
            assert vals == [b"v"]
            assert c.fetch_committed("solo-group", "in", [0]) == {0: 1}


def test_leader_failover_preserves_and_reroutes():
    """Stop one node mid-stream: its partitions' leadership moves to the
    survivors (shared store = the new leader serves the full log), the
    producer's ConnectionError path re-resolves metadata and replays the
    affected batches, and every record — pre- and post-failover — reads
    back through a survivor."""
    cluster = MiniCluster(num_brokers=3, num_partitions=6).start()
    try:
        # bootstrap with ALL nodes so the seed list survives the kill
        prod = KafkaWireProducer(
            [b.bootstrap for b in cluster.brokers]
        )
        first = [("fo.topic", f"a{i}".encode(), b"v", []) for i in range(30)]
        prod.send_records(first)
        victim = cluster.brokers[1]
        victim.stop()
        second = [("fo.topic", f"b{i}".encode(), b"v", []) for i in range(30)]
        prod.send_records(second)  # must reroute, not raise
        prod.close()
        survivors = [b for b in cluster.brokers if b.alive]
        assert len(survivors) == 2
        with KafkaWireConsumer([survivors[0].bootstrap]) as c:
            meta = c.await_topics(["fo.topic"])
            assert {p.leader for p in meta.topics["fo.topic"]} <= {
                b.node_id for b in survivors
            }
            got = []
            for p in range(6):
                recs, _ = c.fetch("fo.topic", p, 0)
                got.extend(bytes(r.key) for r in recs)
        assert sorted(got) == sorted(
            k for _, k, _v, _h in first + second
        )
    finally:
        cluster.stop()


def test_txn_coordinator_failover_mid_producer():
    """Kill the txn coordinator between transactions: the next txn's
    coordinator RPC hits a dead socket, the client drops the cached
    coordinator, FindCoordinator (answered by a survivor) returns the
    NEW owner, and the transaction completes with state intact."""
    cluster = MiniCluster(num_brokers=3, num_partitions=3).start()
    try:
        txn_id = "failover-txn"
        coord = cluster.coordinator_of(txn_id, 1)
        seeds = [b.bootstrap for b in cluster.brokers if b is not coord]
        prod = KafkaWireProducer(seeds, transactional_id=txn_id)
        prod.begin_transaction()
        prod.send_records([("ft.topic", b"k1", b"v1", [])])
        prod.commit_transaction()
        coord.stop()
        assert cluster.coordinator_of(txn_id, 1) is not coord
        prod.begin_transaction()
        prod.send_records([("ft.topic", b"k2", b"v2", [])])
        prod.commit_transaction()
        prod.close()
        survivor = next(b for b in cluster.brokers if b.alive)
        with KafkaWireConsumer([survivor.bootstrap]) as c:
            vals = []
            for p in range(3):
                recs, _ = c.fetch("ft.topic", p, 0, isolation_level=1)
                vals.extend(bytes(r.value) for r in recs)
        assert sorted(vals) == [b"v1", b"v2"]
    finally:
        cluster.stop()


def test_eos_chaos_worst_case_on_cluster():
    """The deterministic worst-case EOS kill schedule, re-run against a
    3-node cluster: producer deaths before/after EndTxn, zombie fencing,
    and coordinator-connection loss all recover across REAL node
    boundaries (txn coordinator, group coordinator, and the partition
    leaders are different brokers)."""
    from tests.test_kafka_txn import _run_eos_chaos_schedule

    _run_eos_chaos_schedule(
        ["after_produce", "after_offsets", "zombie", "coord_drop",
         "after_commit", "after_produce", "after_offsets", "zombie",
         "coord_drop", "after_commit"],
        n_inputs=9,
        chunk=2,
        cluster=True,
    )


def test_producer_id_strides_never_collide():
    """Per-node producer-id ranges are disjoint by construction and the
    allocator asserts instead of silently crossing into a neighbour's
    stride in a very long-lived fixture."""
    import pytest

    from go_pq_cdc_kafka_spark.streaming.minibroker import MiniCluster

    with MiniCluster(num_brokers=3) as cluster:
        bases = [b._next_producer_id for b in cluster.brokers]
        limits = [b._producer_id_limit for b in cluster.brokers]
        assert bases == [1000, 1_001_000, 2_001_000]
        assert limits == [1_000_000, 2_000_000, 3_000_000]
        b0 = cluster.brokers[0]
        assert b0._alloc_producer_id() == 1000
        b0._next_producer_id = b0._producer_id_limit  # exhaust the stride
        with pytest.raises(AssertionError, match="producer-id stride"):
            b0._alloc_producer_id()
        b0._next_producer_id = 1001  # restore sanity for stop()
