"""Classic consumer-group membership (JoinGroup/SyncGroup/Heartbeat/
LeaveGroup v0, range assignor) on the from-scratch wire stack + the
conformance broker — the dynamic half of the consumer-group tier: several
cooperating readers split a topic's partitions; a survivor takes over a
dead peer's share; committed offsets never regress across the handoff."""

import threading
import time

import pytest

from go_pq_cdc_kafka_spark.streaming.kafka_wire import (
    KafkaGroupMember,
    KafkaWireConsumer,
    KafkaWireProducer,
    decode_consumer_assignment,
    decode_consumer_subscription,
    encode_consumer_assignment,
    encode_consumer_subscription,
    range_assign,
)
from go_pq_cdc_kafka_spark.streaming.minibroker import MiniBroker


@pytest.fixture()
def broker():
    with MiniBroker(num_partitions=4) as b:
        b.initial_rebalance_delay_s = 0.15
        yield b


def _fill(bootstrap, topic, n=8):
    with KafkaWireProducer(bootstrap) as p:
        p.send_records(
            [(topic, b"k%d" % i, b"v%d" % i, []) for i in range(n)],
            timestamp_ms=1_700_000_000_000,
        )


def test_consumer_protocol_codecs_roundtrip():
    topics = ["a.topic", "b"]
    assert decode_consumer_subscription(
        encode_consumer_subscription(topics)
    ) == topics
    asg = {"t1": [0, 2], "t2": [1]}
    assert decode_consumer_assignment(encode_consumer_assignment(asg)) == asg


def test_range_assignor_matches_kafka_layout():
    # 2 members, 4 partitions -> contiguous halves in member-id order
    out = range_assign({"m2": ["t"], "m1": ["t"]}, {"t": 4})
    assert out == {"m1": {"t": [0, 1]}, "m2": {"t": [2, 3]}}
    # 3 members, 4 partitions -> first member takes the remainder
    out = range_assign({"a": ["t"], "b": ["t"], "c": ["t"]}, {"t": 4})
    assert out == {"a": {"t": [0, 1]}, "b": {"t": [2]}, "c": {"t": [3]}}
    # per-topic subscriptions are independent
    out = range_assign({"a": ["t", "u"], "b": ["t"]}, {"t": 2, "u": 2})
    assert out == {"a": {"t": [0], "u": [0, 1]}, "b": {"t": [1]}}


def test_two_members_split_partitions(broker):
    _fill(broker.bootstrap, "t.grp")
    with KafkaWireConsumer(broker.bootstrap) as c1, KafkaWireConsumer(
        broker.bootstrap
    ) as c2:
        m1 = KafkaGroupMember(c1, "g.split", ["t.grp"])
        m2 = KafkaGroupMember(c2, "g.split", ["t.grp"])
        # join concurrently so both land in the initial-delay round
        results = {}
        t1 = threading.Thread(target=lambda: results.update(a=m1.join()))
        t2 = threading.Thread(target=lambda: results.update(b=m2.join()))
        t1.start(); t2.start(); t1.join(10); t2.join(10)
        a, b = results["a"], results["b"]
        assert m1.generation == m2.generation
        got = sorted(a.get("t.grp", []) + b.get("t.grp", []))
        assert got == [0, 1, 2, 3]      # complete, disjoint coverage
        assert a["t.grp"] and b["t.grp"]  # both own a share
        assert m1.heartbeat() and m2.heartbeat()
        m1.leave(); m2.leave()


def test_survivor_takes_over_dead_member(broker):
    """Member B stops heartbeating; after the session timeout the
    coordinator rebalances and A's next join owns ALL partitions.
    Offsets B committed are still visible — the survivor resumes from
    them, never behind."""
    _fill(broker.bootstrap, "t.fail")
    with KafkaWireConsumer(broker.bootstrap) as c1, KafkaWireConsumer(
        broker.bootstrap
    ) as c2:
        m1 = KafkaGroupMember(c1, "g.fail", ["t.fail"], session_timeout_ms=700)
        m2 = KafkaGroupMember(c2, "g.fail", ["t.fail"], session_timeout_ms=700)
        results = {}
        t1 = threading.Thread(target=lambda: results.update(a=m1.join()))
        t2 = threading.Thread(target=lambda: results.update(b=m2.join()))
        t1.start(); t2.start(); t1.join(10); t2.join(10)
        b_parts = results["b"].get("t.fail", [])
        assert b_parts
        # B commits progress on its partitions, then dies silently
        c2.commit_offsets("g.fail", "t.fail", {p: 2 for p in b_parts})
        m2.close()  # no LeaveGroup, no heartbeat: a crash
        # A keeps heartbeating until the coordinator notices the death
        deadline = time.monotonic() + 5
        while m1.heartbeat() and time.monotonic() < deadline:
            time.sleep(0.1)
        assigned = m1.join()
        assert sorted(assigned["t.fail"]) == [0, 1, 2, 3]  # took over all
        assert m1.heartbeat()
        # B's committed offsets survived the rebalance: A resumes at 2,
        # not 0 — positions never regress across the handoff
        committed = c1.fetch_committed("g.fail", "t.fail", b_parts)
        assert all(committed[p] == 2 for p in b_parts)
        m1.leave()


def test_clean_leave_triggers_immediate_rebalance(broker):
    _fill(broker.bootstrap, "t.leave")
    with KafkaWireConsumer(broker.bootstrap) as c1, KafkaWireConsumer(
        broker.bootstrap
    ) as c2:
        m1 = KafkaGroupMember(c1, "g.leave", ["t.leave"])
        m2 = KafkaGroupMember(c2, "g.leave", ["t.leave"])
        results = {}
        t1 = threading.Thread(target=lambda: results.update(a=m1.join()))
        t2 = threading.Thread(target=lambda: results.update(b=m2.join()))
        t1.start(); t2.start(); t1.join(10); t2.join(10)
        m2.leave()  # clean exit: no session-timeout wait needed
        assert m1.heartbeat() is False  # rebalance signalled immediately
        assert sorted(m1.join()["t.leave"]) == [0, 1, 2, 3]
        m1.leave()


def test_new_member_joining_stable_group_rebalances(broker):
    _fill(broker.bootstrap, "t.grow")
    with KafkaWireConsumer(broker.bootstrap) as c1, KafkaWireConsumer(
        broker.bootstrap
    ) as c2:
        m1 = KafkaGroupMember(c1, "g.grow", ["t.grow"])
        assert sorted(m1.join()["t.grow"]) == [0, 1, 2, 3]  # solo owns all
        m2 = KafkaGroupMember(c2, "g.grow", ["t.grow"])
        # m2's join blocks until m1 re-joins; heartbeat loop drives m1
        done = {}
        t = threading.Thread(target=lambda: done.update(b=m2.join()))
        t.start()
        deadline = time.monotonic() + 5
        while "b" not in done and time.monotonic() < deadline:
            if not m1.heartbeat():
                done["a"] = m1.join()
            time.sleep(0.05)
        t.join(10)
        got = sorted(done["a"].get("t.grow", []) + done["b"].get("t.grow", []))
        assert got == [0, 1, 2, 3]
        assert done["a"]["t.grow"] and done["b"]["t.grow"]
        m1.leave(); m2.leave()


def test_fenced_generation_and_unknown_member(broker):
    _fill(broker.bootstrap, "t.fence")
    with KafkaWireConsumer(broker.bootstrap) as c1:
        m1 = KafkaGroupMember(c1, "g.fence", ["t.fence"])
        m1.join()
        # stale generation is fenced, not silently accepted
        m1.generation -= 1
        assert m1.heartbeat() is False
        # an id the coordinator never issued is rejected
        m2 = KafkaGroupMember(c1, "g.fence", ["t.fence"])
        m2.member_id = "ghost"
        m2.generation = 99
        assert m2.heartbeat() is False and m2.member_id == ""
