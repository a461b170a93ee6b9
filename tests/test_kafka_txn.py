"""KIP-98 transactions on the wire tier: transactional produce with
commit/abort markers (control batches), epoch fencing, last-stable-offset
gating, and read_committed consumer filtering — exercised end-to-end
against the conformance broker. Completes the exactly-once story on top
of idempotent produce; the reference's own delivery contract stops at
at-least-once (producer_batch.go:141-151)."""

from __future__ import annotations

import pytest

from go_pq_cdc_kafka_spark.streaming.kafka_wire import (
    KafkaProtocolError,
    KafkaWireConsumer,
    KafkaWireProducer,
)
from go_pq_cdc_kafka_spark.streaming.minibroker import MiniBroker


def _values(records):
    return [bytes(r.value) for r in records]


def _send(producer, topic, *values):
    producer.send_records([(topic, b"k", v, []) for v in values])


def test_committed_txn_visible_and_marker_hidden():
    with MiniBroker(num_partitions=1) as broker:
        with KafkaWireProducer(
            broker.bootstrap, transactional_id="txn-app-1"
        ) as p:
            p.begin_transaction()
            _send(p, "t.txn", b"a", b"b")
            p.commit_transaction()
        with KafkaWireConsumer(broker.bootstrap) as c:
            committed, _ = c.fetch("t.txn", 0, isolation_level=1)
            uncommitted, _ = c.fetch("t.txn", 0, isolation_level=0)
        assert _values(committed) == [b"a", b"b"]
        # the commit marker occupies an offset (hwm=3) but is never
        # surfaced as a record
        assert _values(uncommitted) == [b"a", b"b"]
        assert broker.topic_count("t.txn") == 3  # 2 data + 1 marker offset
        assert len(broker.topic_records("t.txn")) == 2


def test_aborted_txn_invisible_read_committed():
    with MiniBroker(num_partitions=1) as broker:
        with KafkaWireProducer(
            broker.bootstrap, transactional_id="txn-app-2"
        ) as p:
            p.begin_transaction()
            _send(p, "t.ab", b"doomed-1", b"doomed-2")
            p.abort_transaction()
            p.begin_transaction()
            _send(p, "t.ab", b"kept")
            p.commit_transaction()
        with KafkaWireConsumer(broker.bootstrap) as c:
            committed, _ = c.fetch("t.ab", 0, isolation_level=1)
            uncommitted, _ = c.fetch("t.ab", 0, isolation_level=0)
        # read_committed: aborted data filtered via the aborted-txn index
        assert _values(committed) == [b"kept"]
        # read_uncommitted sees aborted data too (Kafka's contract)
        assert _values(uncommitted) == [b"doomed-1", b"doomed-2", b"kept"]


def test_open_txn_gates_last_stable_offset():
    with MiniBroker(num_partitions=1) as broker:
        p = KafkaWireProducer(broker.bootstrap, transactional_id="txn-lso")
        p.begin_transaction()
        _send(p, "t.lso", b"pending")
        with KafkaWireConsumer(broker.bootstrap) as c:
            before, hwm = c.fetch("t.lso", 0, isolation_level=1)
            # data exists (hwm advanced) but is not yet stable
            assert hwm == 1
            assert before == []
            # read_uncommitted sees it immediately
            dirty, _ = c.fetch("t.lso", 0, isolation_level=0)
            assert _values(dirty) == [b"pending"]
            p.commit_transaction()
            after, _ = c.fetch("t.lso", 0, isolation_level=1)
            assert _values(after) == [b"pending"]
        p.close()


def test_interleaved_nontxn_records_survive_abort():
    with MiniBroker(num_partitions=1) as broker:
        plain = KafkaWireProducer(broker.bootstrap, idempotent=True)
        txn = KafkaWireProducer(broker.bootstrap, transactional_id="txn-mix")
        _send(plain, "t.mix", b"n1")
        txn.begin_transaction()
        _send(txn, "t.mix", b"t1")
        _send(plain, "t.mix", b"n2")
        _send(txn, "t.mix", b"t2")
        txn.abort_transaction()
        _send(plain, "t.mix", b"n3")
        with KafkaWireConsumer(broker.bootstrap) as c:
            committed, _ = c.fetch("t.mix", 0, isolation_level=1)
        assert _values(committed) == [b"n1", b"n2", b"n3"]
        plain.close()
        txn.close()


def test_epoch_fencing_rejects_zombie_producer():
    with MiniBroker(num_partitions=1) as broker:
        old = KafkaWireProducer(broker.bootstrap, transactional_id="txn-z")
        old.begin_transaction()
        _send(old, "t.z", b"zombie-write")
        # a NEW instance with the same transactional id bumps the epoch,
        # fencing `old` and aborting its open transaction
        new = KafkaWireProducer(broker.bootstrap, transactional_id="txn-z")
        new.begin_transaction()
        _send(new, "t.z", b"fresh")
        new.commit_transaction()
        with pytest.raises(KafkaProtocolError):
            old.commit_transaction()
        with KafkaWireConsumer(broker.bootstrap) as c:
            committed, _ = c.fetch("t.z", 0, isolation_level=1)
        assert _values(committed) == [b"fresh"]
        old.close()
        new.close()


def test_txn_with_compression_roundtrip():
    from go_pq_cdc_kafka_spark.streaming.kafka_wire import COMPRESSION_ZSTD

    with MiniBroker(num_partitions=1) as broker:
        with KafkaWireProducer(
            broker.bootstrap,
            transactional_id="txn-zstd",
            compression=COMPRESSION_ZSTD,
        ) as p:
            p.begin_transaction()
            _send(p, "t.cz", b"zz" * 5000, b"tail")
            p.commit_transaction()
        with KafkaWireConsumer(broker.bootstrap) as c:
            committed, _ = c.fetch("t.cz", 0, isolation_level=1)
        assert _values(committed) == [b"zz" * 5000, b"tail"]


def test_sink_transactional_tasks_commit_per_partition(spark):
    """write_kafka_wire with a transactional-id prefix: every produce task
    runs inside its own transaction, so the whole micro-batch is visible
    to read_committed consumers only through committed markers."""
    from go_pq_cdc_kafka_spark.streaming.kafka import KafkaProducerConfig
    from go_pq_cdc_kafka_spark.streaming.pipeline import write_kafka_wire

    rows = [("t.sink", b"k%d" % i, b"v%d" % i) for i in range(40)]
    df = spark.createDataFrame(
        rows, "topic string, key binary, value binary"
    ).repartition(4)
    with MiniBroker(num_partitions=2) as broker:
        cfg = KafkaProducerConfig(
            brokers=[broker.bootstrap], transactional_id="sink-app"
        )
        n = write_kafka_wire(df, cfg)
        assert n == 40
        got = set()
        with KafkaWireConsumer(broker.bootstrap) as c:
            for p in (0, 1):
                recs, _ = c.fetch("t.sink", p, isolation_level=1)
                got |= {bytes(r.value) for r in recs}
        assert got == {b"v%d" % i for i in range(40)}
        # commit markers were written (offsets beyond the 40 data records)
        assert broker.topic_count("t.sink") > 40


def test_txn_api_misuse_rejected():
    with MiniBroker(num_partitions=1) as broker:
        plain = KafkaWireProducer(broker.bootstrap)
        with pytest.raises(ValueError, match="transactional_id"):
            plain.begin_transaction()
        plain.close()
        p = KafkaWireProducer(broker.bootstrap, transactional_id="txn-m")
        with pytest.raises(ValueError, match="no transaction"):
            p.commit_transaction()
        p.begin_transaction()
        with pytest.raises(ValueError, match="already in progress"):
            p.begin_transaction()
        p.abort_transaction()
        p.close()


def test_send_offsets_commits_atomically_with_records():
    """KIP-98 consume-transform-produce: the group's source offsets and
    the transformed output become visible in the SAME transaction commit,
    so a crash between them can never split read-position from output
    (the reference's publish-then-ack loop, consumer.go:141-157, is
    at-least-once across that window)."""
    with MiniBroker(num_partitions=1) as broker:
        with KafkaWireProducer(broker.bootstrap) as seed:
            _send(seed, "t.in", b"1", b"2", b"3")
        with KafkaWireConsumer(broker.bootstrap) as c:
            assert c.fetch_committed("eos-g", "t.in", [0]) == {0: -1}
            records, _ = c.fetch("t.in", 0, isolation_level=1)
            with KafkaWireProducer(
                broker.bootstrap, transactional_id="txn-eos"
            ) as p:
                p.begin_transaction()
                for r in records:
                    _send(p, "t.out", b"x" + bytes(r.value))
                p.send_offsets_to_transaction(
                    "eos-g", "t.in", {0: len(records)}
                )
                # staged, not yet visible: OffsetFetch still sees no commit
                assert c.fetch_committed("eos-g", "t.in", [0]) == {0: -1}
                p.commit_transaction()
            assert c.fetch_committed("eos-g", "t.in", [0]) == {0: 3}
            out, _ = c.fetch("t.out", 0, isolation_level=1)
            assert _values(out) == [b"x1", b"x2", b"x3"]


def test_send_offsets_discarded_on_abort():
    with MiniBroker(num_partitions=1) as broker:
        with KafkaWireProducer(broker.bootstrap) as seed:
            _send(seed, "t.in2", b"a")
        with KafkaWireProducer(
            broker.bootstrap, transactional_id="txn-eos2"
        ) as p:
            p.begin_transaction()
            _send(p, "t.out2", b"doomed")
            p.send_offsets_to_transaction("eos-g2", "t.in2", {0: 1})
            p.abort_transaction()
        with KafkaWireConsumer(broker.bootstrap) as c:
            assert c.fetch_committed("eos-g2", "t.in2", [0]) == {0: -1}
            out, _ = c.fetch("t.out2", 0, isolation_level=1)
        assert out == []


def test_offsets_only_txn_reaches_broker():
    """A transaction that stages offsets but produces nothing must still
    EndTxn through the coordinator (the empty-txn local short-circuit
    only applies when neither records nor offsets were registered)."""
    with MiniBroker(num_partitions=1) as broker:
        with KafkaWireProducer(
            broker.bootstrap, transactional_id="txn-oo"
        ) as p:
            p.begin_transaction()
            p.send_offsets_to_transaction("oo-g", "t.any", {0: 7})
            p.commit_transaction()
        with KafkaWireConsumer(broker.bootstrap) as c:
            assert c.fetch_committed("oo-g", "t.any", [0]) == {0: 7}


def test_zombie_cannot_stage_offsets():
    """Epoch fencing covers the offsets path too: once a new instance
    bumps the epoch, the old producer's TxnOffsetCommit is rejected and
    nothing it staged survives."""
    with MiniBroker(num_partitions=1) as broker:
        old = KafkaWireProducer(broker.bootstrap, transactional_id="txn-zo")
        old.begin_transaction()
        old.send_offsets_to_transaction("zo-g", "t.zo", {0: 5})
        new = KafkaWireProducer(broker.bootstrap, transactional_id="txn-zo")
        new.begin_transaction()
        with pytest.raises(KafkaProtocolError):
            old.send_offsets_to_transaction("zo-g", "t.zo", {0: 9})
        with pytest.raises(KafkaProtocolError):
            old.commit_transaction()
        new.abort_transaction()
        with KafkaWireConsumer(broker.bootstrap) as c:
            assert c.fetch_committed("zo-g", "t.zo", [0]) == {0: -1}
        old.close()
        new.close()


def test_send_offsets_requires_open_txn():
    with MiniBroker(num_partitions=1) as broker:
        with KafkaWireProducer(
            broker.bootstrap, transactional_id="txn-req"
        ) as p:
            with pytest.raises(ValueError, match="open transaction"):
                p.send_offsets_to_transaction("g", "t", {0: 1})


def test_eos_loop_spark_exactly_once(spark):
    """End-to-end exactly-once consume-transform-produce through Spark:
    kafkawire source (committed resume) → narrow transform →
    write_kafka_wire_eos. Each source partition's offsets commit inside
    the same transaction as its transformed output, so re-running the
    loop never reprocesses covered input and never duplicates output."""
    from pyspark.sql import functions as F

    from go_pq_cdc_kafka_spark.sources import kafka_source as KS
    from go_pq_cdc_kafka_spark.streaming.kafka import KafkaProducerConfig
    from go_pq_cdc_kafka_spark.streaming.pipeline import write_kafka_wire_eos

    KS.register(spark)
    with MiniBroker(num_partitions=2) as broker:
        cfg = KafkaProducerConfig(
            brokers=[broker.bootstrap], transactional_id="eos-loop-app"
        )

        def run_loop() -> int:
            src = (
                spark.read.format("kafkawire")
                .option("bootstrap", broker.bootstrap)
                .option("topic", "t.eos.in")
                .option("group.id", "eos-loop")
                .option("startingoffsets", "committed")
                .option("auto.offset.reset", "earliest")
                .load()
            )
            rec = src.select(
                F.col("topic").alias("src_topic"),
                F.col("partition").alias("src_partition"),
                F.col("offset").alias("src_offset"),
                F.lit("t.eos.out").alias("topic"),
                F.col("key"),
                F.upper(F.col("value").cast("string"))
                .cast("binary")
                .alias("value"),
            )
            return write_kafka_wire_eos(rec, cfg, "eos-loop")

        def out_values() -> list[bytes]:
            vals = []
            with KafkaWireConsumer(broker.bootstrap) as c:
                for p in (0, 1):
                    recs, _ = c.fetch("t.eos.out", p, isolation_level=1)
                    vals += [bytes(r.value) for r in recs]
            return sorted(vals)

        with KafkaWireProducer(broker.bootstrap) as seed:
            _send(seed, "t.eos.in", *[b"m%d" % i for i in range(10)])
        assert run_loop() == 10
        assert out_values() == sorted(b"M%d" % i for i in range(10))
        # second pass: everything is covered by committed transactions
        assert run_loop() == 0
        assert out_values() == sorted(b"M%d" % i for i in range(10))
        # incremental input: only the delta is processed
        with KafkaWireProducer(broker.bootstrap) as seed:
            _send(seed, "t.eos.in", b"x1", b"x2", b"x3")
        assert run_loop() == 3
        assert out_values() == sorted(
            [b"M%d" % i for i in range(10)] + [b"X1", b"X2", b"X3"]
        )


def test_eos_task_failure_advances_nothing():
    """The produce closure run to a mid-stream failure aborts its
    transaction: neither the records it already flushed nor the offsets
    it tracked become visible, so a Spark task retry (same inputs) is a
    clean exactly-once redo."""
    import pandas as pd

    from go_pq_cdc_kafka_spark.streaming.pipeline import _wire_produce_fn

    with MiniBroker(num_partitions=1) as broker:
        fn = _wire_produce_fn(
            {"bootstrap": broker.bootstrap,
             "transactional_id": "eos-fail"},
            (1, 1 << 20),  # flush every record: data reaches the broker
            eos_group="eos-fail-g",
        )

        def frames():
            yield pd.DataFrame({
                "topic": ["t.ef.out"], "key": [b"k"], "value": [b"v"],
                "src_topic": ["t.ef.in"], "src_partition": [0],
                "src_offset": [4],
            })
            raise RuntimeError("executor died mid-task")

        with pytest.raises(RuntimeError, match="mid-task"):
            list(fn(frames()))
        with KafkaWireConsumer(broker.bootstrap) as c:
            recs, _ = c.fetch("t.ef.out", 0, isolation_level=1)
            assert recs == []  # flushed but aborted — invisible
            assert c.fetch_committed("eos-fail-g", "t.ef.in", [0]) == {0: -1}


def test_eos_requires_txn_and_lineage(spark):
    from go_pq_cdc_kafka_spark.streaming.kafka import KafkaProducerConfig
    from go_pq_cdc_kafka_spark.streaming.pipeline import write_kafka_wire_eos

    df = spark.createDataFrame(
        [("t", b"k", b"v")], "topic string, key binary, value binary"
    )
    with pytest.raises(ValueError, match="transactional_id"):
        write_kafka_wire_eos(
            df, KafkaProducerConfig(brokers=["x:1"]), "g"
        )
    with pytest.raises(ValueError, match="lineage"):
        write_kafka_wire_eos(
            df,
            KafkaProducerConfig(brokers=["x:1"], transactional_id="t"),
            "g",
        )


def test_find_coordinator_v1_both_key_types():
    """FindCoordinator v1 (throttle + error_message in the response)
    resolves both the group (type 0) and transaction (type 1) coordinator;
    transactional RPCs must be routed through it — bootstrap-only routing
    fails with NOT_COORDINATOR on real multi-broker clusters."""
    with MiniBroker(num_partitions=1) as broker:
        with KafkaWireProducer(
            broker.bootstrap, transactional_id="fc-v1"
        ) as p:
            g = p._coordinator_conn_v1("some-group", 0)
            t = p._coordinator_conn_v1("fc-v1", 1)
            assert g is not t  # independent cached connections
            # cache hit returns the same object
            assert p._coordinator_conn_v1("fc-v1", 1) is t
            # the resolved connections actually serve requests
            p.begin_transaction()
            _send(p, "t.fc", b"x")
            p.commit_transaction()
        with KafkaWireConsumer(broker.bootstrap) as c:
            recs, _ = c.fetch("t.fc", 0, isolation_level=1)
            assert [bytes(r.value) for r in recs] == [b"x"]


def test_eos_align_repartition_with_minpartitions_split(spark):
    """`minpartitions` splits one source partition's offset range across
    several input tasks — under align="assume" each piece would commit its
    own transaction (a later-range commit can outlive an earlier-range
    abort and skip records on resume). The default align="repartition"
    re-unifies each source partition onto one task, so the loop stays
    exactly-once regardless of how the source planned its scan."""
    from pyspark.sql import functions as F

    from go_pq_cdc_kafka_spark.sources import kafka_source as KS
    from go_pq_cdc_kafka_spark.streaming.kafka import KafkaProducerConfig
    from go_pq_cdc_kafka_spark.streaming.pipeline import write_kafka_wire_eos

    KS.register(spark)
    with MiniBroker(num_partitions=1) as broker:
        cfg = KafkaProducerConfig(
            brokers=[broker.bootstrap], transactional_id="eos-minpart-app"
        )

        def run_loop() -> int:
            src = (
                spark.read.format("kafkawire")
                .option("bootstrap", broker.bootstrap)
                .option("topic", "t.mp.in")
                .option("group.id", "eos-minpart")
                .option("startingoffsets", "committed")
                .option("auto.offset.reset", "earliest")
                .option("minpartitions", "4")  # force the range split
                .load()
            )
            rec = src.select(
                F.col("topic").alias("src_topic"),
                F.col("partition").alias("src_partition"),
                F.col("offset").alias("src_offset"),
                F.lit("t.mp.out").alias("topic"),
                F.col("key"),
                F.col("value"),
            )
            return write_kafka_wire_eos(rec, cfg, "eos-minpart")

        with KafkaWireProducer(broker.bootstrap) as seed:
            _send(seed, "t.mp.in", *[b"r%d" % i for i in range(20)])
        assert run_loop() == 20
        assert run_loop() == 0  # committed-resume covers everything
        with KafkaWireConsumer(broker.bootstrap) as c:
            recs, _ = c.fetch("t.mp.out", 0, isolation_level=1)
            assert sorted(bytes(r.value) for r in recs) == sorted(
                b"r%d" % i for i in range(20)
            )
            # the whole partition's range rode exactly one transaction
            assert c.fetch_committed(
                "eos-minpart", "t.mp.in", [0]
            ) == {0: 20}


def test_align_by_source_unifies_split_partitions(spark):
    """_align_by_source: after alignment every (src_topic, src_partition)
    lives in exactly one Spark partition with offsets in ascending order —
    the invariant each per-task transaction relies on."""
    from pyspark.sql import functions as F

    from go_pq_cdc_kafka_spark.streaming.pipeline import _align_by_source

    rows = [
        ("a", p, o) for p in range(3) for o in range(50)
    ]
    df = (
        spark.createDataFrame(
            rows, "src_topic string, src_partition int, src_offset long"
        )
        .repartition(16)  # scatter: simulates minpartitions/up-stream shuffle
        .withColumn("topic", F.lit("out"))
        .withColumn("key", F.lit(None).cast("binary"))
        .withColumn("value", F.lit(None).cast("binary"))
    )
    aligned = _align_by_source(df)

    placed = (
        aligned.withColumn("spid", F.spark_partition_id())
        .groupBy("src_topic", "src_partition")
        .agg(F.countDistinct("spid").alias("n_tasks"))
        .collect()
    )
    assert len(placed) == 3
    assert all(r["n_tasks"] == 1 for r in placed)

    def check_sorted(it):
        import pandas as pd

        last: dict[tuple, int] = {}
        ok = True
        for pdf in it:
            for t, p, o in zip(
                pdf["src_topic"], pdf["src_partition"], pdf["src_offset"]
            ):
                k = (t, int(p))
                if k in last and int(o) < last[k]:
                    ok = False
                last[k] = int(o)
        yield pd.DataFrame({"ok": [ok]})

    flags = aligned.mapInPandas(check_sorted, schema="ok boolean").collect()
    assert all(r["ok"] for r in flags)


def test_eos_rejects_unknown_align(spark):
    from go_pq_cdc_kafka_spark.streaming.kafka import KafkaProducerConfig
    from go_pq_cdc_kafka_spark.streaming.pipeline import write_kafka_wire_eos

    df = spark.createDataFrame(
        [("t", 0, 0)], "src_topic string, src_partition int, src_offset long"
    )
    with pytest.raises(ValueError, match="align"):
        write_kafka_wire_eos(
            df,
            KafkaProducerConfig(brokers=["x:1"], transactional_id="t"),
            "g",
            align="magic",
        )


# ---------------------------------------------------------------------------
# Chaos matrix: randomized kill schedules over the exactly-once loop.
# ---------------------------------------------------------------------------

_CRASH_POINTS = (
    "none",            # healthy attempt
    "after_produce",   # die before staging offsets (txn left open)
    "after_offsets",   # die after TxnOffsetCommit, before EndTxn
    "after_commit",    # die after EndTxn(commit) — work IS durable
    "zombie",          # a fenced prior instance keeps sending afterwards
    "coord_drop",      # coordinator connections severed mid-attempt —
                       # the client must re-resolve via FindCoordinator
)


def _run_eos_chaos_schedule(schedule, n_inputs, chunk, cluster=False):
    """Drive the consume-transform-produce loop over ``n_inputs`` records,
    injecting one scheduled failure per attempt (then healthy attempts
    until done). Asserts the read-committed output is EXACTLY the ordered
    transform of the input — no loss, no duplicates — whatever the
    schedule (KIP-98's claim, exercised the way Kafka Streams EOS does).
    ``cluster=True`` runs the same loop against a 3-node MiniCluster —
    txn coordinator, group coordinator, and partition leaders on
    different nodes, so every coordinator-routing path (including the
    coord_drop re-resolution) crosses real node boundaries."""
    from go_pq_cdc_kafka_spark.streaming.kafka_wire import KafkaProtocolError
    from go_pq_cdc_kafka_spark.streaming.minibroker import MiniCluster

    IN, OUT, GROUP, TXN = "t.cx.in", "t.cx.out", "cx-group", "cx-app"
    broker_cm = (
        MiniCluster(num_brokers=3, num_partitions=1)
        if cluster
        else MiniBroker(num_partitions=1)
    )
    with broker_cm as broker:
        with KafkaWireProducer(broker.bootstrap) as seed:
            _send(seed, IN, *[b"m%d" % i for i in range(n_inputs)])

        zombies: list[KafkaWireProducer] = []
        consumer = KafkaWireConsumer(broker.bootstrap)
        attempts = 0
        max_attempts = len(schedule) + n_inputs + 8  # progress guarantee
        try:
            while attempts < max_attempts:
                fail = schedule[attempts] if attempts < len(schedule) else "none"
                attempts += 1

                # a fresh instance: InitProducerId bumps the epoch, fencing
                # any zombie AND aborting its open transaction
                prod = KafkaWireProducer(broker.bootstrap, transactional_id=TXN)

                if fail == "zombie" and zombies:
                    # the previous incarnation wakes up after the new
                    # instance registered: every write path must be fenced
                    old = zombies[-1]
                    prod.begin_transaction()  # registers the new epoch
                    with pytest.raises(KafkaProtocolError):
                        if not old._in_txn:
                            old.begin_transaction()  # local: pid is cached
                        _send(old, OUT, b"ZOMBIE")
                    with pytest.raises(KafkaProtocolError):
                        old.send_offsets_to_transaction(GROUP, IN, {0: 999})
                    prod.abort_transaction()
                    prod.close()
                    continue

                committed = consumer.fetch_committed(GROUP, IN, [0])[0]
                pos = max(committed, 0)
                if pos >= n_inputs:
                    prod.close()
                    break
                recs, _ = consumer.fetch(IN, 0, offset=pos, isolation_level=1)
                batch = recs[:chunk]
                if not batch:
                    prod.close()
                    continue

                prod.begin_transaction()
                _send(prod, OUT, *[bytes(r.value).upper() for r in batch])
                if fail == "after_produce":
                    zombies.append(prod)  # crash: no offsets, no EndTxn
                    continue
                if fail == "coord_drop":
                    # sever every cached coordinator conn: the next txn
                    # RPC must FindCoordinator again and still commit
                    for c in list(prod._coord_conns.values()):
                        c.close()
                prod.send_offsets_to_transaction(
                    GROUP, IN, {0: batch[-1].offset + 1}
                )
                if fail == "after_offsets":
                    zombies.append(prod)  # crash: EndTxn never sent
                    continue
                prod.commit_transaction()
                if fail == "after_commit":
                    zombies.append(prod)  # crash AFTER durability
                    continue
                prod.close()

            final = consumer.fetch_committed(GROUP, IN, [0])[0]
            assert final == n_inputs, f"loop stalled: {final}/{n_inputs}"
            out, _ = consumer.fetch(
                OUT, 0, isolation_level=1, max_bytes=4 << 20
            )
            assert [bytes(r.value) for r in out] == [
                b"M%d" % i for i in range(n_inputs)
            ], "read-committed output must be the exact ordered transform"
        finally:
            consumer.close()
            for z in zombies:
                try:
                    z.close()
                except Exception:
                    pass


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=100,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        schedule=st.lists(
            st.sampled_from(_CRASH_POINTS), min_size=1, max_size=10
        ),
        n_inputs=st.integers(min_value=1, max_value=12),
        chunk=st.integers(min_value=1, max_value=4),
    )
    def test_eos_chaos_matrix_exactly_once(schedule, n_inputs, chunk):
        """≥100 randomized kill schedules (producer death before/after
        EndTxn, post-commit death, zombie fencing, coordinator connection
        loss): the read-committed consumer sees each input exactly once,
        in order, every time."""
        _run_eos_chaos_schedule(schedule, n_inputs, chunk)

except ImportError:  # pragma: no cover - hypothesis is baked into this env
    pass


def test_eos_chaos_worst_case_schedule():
    """Deterministic anchor: every failure mode back to back, twice."""
    _run_eos_chaos_schedule(
        ["after_produce", "after_offsets", "zombie", "coord_drop",
         "after_commit", "after_produce", "after_offsets", "zombie",
         "coord_drop", "after_commit"],
        n_inputs=9,
        chunk=2,
    )
