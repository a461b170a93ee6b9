#!/usr/bin/env python
"""Exactly-once STREAMING CDC -> Kafka, surviving micro-batch replay.

The reference's loop is at-least-once by design (ack after publish,
producer_batch.go:141-151): a crash between a batch's produce and its
checkpoint commit replays the batch, and every replayed record lands on
the broker twice. ``CdcPipeline.to_kafka_wire_eos`` closes that window
with the Kafka-Streams EOS recipe generalized to a CDC source:

  - each task produces its slice of the micro-batch inside ONE KIP-98
    transaction;
  - the task stages ``max(lsn)+1`` per deterministic lineage partition
    (``xxhash64(key) % P``) into the consumer group via TxnOffsetCommit
    — the watermark commits atomically with the rows;
  - on a REPLAY, every task first reads the committed watermark and
    drops rows below it, so a first attempt that committed contributes
    nothing twice and one that aborted left nothing visible.

This example replays the WORST case deliberately: the same changelog is
processed twice from a FRESH checkpoint (as if every checkpoint write
had been lost), and a read_committed consumer still sees every change
event exactly once. Swap the MiniBroker for a real Kafka >= 0.11
bootstrap and the code is unchanged.
"""

import json
import tempfile

import pyspark.sql.functions as F


def main(bootstrap: str | None = None) -> dict[int, int]:
    from go_pq_cdc_kafka_spark.envelope import insert_events, to_dynamic
    from go_pq_cdc_kafka_spark.plans.routing import RoutingTable
    from go_pq_cdc_kafka_spark.session import get_spark
    from go_pq_cdc_kafka_spark.sources import changelog as cl
    from go_pq_cdc_kafka_spark.streaming.kafka import KafkaProducerConfig
    from go_pq_cdc_kafka_spark.streaming.kafka_wire import KafkaWireConsumer
    from go_pq_cdc_kafka_spark.streaming.pipeline import CdcPipeline

    own_broker = None
    if bootstrap is None:
        from go_pq_cdc_kafka_spark.streaming.minibroker import MiniBroker

        own_broker = MiniBroker(num_partitions=3).start()
        bootstrap = own_broker.bootstrap

    spark = get_spark(app_name="streaming-eos-example")
    work = tempfile.mkdtemp(prefix="streaming_eos_")
    rows = [(i, f"user-{i}", i + 1000) for i in range(1, 31)]
    base = spark.createDataFrame(rows, "id int, name string, lsn long")
    log = to_dynamic(insert_events(base, "users", lsn=F.col("lsn")))
    cl.write_changelog(log, f"{work}/log", num_files=3)

    cfg = KafkaProducerConfig(
        brokers=[bootstrap],
        transactional_id="streaming-eos-example",
        idempotent=True,
    )

    def run_once(checkpoint: str) -> None:
        pipe = CdcPipeline(
            source=cl.read_changelog_stream(spark, f"{work}/log"),
            routing=RoutingTable({"public.users": "users.eos"}),
            pk_field="id",
        )
        q = pipe.to_kafka_wire_eos(
            cfg,
            checkpoint,
            group="streaming-eos-group",
            progress_partitions=8,
            trigger={"availableNow": True},
        )
        q.awaitTermination(120)

    run_once(f"{work}/ckpt1")
    run_once(f"{work}/ckpt2")  # full replay: every batch re-executes

    seen: dict[int, int] = {}
    try:
        with KafkaWireConsumer(bootstrap) as cons:
            for p in range(3):
                off = 0
                while True:
                    recs, hwm = cons.fetch(
                        "users.eos", p, offset=off, isolation_level=1
                    )
                    if not recs:
                        if off >= hwm:
                            break
                        off += 1  # step past txn control markers
                        continue
                    for r in recs:
                        k = int(json.loads(bytes(r.value))["id"])
                        seen[k] = seen.get(k, 0) + 1
                    off = recs[-1].offset + 1
    finally:
        if own_broker is not None:
            own_broker.stop()
    assert sorted(seen) == list(range(1, 31)), sorted(seen)
    assert all(v == 1 for v in seen.values()), seen
    print(f"{len(seen)} change events, each seen exactly once "
          "by a read_committed consumer across a full replay")
    return seen


if __name__ == "__main__":
    main()
