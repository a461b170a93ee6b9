#!/usr/bin/env python
"""Exactly-once consume-transform-produce on a multi-broker cluster.

The reference delivers at-least-once (ack after publish — a crash
between produce and ack replays). This example shows the KIP-98 upgrade
this engine adds on the wire path, against a 3-node MiniCluster whose
transaction coordinator, group coordinator, and partition leaders live
on DIFFERENT brokers — the topology a real deployment has and a
single-node test can't exercise:

  read committed position → transform → transactional produce
  → TxnOffsetCommit (offsets staged INSIDE the transaction)
  → commit: records + new position become visible atomically

A crash anywhere before commit replays the batch with nothing
duplicated; a zombie of the old producer is epoch-fenced. Point
``bootstrap`` at a real Kafka >= 0.11 cluster and the client code is
unchanged (the balancer/coordinator routing is the same protocol).
"""

from go_pq_cdc_kafka_spark.streaming.kafka_wire import (
    KafkaWireConsumer,
    KafkaWireProducer,
)


def main(bootstrap: str | None = None) -> list[bytes]:
    own_cluster = None
    if bootstrap is None:
        from go_pq_cdc_kafka_spark.streaming.minibroker import MiniCluster

        own_cluster = MiniCluster(num_brokers=3, num_partitions=1).start()
        bootstrap = own_cluster.bootstrap

    IN, OUT, GROUP, TXN = "ex.in", "ex.out", "ex-group", "ex-app"
    try:
        # seed the input topic
        with KafkaWireProducer(bootstrap) as seed:
            seed.send_records(
                [(IN, b"k%d" % i, b"event-%d" % i, []) for i in range(10)]
            )

        consumer = KafkaWireConsumer(bootstrap)
        try:
            while True:
                pos = max(consumer.fetch_committed(GROUP, IN, [0])[0], 0)
                recs, hwm = consumer.fetch(IN, 0, offset=pos,
                                           isolation_level=1)
                if not recs:
                    break
                batch = recs[:4]
                prod = KafkaWireProducer(bootstrap, transactional_id=TXN)
                prod.begin_transaction()
                prod.send_records(
                    [(OUT, bytes(r.key), bytes(r.value).upper(), [])
                     for r in batch]
                )
                prod.send_offsets_to_transaction(
                    GROUP, IN, {0: batch[-1].offset + 1}
                )
                prod.commit_transaction()  # records + position, atomically
                prod.close()
            out, _ = consumer.fetch(OUT, 0, isolation_level=1)
            return [bytes(r.value) for r in out]
        finally:
            consumer.close()
    finally:
        if own_cluster is not None:
            own_cluster.stop()


if __name__ == "__main__":
    for v in main():
        print(v.decode())
