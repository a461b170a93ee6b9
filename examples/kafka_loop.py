#!/usr/bin/env python
"""The full CDC → Kafka → Spark loop, jar-free and broker-optional.

The reference's deployment shape is Postgres → connector → Kafka; every
consumer of those topics then needs the jar-backed Spark Kafka source.
This example runs the WHOLE loop inside one engine: a changelog streams
through the standard pipeline into ``to_kafka_wire`` (the from-scratch
protocol producer — record batch v2, CRC32C, murmur2 key placement), and
the ``kafkawire`` DataSource reads the topic back executor-parallel.

With no broker address given it spins up the in-process conformance
broker (streaming/minibroker.py) so the example is runnable anywhere;
point ``bootstrap`` at a real Kafka >= 0.11 cluster and both halves work
unchanged (SASL/SCRAM + TLS options included).
"""

import json

import pyspark.sql.functions as F

from go_pq_cdc_kafka_spark.plans.routing import RoutingTable
from go_pq_cdc_kafka_spark.session import get_spark
from go_pq_cdc_kafka_spark.sources import changelog as cl
from go_pq_cdc_kafka_spark.sources import kafka_source as KS
from go_pq_cdc_kafka_spark.streaming.kafka import KafkaProducerConfig
from go_pq_cdc_kafka_spark.streaming.pipeline import CdcPipeline


def main(
    spark=None,
    workdir: str = "/tmp/example_kafka_loop",
    bootstrap: str | None = None,
) -> list:
    spark = spark or get_spark(app_name="example-kafka-loop")

    own_broker = None
    if bootstrap is None:
        from go_pq_cdc_kafka_spark.streaming.minibroker import MiniBroker

        own_broker = MiniBroker(num_partitions=3).start()
        bootstrap = own_broker.bootstrap

    try:
        users = spark.range(1, 6).select(
            F.col("id").cast("int").alias("id"),
            F.concat(F.lit("user"), F.col("id")).alias("name"),
        )
        log = cl.generate_table_changelog(
            users, "id", "users", update_mod=2, delete_mod=5
        )
        cl.write_changelog(log, f"{workdir}/log", num_files=2)

        # produce half: pipeline → wire producer → broker (CRC-validated)
        pipe = CdcPipeline(
            source=cl.read_changelog_stream(spark, f"{workdir}/log"),
            routing=RoutingTable({"public.users": "users.cdc"}),
            pk_field="id",
        )
        q = pipe.to_kafka_wire(
            KafkaProducerConfig(brokers=[bootstrap]),
            f"{workdir}/ckpt",
            trigger={"availableNow": True},
        )
        q.awaitTermination(120)

        # consume half: executor-parallel snapshot read of the topic
        KS.register(spark)
        back = (
            spark.read.format("kafkawire")
            .option("bootstrap", bootstrap)
            .option("topic", "users.cdc")
            .load()
            .orderBy("partition", "offset")
        )
        rows = back.collect()
        for r in rows[:5]:
            print(
                f"p{r.partition}@{r.offset}",
                bytes(r.key).decode(),
                json.loads(bytes(r.value))["operation"],
            )

        # …and straight back into the envelope: the relational tier runs
        # over consumed topics unchanged (works against topics produced by
        # the reference connector too)
        from go_pq_cdc_kafka_spark.envelope import from_kafka_records

        env = from_kafka_records(back)
        env.groupBy("table_name", "op").count().orderBy("op").show()
        return rows
    finally:
        if own_broker is not None:
            own_broker.stop()


if __name__ == "__main__":
    main()
