#!/usr/bin/env python
"""The reference's example/simple, on this engine.

example/simple/main.go: two tables (users, books) under one publication;
the handler keeps INSERT/UPDATE (key = id, value = new image + operation),
renders DELETE from the old image, and drops everything else; records go to
users.0 / books.0.

Here the same pipeline runs against a deterministic file-replay changelog
(no Postgres/Kafka needed): generate a change log for both tables, stream
it through the identical handler semantics, and land records in a memory
sink for inspection. Swap the source for the pgwal DataSource tailing a
real WAL feed and the sink for `pipe.to_kafka(cfg, ckpt)` in production.
"""

import json

import pyspark.sql.functions as F

from go_pq_cdc_kafka_spark.plans.routing import RoutingTable
from go_pq_cdc_kafka_spark.session import get_spark
from go_pq_cdc_kafka_spark.sources import changelog as cl
from go_pq_cdc_kafka_spark.streaming.pipeline import CdcPipeline


def main(spark=None, workdir: str = "/tmp/example_simple") -> list:
    spark = spark or get_spark(app_name="example-simple")

    users = spark.range(1, 6).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("Oyleli"), F.col("id")).alias("name"),
    )
    books = spark.range(1, 4).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("Author"), F.col("id")).alias("author"),
    )
    log = cl.generate_table_changelog(users, "id", "users").unionByName(
        cl.generate_table_changelog(books, "id", "books")
    )
    path = f"{workdir}/log"
    cl.write_changelog(log, path, num_files=2)

    pipe = CdcPipeline(
        source=cl.read_changelog_stream(spark, path),
        routing=RoutingTable(
            {"public.users": "users.0", "public.books": "books.0"}
        ),
        pk_field="id",
    )
    q = pipe.to_memory("simple_sink")
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("select * from simple_sink limit 5").collect()
    for r in rows:
        print(r.topic, bytes(r.key).decode(), json.loads(bytes(r.value)))
    return rows


if __name__ == "__main__":
    main()
