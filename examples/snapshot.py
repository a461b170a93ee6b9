#!/usr/bin/env python
"""The reference's example/snapshot (initial mode), on this engine.

example/snapshot/main.go: snapshot the publication tables in chunks, then
stream changes — consumers distinguish the phases by the ``source`` header
(initial-snapshot vs cdc, example/snapshot/README.md:88-113).

Here :func:`snapshot_then_stream` runs the same contract against a base
parquet table + file-replay WAL: record the WAL position, land the bounded
snapshot, stream everything past the recorded LSN into the same directory.
"""

import json

import pyspark.sql.functions as F

from go_pq_cdc_kafka_spark.plans.routing import RoutingTable
from go_pq_cdc_kafka_spark.session import get_spark
from go_pq_cdc_kafka_spark.sources import cdc
from go_pq_cdc_kafka_spark.sources.snapshot import snapshot_from_parquet
from go_pq_cdc_kafka_spark.streaming import handoff as HO


def main(spark=None, workdir: str = "/tmp/example_snapshot") -> dict:
    spark = spark or get_spark(app_name="example-snapshot")

    base = f"{workdir}/users.parquet"
    wal = f"{workdir}/wal.jsonl"
    spark.range(1, 6).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("User"), F.col("id")).alias("name"),
    ).write.mode("overwrite").parquet(base)
    cdc.write_wal_jsonl(
        [
            {
                "op": "INSERT",
                "event_time": "2024-01-01T00:00:00",
                "lsn": i,
                "table_namespace": "public",
                "table_name": "users",
                "before": None,
                "after": {"id": str(i), "name": f"User{i}"},
            }
            for i in range(1, 6)
        ],
        wal,
        append=False,
    )

    load = HO.snapshot_then_stream(
        spark,
        snapshot_source=snapshot_from_parquet(spark, base, "users"),
        wal_path=wal,
        routing=RoutingTable({"public.users": "users.snapshot.test"}),
        pk_field="id",
        out_path=f"{workdir}/out",
        checkpoint_location=f"{workdir}/ckpt",
    )
    try:
        # a change committed after the handoff recording
        cdc.write_wal_jsonl(
            [
                {
                    "op": "UPDATE",
                    "event_time": "2024-01-01T00:01:00",
                    "lsn": 6,
                    "table_namespace": "public",
                    "table_name": "users",
                    "before": {"id": "1", "name": "User1"},
                    "after": {"id": "1", "name": "User1-renamed"},
                }
            ],
            wal,
        )
        load.query.processAllAvailable()
    finally:
        load.query.stop()

    counts: dict[str, int] = {}
    for r in spark.read.parquet(f"{workdir}/out").collect():
        op = json.loads(bytes(r.value))["operation"]
        counts[op] = counts.get(op, 0) + 1
    print(f"handoff_lsn={load.handoff_lsn} records={counts}")
    return counts


if __name__ == "__main__":
    main()
