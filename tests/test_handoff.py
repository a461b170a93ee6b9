"""Snapshot→CDC handoff (initial mode): no gap, no snapshot double-read.

Mirrors the reference's initial-mode contract (README.md:44-54): WAL events
already reflected in the snapshotted base table are NOT replayed (their LSN
is at or below the recorded position); events arriving after the recording
— including during the snapshot — are."""

import json

import pyspark.sql.functions as F

from go_pq_cdc_kafka_spark.plans.routing import RoutingTable
from go_pq_cdc_kafka_spark.sources import cdc
from go_pq_cdc_kafka_spark.sources.snapshot import snapshot_from_parquet
from go_pq_cdc_kafka_spark.streaming import handoff as HO


def _wal_event(lsn, op="INSERT", table="users"):
    return {
        "op": op,
        "event_time": "2024-01-01T00:00:00",
        "lsn": lsn,
        "table_namespace": "public",
        "table_name": table,
        "before": None,
        "after": {"id": str(lsn), "name": f"User-{lsn}"},
    }


def test_wal_position(tmp_path):
    wal = str(tmp_path / "wal.jsonl")
    assert HO.wal_position(wal) == -1
    cdc.write_wal_jsonl([_wal_event(3), _wal_event(7), _wal_event(5)], wal)
    assert HO.wal_position(wal) == 7


def test_snapshot_then_stream_no_gap_no_dupes(spark, tmp_path):
    wal = str(tmp_path / "wal.jsonl")
    base_path = str(tmp_path / "base.parquet")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # base table contains ids 1..5; the WAL records how they got there
    spark.range(1, 6).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("User-"), F.col("id")).alias("name"),
    ).write.parquet(base_path)
    cdc.write_wal_jsonl([_wal_event(i) for i in range(1, 6)], wal)

    load = HO.snapshot_then_stream(
        spark,
        snapshot_source=snapshot_from_parquet(spark, base_path, "users"),
        wal_path=wal,
        routing=RoutingTable({"public.users": "users.t"}),
        pk_field="id",
        out_path=out,
        checkpoint_location=ckpt,
    )
    try:
        assert load.handoff_lsn == 5
        assert load.snapshot_records == 5

        # change arrives AFTER the handoff recording (e.g. mid-snapshot)
        cdc.write_wal_jsonl([_wal_event(6), _wal_event(7)], wal)
        load.query.processAllAvailable()
    finally:
        load.query.stop()

    rows = spark.read.parquet(out).collect()
    payloads = [json.loads(bytes(r.value)) for r in rows]
    ops = sorted(p["operation"] for p in payloads)
    # 5 SNAPSHOT (from the bounded load) + exactly the 2 post-handoff INSERTs:
    # WAL lsns 1..5 are NOT replayed (they are the snapshot's own history)
    assert ops == ["INSERT", "INSERT"] + ["SNAPSHOT"] * 5
    inserted = sorted(p["id"] for p in payloads if p["operation"] == "INSERT")
    assert inserted == ["6", "7"]


def test_snapshot_metrics_parity_names(spark, tmp_path):
    """The reference's snapshot metric family is exposed name-for-name
    (README.md:290-299) and transitions in_progress 1 -> 0."""
    from go_pq_cdc_kafka_spark.streaming.metrics import (
        EngineMetrics,
        SnapshotMetrics,
    )

    m = EngineMetrics()
    sm = SnapshotMetrics(m)
    sm.started(total_tables=1, total_chunks=4)
    assert m.gauges["go_pq_cdc_snapshot_in_progress"] == 1
    sm.chunk_done(rows=100)
    sm.chunk_done(rows=50)
    sm.finished(duration_s=1.5)
    text = m.prometheus_text()
    for name in (
        "go_pq_cdc_snapshot_in_progress 0",
        "go_pq_cdc_snapshot_total_tables 1",
        "go_pq_cdc_snapshot_total_chunks 4",
        "go_pq_cdc_snapshot_completed_chunks 2",
        "go_pq_cdc_snapshot_total_rows 150",
        "go_pq_cdc_snapshot_duration_seconds 1.5",
    ):
        assert name in text, name
