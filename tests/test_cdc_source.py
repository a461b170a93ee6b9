"""pgwal DataSource: LSN offset bookkeeping through Spark checkpoints."""

import json

from go_pq_cdc_kafka_spark.sources import cdc


def _events(lsns, table="users"):
    return [
        {
            "op": "INSERT",
            "event_time": "2024-01-01T00:00:00",
            "lsn": lsn,
            "table_namespace": "public",
            "table_name": table,
            "before": None,
            "after": {"id": str(lsn), "name": f"User-{lsn}"},
        }
        for lsn in lsns
    ]


def test_wal_source_streams_by_lsn(spark, tmp_path):
    cdc.register(spark)
    wal = str(tmp_path / "wal.jsonl")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    cdc.write_wal_jsonl(_events([1, 2, 3]), wal)

    def drain():
        q = (
            spark.readStream.format("pgwal")
            .option("path", wal)
            .option("maxEventsPerBatch", 2)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    drain()
    df = spark.read.parquet(out)
    assert sorted(r.lsn for r in df.collect()) == [1, 2, 3]
    assert df.filter("after.id = '2'").count() == 1

    # WAL grows while consumer is down; restart resumes past committed LSN
    cdc.write_wal_jsonl(_events([4, 5]), wal)
    drain()
    lsns = sorted(r.lsn for r in spark.read.parquet(out).collect())
    assert lsns == [1, 2, 3, 4, 5]  # no dupes, no loss


def test_wal_source_start_lsn_handoff(spark, tmp_path):
    """Snapshot→CDC no-gap handoff: stream starts after the LSN recorded at
    snapshot time (README.md:50-54)."""
    cdc.register(spark)
    wal = str(tmp_path / "wal2.jsonl")
    cdc.write_wal_jsonl(_events([10, 11, 12]), wal)
    q = (
        spark.readStream.format("pgwal")
        .option("path", wal)
        .option("startLsn", 10)
        .load()
        .writeStream.format("memory")
        .queryName("handoff_sink")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    lsns = sorted(r.lsn for r in spark.sql("select * from handoff_sink").collect())
    assert lsns == [11, 12]


def test_replication_client_dials_wire_when_no_frame_source():
    # without an injected frame_source the client builds a real wire
    # transport from the DSN; with no server to dial, events() must surface
    # the connection failure (not NotImplementedError — the transport layer
    # is implemented, sources/wire.py)
    client = cdc.PostgresReplicationClient(
        "postgresql://u:p@127.0.0.1:1/db", "slot", "pub"
    )
    try:
        next(client.events(0))
        raise AssertionError("expected a connection error")
    except (OSError, ValueError):
        pass
