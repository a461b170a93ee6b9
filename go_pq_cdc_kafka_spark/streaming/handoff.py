"""Snapshot → CDC handoff: the reference's ``initial`` mode, orchestrated.

Reference contract (README.md:44-54; snapshot.go flow): record the slot's
WAL position BEFORE the snapshot, run the chunked snapshot, then stream
changes from the recorded position. Events committed while the snapshot ran
are replayed (their LSN is past the recorded position), so nothing is
missed; the overlap window is absorbed by at-least-once consumers (or the
LWW materialization, operators.relational) exactly as in the reference.

Spark shape: the snapshot is a bounded run of the SAME record lineage
(CdcPipeline.run_batch), the stream is the pgwal source started at the
recorded LSN, and both write through one sink path so downstream consumers
see one continuous feed."""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from go_pq_cdc_kafka_spark.plans.routing import RoutingTable
from go_pq_cdc_kafka_spark.streaming.pipeline import CdcPipeline


def wal_position(wal_path: str) -> int:
    """Current end-of-WAL position of a JSONL WAL file (the file-tail
    analogue of ``pg_current_wal_lsn()``); -1 for a missing/empty log so a
    subsequent stream starts from the very first event."""
    pos = -1
    if not os.path.exists(wal_path):
        return pos
    with open(wal_path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                pos = max(pos, json.loads(line)["lsn"])
    return pos


@dataclass
class InitialLoad:
    """Result of :func:`snapshot_then_stream`: the recorded handoff LSN, the
    number of snapshot records landed, and the live CDC query (caller owns
    stopping it)."""

    handoff_lsn: int
    snapshot_records: int
    query: StreamingQuery


def snapshot_then_stream(
    spark: SparkSession,
    snapshot_source: DataFrame,
    wal_path: str,
    routing: RoutingTable,
    pk_field: str,
    out_path: str,
    checkpoint_location: str,
    max_events_per_batch: int = 1000,
    snapshot_metrics=None,
) -> InitialLoad:
    """Run ``initial`` mode into a parquet sink.

    1. Record the WAL position (BEFORE the snapshot — the no-gap rule).
    2. Land the bounded snapshot through the full record lineage.
    3. Start the stream from the recorded LSN into the same sink path.

    The stream replays any event with lsn > handoff_lsn, including ones
    committed while step 2 ran."""
    handoff_lsn = wal_position(wal_path)

    snap_pipe = CdcPipeline(
        source=snapshot_source, routing=routing, pk_field=pk_field
    )
    t0 = time.monotonic()
    if snapshot_metrics is not None:
        snapshot_metrics.started(
            total_tables=1,
            total_chunks=snapshot_source.rdd.getNumPartitions(),
        )
    snap_records = snap_pipe.run_batch()
    snap_records.write.mode("append").parquet(out_path)
    n = spark.read.parquet(out_path).count()
    if snapshot_metrics is not None:
        snapshot_metrics.chunk_done(rows=n)
        snapshot_metrics.finished(duration_s=time.monotonic() - t0)

    from go_pq_cdc_kafka_spark.sources import cdc

    cdc.register(spark)
    stream = (
        spark.readStream.format(cdc.FORMAT_NAME)
        .option("path", wal_path)
        .option("startLsn", handoff_lsn)
        .option("maxEventsPerBatch", max_events_per_batch)
        .load()
    )
    cdc_pipe = CdcPipeline(source=stream, routing=routing, pk_field=pk_field)

    # foreachBatch plain-append instead of the parquet streaming sink: the
    # streaming sink's _spark_metadata transaction log makes readers ignore
    # any file it didn't write — which would hide the batch-written snapshot
    # files sharing this directory. Plain appends keep ONE directory readable
    # across both phases; delivery is at-least-once on failure replay, the
    # reference's own contract (ack-after-flush, producer_batch.go:141-151).
    def _append(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_path)

    query = (
        cdc_pipe.records()
        .writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_location)
        .start()
    )
    return InitialLoad(handoff_lsn=handoff_lsn, snapshot_records=n, query=query)


def snapshot_then_stream_over_wire(
    spark: SparkSession,
    dsn: str,
    slot: str,
    publication: str,
    table: str,
    pk_field: str,
    routing: RoutingTable,
    out_path: str,
    checkpoint_location: str,
    schema_name: str = "public",
    chunk_size: int = 8000,
    parallel: int | None = None,
) -> InitialLoad:
    """``initial`` mode end-to-end over the wire client, no files anywhere:

    1. CREATE the replication slot FIRST and record its consistent point.
       A logical slot only decodes transactions that BEGIN after it
       exists, so creating it lazily (when the stream dials) would
       silently LOSE every commit between the snapshot scan and the
       stream's first connection — the exact gap ``initial`` mode exists
       to close. Live-PG-verified failure mode: the walsender streams
       nothing but keepalives for rows inserted pre-slot. The reference
       orders it the same way (slot bootstrap before snapshot,
       README.md:44-54).
    2. :func:`~go_pq_cdc_kafka_spark.sources.snapshot.snapshot_df_over_wire`
       runs the chunked consistent scan; the bounded snapshot lands
       through the full record lineage.
    3. The ``pgwire`` stream starts from the recorded consistent point
       into the same sink path; events committed during the snapshot
       replay from the slot-retained WAL (lsn > handoff) and
       at-least-once consumers/LWW absorb the overlap.

    ``parallel=N`` upgrades step 2 to the executor-parallel scan under
    the slot's EXPORTED snapshot
    (:func:`~go_pq_cdc_kafka_spark.sources.snapshot.parallel_snapshot_over_wire`):
    N keyset ranges scan concurrently, each pinned to the slot's exact
    MVCC state, so the snapshot/stream boundary is EXACT — post-slot
    commits appear in no chunk and replay from the WAL only (no overlap
    for LWW to absorb). Requires a FRESH slot (a pre-existing slot has no
    exported snapshot: falls back to the serial scan). The slot-creating
    connection is held open and idle until the scan lands, per Postgres's
    exported-snapshot lifetime rule."""
    from go_pq_cdc_kafka_spark.sources import cdc
    from go_pq_cdc_kafka_spark.sources import snapshot as SN
    from go_pq_cdc_kafka_spark.sources import wire

    import os

    from go_pq_cdc_kafka_spark.streaming import sinks as SK

    # The snapshot is "batch -1" of the same effectively-once layout the
    # stream writes; its _COMMITTED marker records the handoff LSN so a
    # re-run NEVER captures a fresh position against an old snapshot. The
    # failure mode that rule closes: crash after the marker but before the
    # stream's first offset commit — re-running with a freshly captured LSN
    # would hand changes committed in between to NEITHER the (old) snapshot
    # NOR the (new-LSN) stream. Marker present + LSN recorded → skip the
    # wire rescan entirely and resume the stream from the recorded LSN.
    # Marker absent/empty (legacy or torn write) → redo the scan, which
    # recaptures position-then-snapshot atomically from the server.
    snap_dir = os.path.join(out_path, "batch=-1")
    snap_marker = os.path.join(snap_dir, "_COMMITTED")
    handoff_lsn: int | None = None
    if os.path.exists(snap_marker):
        with open(snap_marker, "r", encoding="utf-8") as f:
            content = f.read().strip()
        if content:
            handoff_lsn = int(content)
    if handoff_lsn is None:
        # Slot BEFORE snapshot (step 1 above): its consistent point is the
        # handoff LSN — every commit after it is retained by the slot and
        # will stream, even ones landing before the stream first dials.
        slot_conn = wire.ReplicationConnection(**wire.parse_dsn(dsn)).connect()
        try:
            row = slot_conn.create_replication_slot(slot)
            slot_lsn = (
                wire.parse_lsn(row["consistent_point"])
                if row and row.get("consistent_point")
                else None
            )
            snap_name = row.get("snapshot_name") if row else None
            if parallel and snap_name:
                # exported-snapshot parallel scan — slot_conn must stay
                # OPEN and IDLE until the scan is durable (next command
                # or close invalidates the exported snapshot), so the
                # materializing write happens inside this block
                snap_df = SN.parallel_snapshot_over_wire(
                    spark, dsn, table, pk=pk_field,
                    schema_name=schema_name, n_chunks=parallel,
                    snapshot_name=snap_name, chunk_size=chunk_size,
                )
                scan_lsn = None  # fresh slot ⇒ slot_lsn is the handoff
            else:
                # Serial scan does not use the exported snapshot, and the
                # slot is durable once the DDL returns — release the slot
                # session BEFORE dialing the scan connection. (Holding it
                # open serializes two live sessions for no benefit, and
                # deadlocks single-connection-at-a-time test servers.)
                slot_conn.close()
                snap_df, scan_lsn = SN.snapshot_df_over_wire(
                    spark, dsn, table, pk=pk_field,
                    schema_name=schema_name, chunk_size=chunk_size,
                )
            # Fresh slot: start from its consistent point (<= scan
            # position; the overlap replays from retained WAL and is
            # absorbed at-least-once — and with the parallel exported-
            # snapshot scan there is no overlap at all). Pre-existing
            # slot (row is None, 42710 swallowed): the scan position is
            # the floor instead — everything below it is already captured
            # by the snapshot, and the reader's >-filter must not
            # re-emit that history.
            #
            # MINUS ONE, because both positions are end-of-WAL markers:
            # the NEXT record begins exactly AT them, and the stream
            # reader's resume filter is strictly ``lsn > offset`` (it
            # must be — an inclusive filter would re-emit the last event
            # of every batch). Live-PG-verified: on a quiet server the
            # first post-slot commit decodes with lsn == consistent_point
            # and a non-decremented handoff silently drops it.
            handoff_lsn = (slot_lsn if slot_lsn is not None else scan_lsn) - 1
            snap_pipe = CdcPipeline(
                source=snap_df, routing=routing, pk_field=pk_field
            )
            snap_pipe.run_batch().write.mode("overwrite").parquet(snap_dir)
            with open(snap_marker, "w", encoding="utf-8") as f:
                f.write(str(handoff_lsn))
        finally:
            slot_conn.close()
    n = spark.read.parquet(snap_dir).count()

    cdc.register(spark)
    stream = (
        spark.readStream.format("pgwire")
        .option("dsn", dsn)
        .option("slot", slot)
        .option("publication", publication)
        .option("startlsn", handoff_lsn)
        .load()
    )
    cdc_pipe = CdcPipeline(source=stream, routing=routing, pk_field=pk_field)
    query = (
        cdc_pipe.records()
        .writeStream.foreachBatch(SK.foreach_batch_idempotent_parquet(out_path))
        .option("checkpointLocation", checkpoint_location)
        .start()
    )
    return InitialLoad(handoff_lsn=handoff_lsn, snapshot_records=n, query=query)
