"""Live-PostgreSQL integration tier: the SAME client/decoder/snapshot code
the scripted-socket suite (tests/test_wire.py) pins, pointed at a real
server — the reference's E2E coverage (integration_test/connector_test.go:
24-648, snapshot_test.go:24-163) re-expressed over this engine's wire
client. Gated on ``SPARK_GRAFT_LIVE_PG`` (a DSN); see
``docker-compose.live.yml``.

Every object created here is suffixed with a uuid and dropped in
``finally`` blocks, so the suite is re-runnable against a dirty server.
"""

import threading
import time
import uuid

import os

import pytest

from go_pq_cdc_kafka_spark.sources import pgoutput as PO
from go_pq_cdc_kafka_spark.sources import snapshot as SN
from go_pq_cdc_kafka_spark.sources import wire

DSN = os.environ.get("SPARK_GRAFT_LIVE_PG")
pytestmark = pytest.mark.skipif(not DSN, reason="SPARK_GRAFT_LIVE_PG not set")


def _conn():
    return wire.ReplicationConnection(**wire.parse_dsn(DSN)).connect()


def test_live_identify_system():
    """SCRAM/MD5 auth + IDENTIFY_SYSTEM against a real walsender."""
    conn = _conn()
    try:
        info = conn.identify_system()
        assert wire.parse_lsn(info["xlogpos"]) > 0
        assert info["dbname"]
    finally:
        conn.close()


def test_live_slot_create_is_idempotent_then_drops():
    slot = f"sg_live_{uuid.uuid4().hex[:8]}"
    conn = _conn()
    try:
        conn.create_replication_slot(slot)
        conn.create_replication_slot(slot)  # 42710 duplicate swallowed
    finally:
        try:
            conn.drop_replication_slot(slot)
        finally:
            conn.close()


def test_live_snapshot_over_wire_chunked_consistent_scan():
    """Keyset-paginated REPEATABLE READ scan of a real table; quoted
    identifiers round-trip and chunking covers the whole key space."""
    tbl = f"sg_snap_{uuid.uuid4().hex[:8]}"
    admin = _conn()
    try:
        admin.simple_query(
            f'CREATE TABLE "{tbl}" (id bigint PRIMARY KEY, name text)'
        )
        admin.simple_query(
            f'INSERT INTO "{tbl}" '
            f"SELECT g, 'u' || g FROM generate_series(1, 25) g"
        )
        events, lsn = SN.snapshot_events_over_wire(
            DSN, tbl, pk="id", chunk_size=10
        )
        assert len(events) == 25
        assert {e["op"] for e in events} == {"SNAPSHOT"}
        assert sorted(int(e["after"]["id"]) for e in events) == list(
            range(1, 26)
        )
        assert lsn > 0
    finally:
        try:
            admin.simple_query(f'DROP TABLE IF EXISTS "{tbl}"')
        finally:
            admin.close()


def test_live_stream_insert_roundtrip():
    """The connector_test flow: publication + slot, live INSERTs, decoded
    envelope events arrive with the commit timestamp stamped."""
    suffix = uuid.uuid4().hex[:8]
    tbl, pub, slot = f"sg_tbl_{suffix}", f"sg_pub_{suffix}", f"sg_slot_{suffix}"
    admin = _conn()
    admin.simple_query(f'CREATE TABLE "{tbl}" (id bigint PRIMARY KEY, name text)')
    admin.simple_query(f'CREATE PUBLICATION "{pub}" FOR TABLE "{tbl}"')
    events = []
    try:
        def consume():
            frames = wire.frame_source_from_dsn(DSN, slot, pub)(0)
            for ev in PO.decode_replication_stream(frames):
                events.append(ev)
                if len(events) >= 2:
                    break

        t = threading.Thread(target=consume, daemon=True)
        t.start()
        time.sleep(2)  # slot DDL + stream startup
        admin.simple_query(f"INSERT INTO \"{tbl}\" VALUES (1, 'live'), (2, 'wire')")
        t.join(timeout=30)
        assert [e["op"] for e in events] == ["INSERT", "INSERT"], events
        assert [e["after"]["name"] for e in events] == ["live", "wire"]
        assert {e["table_name"] for e in events} == {tbl}
        assert all(e["event_time"] for e in events)  # commit ts stamped
        assert events[0]["lsn"] > 0
    finally:
        try:
            admin.simple_query(f'DROP PUBLICATION IF EXISTS "{pub}"')
            admin.simple_query(f'DROP TABLE IF EXISTS "{tbl}"')
            try:
                admin.drop_replication_slot(slot)
            except wire.WireError:
                pass  # consumer thread may still hold it; slot is uuid-scoped
        finally:
            admin.close()


def test_live_initial_mode_no_gap(spark, tmp_path):
    """snapshot_then_stream_over_wire against a real server: snapshot rows
    land, a post-snapshot INSERT arrives via the stream, and a pre-recorded
    row is not duplicated — the no-gap/no-dupe handoff contract."""
    import json

    from go_pq_cdc_kafka_spark.plans.routing import RoutingTable
    from go_pq_cdc_kafka_spark.streaming import handoff as HO
    from go_pq_cdc_kafka_spark.streaming import sinks as SK

    suffix = uuid.uuid4().hex[:8]
    tbl, pub, slot = f"sg_ho_{suffix}", f"sg_hopub_{suffix}", f"sg_hoslot_{suffix}"
    admin = _conn()
    admin.simple_query(f'CREATE TABLE "{tbl}" (id bigint PRIMARY KEY, name text)')
    admin.simple_query(f'CREATE PUBLICATION "{pub}" FOR TABLE "{tbl}"')
    admin.simple_query(f"INSERT INTO \"{tbl}\" VALUES (1, 'pre')")
    load = None
    try:
        load = HO.snapshot_then_stream_over_wire(
            spark,
            DSN,
            slot,
            pub,
            table=tbl,
            pk_field="id",
            routing=RoutingTable({f"public.{tbl}": f"{tbl}.cdc"}),
            out_path=str(tmp_path / "out"),
            checkpoint_location=str(tmp_path / "ckpt"),
        )
        assert load.snapshot_records == 1
        admin.simple_query(f"INSERT INTO \"{tbl}\" VALUES (2, 'post')")
        deadline = time.monotonic() + 60
        by_name = {}
        while time.monotonic() < deadline:
            recs = SK.read_committed(spark, str(tmp_path / "out")).collect()
            by_name = {}
            for r in recs:
                p = json.loads(bytes(r.value))
                by_name.setdefault(p["name"], []).append(p["operation"])
            if "post" in by_name:
                break
            time.sleep(0.5)
        assert by_name.get("pre") == ["SNAPSHOT"]  # exactly once, via snapshot
        assert by_name.get("post") == ["INSERT"]  # exactly once, via stream
    finally:
        try:
            if load is not None:
                load.query.stop()
            admin.simple_query(f'DROP PUBLICATION IF EXISTS "{pub}"')
            admin.simple_query(f'DROP TABLE IF EXISTS "{tbl}"')
            try:
                admin.drop_replication_slot(slot)
            except wire.WireError:
                pass
        finally:
            admin.close()


def test_live_ack_parity_stop_insert_restart_exactly_once(spark, tmp_path):
    """The reference's delivery-semantics crown jewel (connector_test.go:
    416-648) over a real server: a batch is processed and acked, the
    connector STOPS, inserts land while it is down, it restarts from the
    same checkpoint — and every row arrives exactly once: no duplicates of
    the acked batch, no loss of the while-down inserts (the un-acked slot
    retained their WAL)."""
    import json

    from go_pq_cdc_kafka_spark.plans.routing import RoutingTable
    from go_pq_cdc_kafka_spark.streaming import handoff as HO
    from go_pq_cdc_kafka_spark.streaming import sinks as SK

    suffix = uuid.uuid4().hex[:8]
    tbl, pub, slot = f"sg_ack_{suffix}", f"sg_ackpub_{suffix}", f"sg_ackslot_{suffix}"
    admin = _conn()
    admin.simple_query(f'CREATE TABLE "{tbl}" (id bigint PRIMARY KEY, name text)')
    admin.simple_query(f'CREATE PUBLICATION "{pub}" FOR TABLE "{tbl}"')
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    routing = RoutingTable({f"public.{tbl}": f"{tbl}.cdc"})

    def run_until(names_expected: set, load):
        deadline = time.monotonic() + 60
        by_name: dict = {}
        while time.monotonic() < deadline:
            by_name = {}
            for r in SK.read_committed(spark, out).collect():
                p = json.loads(bytes(r.value))
                by_name.setdefault(p["name"], []).append(p["operation"])
            if names_expected <= set(by_name):
                break
            time.sleep(0.5)
        return by_name

    load = None
    try:
        # phase 1: empty-table initial load, then two live inserts, acked
        load = HO.snapshot_then_stream_over_wire(
            spark, DSN, slot, pub, table=tbl, pk_field="id",
            routing=routing, out_path=out, checkpoint_location=ckpt,
        )
        admin.simple_query(f"INSERT INTO \"{tbl}\" VALUES (1, 'a1'), (2, 'a2')")
        by_name = run_until({"a1", "a2"}, load)
        assert by_name.get("a1") == ["INSERT"], by_name
        assert by_name.get("a2") == ["INSERT"], by_name
        load.query.stop()
        load = None

        # phase 2: inserts while the connector is DOWN
        admin.simple_query(f"INSERT INTO \"{tbl}\" VALUES (3, 'b1'), (4, 'b2')")

        # phase 3: restart from the same checkpoint + marker
        load = HO.snapshot_then_stream_over_wire(
            spark, DSN, slot, pub, table=tbl, pk_field="id",
            routing=routing, out_path=out, checkpoint_location=ckpt,
        )
        by_name = run_until({"b1", "b2"}, load)
        # exactly once each — acked batch not duplicated, downtime not lost
        assert {
            n: ops for n, ops in by_name.items()
        } == {
            "a1": ["INSERT"], "a2": ["INSERT"],
            "b1": ["INSERT"], "b2": ["INSERT"],
        }, by_name
    finally:
        try:
            if load is not None:
                load.query.stop()
            admin.simple_query(f'DROP PUBLICATION IF EXISTS "{pub}"')
            admin.simple_query(f'DROP TABLE IF EXISTS "{tbl}"')
            try:
                admin.drop_replication_slot(slot)
            except wire.WireError:
                pass
        finally:
            admin.close()


def test_live_unchanged_toast_resolution():
    """Real TOAST: a >8KB text value is toasted by the server; an UPDATE
    that doesn't touch it sends the 'u' unchanged-TOAST marker. Under
    REPLICA IDENTITY DEFAULT there is no old image, so the decoder must
    surface None; under REPLICA IDENTITY FULL the old image carries the
    value and the decoder must materialize it (pgoutput.py:_resolve_toast
    — scripted in tests/test_pgoutput.py, proven here against a real
    walsender)."""
    suffix = uuid.uuid4().hex[:8]
    tbl, pub, slot = f"sg_to_{suffix}", f"sg_topub_{suffix}", f"sg_toslot_{suffix}"
    big = "x" * 100_000
    admin = _conn()
    admin.simple_query(
        f'CREATE TABLE "{tbl}" (id bigint PRIMARY KEY, big text, small text)'
    )
    # EXTERNAL = out-of-line, uncompressed: repetitive test data would
    # otherwise compress to an INLINE value and never TOAST at all
    admin.simple_query(
        f'ALTER TABLE "{tbl}" ALTER COLUMN big SET STORAGE EXTERNAL'
    )
    admin.simple_query(f'CREATE PUBLICATION "{pub}" FOR TABLE "{tbl}"')
    admin.simple_query(
        f"INSERT INTO \"{tbl}\" VALUES (1, '{big}', 'a')"
    )
    try:
        c2 = _conn()
        row = c2.create_replication_slot(slot)
        c2.close()
        start = wire.parse_lsn(row["consistent_point"]) - 1

        admin.simple_query(f"UPDATE \"{tbl}\" SET small = 'b' WHERE id = 1")
        admin.simple_query(f'ALTER TABLE "{tbl}" REPLICA IDENTITY FULL')
        admin.simple_query(f"UPDATE \"{tbl}\" SET small = 'c' WHERE id = 1")

        events = []
        frames = wire.frame_source_from_dsn(DSN, slot, pub)(start)
        for ev in PO.decode_replication_stream(frames):
            events.append(ev)
            if len(events) >= 2:
                break
        assert [e["op"] for e in events] == ["UPDATE", "UPDATE"]
        first, second = events
        # default replica identity: unchanged TOAST is genuinely absent
        assert first["after"]["small"] == "b"
        assert first["after"]["big"] is None
        assert first["before"] is None
        # identity FULL: the old image carries the 100KB value; the
        # decoder materializes it into the new image
        assert second["after"]["small"] == "c"
        assert second["after"]["big"] == big
        assert second["before"]["big"] == big
        assert second["before"]["small"] == "b"
    finally:
        try:
            admin.simple_query(f'DROP PUBLICATION IF EXISTS "{pub}"')
            admin.simple_query(f'DROP TABLE IF EXISTS "{tbl}"')
            try:
                admin.drop_replication_slot(slot)
            except wire.WireError:
                pass
        finally:
            admin.close()


def test_live_protocol_v2_streamed_transaction():
    """Protocol v2 in-progress streaming against a real server: with
    logical_decoding_work_mem floored at 64kB, a 5000-row single
    transaction exceeds the decoder workspace and the walsender STREAMS it
    (S/E segments, per-message xid, stream commit) — the v1 scripted
    suite can only simulate those frames; this proves the buffering
    decoder (pgoutput.py per-xid buffers) against the real thing. All
    rows must surface exactly once, stamped with the commit timestamp and
    the commit LSN (mid-stream offsets are not safe resume points)."""
    n_rows = 5000
    suffix = uuid.uuid4().hex[:8]
    tbl, pub, slot = f"sg_v2_{suffix}", f"sg_v2pub_{suffix}", f"sg_v2slot_{suffix}"
    admin = _conn()
    admin.simple_query("ALTER SYSTEM SET logical_decoding_work_mem = '64kB'")
    admin.simple_query("SELECT pg_reload_conf()")
    admin.simple_query(
        f'CREATE TABLE "{tbl}" (id bigint PRIMARY KEY, name text)'
    )
    admin.simple_query(f'CREATE PUBLICATION "{pub}" FOR TABLE "{tbl}"')
    try:
        c2 = _conn()
        row = c2.create_replication_slot(slot)
        c2.close()
        start = wire.parse_lsn(row["consistent_point"]) - 1

        admin.simple_query(
            f"INSERT INTO \"{tbl}\" "
            f"SELECT g, 'user' || g FROM generate_series(1, {n_rows}) g"
        )

        events = []
        frames = wire.frame_source_from_dsn(
            DSN, slot, pub, proto_version=2, streaming=True
        )(start)
        for ev in PO.decode_replication_stream(frames):
            if ev["op"] == "INSERT":
                events.append(ev)
                if len(events) >= n_rows:
                    break
        assert len(events) == n_rows
        assert sorted(int(e["after"]["id"]) for e in events) == list(
            range(1, n_rows + 1)
        )
        assert all(e["event_time"] for e in events)
        # streamed transactions release at Stream Commit with ONE lsn
        lsns = {e["lsn"] for e in events}
        assert len(lsns) == 1 and lsns.pop() > start
    finally:
        try:
            admin.simple_query(
                "ALTER SYSTEM RESET logical_decoding_work_mem"
            )
            admin.simple_query("SELECT pg_reload_conf()")
            admin.simple_query(f'DROP PUBLICATION IF EXISTS "{pub}"')
            admin.simple_query(f'DROP TABLE IF EXISTS "{tbl}"')
            try:
                admin.drop_replication_slot(slot)
            except wire.WireError:
                pass
        finally:
            admin.close()


def test_live_walsender_termination_is_transient(spark, tmp_path):
    """pg_terminate_backend on the walsender (a rolling restart / failover
    in production) arrives as a FATAL 57P01 ErrorResponse, not a socket
    drop. The pgwire reader must class it TRANSIENT: reconnect, resume
    from the batch-start LSN, lose nothing, duplicate nothing — the live
    twin of the scripted DropOnceWalsender test (B5 retryable class)."""
    from go_pq_cdc_kafka_spark.sources import cdc

    suffix = uuid.uuid4().hex[:8]
    tbl, pub, slot = f"sg_tm_{suffix}", f"sg_tmpub_{suffix}", f"sg_tmslot_{suffix}"
    admin = _conn()
    admin.simple_query(f'CREATE TABLE "{tbl}" (id bigint PRIMARY KEY, name text)')
    admin.simple_query(f'CREATE PUBLICATION "{pub}" FOR TABLE "{tbl}"')
    cdc.register(spark)
    q = None
    try:
        c2 = _conn()
        row = c2.create_replication_slot(slot)
        c2.close()
        start = wire.parse_lsn(row["consistent_point"]) - 1

        stream = (
            spark.readStream.format("pgwire")
            .option("dsn", DSN)
            .option("slot", slot)
            .option("publication", pub)
            .option("startlsn", str(start))
            .option("pollms", "300")
            .load()
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("live_term_sink")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )

        def sunk_ids():
            return sorted(
                int(r.after["id"])
                for r in spark.sql(
                    "select after from live_term_sink where op = 'INSERT'"
                ).collect()
            )

        def wait_for(ids, secs=60):
            deadline = time.monotonic() + secs
            while time.monotonic() < deadline:
                if sunk_ids() == ids:
                    return True
                time.sleep(0.5)
            return False

        admin.simple_query(f"INSERT INTO \"{tbl}\" VALUES (1, 'a'), (2, 'b')")
        assert wait_for([1, 2]), sunk_ids()

        # kill the walsender holding the slot — FATAL 57P01 to the client
        pids = admin.simple_query(
            f"SELECT active_pid FROM pg_replication_slots "
            f"WHERE slot_name = '{slot}' AND active"
        )
        assert pids and pids[0]["active_pid"]
        admin.simple_query(
            f"SELECT pg_terminate_backend({pids[0]['active_pid']})"
        )

        admin.simple_query(f"INSERT INTO \"{tbl}\" VALUES (3, 'c'), (4, 'd')")
        assert wait_for([1, 2, 3, 4]), sunk_ids()
        assert q.isActive  # the termination was absorbed, not surfaced
    finally:
        try:
            if q is not None:
                q.stop()
            admin.simple_query(f'DROP PUBLICATION IF EXISTS "{pub}"')
            admin.simple_query(f'DROP TABLE IF EXISTS "{tbl}"')
            try:
                admin.drop_replication_slot(slot)
            except wire.WireError:
                pass
        finally:
            admin.close()


def test_live_raw_executor_decode_matches_pgwire(spark, tmp_path):
    """The executor-decode scale tier (pgwire-raw + decode_raw_frames)
    must produce the SAME envelope as the driver-decoding pgwire source
    for an identical live workload: same ops, lsns, and images."""
    from go_pq_cdc_kafka_spark.sources import cdc, raw as RAW

    suffix = uuid.uuid4().hex[:8]
    tbl, pub = f"sg_rp_{suffix}", f"sg_rppub_{suffix}"
    slots = {"serial": f"sg_rps_{suffix}", "raw": f"sg_rpr_{suffix}"}
    admin = _conn()
    admin.simple_query(f'CREATE TABLE "{tbl}" (id bigint PRIMARY KEY, name text)')
    admin.simple_query(f'CREATE PUBLICATION "{pub}" FOR TABLE "{tbl}"')
    cdc.register(spark)
    RAW.register(spark)
    queries = []
    try:
        starts = {}
        for k, s in slots.items():
            c = _conn()
            row = c.create_replication_slot(s)
            c.close()
            starts[k] = wire.parse_lsn(row["consistent_point"]) - 1

        serial = (
            spark.readStream.format("pgwire")
            .option("dsn", DSN).option("slot", slots["serial"])
            .option("publication", pub)
            .option("startlsn", str(starts["serial"]))
            .option("pollms", "300").load()
        )
        raw_frames = (
            spark.readStream.format("pgwire-raw")
            .option("dsn", DSN).option("slot", slots["raw"])
            .option("publication", pub)
            .option("startlsn", str(starts["raw"]))
            .option("groups", "4").option("pollms", "300").load()
        )
        for name, df in (
            ("par_serial", serial),
            ("par_raw", RAW.decode_raw_frames(raw_frames, groups=4)),
        ):
            queries.append(
                df.writeStream.format("memory").queryName(name)
                .option("checkpointLocation", str(tmp_path / name))
                .start()
            )

        admin.simple_query(
            f"INSERT INTO \"{tbl}\" SELECT g, 'u' || g FROM generate_series(1, 50) g"
        )
        admin.simple_query(f"UPDATE \"{tbl}\" SET name = 'upd' WHERE id <= 5")
        admin.simple_query(f'DELETE FROM "{tbl}" WHERE id > 45')

        def rows_of(sink):
            return [
                (r.op, r.lsn, r.table_name,
                 tuple(sorted(dict(r.after).items())) if r.after else None,
                 tuple(sorted(dict(r.before).items())) if r.before else None)
                for r in spark.sql(
                    f"select op, lsn, table_name, before, after from {sink} "
                    "order by lsn"
                ).collect()
            ]

        deadline = time.monotonic() + 90
        a = b = None
        while time.monotonic() < deadline:
            a, b = rows_of("par_serial"), rows_of("par_raw")
            if len(a) == 60 and a == b:
                break
            time.sleep(0.5)
        assert len(a) == 60, (len(a), len(b))
        assert a == b
    finally:
        try:
            for q in queries:
                q.stop()
            admin.simple_query(f'DROP PUBLICATION IF EXISTS "{pub}"')
            admin.simple_query(f'DROP TABLE IF EXISTS "{tbl}"')
            for s in slots.values():
                try:
                    admin.drop_replication_slot(s)
                except wire.WireError:
                    pass
        finally:
            admin.close()


def test_live_raw_tier_absorbs_walsender_termination(spark, tmp_path):
    """Same 57P01 resilience contract as the serial tier, for the
    executor-decode path: terminate the walsender mid-stream, stream
    resumes from the commit-aligned offset with no loss/duplication."""
    from go_pq_cdc_kafka_spark.sources import raw as RAW

    suffix = uuid.uuid4().hex[:8]
    tbl, pub, slot = f"sg_rt_{suffix}", f"sg_rtpub_{suffix}", f"sg_rtslot_{suffix}"
    admin = _conn()
    admin.simple_query(f'CREATE TABLE "{tbl}" (id bigint PRIMARY KEY, name text)')
    admin.simple_query(f'CREATE PUBLICATION "{pub}" FOR TABLE "{tbl}"')
    RAW.register(spark)
    q = None
    try:
        c2 = _conn()
        row = c2.create_replication_slot(slot)
        c2.close()
        start = wire.parse_lsn(row["consistent_point"]) - 1
        frames = (
            spark.readStream.format("pgwire-raw")
            .option("dsn", DSN).option("slot", slot)
            .option("publication", pub)
            .option("startlsn", str(start))
            .option("groups", "2").option("pollms", "300").load()
        )
        q = (
            RAW.decode_raw_frames(frames, groups=2)
            .writeStream.format("memory").queryName("live_rawterm_sink")
            .option("checkpointLocation", str(tmp_path / "ckpt")).start()
        )

        def sunk_ids():
            return sorted(
                int(r.after["id"])
                for r in spark.sql(
                    "select after from live_rawterm_sink where op = 'INSERT'"
                ).collect()
            )

        def wait_for(ids, secs=60):
            deadline = time.monotonic() + secs
            while time.monotonic() < deadline:
                if sunk_ids() == ids:
                    return True
                time.sleep(0.5)
            return False

        admin.simple_query(f"INSERT INTO \"{tbl}\" VALUES (1, 'a'), (2, 'b')")
        assert wait_for([1, 2]), sunk_ids()
        pids = admin.simple_query(
            f"SELECT active_pid FROM pg_replication_slots "
            f"WHERE slot_name = '{slot}' AND active"
        )
        assert pids and pids[0]["active_pid"]
        admin.simple_query(
            f"SELECT pg_terminate_backend({pids[0]['active_pid']})"
        )
        admin.simple_query(f"INSERT INTO \"{tbl}\" VALUES (3, 'c'), (4, 'd')")
        assert wait_for([1, 2, 3, 4]), sunk_ids()
        assert q.isActive
    finally:
        try:
            if q is not None:
                q.stop()
            admin.simple_query(f'DROP PUBLICATION IF EXISTS "{pub}"')
            admin.simple_query(f'DROP TABLE IF EXISTS "{tbl}"')
            try:
                admin.drop_replication_slot(slot)
            except wire.WireError:
                pass
        finally:
            admin.close()


def test_live_pg_upsert_sink_materializes_cdc_roundtrip(spark, tmp_path):
    """The full serving loop against a REAL server: change events →
    pipeline-shaped DataFrame → streaming pg_sink upserts/deletes →
    SELECT back equals the LWW-expected state; replaying the same batch
    is idempotent (the effectively-once argument)."""
    import pyspark.sql.functions as F

    from go_pq_cdc_kafka_spark.streaming import pg_sink as PS

    suffix = uuid.uuid4().hex[:8]
    tbl = f"sg_mat_{suffix}"
    admin = _conn()
    admin.simple_query(
        f'CREATE TABLE "{tbl}" (id bigint PRIMARY KEY, name text, cents bigint)'
    )
    try:
        # batch 1: inserts + one update collapsed upstream (one row/key)
        b1 = spark.createDataFrame(
            [
                (1, "alice", 100, "INSERT"),
                (2, "bob's", 250, "UPDATE"),   # quote in payload
                (3, "carol", None, "SNAPSHOT"),
            ],
            "id long, name string, cents long, op string",
        ).repartition(2)
        sink = PS.foreach_batch_pg_upsert(
            DSN, tbl, key_cols=["id"], op_col="op"
        )
        sink(b1, 0)
        got = {
            (int(r["id"]), r["name"], None if r["cents"] is None else int(r["cents"]))
            for r in admin.simple_query(f'SELECT * FROM "{tbl}"')
        }
        assert got == {(1, "alice", 100), (2, "bob's", 250), (3, "carol", None)}

        # replay the SAME batch: idempotent
        sink(b1, 0)
        n = admin.simple_query(f'SELECT COUNT(*) AS n FROM "{tbl}"')[0]["n"]
        assert int(n) == 3

        # batch 2: update one key, delete another
        b2 = spark.createDataFrame(
            [(1, "alice2", 111, "UPDATE"), (3, None, None, "DELETE")],
            "id long, name string, cents long, op string",
        )
        sink(b2, 1)
        got = {
            (int(r["id"]), r["name"]) for r in admin.simple_query(
                f'SELECT id, name FROM "{tbl}" ORDER BY id'
            )
        }
        assert got == {(1, "alice2"), (2, "bob's")}
    finally:
        admin.simple_query(f'DROP TABLE IF EXISTS "{tbl}"')
        admin.close()


def test_live_pg_upsert_sink_streaming_end_to_end(spark, tmp_path):
    """availableNow streaming query: file-replay changelog → per-batch LWW
    collapse (the real pipeline's materialize step) → pg_sink; the serving
    table converges to the changelog's final state."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from go_pq_cdc_kafka_spark.sources import changelog as cl
    from go_pq_cdc_kafka_spark.streaming import pg_sink as PS

    suffix = uuid.uuid4().hex[:8]
    tbl = f"sg_serve_{suffix}"
    admin = _conn()
    admin.simple_query(
        f'CREATE TABLE "{tbl}" (id bigint PRIMARY KEY, name text)'
    )
    try:
        users = spark.range(1, 8).select(
            F.col("id").cast("int").alias("id"),
            F.concat(F.lit("user"), F.col("id")).alias("name"),
        )
        log_dir = str(tmp_path / "log")
        # snapshot(1..7) + re-keyed inserts(1000001..1000007) + delete(7)
        cl.write_changelog(
            cl.generate_table_changelog(users, "id", "users"), log_dir, 2
        )
        flat = cl.read_changelog_stream(spark, log_dir).select(
            F.coalesce(F.col("after")["id"], F.col("before")["id"])
            .cast("long")
            .alias("id"),
            F.col("after")["name"].alias("name"),
            F.col("op"),
            F.col("lsn"),
        )
        inner = PS.foreach_batch_pg_upsert(DSN, tbl, ["id"], op_col="op")

        def fb(bdf, bid):
            # LWW collapse per micro-batch: one statement per key — the
            # contract the sink documents (PG errors loudly otherwise)
            w = Window.partitionBy("id").orderBy(F.desc("lsn"))
            inner(
                bdf.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .drop("rn", "lsn"),
                bid,
            )

        q = (
            flat.writeStream.foreachBatch(fb)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        assert q.awaitTermination(180)
        rows = admin.simple_query(f'SELECT id, name FROM "{tbl}" ORDER BY id')
        got = {(int(r["id"]), r["name"]) for r in rows}
        expected = {(i, f"user{i}") for i in range(1, 7)} | {
            (1_000_000 + i, f"user{i}") for i in range(1, 8)
        }
        assert got == expected
    finally:
        admin.simple_query(f'DROP TABLE IF EXISTS "{tbl}"')
        admin.close()


def test_live_pg_upsert_sink_copy_bulk_path(spark):
    """use_copy=True: COPY-into-temp-stage + one set-based merge over the
    wire client's copy_in — COPY-escaped special characters, bytea, nulls,
    update-merge, and replay idempotence against a real server."""
    from go_pq_cdc_kafka_spark.streaming import pg_sink as PS

    suffix = uuid.uuid4().hex[:8]
    tbl = f"sg_copy_{suffix}"
    admin = _conn()
    try:
        b1 = spark.createDataFrame(
            [
                (1, "tab\there", bytearray(b"\x00\x01")),
                (2, "line\nbreak \\ slash", None),
                (3, None, bytearray(b"\xff")),
            ],
            "id long, name string, blob binary",
        ).repartition(2)
        # serving-table bootstrap from the DataFrame schema (idempotent)
        PS.ensure_table(DSN, tbl, b1.schema, ["id"])
        PS.ensure_table(DSN, tbl, b1.schema, ["id"])
        sink = PS.foreach_batch_pg_upsert(DSN, tbl, ["id"], use_copy=True)
        sink(b1, 0)

        def fetch():
            return {
                (int(r["id"]), r["name"], r["blob"])
                for r in admin.simple_query(
                    f'SELECT id, name, encode(blob, \'hex\') AS blob '
                    f'FROM "{tbl}"'
                )
            }

        expected = {
            (1, "tab\there", "0001"),
            (2, "line\nbreak \\ slash", None),
            (3, None, "ff"),
        }
        assert fetch() == expected
        sink(b1, 0)  # replay: merge converges, no duplicates
        assert fetch() == expected

        # merge-update an existing key through the COPY path
        b2 = spark.createDataFrame(
            [(2, "fixed", bytearray(b"\xaa"))], "id long, name string, blob binary"
        )
        sink(b2, 1)
        assert (2, "fixed", "aa") in fetch() and len(fetch()) == 3
    finally:
        admin.simple_query(f'DROP TABLE IF EXISTS "{tbl}"')
        admin.close()


def test_live_parallel_snapshot_exported_snapshot_consistency(spark):
    """Executor-parallel snapshot under the slot's EXPORTED snapshot: rows
    inserted AFTER slot creation are invisible to every chunk (cross-chunk
    MVCC consistency) and arrive via the replication stream instead —
    scan ∪ stream has no gap and no dup regardless of scan parallelism."""
    from go_pq_cdc_kafka_spark.sources import pgoutput as PO2
    from go_pq_cdc_kafka_spark.sources import snapshot as SN2

    suffix = uuid.uuid4().hex[:8]
    tbl, pub, slot = f"sg_psnap_{suffix}", f"sg_psnp_{suffix}", f"sg_psns_{suffix}"
    admin = _conn()
    admin.simple_query(
        f'CREATE TABLE "{tbl}" (id bigint PRIMARY KEY, name text)'
    )
    admin.simple_query(f'CREATE PUBLICATION "{pub}" FOR TABLE "{tbl}"')
    slot_conn = None
    try:
        admin.simple_query(
            f'INSERT INTO "{tbl}" SELECT g, \'pre\' || g '
            f"FROM generate_series(1, 5000) g"
        )
        # slot creation EXPORTS a snapshot; the connection must stay idle
        slot_conn = _conn()
        row = slot_conn.create_replication_slot(slot)
        snap_name, cpoint = row["snapshot_name"], row["consistent_point"]
        assert snap_name

        # rows AFTER the slot: must be invisible to the parallel scan
        admin.simple_query(
            f'INSERT INTO "{tbl}" SELECT g, \'post\' || g '
            f"FROM generate_series(5001, 5400) g"
        )

        df = SN2.parallel_snapshot_over_wire(
            spark, DSN, tbl, pk="id", n_chunks=4, snapshot_name=snap_name
        )
        ids = [
            int(r.after["id"])
            for r in df.select("after").collect()
        ]
        assert len(ids) == 5000 and max(ids) == 5000 and len(set(ids)) == 5000

        # the post-slot rows replay from the WAL starting at the
        # consistent point: no gap, no dup with the scan
        slot_conn.close()  # snapshot no longer needed; free the slot
        slot_conn = None
        start = wire.parse_lsn(cpoint) - 1
        frames = wire.frame_source_from_dsn(DSN, slot, pub, create_slot=False)(start)
        streamed = []
        try:
            for ev in PO2.decode_replication_stream(frames):
                if ev["op"] == "INSERT":
                    streamed.append(int(ev["after"]["id"]))
                    if len(streamed) >= 400:
                        break
        finally:
            frames.close()
        assert sorted(streamed) == list(range(5001, 5401))
    finally:
        if slot_conn is not None:
            slot_conn.close()
        admin.simple_query(f'DROP PUBLICATION IF EXISTS "{pub}"')
        admin.simple_query(f'DROP TABLE IF EXISTS "{tbl}"')
        try:
            admin.drop_replication_slot(slot)
        except wire.WireError:
            pass
        admin.close()


def test_live_initial_mode_parallel_exported_snapshot_no_gap(spark, tmp_path):
    """initial mode with parallel=4: the executor-parallel scan runs under
    the slot's exported snapshot (slot connection held open+idle), 5000
    snapshot rows land via 4 concurrent range scans, a post-snapshot
    INSERT arrives exactly once via the stream, and nothing duplicates."""
    import json

    from go_pq_cdc_kafka_spark.plans.routing import RoutingTable
    from go_pq_cdc_kafka_spark.streaming import handoff as HO
    from go_pq_cdc_kafka_spark.streaming import sinks as SK

    suffix = uuid.uuid4().hex[:8]
    tbl, pub, slot = f"sg_pho_{suffix}", f"sg_phop_{suffix}", f"sg_phos_{suffix}"
    admin = _conn()
    admin.simple_query(f'CREATE TABLE "{tbl}" (id bigint PRIMARY KEY, name text)')
    admin.simple_query(f'CREATE PUBLICATION "{pub}" FOR TABLE "{tbl}"')
    admin.simple_query(
        f'INSERT INTO "{tbl}" SELECT g, \'pre\' || g '
        f"FROM generate_series(1, 5000) g"
    )
    load = None
    try:
        load = HO.snapshot_then_stream_over_wire(
            spark,
            DSN,
            slot,
            pub,
            table=tbl,
            pk_field="id",
            routing=RoutingTable({f"public.{tbl}": f"{tbl}.cdc"}),
            out_path=str(tmp_path / "out"),
            checkpoint_location=str(tmp_path / "ckpt"),
            parallel=4,
        )
        assert load.snapshot_records == 5000
        admin.simple_query(f"INSERT INTO \"{tbl}\" VALUES (9001, 'post')")
        deadline = time.monotonic() + 60
        ops_by_name: dict[str, list] = {}
        while time.monotonic() < deadline:
            recs = SK.read_committed(spark, str(tmp_path / "out")).collect()
            ops_by_name = {}
            for r in recs:
                p = json.loads(bytes(r.value))
                ops_by_name.setdefault(p["name"], []).append(p["operation"])
            if "post" in ops_by_name:
                break
            time.sleep(0.5)
        assert ops_by_name.get("post") == ["INSERT"]
        # every snapshot row exactly once, all via the parallel scan
        snap_ops = [
            ops
            for name, ops in ops_by_name.items()
            if name.startswith("pre")
        ]
        assert len(snap_ops) == 5000
        assert all(ops == ["SNAPSHOT"] for ops in snap_ops)
    finally:
        try:
            if load is not None:
                load.query.stop()
            admin.simple_query(f'DROP PUBLICATION IF EXISTS "{pub}"')
            admin.simple_query(f'DROP TABLE IF EXISTS "{tbl}"')
            try:
                admin.drop_replication_slot(slot)
            except wire.WireError:
                pass
        finally:
            admin.close()


def test_live_pg_to_kafka_wire_full_loop(spark, tmp_path):
    """The COMPLETE reference loop executing with real wire protocols on
    both ends: real PostgreSQL logical replication (pgwire source) →
    envelope → routing → records → from-scratch Kafka producer
    (streaming/kafka_wire.py) → broker-validated record batches (CRC32C)
    → Fetch read-back. The sandbox twin of the reference's
    Postgres+Redpanda integration stack (integration_test/
    connector_test.go:24-101)."""
    import json

    from go_pq_cdc_kafka_spark.plans.routing import RoutingTable
    from go_pq_cdc_kafka_spark.sources import cdc
    from go_pq_cdc_kafka_spark.streaming.kafka import KafkaProducerConfig
    from go_pq_cdc_kafka_spark.streaming.kafka_wire import (
        KafkaWireConsumer,
        wire_balancer,
    )
    from go_pq_cdc_kafka_spark.streaming.minibroker import MiniBroker
    from go_pq_cdc_kafka_spark.streaming.pipeline import CdcPipeline

    suffix = uuid.uuid4().hex[:8]
    tbl, pub, slot = f"sg_kw_{suffix}", f"sg_kwpub_{suffix}", f"sg_kwslot_{suffix}"
    topic = f"{tbl}.cdc"
    admin = _conn()
    admin.simple_query(
        f'CREATE TABLE "{tbl}" (id bigint PRIMARY KEY, name text)'
    )
    admin.simple_query(f'CREATE PUBLICATION "{pub}" FOR TABLE "{tbl}"')
    cdc.register(spark)
    q = None
    broker = MiniBroker(num_partitions=3).start()
    try:
        c2 = _conn()
        row = c2.create_replication_slot(slot)
        c2.close()
        start = wire.parse_lsn(row["consistent_point"]) - 1

        stream = (
            spark.readStream.format("pgwire")
            .option("dsn", DSN)
            .option("slot", slot)
            .option("publication", pub)
            .option("startlsn", str(start))
            .option("pollms", "300")
            .load()
        )
        pipe = CdcPipeline(
            source=stream,
            routing=RoutingTable({f"public.{tbl}": topic}),
            pk_field="id",
        )
        cfg = KafkaProducerConfig(brokers=[broker.bootstrap])
        q = pipe.to_kafka_wire(
            cfg,
            str(tmp_path / "ckpt_kw"),
            trigger={"processingTime": "1 seconds"},
        )

        admin.simple_query(
            f"INSERT INTO \"{tbl}\" VALUES (1, 'alpha'), (2, 'beta')"
        )
        admin.simple_query(f"UPDATE \"{tbl}\" SET name = 'alpha2' WHERE id = 1")
        admin.simple_query(f'DELETE FROM "{tbl}" WHERE id = 2')

        deadline = time.monotonic() + 60
        records = []
        while time.monotonic() < deadline:
            records = broker.topic_records(topic)
            if len(records) >= 4:
                break
            time.sleep(0.5)
        assert len(records) == 4, [r.value for r in records]

        payloads = [json.loads(r.value) for r in records]
        by_op = {p["operation"]: p for p in payloads}
        assert set(by_op) == {"INSERT", "UPDATE", "DELETE"}
        assert by_op["UPDATE"]["name"] == "alpha2"
        # pre-image rendered for DELETE (pgoutput carries values as text)
        assert by_op["DELETE"]["id"] == "2"
        for r in records:
            hdr = dict(r.headers)
            assert hdr["table"].decode() == tbl
            assert hdr["source"] == b"cdc"

        # key→partition placement is kafka-go's FNV-1a Hash (the config
        # default maps to the reference balancer by name), verified
        # through real Fetch frames rather than broker internals
        hash_bal = wire_balancer("Hash")
        with KafkaWireConsumer(broker.bootstrap) as cons:
            for pid_expected, key in [
                (hash_bal.partition(b"1", None, [0, 1, 2]), b"1"),
                (hash_bal.partition(b"2", None, [0, 1, 2]), b"2"),
            ]:
                recs, _ = cons.fetch(topic, pid_expected, offset=0)
                assert any(r.key == key for r in recs)
    finally:
        try:
            if q is not None:
                q.stop()
            broker.stop()
            admin.simple_query(f'DROP PUBLICATION IF EXISTS "{pub}"')
            admin.simple_query(f'DROP TABLE IF EXISTS "{tbl}"')
            try:
                admin.drop_replication_slot(slot)
            except wire.WireError:
                pass
        finally:
            admin.close()


def test_live_pg_append_eos_ledger_exactly_once(spark):
    """Keyless append sink against a REAL server: a replayed micro-batch
    (same batch_id) inserts nothing the second time because every task's
    ledger claim commits atomically with its rows; distinct batch_ids
    append; a mid-transaction failure leaves neither claim nor rows."""
    from go_pq_cdc_kafka_spark.streaming import pg_sink as PS

    suffix = uuid.uuid4().hex[:8]
    tbl = f"sg_app_{suffix}"
    ledger = f"sg_led_{suffix}"
    admin = _conn()
    admin.simple_query(f'CREATE TABLE "{tbl}" (v bigint NOT NULL, note text)')
    try:
        sink = PS.foreach_batch_pg_append_eos(
            DSN, tbl, ledger_table=ledger
        )
        b0 = spark.createDataFrame(
            [(i, f"n{i}") for i in range(20)], "v long, note string"
        ).repartition(3)
        sink(b0, 0)
        count = lambda: int(  # noqa: E731
            admin.simple_query(f'SELECT COUNT(*) AS n FROM "{tbl}"')[0]["n"]
        )
        assert count() == 20
        sink(b0, 0)  # full-batch replay: every claim conflicts
        assert count() == 20
        sink(b0, 1)  # a NEW batch id is new work
        assert count() == 40
        claims = admin.simple_query(
            f'SELECT batch_id, part_id FROM "{ledger}" ORDER BY 1, 2'
        )
        assert {(int(r["batch_id"])) for r in claims} == {0, 1}

        # copy path: same ledger, next batch
        sink_copy = PS.foreach_batch_pg_append_eos(
            DSN, tbl, ledger_table=ledger, use_copy=True
        )
        sink_copy(b0, 2)
        assert count() == 60
        sink_copy(b0, 2)
        assert count() == 60

        # mid-transaction failure: a NOT NULL violation fails the data
        # INSERT after the claim succeeded — the server rolls back claim
        # AND rows together, so a corrected retry of the batch applies
        bad = spark.createDataFrame(
            [(1, "ok"), (None, "boom")], "v long, note string"
        ).coalesce(1)
        with pytest.raises(Exception):
            sink(bad, 3)
        assert count() == 60  # nothing leaked
        rows = admin.simple_query(
            f'SELECT COUNT(*) AS n FROM "{ledger}" WHERE batch_id = 3'
        )
        assert int(rows[0]["n"]) == 0  # claim rolled back with the data
        fixed = spark.createDataFrame(
            [(1, "ok"), (2, "fixed")], "v long, note string"
        ).coalesce(1)
        sink(fixed, 3)  # corrected retry applies cleanly
        assert count() == 62
    finally:
        admin.simple_query(f'DROP TABLE IF EXISTS "{tbl}"')
        admin.simple_query(f'DROP TABLE IF EXISTS "{ledger}"')
        admin.close()

def test_live_schema_evolution_mid_stream():
    """DDL between commits: ALTER TABLE ADD COLUMN / DROP COLUMN / RENAME
    while the slot retains the pre-DDL changes. Postgres re-sends the
    Relation message before the first post-DDL row, and the decoder's
    relid registry (pgoutput.py PgOutputDecoder.decode, scripted twin
    tests/test_pgoutput.py:233,256) must re-key the column layout so each
    event decodes against the schema THAT ROW was logged under — the
    reference inherits this from go-pq-cdc's relation cache. Proven here
    against a real walsender: one stream read yields four INSERTs spanning
    three table shapes and two table names."""
    suffix = uuid.uuid4().hex[:8]
    tbl, pub, slot = f"sg_ev_{suffix}", f"sg_evpub_{suffix}", f"sg_evslot_{suffix}"
    tbl2 = f"{tbl}_renamed"
    admin = _conn()
    admin.simple_query(f'CREATE TABLE "{tbl}" (id bigint PRIMARY KEY, name text)')
    admin.simple_query(f'CREATE PUBLICATION "{pub}" FOR TABLE "{tbl}"')
    try:
        c2 = _conn()
        row = c2.create_replication_slot(slot)
        c2.close()
        start = wire.parse_lsn(row["consistent_point"]) - 1

        admin.simple_query(f"INSERT INTO \"{tbl}\" VALUES (1, 'before')")
        admin.simple_query(f'ALTER TABLE "{tbl}" ADD COLUMN email text')
        admin.simple_query(
            f"INSERT INTO \"{tbl}\" VALUES (2, 'widened', 'w@x')"
        )
        admin.simple_query(f'ALTER TABLE "{tbl}" DROP COLUMN name')
        admin.simple_query(f"INSERT INTO \"{tbl}\" VALUES (3, 'n@x')")
        # rename follows the relation oid: the publication still covers it
        admin.simple_query(f'ALTER TABLE "{tbl}" RENAME TO "{tbl2}"')
        admin.simple_query(f"INSERT INTO \"{tbl2}\" VALUES (4, 'r@x')")

        events = []
        frames = wire.frame_source_from_dsn(DSN, slot, pub)(start)
        for ev in PO.decode_replication_stream(frames):
            events.append(ev)
            if len(events) >= 4:
                break
        assert [e["op"] for e in events] == ["INSERT"] * 4
        e1, e2, e3, e4 = events
        # original shape
        assert e1["after"] == {"id": "1", "name": "before"}
        assert e1["table_name"] == tbl
        # widened shape: the added column appears exactly when it was added
        assert e2["after"] == {"id": "2", "name": "widened", "email": "w@x"}
        # narrowed shape: the dropped column vanishes from later rows
        assert e3["after"] == {"id": "3", "email": "n@x"}
        # renamed relation: same oid, events route under the new name
        assert e4["after"] == {"id": "4", "email": "r@x"}
        assert e4["table_name"] == tbl2
        assert e3["table_name"] == tbl
    finally:
        try:
            admin.simple_query(f'DROP PUBLICATION IF EXISTS "{pub}"')
            admin.simple_query(f'DROP TABLE IF EXISTS "{tbl}"')
            admin.simple_query(f'DROP TABLE IF EXISTS "{tbl2}"')
            try:
                admin.drop_replication_slot(slot)
            except wire.WireError:
                pass
        finally:
            admin.close()
