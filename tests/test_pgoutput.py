"""pgoutput wire decoder: fixtures are hand-packed from the PostgreSQL
protocol documentation ("Logical Replication Message Formats" + COPY-BOTH
XLogData framing), NOT produced by the module under test — the decoder is
checked against independently constructed bytes.

End-to-end: raw replication frames → decoder → WAL JSONL → pgwal stream →
CdcPipeline records, proving the production byte path feeds the same
envelope contract the file-replay source uses.
"""

import json
import struct
from datetime import datetime, timezone

import pytest

from go_pq_cdc_kafka_spark.plans.routing import RoutingTable
from go_pq_cdc_kafka_spark.sources import cdc
from go_pq_cdc_kafka_spark.sources import pgoutput as PO
from go_pq_cdc_kafka_spark.streaming.pipeline import CdcPipeline

# -- independent binary fixture builders ------------------------------------

RELID = 16384
TS_2024 = int(
    (datetime(2024, 1, 1, tzinfo=timezone.utc) - PO.PG_EPOCH).total_seconds() * 1_000_000
)
TOAST = object()  # marker for an unchanged-TOAST column in fixtures


def cstr(s):
    return s.encode() + b"\x00"


def rel_msg(relid=RELID, ns="public", name="users", ident="d", cols=None):
    cols = cols or [(1, "id", 23, -1), (0, "name", 25, -1)]
    b = b"R" + struct.pack(">i", relid) + cstr(ns) + cstr(name) + ident.encode()
    b += struct.pack(">h", len(cols))
    for flags, cname, oid, typmod in cols:
        b += struct.pack(">b", flags) + cstr(cname) + struct.pack(">ii", oid, typmod)
    return b


def tup(*vals):
    b = struct.pack(">h", len(vals))
    for v in vals:
        if v is None:
            b += b"n"
        elif v is TOAST:
            b += b"u"
        elif isinstance(v, bytes):
            b += b"b" + struct.pack(">i", len(v)) + v
        else:
            e = v.encode()
            b += b"t" + struct.pack(">i", len(e)) + e
    return b


def begin(ts_us=TS_2024, xid=101, final_lsn=0):
    return b"B" + struct.pack(">qqi", final_lsn, ts_us, xid)


def commit():
    return b"C" + struct.pack(">bqqq", 0, 0, 0, 0)


def insert(t, relid=RELID):
    return b"I" + struct.pack(">i", relid) + b"N" + t


def update(new, old=None, old_kind=b"O", relid=RELID):
    b = b"U" + struct.pack(">i", relid)
    if old is not None:
        b += old_kind + old
    return b + b"N" + new


def delete(old, kind=b"K", relid=RELID):
    return b"D" + struct.pack(">i", relid) + kind + old


def truncate(*relids):
    return (
        b"T"
        + struct.pack(">ib", len(relids), 0)
        + b"".join(struct.pack(">i", r) for r in relids)
    )


def xlogdata(lsn, msg):
    return b"w" + struct.pack(">qqq", lsn, lsn, 0) + msg


def keepalive(wal_end=5, reply=1):
    return b"k" + struct.pack(">qqb", wal_end, 0, reply)


# -- decoder unit tests ------------------------------------------------------

def test_decode_insert_update_delete_roundtrip():
    d = PO.PgOutputDecoder()
    assert d.decode(1, rel_msg()) == []
    assert d.decode(2, begin()) == []

    (ins,) = d.decode(900, insert(tup("1", "A")))
    assert ins == {
        "op": "INSERT",
        "event_time": "2024-01-01T00:00:00+00:00",
        "lsn": 900,
        "table_namespace": "public",
        "table_name": "users",
        "before": None,
        "after": {"id": "1", "name": "A"},
    }

    (ins2,) = d.decode(910, insert(tup("2", None)))
    assert ins2["after"] == {"id": "2", "name": None}

    (upd,) = d.decode(1100, update(tup("2", "C"), old=tup("2", "B")))
    assert upd["op"] == "UPDATE"
    assert upd["before"] == {"id": "2", "name": "B"}
    assert upd["after"] == {"id": "2", "name": "C"}

    # default replica identity: no old tuple on UPDATE
    (upd2,) = d.decode(1110, update(tup("1", "Z")))
    assert upd2["before"] is None and upd2["after"]["name"] == "Z"

    (dele,) = d.decode(1200, delete(tup("1", None)))
    assert dele["op"] == "DELETE"
    assert dele["before"] == {"id": "1", "name": None} and dele["after"] is None

    assert d.decode(1300, commit()) == []


def test_unchanged_toast_resolution():
    d = PO.PgOutputDecoder()
    d.decode(1, rel_msg(ident="f"))
    d.decode(2, begin())
    # old image carries the TOASTed value -> filled into the new image
    (upd,) = d.decode(10, update(tup("7", TOAST), old=tup("7", "big-old-text")))
    assert upd["after"] == {"id": "7", "name": "big-old-text"}
    # key-only old image lacks the value -> None
    (upd2,) = d.decode(11, update(tup("8", TOAST), old=tup("8", None), old_kind=b"K"))
    assert upd2["after"] == {"id": "8", "name": None}


def test_truncate_and_multirelation():
    d = PO.PgOutputDecoder()
    d.decode(1, rel_msg())
    d.decode(2, rel_msg(relid=16500, name="orders", cols=[(1, "oid", 23, -1)]))
    d.decode(3, begin())
    evs = d.decode(50, truncate(RELID, 16500))
    assert [e["table_name"] for e in evs] == ["users", "orders"]
    assert all(e["op"] == "TRUNCATE" for e in evs)


def test_binary_mode_and_errors():
    d = PO.PgOutputDecoder()
    d.decode(1, rel_msg())
    d.decode(2, begin())
    (ins,) = d.decode(5, insert(tup("9", b"\xf0\x9f\x90\x98")))  # binary col
    assert ins["after"]["name"] == "🐘"

    with pytest.raises(ValueError, match="unknown relation"):
        d.decode(6, insert(tup("1", "x"), relid=999))
    with pytest.raises(ValueError, match="unknown pgoutput message tag"):
        d.decode(7, b"Z123")


def test_copy_frame_decode():
    lsn, msg = PO.decode_copy_frame(xlogdata(42, begin()))
    assert lsn == 42 and msg == begin()
    ka = PO.decode_copy_frame(keepalive(wal_end=77, reply=1))
    assert isinstance(ka, PO.Keepalive)
    assert ka.wal_end == 77 and ka.reply_requested is True


def _frames():
    return [
        xlogdata(1, rel_msg()),
        xlogdata(2, begin()),
        keepalive(),  # interleaved keepalives are transport noise
        xlogdata(900, insert(tup("1", "A"))),
        xlogdata(910, insert(tup("2", "B"))),
        xlogdata(1100, update(tup("2", "C"), old=tup("2", "B"))),
        xlogdata(1200, delete(tup("1", None))),
        xlogdata(1300, commit()),
    ]


def test_replication_client_with_frame_source():
    client = cdc.PostgresReplicationClient(
        "dsn", "slot", "pub", frame_source=lambda start_lsn: iter(_frames())
    )
    evs = list(client.events(start_lsn=905))
    # start_lsn filter: the two events at 900/910 <= 905 threshold... 910 > 905
    assert [(e["op"], e["lsn"]) for e in evs] == [
        ("INSERT", 910),
        ("UPDATE", 1100),
        ("DELETE", 1200),
    ]


def test_pgoutput_to_pipeline_end_to_end(spark, tmp_path):
    """Raw frames → decoder → WAL JSONL → pgwal stream → pipeline records:
    the production byte path produces the same record contract as the
    file-replay tests (payload shapes per connector_test.go:663-713)."""
    cdc.register(spark)
    events = list(PO.decode_replication_stream(iter(_frames())))
    wal = str(tmp_path / "wal.jsonl")
    cdc.write_wal_jsonl(events, wal)

    pipe = CdcPipeline(
        source=spark.readStream.format("pgwal").option("path", wal).load(),
        routing=RoutingTable({"public.users": "users.cdc"}),
        pk_field="id",
    )
    q = pipe.to_memory("pgoutput_sink")
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("select * from pgoutput_sink").collect()
    payloads = [json.loads(bytes(r.value)) for r in rows]
    ops = sorted(p["operation"] for p in payloads)
    assert ops == ["DELETE", "INSERT", "INSERT", "UPDATE"]
    dele = next(p for p in payloads if p["operation"] == "DELETE")
    assert dele["id"] == "1"  # DELETE renders the pre-image
    upd = next(p for p in payloads if p["operation"] == "UPDATE")
    assert upd["name"] == "C"
    assert all(r.topic == "users.cdc" for r in rows)


def test_schema_evolution_relation_redefinition():
    """ALTER TABLE ADD COLUMN mid-stream: Postgres re-sends the Relation
    message before the first change under the new schema; the stateful
    registry must overwrite and subsequent tuples decode with the added
    column (reference relies on go-pq-cdc for the same contract)."""
    d = PO.PgOutputDecoder()
    d.decode(1, begin())
    d.decode(2, rel_msg())
    (ev1,) = d.decode(3, insert(tup("1", "alice")))
    assert ev1["after"] == {"id": "1", "name": "alice"}
    # new Relation for the same relid: added nullable column "email"
    d.decode(
        4,
        rel_msg(
            cols=[(1, "id", 23, -1), (0, "name", 25, -1), (0, "email", 25, -1)]
        ),
    )
    (ev2,) = d.decode(5, insert(tup("2", "bob", "b@x.io")))
    assert ev2["after"] == {"id": "2", "name": "bob", "email": "b@x.io"}
    # pre-evolution rows already emitted keep the 2-column image
    assert set(ev1["after"]) == {"id", "name"}


def test_rename_via_relation_redefinition_routes_new_name():
    """A redefined Relation can also rename the table; events after it must
    carry the new table identity (the reference resolves topics per event
    from the message's table name, connector.go:144-156)."""
    d = PO.PgOutputDecoder()
    d.decode(1, begin())
    d.decode(2, rel_msg(name="users"))
    (a,) = d.decode(3, insert(tup("1", "x")))
    d.decode(4, rel_msg(name="users_v2"))
    (b,) = d.decode(5, insert(tup("2", "y")))
    assert a["table_name"] == "users" and b["table_name"] == "users_v2"


# -- protocol v2 streamed transactions ---------------------------------------


def stream_start(xid, first=1):
    return b"S" + struct.pack(">ib", xid, first)


def stream_stop():
    return b"E"


def stream_commit(xid, ts_us=TS_2024):
    return b"c" + struct.pack(">ibqqq", xid, 0, 0, 0, ts_us)


def stream_abort(xid, subxid=None):
    # a whole-transaction abort carries subxid == xid; subxid != xid means
    # only that subtransaction rolled back (savepoint / exception block)
    return b"A" + struct.pack(">ii", xid, xid if subxid is None else subxid)


def _xid_prefixed(msg, xid):
    # within S..E every v2 message carries its xid right after the tag
    return msg[:1] + struct.pack(">i", xid) + msg[1:]


def test_streamed_transaction_buffers_until_stream_commit():
    d = PO.PgOutputDecoder()
    assert d.decode(1, rel_msg()) == []
    assert d.decode(2, stream_start(701)) == []
    assert d.decode(3, _xid_prefixed(insert(tup("1", "A")), 701)) == []
    assert d.decode(4, stream_stop()) == []
    # nothing visible while the transaction is in flight
    assert d.decode(5, stream_start(701, first=0)) == []
    assert d.decode(6, _xid_prefixed(insert(tup("2", "B")), 701)) == []
    assert d.decode(7, stream_stop()) == []
    events = d.decode(8, stream_commit(701))
    assert [(e["op"], e["after"]["id"]) for e in events] == [
        ("INSERT", "1"),
        ("INSERT", "2"),
    ]
    # commit timestamp stamped onto every buffered event
    assert all(e["event_time"].startswith("2024-01-01") for e in events)


def test_streamed_abort_discards_and_interleaving_keeps_xids_apart():
    d = PO.PgOutputDecoder()
    d.decode(1, rel_msg())
    # two interleaved streamed transactions
    d.decode(2, stream_start(801))
    d.decode(3, _xid_prefixed(insert(tup("1", "dead")), 801))
    d.decode(4, stream_stop())
    d.decode(5, stream_start(802))
    d.decode(6, _xid_prefixed(insert(tup("2", "live")), 802))
    d.decode(7, stream_stop())
    assert d.decode(8, stream_abort(801)) == []  # rollback: buffer dropped
    events = d.decode(9, stream_commit(802))
    assert [(e["op"], e["after"]["name"]) for e in events] == [("INSERT", "live")]
    # nothing lingers for the aborted xid
    assert d.decode(10, stream_commit(801)) == []


def test_streamed_subtransaction_rows_released_at_top_level_commit():
    """Per-message Xids inside a stream are the (sub)transaction's xid —
    rows written under a subtransaction (subxid != top xid) must still be
    released when the TOP-LEVEL transaction commits. Regression: they were
    buffered under the subxid and silently dropped at Stream Commit."""
    d = PO.PgOutputDecoder()
    d.decode(1, rel_msg())
    d.decode(2, stream_start(1001))
    d.decode(3, _xid_prefixed(insert(tup("1", "top")), 1001))
    # SAVEPOINT: change arrives tagged with the subtransaction's xid
    d.decode(4, _xid_prefixed(insert(tup("2", "sub")), 1002))
    d.decode(5, _xid_prefixed(insert(tup("3", "top2")), 1001))
    d.decode(6, stream_stop())
    events = d.decode(7, stream_commit(1001))
    assert [(e["op"], e["after"]["name"]) for e in events] == [
        ("INSERT", "top"),
        ("INSERT", "sub"),
        ("INSERT", "top2"),
    ]


def test_streamed_subtransaction_abort_keeps_rest_of_transaction():
    """Stream Abort with subxid != xid rolls back ONLY the subtransaction;
    the remaining rows of the top-level transaction must survive to commit.
    Regression: the whole top-level buffer was popped."""
    d = PO.PgOutputDecoder()
    d.decode(1, rel_msg())
    d.decode(2, stream_start(1101))
    d.decode(3, _xid_prefixed(insert(tup("1", "keep")), 1101))
    d.decode(4, _xid_prefixed(insert(tup("2", "rollback-me")), 1102))
    d.decode(5, _xid_prefixed(insert(tup("3", "keep2")), 1103))
    d.decode(6, stream_stop())
    # savepoint 1102 rolls back; 1101 and 1103 are still in flight
    assert d.decode(7, stream_abort(1101, subxid=1102)) == []
    events = d.decode(8, stream_commit(1101))
    assert [(e["op"], e["after"]["name"]) for e in events] == [
        ("INSERT", "keep"),
        ("INSERT", "keep2"),
    ]
    # abort of an unknown/already-gone xid is a no-op, not an error
    assert d.decode(9, stream_abort(9999, subxid=9998)) == []


def test_streamed_relation_updates_registry_immediately():
    d = PO.PgOutputDecoder()
    d.decode(1, stream_start(901))
    # Relation arrives INSIDE the stream (xid-prefixed) and must apply
    # to the registry at once so later messages in the stream decode
    d.decode(2, _xid_prefixed(rel_msg(), 901))
    d.decode(3, _xid_prefixed(insert(tup("5", "E")), 901))
    d.decode(4, stream_stop())
    events = d.decode(5, stream_commit(901))
    assert [(e["op"], e["after"]["id"]) for e in events] == [("INSERT", "5")]


def test_streamed_frames_through_decode_replication_stream():
    """v2 streamed frames flow through the transport-level stream decoder:
    events surface only at Stream Commit, in commit order."""
    frames = [
        xlogdata(1, rel_msg()),
        xlogdata(2, stream_start(55)),
        xlogdata(3, _xid_prefixed(insert(tup("1", "A")), 55)),
        xlogdata(4, stream_stop()),
        keepalive(),
        xlogdata(5, stream_start(55, first=0)),
        xlogdata(6, _xid_prefixed(insert(tup("2", "B")), 55)),
        xlogdata(7, stream_stop()),
        xlogdata(900, stream_commit(55)),
    ]
    events = list(PO.decode_replication_stream(iter(frames)))
    assert [(e["op"], e["lsn"], e["after"]["name"]) for e in events] == [
        ("INSERT", 900, "A"),
        ("INSERT", 900, "B"),
    ]
