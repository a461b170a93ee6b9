"""Strict-order produce path + fake-broker record-contract harness.

The reference's ordering contract is single-threaded WAL dispatch
(connector.go:129-184) with batch append in arrival order
(producer_batch.go:150): consumers observe changelog (LSN) order. These tests
pin the repo's ``strict_order`` analogue to that contract with a recording
fake producer — the foreachBatch shape is byte-for-byte what ``to_kafka``
uses, minus the broker round-trip, so the record contract
(integration_test/connector_test.go:663-713, example/snapshot/README.md:88-113)
is exercised end-to-end without a server.
"""

import json

import pyspark.sql.functions as F

from go_pq_cdc_kafka_spark.envelope import insert_events, to_dynamic
from go_pq_cdc_kafka_spark.plans.routing import RoutingTable
from go_pq_cdc_kafka_spark.sources import changelog as cl
from go_pq_cdc_kafka_spark.streaming.pipeline import CdcPipeline, ordered_records


def _run_capturing(spark, pipe, ckpt, capture):
    q = (
        pipe.records(carry_cols=("lsn",))
        .writeStream.foreachBatch(capture)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_strict_order_emits_wal_order_not_key_order(spark, tmp_path):
    """Multi-table changelog with keys crafted so lexicographic key order
    ("1" < "10" < "2" < "7") differs from LSN order — the round-1 bug sorted
    by key bytes and would interleave tables wrongly here."""
    users = spark.createDataFrame([(10, "u10"), (2, "u2")], "id int, name string")
    orders = spark.createDataFrame([(7, "o7"), (1, "o1")], "id int, status string")
    lsn_u = F.when(F.col("id") == 10, 1).otherwise(4).cast("long")
    lsn_o = F.when(F.col("id") == 7, 2).otherwise(3).cast("long")
    log = to_dynamic(insert_events(users, "users", lsn=lsn_u)).unionByName(
        to_dynamic(insert_events(orders, "orders", lsn=lsn_o))
    )
    path = str(tmp_path / "log")
    cl.write_changelog(log, path, num_files=1)

    pipe = CdcPipeline(
        source=cl.read_changelog_stream(spark, path),
        routing=RoutingTable(
            {"public.users": "users.t", "public.orders": "orders.t"}
        ),
        pk_field="id",
    )
    captured = []

    def fake_producer(batch_df, _bid):
        assert "lsn" not in ordered_records(batch_df).columns
        for r in ordered_records(batch_df).collect():
            captured.append((r.topic, bytes(r.key).decode()))

    _run_capturing(spark, pipe, str(tmp_path / "ckpt"), fake_producer)

    assert captured == [
        ("users.t", "10"),
        ("orders.t", "7"),
        ("orders.t", "1"),
        ("users.t", "2"),
    ]
    # guard: the old key sort would have produced a different sequence
    assert sorted(k for _, k in captured) != [k for _, k in captured]


def test_fake_broker_record_contract(spark, tmp_path):
    """E2E insert/update/delete/snapshot → captured records match the
    reference payload conventions (connector_test.go:663-713): key = pk
    string bytes, value = image JSON + injected operation (DELETE renders the
    pre-image), headers = operation/table/source with source distinguishing
    initial-snapshot from cdc."""
    base = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C")], "id int, name string"
    )
    log = cl.generate_table_changelog(base, "id", "users", update_mod=2, delete_mod=3)
    path = str(tmp_path / "log")
    cl.write_changelog(log, path, num_files=2)

    pipe = CdcPipeline(
        source=cl.read_changelog_stream(spark, path),
        routing=RoutingTable({"public.users": "users.test"}),
        pk_field="id",
    )
    produced = []

    def fake_producer(batch_df, _bid):
        for r in ordered_records(batch_df).collect():
            produced.append(
                {
                    "topic": r.topic,
                    "key": bytes(r.key).decode(),
                    "value": json.loads(bytes(r.value)),
                    "headers": {h.key: bytes(h.value).decode() for h in r.headers},
                }
            )

    _run_capturing(spark, pipe, str(tmp_path / "ckpt"), fake_producer)

    # produced sequence is full changelog order across micro-batches
    ops = [p["value"]["operation"] for p in produced]
    assert ops == ["SNAPSHOT"] * 3 + ["INSERT"] * 3 + ["UPDATE"] + ["DELETE"]
    assert all(p["topic"] == "users.test" for p in produced)
    assert all(p["headers"]["table"] == "users" for p in produced)
    assert all(p["headers"]["operation"] == p["value"]["operation"] for p in produced)

    snaps = [p for p in produced if p["value"]["operation"] == "SNAPSHOT"]
    assert [p["key"] for p in snaps] == ["1", "2", "3"]
    assert all(p["headers"]["source"] == "initial-snapshot" for p in snaps)

    ins = [p for p in produced if p["value"]["operation"] == "INSERT"]
    assert [p["key"] for p in ins] == ["1000001", "1000002", "1000003"]
    assert all(p["headers"]["source"] == "cdc" for p in ins)

    upd = next(p for p in produced if p["value"]["operation"] == "UPDATE")
    assert upd["key"] == "2" and upd["value"]["name"] == "B"

    # DELETE renders the pre-image (payload-choice convention)
    del_ = next(p for p in produced if p["value"]["operation"] == "DELETE")
    assert del_["key"] == "3" and del_["value"]["name"] == "C"
    assert del_["headers"]["source"] == "cdc"
