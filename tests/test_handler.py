"""Handler/record-shaping parity with the reference's conventions
(README.md:183-212, example/snapshot/main.go:127-179, FIXTURES.md §3)."""

import json

import pyspark.sql.functions as F
from pyspark.sql.types import StructType

from go_pq_cdc_kafka_spark import envelope as env
from go_pq_cdc_kafka_spark import handler as H
from go_pq_cdc_kafka_spark.plans.routing import RoutingTable, resolve_topics


def users(spark):
    return spark.createDataFrame(
        [(1, "Test User 1", "test1@example.com")], "id int, name string, email string"
    )


def shaped(spark, ev):
    rt = RoutingTable({"public.users": "users.test"})
    return H.to_kafka_records(resolve_topics(ev, rt), pk_field="id")


def test_snapshot_record_shape(spark):
    """Mirrors snapshot_test.go:24-163 — rows in ⇒ SNAPSHOT payloads out with
    operation + fields intact, key = pk string bytes, source header."""
    rec = shaped(spark, env.snapshot_events(users(spark), "users")).collect()[0]
    assert rec.topic == "users.test"
    assert rec.key == b"1"
    payload = json.loads(bytes(rec.value))
    assert payload["operation"] == "SNAPSHOT"
    assert payload["name"] == "Test User 1"
    headers = {h.key: bytes(h.value).decode() for h in rec.headers}
    assert headers == {"operation": "SNAPSHOT", "table": "users", "source": "initial-snapshot"}


def test_delete_value_renders_preimage(spark):
    """connector_test.go:282-414 — DELETE payload carries the pre-image."""
    rec = shaped(spark, env.delete_events(users(spark), "users")).collect()[0]
    payload = json.loads(bytes(rec.value))
    assert payload["operation"] == "DELETE"
    assert payload["email"] == "test1@example.com"
    headers = {h.key: bytes(h.value).decode() for h in rec.headers}
    assert headers["source"] == "cdc"


def test_insert_update_records(spark):
    ins = shaped(spark, env.insert_events(users(spark), "users")).collect()[0]
    assert json.loads(bytes(ins.value))["operation"] == "INSERT"
    old_new = users(spark).select(
        F.struct("id", "name", "email").alias("old"),
        F.struct("id", F.lit("Updated").alias("name"), "email").alias("new"),
    )
    up = shaped(spark, env.update_events(old_new, "users")).collect()[0]
    p = json.loads(bytes(up.value))
    assert p["operation"] == "UPDATE" and p["name"] == "Updated"
    assert up.key == b"1"


def test_dynamic_tier_records(spark):
    ev = env.to_dynamic(env.snapshot_events(users(spark), "users"))
    rec = shaped(spark, ev).collect()[0]
    payload = json.loads(bytes(rec.value))
    assert payload["operation"] == "SNAPSHOT" and payload["id"] == "1"


def test_flat_map_handler_one_to_n_and_drop(spark):
    """handler.go:5 semantics: 1→N fan-out and N=0 drop."""
    df = spark.createDataFrame([(1,), (2,), (3,)], "id int")

    def fanout(pdf):
        import pandas as pd

        rows = []
        for _, r in pdf.iterrows():
            if r.id == 2:
                continue  # drop
            for j in range(r.id):
                rows.append({"id": int(r.id), "copy": j})
        return pd.DataFrame(rows, columns=["id", "copy"])

    out = H.flat_map_handler(df, fanout, "id int, copy int").collect()
    assert sorted((r.id, r.copy) for r in out) == [(1, 0), (3, 0), (3, 1), (3, 2)]
