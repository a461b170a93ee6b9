"""Envelope semantics vs reference message.go:20-76 population rules."""

import pyspark.sql.functions as F

from go_pq_cdc_kafka_spark import envelope as env


def users_df(spark, n=5):
    return spark.range(1, n + 1).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("Test User "), F.col("id")).alias("name"),
        F.concat(F.lit("test"), F.col("id"), F.lit("@example.com")).alias("email"),
    )


def test_snapshot_events_population(spark):
    ev = env.snapshot_events(users_df(spark), "users").collect()
    assert len(ev) == 5
    assert all(r.op == "SNAPSHOT" for r in ev)
    assert all(r.before is None for r in ev)
    assert all(r.after is not None for r in ev)
    assert all(r.lsn == 0 for r in ev)
    assert {r.after.name for r in ev} == {f"Test User {i}" for i in range(1, 6)}
    assert ev[0].table_namespace == "public"
    assert ev[0].table_name == "users"


def test_insert_delete_population(spark):
    df = users_df(spark)
    ins = env.insert_events(df, "users", lsn=F.col("id")).collect()
    assert all(r.op == "INSERT" and r.before is None and r.after is not None for r in ins)
    assert sorted(r.lsn for r in ins) == [1, 2, 3, 4, 5]
    dels = env.delete_events(df, "users").collect()
    assert all(r.op == "DELETE" and r.after is None and r.before is not None for r in dels)
    assert {r.before.email for r in dels} == {f"test{i}@example.com" for i in range(1, 6)}


def test_update_population_carries_both_images(spark):
    df = users_df(spark)
    old_new = df.select(
        F.struct("id", "name", "email").alias("old"),
        F.struct(
            "id",
            F.concat(F.col("name"), F.lit(" v2")).alias("name"),
            "email",
        ).alias("new"),
    )
    ups = env.update_events(old_new, "users", lsn=F.col("old.id")).collect()
    assert all(r.op == "UPDATE" for r in ups)
    assert all(r.after.name == r.before.name + " v2" for r in ups)


def test_unknown_ops_dropped_like_reference_listener(spark):
    """TRUNCATE (and Begin/Commit/Relation) subscribed but never forwarded —
    connector.go:131-141 default arm."""
    df = spark.createDataFrame(
        [("INSERT",), ("TRUNCATE",), ("UPDATE",), ("BEGIN",), ("SNAPSHOT",), ("DELETE",)],
        "op string",
    )
    kept = [r.op for r in env.filter_known_ops(df).collect()]
    assert sorted(kept) == ["DELETE", "INSERT", "SNAPSHOT", "UPDATE"]


def test_replica_identity_default_prunes_preimage(spark):
    df = users_df(spark)
    ev = env.delete_events(df, "users")
    pruned = env.replica_identity_default(ev, ["id"])
    row = pruned.select("before").first().before
    assert row.asDict().keys() == {"id"}


def test_dynamic_tier_multiplexes_tables(spark):
    users = env.snapshot_events(users_df(spark), "users")
    books = env.snapshot_events(
        spark.createDataFrame([(1, "Book 1", "Author-1")], "id int, title string, author string"),
        "books",
    )
    mux = env.to_dynamic(users).unionByName(env.to_dynamic(books))
    rows = mux.collect()
    assert len(rows) == 6
    by_table = {r.table_name for r in rows}
    assert by_table == {"users", "books"}
    u = next(r for r in rows if r.table_name == "users")
    assert u.after["name"].startswith("Test User")
