"""Routing parity with connector.go:194-265 (R1-R4)."""

import pyspark.sql.functions as F

from go_pq_cdc_kafka_spark.plans.routing import RoutingTable, resolve_topics


def events(spark, names):
    return spark.createDataFrame(
        [("public", n) for n in names], "table_namespace string, table_name string"
    )


def topics(df):
    return {r.table_name: r.topic for r in df.collect()}


def test_exact_match(spark):
    rt = RoutingTable({"public.users": "users.topic"})
    out = topics(resolve_topics(events(spark, ["users"]), rt))
    assert out == {"users": "users.topic"}


def test_miss_is_dropped(spark):
    """Unmapped table ⇒ skip-and-ack (connector.go:146-156)."""
    rt = RoutingTable({"public.users": "users.topic"})
    out = resolve_topics(events(spark, ["users", "orders"]), rt)
    assert topics(out) == {"users": "users.topic"}


def test_partition_parent_shortest_prefix_wins(spark):
    """users_2024_01 routes via shortest mapped prefix (connector.go:249-265)."""
    rt = RoutingTable({"public.users": "users.topic", "public.users_2024": "y2024"})
    out = topics(resolve_topics(events(spark, ["users_2024_01"]), rt))
    assert out == {"users_2024_01": "users.topic"}


def test_partition_parent_progressive(spark):
    rt = RoutingTable({"public.orders_eu": "eu.orders"})
    out = topics(resolve_topics(events(spark, ["orders_eu_2024_05", "orders"]), rt))
    assert out == {"orders_eu_2024_05": "eu.orders"}  # bare "orders" dropped


def test_hypertable_parent(spark):
    rt = RoutingTable(
        {"public.metrics": "metrics.topic"},
        hypertables={"_timescaledb_internal._hyper_1_3_chunk": "public.metrics"},
    )
    df = spark.createDataFrame(
        [("_timescaledb_internal", "_hyper_1_3_chunk")],
        "table_namespace string, table_name string",
    )
    assert topics(resolve_topics(df, rt)) == {"_hyper_1_3_chunk": "metrics.topic"}


def test_handler_override_beats_default(spark):
    """connector.go:186-192: non-empty per-message topic wins."""
    rt = RoutingTable({"public.users": "users.topic"})
    df = events(spark, ["users", "users"]).withColumn(
        "handler_topic",
        F.when(F.col("table_name") == "users", F.lit("override.topic")),
    )
    df = spark.createDataFrame(
        [("public", "users", "override.topic"), ("public", "users", "")],
        "table_namespace string, table_name string, handler_topic string",
    )
    out = [r.topic for r in resolve_topics(df, rt, handler_topic_col="handler_topic").collect()]
    assert sorted(out) == ["override.topic", "users.topic"]


def test_empty_mapping_pass_through(spark):
    """Empty mapping ⇒ nothing dropped; handler topic used (connector.go:196-199)."""
    rt = RoutingTable({})
    df = spark.createDataFrame(
        [("public", "anything", "handler.topic")],
        "table_namespace string, table_name string, handler_topic string",
    )
    out = resolve_topics(df, rt, handler_topic_col="handler_topic").collect()
    assert len(out) == 1 and out[0].topic == "handler.topic"



def test_dimension_routing_picks_up_updates_mid_stream(spark, tmp_path):
    """Dimension routing applied inside foreachBatch re-reads the routing
    table every micro-batch: a table added BETWEEN batches routes without
    a restart — the reference's live hypertable-map behavior
    (connector.go:204-209). (A plan-embedded stream-static join pins the
    file listing at query start and never sees updates — hence the
    foreachBatch contract.)"""
    from go_pq_cdc_kafka_spark.plans.routing import resolve_topics_from_dimension

    dim = str(tmp_path / "dim")
    src = str(tmp_path / "src")
    out: list = []
    spark.createDataFrame(
        [("public.users", "users.cdc")], "full_table string, topic string"
    ).coalesce(1).write.mode("overwrite").parquet(dim)

    schema = "table_namespace string, table_name string, pk string"
    spark.createDataFrame(
        [("public", "users", "1"), ("public", "books", "9")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )

    def land(batch_df, _bid):
        routed = resolve_topics_from_dimension(batch_df, dim)
        out.extend((r.table_name, r.topic) for r in routed.collect())

    q = (
        stream.writeStream.foreachBatch(land)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    # books is unroutable in batch 1: skipped-and-acked
    assert set(out) == {("users", "users.cdc")}

    # routing update lands between batches: books gains a topic
    spark.createDataFrame(
        [("public.users", "users.cdc"), ("public.books", "books.cdc")],
        "full_table string, topic string",
    ).coalesce(1).write.mode("overwrite").parquet(dim)
    spark.createDataFrame([("public", "books", "10")], schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    assert ("books", "books.cdc") in set(out)
