"""Event-time windowing + stateful streaming operators (SURVEY §2.B rows:
watermarks/late data, tumbling/session windows, stateful dedup, custom
applyInPandasWithState state)."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from go_pq_cdc_kafka_spark.sources import changelog as cl
from go_pq_cdc_kafka_spark.streaming import windows as W

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def events_batch(spark):
    rows = [
        (1, ts(0), 10, "click", 1.0),
        (2, ts(10), 10, "click", 2.0),
        (3, ts(65), 10, "click", 4.0),     # new hour, and >30min gap
        (4, ts(5), 20, "view", 8.0),
        (5, ts(50), 20, "view", 16.0),     # >30min gap -> new session
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_tumbling_agg_batch(spark):
    out = {(r.window_start, r.event_type): (r.n, r.sum_value)
           for r in W.tumbling_agg(events_batch(spark)).collect()}
    assert out[(ts(0), "click")] == (2, 3.0)
    assert out[(ts(60), "click")] == (1, 4.0)
    assert out[(ts(0), "view")] == (2, 24.0)


def test_session_agg_batch(spark):
    out = [(r.user_id, r.session_start, r.n, r.sum_value)
           for r in W.session_agg(events_batch(spark))
           .orderBy("user_id", "session_start").collect()]
    # user 10: events at 0,10 merge (gap 10m < 30m); 65 splits
    # user 20: events at 5 and 50 split (gap 45m)
    assert out == [
        (10, ts(0), 2, 3.0),
        (10, ts(65), 1, 4.0),
        (20, ts(5), 1, 8.0),
        (20, ts(50), 1, 16.0),
    ]


def _write_files(spark, tmp_path, name, batches):
    """One parquet file per batch; the file source orders by modification
    time, so stamp each batch's files with strictly increasing mtimes to
    pin arrival order (appends within the same clock tick would otherwise
    interleave)."""
    import glob
    import os

    path = str(tmp_path / name)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    base = 1_700_000_000
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        for f in glob.glob(os.path.join(path, "*.parquet")):
            if os.path.getmtime(f) > base + i * 60:
                os.utime(f, (base + i * 60, base + i * 60))
    return path


def test_streaming_tumbling_watermark_drops_late(spark, tmp_path):
    """Append-mode tumbling agg: a row arriving after the watermark passed
    its window end is dropped (late-data semantics, SURVEY §2.B)."""
    # Watermark advancement lags one micro-batch (it is computed from data
    # seen through batch N-1), so two advancing batches guarantee hour-0's
    # state was emitted + evicted before the late row arrives; only then is
    # the drop guaranteed rather than best-effort.
    batches = [
        [(1, ts(0), 10, "click", 1.0), (2, ts(30), 10, "click", 2.0)],
        [(3, ts(180), 10, "click", 4.0)],
        [(4, ts(360), 10, "click", 4.0)],
        # very-late arrival into hour 0 — window already closed, must drop
        [(5, ts(40), 10, "click", 8.0)],
        [(6, ts(500), 10, "click", 16.0)],
    ]
    path = _write_files(spark, tmp_path, "late", batches)
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(path)
    )
    agg = W.tumbling_agg(stream, duration="1 hour", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    collected = spark.sql("select * from late_sink").collect()
    # hour 0 closed with only the two on-time rows; late event_id=5 dropped,
    # and append mode emitted the window exactly once
    hour0 = [r for r in collected if r.window_start == ts(0)]
    assert len(hour0) == 1
    assert (hour0[0].n, hour0[0].sum_value) == (2, 3.0)


def test_streaming_dedup_with_watermark(spark, tmp_path):
    batches = [
        [(1, ts(0), 10, "click", 1.0), (1, ts(0), 10, "click", 1.0)],  # dup in-batch
        [(1, ts(1), 10, "click", 1.0), (2, ts(2), 20, "view", 2.0)],   # dup cross-batch
    ]
    path = _write_files(spark, tmp_path, "dedup", batches)
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = W.dedup_stream(stream, keys=["event_id"], watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    ids = sorted(r.event_id for r in spark.sql("select * from dedup_sink").collect())
    assert ids == [1, 2]


def test_stateful_running_counts(spark, tmp_path):
    """applyInPandasWithState: totals accumulate across micro-batches and
    survive in the state store."""
    schema = "table_name string, op string"
    b1 = [("users", "INSERT"), ("users", "INSERT"), ("users", "UPDATE")]
    b2 = [("users", "INSERT"), ("books", "DELETE")]
    path = str(tmp_path / "ops")
    for rows in (b1, b2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)

    stream = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    counts = W.running_counts_stateful(stream)
    q = (
        counts.writeStream.format("memory")
        .queryName("state_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from state_sink").collect()
    # last emission per key carries the running total
    final = {}
    for r in rows:
        key = (r.table_name, r.op)
        if key not in final or r.batches >= final[key].batches:
            final[key] = r
    assert final[("users", "INSERT")].events == 3
    assert final[("users", "UPDATE")].events == 1
    assert final[("books", "DELETE")].events == 1


def test_interval_join_batch_semantics(spark):
    imps = spark.createDataFrame(
        [(1, ts(0), 10), (2, ts(100), 10), (3, ts(0), 20)],
        "imp_id long, its timestamp, user_id long",
    )
    clks = spark.createDataFrame(
        [(91, ts(10), 10),   # within 30m of imp 1
         (92, ts(125), 10),  # within 30m of imp 2
         (93, ts(70), 10),   # matches no impression window
         (94, ts(40), 20)],  # 40m after imp 3 -> outside
        "clk_id long, cts timestamp, user_id long",
    )
    got = {
        (r.imp_id, r.clk_id)
        for r in W.interval_join(imps, clks, "user_id", "its", "cts").collect()
    }
    assert got == {(1, 91), (2, 92)}


def test_interval_join_streaming(spark, tmp_path):
    import glob
    import os

    def write_stream_dir(name, schema, batches):
        path = str(tmp_path / name)
        base = 1_700_000_000
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(path)
            for f in glob.glob(os.path.join(path, "*.parquet")):
                if os.path.getmtime(f) > base + i * 60:
                    os.utime(f, (base + i * 60, base + i * 60))
        return path

    ipath = write_stream_dir(
        "imps", "imp_id long, its timestamp, user_id long",
        [[(1, ts(0), 10), (2, ts(100), 10)]],
    )
    cpath = write_stream_dir(
        "clks", "clk_id long, cts timestamp, user_id long",
        [[(91, ts(10), 10), (92, ts(125), 10), (93, ts(70), 10)]],
    )
    imps = spark.readStream.schema(
        spark.read.parquet(ipath).schema
    ).parquet(ipath)
    clks = spark.readStream.schema(
        spark.read.parquet(cpath).schema
    ).parquet(cpath)
    q = (
        W.interval_join(imps, clks, "user_id", "its", "cts")
        .select("imp_id", "clk_id")
        .writeStream.format("memory")
        .queryName("ij_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ij_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {(r.imp_id, r.clk_id) for r in spark.sql("select * from ij_sink").collect()}
    assert got == {(1, 91), (2, 92)}


def test_sliding_window_batch(spark):
    out = {
        (r.window_start, r.n)
        for r in W.tumbling_agg(
            events_batch(spark).filter(F.col("user_id") == 10),
            duration="1 hour", slide="30 minutes", value_col=None, keys=(),
        ).collect()
    }
    # events at minutes 0, 10, 65: hops [-30,30)=2, [0,60)=2, [30,90)=1,
    # [60,120)=1 — each row lands in duration/slide = 2 windows
    assert out == {(ts(-30), 2), (ts(0), 2), (ts(30), 1), (ts(60), 1)}


def test_stateful_lww_materialization(spark, tmp_path):
    """Streaming LWW: per-pk state converges to the latest-LSN image across
    micro-batches; DELETE tombstones null the image; replayed older LSNs
    cannot regress the row (idempotence under at-least-once)."""
    import json

    base = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C")], "id int, name string"
    )
    log = cl.generate_table_changelog(base, "id", "users", update_mod=2, delete_mod=3)
    path = str(tmp_path / "log")
    cl.write_changelog(log, path, num_files=3)

    stream = cl.read_changelog_stream(spark, path)
    q = (
        W.lww_stateful(stream, pk_field="id")
        .writeStream.format("memory")
        .queryName("lww_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("select * from lww_sink").collect()
    final = {}
    for r in rows:  # last emission per pk wins (highest lsn)
        if r.pk not in final or r.last_lsn >= final[r.pk].last_lsn:
            final[r.pk] = r

    # changelog: snapshots 1-3, inserts 1000001-1000003, update id=2, delete id=3
    assert final["2"].last_op == "UPDATE"
    assert json.loads(final["2"].image)["name"] == "B"
    assert final["3"].last_op == "DELETE" and final["3"].image is None
    assert final["1"].last_op == "SNAPSHOT"
    assert json.loads(final["1000001"].image)["name"] == "A"
    live = {pk for pk, r in final.items() if r.last_op != "DELETE"}
    assert live == {"1", "2", "1000001", "1000002", "1000003"}


def test_stateful_lww_tws_matches_apply_in_pandas_variant(spark, tmp_path):
    """lww_tws (transformWithState) must produce the SAME converged
    materialization as lww_stateful on the same changelog — tombstones,
    replay idempotence, last-LSN images."""
    import json

    if not W.tws_available():
        pytest.skip("google.protobuf not installed; TWS state server needs it")
    base = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C")], "id int, name string"
    )
    log = cl.generate_table_changelog(base, "id", "users", update_mod=2, delete_mod=3)
    path = str(tmp_path / "log")
    cl.write_changelog(log, path, num_files=3)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = cl.read_changelog_stream(spark, path)
        q = (
            W.lww_tws(stream, pk_field="id")
            .writeStream.format("memory")
            .queryName("lww_tws_sink")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    rows = spark.sql("select * from lww_tws_sink").collect()
    final = {}
    for r in rows:
        if r.pk not in final or r.last_lsn >= final[r.pk].last_lsn:
            final[r.pk] = r
    assert final["2"].last_op == "UPDATE"
    assert json.loads(final["2"].image)["name"] == "B"
    assert final["3"].last_op == "DELETE" and final["3"].image is None
    live = {pk for pk, r in final.items() if r.last_op != "DELETE"}
    assert live == {"1", "2", "1000001", "1000002", "1000003"}


def test_stateful_running_counts_tws(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 stateful API): same totals as
    the applyInPandasWithState operator, state in RocksDB. Skips where the
    protobuf package (TWS wire protocol) is absent — this container."""
    if not W.tws_available():
        pytest.skip("google.protobuf not installed; TWS state server needs it")
    schema = "table_name string, op string"
    b1 = [("users", "INSERT"), ("users", "INSERT"), ("users", "UPDATE")]
    b2 = [("users", "INSERT"), ("books", "DELETE")]
    path = str(tmp_path / "ops")
    for rows in (b1, b2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(spark.read.parquet(path).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        counts = W.running_counts_tws(stream)
        q = (
            counts.writeStream.format("memory")
            .queryName("tws_sink")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    rows = spark.sql("select * from tws_sink").collect()
    final = {}
    for r in rows:
        key = (r.table_name, r.op)
        if key not in final or r.batches >= final[key].batches:
            final[key] = r
    assert final[("users", "INSERT")].events == 3
    assert final[("users", "UPDATE")].events == 1
    assert final[("books", "DELETE")].events == 1


def test_streaming_dedup_within_watermark_reemits_after_horizon(spark, tmp_path):
    """dropDuplicatesWithinWatermark: near-in-time duplicates are dropped,
    but once the watermark passes a key its state is evicted and a later
    legitimate recurrence IS re-emitted (the bounded-state contract
    dedup_stream cannot offer on an unbounded keyspace)."""
    batches = [
        [(1, ts(0), 10, "click", 1.0), (1, ts(1), 10, "click", 1.0)],  # dup within delay
        [(99, ts(60), 20, "view", 2.0)],   # advances watermark to ts(50)
        [(98, ts(61), 20, "view", 4.0)],   # a batch under the new watermark
        # evicts key 1's expired state (eviction lags the watermark update
        # by one micro-batch)
        [(1, ts(65), 10, "click", 3.0)],   # key 1 recurs AFTER its state expired
    ]
    path = _write_files(spark, tmp_path, "dedup_ww", batches)
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = W.dedup_stream_within_watermark(
        stream, keys=["event_id"], watermark="10 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_ww_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ww"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r.event_id, r.value)
        for r in spark.sql("select * from dedup_ww_sink").collect()
    )
    assert got == [(1, 1.0), (1, 3.0), (98, 4.0), (99, 2.0)]



def test_interval_join_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream interval join: an impression with no click
    inside [its, its+30min] must still emit — with null click columns —
    but only once the right watermark passes its+30min (state eviction
    proves no match can arrive). A far-future click in batch 2 advances
    the watermark past every horizon."""
    def write_batch(path, schema, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    ipath, cpath = str(tmp_path / "imps"), str(tmp_path / "clks")
    # imp 1 gets a click; imp 2 never does
    write_batch(ipath, "imp_id long, its timestamp, user_id long",
                [(1, ts(0), 10), (2, ts(100), 10)])
    write_batch(cpath, "clk_id long, cts timestamp, user_id long",
                [(91, ts(10), 10)])

    imps = spark.readStream.schema(spark.read.parquet(ipath).schema).parquet(ipath)
    clks = spark.readStream.schema(spark.read.parquet(cpath).schema).parquet(cpath)
    q = (
        W.interval_join(imps, clks, "user_id", "its", "cts", how="leftOuter")
        .select("imp_id", "clk_id")
        .writeStream.format("memory")
        .queryName("ij_outer_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark still near ts(10): imp 2's no-match row must NOT have
        # emitted yet (a match could still arrive)
        early = {(r.imp_id, r.clk_id)
                 for r in spark.sql("select * from ij_outer_sink").collect()}
        assert (2, None) not in early

        # the GLOBAL watermark is min(left, right): advance BOTH sides far
        # past its+30min, then drain twice — batch k advances the
        # watermark, batch k+1 evicts state and emits the null row
        write_batch(cpath, "clk_id long, cts timestamp, user_id long",
                    [(99, ts(100_000), 77)])
        write_batch(ipath, "imp_id long, its timestamp, user_id long",
                    [(3, ts(100_000), 88)])
        q.processAllAvailable()
        write_batch(cpath, "clk_id long, cts timestamp, user_id long",
                    [(98, ts(200_000), 77)])
        write_batch(ipath, "imp_id long, its timestamp, user_id long",
                    [(4, ts(200_000), 88)])
        q.processAllAvailable()
        got = {(r.imp_id, r.clk_id)
               for r in spark.sql("select * from ij_outer_sink").collect()}
        assert (1, 91) in got
        assert (2, None) in got, got
    finally:
        q.stop()


def test_stateful_running_counts_rocksdb_provider(spark, tmp_path):
    """applyInPandasWithState on the RocksDBStateStoreProvider — the state
    backend transformWithState requires. The TWS API itself stays
    env-skipped (its state server needs google.protobuf, absent here);
    this proves the RocksDB state tier and the same running-count
    semantics execute in this environment, so the only missing piece is
    the TWS wire protocol, not the state store or the operator."""
    schema = "table_name string, op string"
    b1 = [("users", "INSERT"), ("users", "INSERT"), ("users", "UPDATE")]
    b2 = [("users", "INSERT"), ("books", "DELETE")]
    path = str(tmp_path / "ops")
    for rows in (b1, b2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(spark.read.parquet(path).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        q = (
            W.running_counts_stateful(stream)
            .writeStream.format("memory")
            .queryName("rocksdb_state_sink")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_rocks"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    rows = spark.sql("select * from rocksdb_state_sink").collect()
    final = {}
    for r in rows:
        key = (r.table_name, r.op)
        if key not in final or r.batches >= final[key].batches:
            final[key] = r
    assert final[("users", "INSERT")].events == 3
    assert final[("users", "UPDATE")].events == 1
    assert final[("books", "DELETE")].events == 1
