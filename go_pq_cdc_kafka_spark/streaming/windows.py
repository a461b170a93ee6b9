"""Event-time windowing and stateful operators (SURVEY §2.B streaming rows:
watermarks/late data, tumbling/session windows, stateful dedup, custom state).

The reference is stateless — its only state is the slot LSN (SURVEY §0) and
its only "window" is the wall-clock flush ticker (producer_batch.go:53-60).
These operators are the engine-extension tier: event-time analytics over the
CDC envelope stream that Structured Streaming gives us natively.

Every helper works on BOTH batch and streaming DataFrames (F.window /
F.session_window are batch-legal), so each has a DuckDB-checkable batch twin
in the query registry while the streaming tests exercise watermarks and
incremental state.

Scale notes: windowed aggregation shuffles once on (window, keys); state
store size is bounded by the watermark (late rows beyond it are dropped and
their state evicted); ``applyInPandasWithState`` keeps per-key state in the
state store, Arrow-batched per group — no driver-side state anywhere.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    keys: Iterable[str] = ("event_type",),
    value_col: str | None = "value",
    watermark: str | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding/hopping) event-time window:
    count + decimal-exact value sum per (window, keys). With ``watermark``
    set (streaming), late rows beyond it are dropped and window state is
    evicted once the watermark passes. A sliding window assigns each row to
    duration/slide overlapping windows (that multiplier is the state-size
    cost to budget at scale)."""
    d = df.withWatermark(ts_col, watermark) if watermark else df
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(27,6)")).cast("double").alias("sum_value")
        )
    return (
        d.groupBy(F.window(ts_col, duration, slide).alias("w"), *keys)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "n",
            *(["sum_value"] if value_col is not None else []),
        )
    )


def session_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    keys: Iterable[str] = ("user_id",),
    value_col: str | None = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: rows of the same keys within ``gap`` of each other
    merge into one session (gaps-and-islands, engine-native)."""
    d = df.withWatermark(ts_col, watermark) if watermark else df
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(27,6)")).cast("double").alias("sum_value")
        )
    return (
        d.groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("session_start"),
            *keys,
            "n",
            *(["sum_value"] if value_col is not None else []),
        )
    )


def dedup_stream(
    df: DataFrame,
    keys: Iterable[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup on key columns; the watermark bounds the
    dedup-state retention (keys older than it are evicted — at 100 TB the
    state store would otherwise grow without bound)."""
    return df.withWatermark(ts_col, watermark).dropDuplicates(list(keys))


def dedup_stream_within_watermark(
    df: DataFrame,
    keys: Iterable[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dedup that only suppresses duplicates arriving within the
    watermark delay of the first sighting; once the watermark passes a key
    its state is evicted and the key may legitimately recur (CDC replay
    after a slot restart, periodic heartbeats). Unlike :func:`dedup_stream`
    the state size is bounded by the event-time horizon rather than by
    distinct-key cardinality — the property that keeps the state store
    finite on an unbounded 100 TB keyspace."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


# ---------------------------------------------------------------------------
# custom stateful operator: applyInPandasWithState
# ---------------------------------------------------------------------------

RUNNING_COUNT_SCHEMA = "table_name string, op string, events long, batches long"
_STATE_SCHEMA = "events long, batches long"


def _running_count_fn(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    events, batches = state.get if state.exists else (0, 0)
    n = 0
    for pdf in pdfs:
        n += len(pdf)
    events += n
    batches += 1
    state.update((events, batches))
    yield pd.DataFrame(
        {
            "table_name": [key[0]],
            "op": [key[1]],
            "events": [events],
            "batches": [batches],
        }
    )


def running_counts_stateful(df: DataFrame) -> DataFrame:
    """Per-(table, op) running event totals across micro-batches — the
    minimal custom stateful operator: state lives in the state store
    (checkpointed, partitioned by key), each group processes Arrow batches.
    The reference's closest analog is its per-topic Prometheus counters
    (kafka/producer/metric.go:75-111) — here the counts are exact, replayable
    state, not process-lifetime gauges."""
    return df.groupBy("table_name", "op").applyInPandasWithState(
        _running_count_fn,
        outputStructType=RUNNING_COUNT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


LWW_SCHEMA = (
    "table_name string, pk string, last_op string, last_lsn long, image string"
)
_LWW_STATE_SCHEMA = "last_op string, last_lsn long, image string"


def _lww_fn(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import json as _json

    last_op, last_lsn, image_json = (
        state.get if state.exists else (None, -1, None)
    )
    for pdf in pdfs:
        for op, lsn, after in zip(pdf["op"], pdf["lsn"], pdf["after"]):
            lsn = int(lsn)
            if lsn <= last_lsn:
                continue  # replayed or out-of-order older event: idempotent
            last_lsn, last_op = lsn, op
            image_json = (
                None
                if op == "DELETE" or after is None
                else _json.dumps(dict(after), sort_keys=True)
            )
    state.update((last_op, last_lsn, image_json))
    yield pd.DataFrame(
        {
            "table_name": [key[0]],
            "pk": [key[1]],
            "last_op": [last_op],
            "last_lsn": [last_lsn],
            "image": [image_json],
        }
    )


def lww_stateful(df: DataFrame, pk_field: str = "id") -> DataFrame:
    """Streaming last-write-wins materialization: the incremental form of
    ``operators.relational.lww_materialize`` (and of what every consumer of
    the reference's topic builds downstream — README.md:183-212 payloads
    keyed by pk). Per (table, pk) the state store keeps (last_op, last_lsn,
    image); each micro-batch emits the refreshed row in update mode; DELETE
    tombstones null the image. The ``lsn <= last_lsn`` guard makes the
    operator idempotent under at-least-once replay — re-delivered events
    can't regress the materialized row, which is exactly why the reference's
    ack-after-flush replay is safe for its consumers too.

    Scale: state is one small row per live key, hash-partitioned by
    (table, pk); Arrow-batched per group; no driver-side state."""
    keyed = df.withColumn(
        "pk",
        F.coalesce(
            F.col("after").getItem(pk_field), F.col("before").getItem(pk_field)
        ),
    )
    return keyed.groupBy("table_name", "pk").applyInPandasWithState(
        _lww_fn,
        outputStructType=LWW_SCHEMA,
        stateStructType=_LWW_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# stream-stream interval join
# ---------------------------------------------------------------------------

def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "30 minutes",
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two event-time streams on ``key`` where the right event lands in
    ``[left_ts, left_ts + max_delay]`` (impression→click attribution shape).

    The time bound is what makes an unbounded stream-stream join finite:
    with both sides watermarked AND the range condition, Spark derives the
    state eviction horizon — a buffered left row is dropped once the right
    watermark passes ``left_ts + max_delay`` (and vice versa), so state is
    O(window × rate), not O(stream). Works identically on batch DataFrames
    (watermarks become no-ops), which is how the test pins semantics.

    Scale: both sides shuffle on ``key`` once; the range predicate is
    evaluated inside the per-key state store, not as a post-join filter.
    ``left``/``right`` column names must be disjoint apart from ``key``.
    """
    l = left.withWatermark(left_ts, left_watermark)
    r = right.withWatermark(right_ts, right_watermark)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= F.expr(f"{left_ts} + interval {max_delay}"))
    )
    return l.join(r, cond, how).drop(r[key])


# ---------------------------------------------------------------------------
# custom stateful operator, Spark 4 API: transformWithStateInPandas
# ---------------------------------------------------------------------------


def running_counts_tws(df: DataFrame) -> DataFrame:
    """``running_counts_stateful`` on the Spark 4 ``transformWithState``
    API: typed per-key ValueState in the RocksDB state store instead of a
    single pickled tuple. Same semantics as the applyInPandasWithState
    version (kept for Spark 3.x-style deployments); new pipelines should
    prefer this one — it adds typed composite state, timers, and TTL.

    Requires ``spark.sql.streaming.stateStore.providerClass`` =
    RocksDBStateStoreProvider (transformWithState is RocksDB-only) and the
    ``protobuf`` Python package (the TWS state-server wire protocol;
    ``tws_available()`` reports whether this runtime has it).
    """
    return df.groupBy("table_name", "op").transformWithStateInPandas(
        _RunningCountsProcessor(),
        outputStructType=RUNNING_COUNT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


def tws_available() -> bool:
    """True when the runtime can execute transformWithStateInPandas: its
    state server speaks protobuf, so the ``protobuf`` package must be
    importable in the Python workers. When the real package is absent the
    vendored from-scratch shim (vendor/google/protobuf) is put on the
    path instead — protobuf-java inside the JVM is its conformance
    oracle, so a wire bug fails the query loudly rather than silently."""
    from go_pq_cdc_kafka_spark.session import _ensure_protobuf_path

    _ensure_protobuf_path()
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class _LwwProcessor(StatefulProcessor):
    """Module-level (picklable) processor for :func:`lww_tws` — the
    transformWithState twin of ``_lww_fn`` with identical semantics
    (``lsn <= last_lsn`` replay idempotence, DELETE tombstones)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("lww", _LWW_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        import json as _json

        if self._state.exists():
            last_op, last_lsn, image_json = self._state.get()
            last_lsn = int(last_lsn)
        else:
            last_op, last_lsn, image_json = None, -1, None
        for pdf in rows:
            for op, lsn, after in zip(pdf["op"], pdf["lsn"], pdf["after"]):
                lsn = int(lsn)
                if lsn <= last_lsn:
                    continue  # replayed/out-of-order older event
                last_lsn, last_op = lsn, op
                image_json = (
                    None
                    if op == "DELETE" or after is None
                    else _json.dumps(dict(after), sort_keys=True)
                )
        self._state.update((last_op, last_lsn, image_json))
        yield pd.DataFrame(
            {
                "table_name": [key[0]],
                "pk": [key[1]],
                "last_op": [last_op],
                "last_lsn": [last_lsn],
                "image": [image_json],
            }
        )

    def close(self) -> None:
        pass


def lww_tws(df: DataFrame, pk_field: str = "id") -> DataFrame:
    """:func:`lww_stateful` on the Spark 4 ``transformWithState`` API:
    typed per-key ValueState in RocksDB instead of a pickled tuple, plus
    the API surface new pipelines want (TTL, timers, composite state).
    Same output schema and replay idempotence; tools/stream_state_bench.py
    measures both variants side by side — SCALE.md records which one is
    the recommended bulk path at which rate."""
    keyed = df.withColumn(
        "pk",
        F.coalesce(
            F.col("after").getItem(pk_field), F.col("before").getItem(pk_field)
        ),
    )
    return keyed.groupBy("table_name", "pk").transformWithStateInPandas(
        _LwwProcessor(),
        outputStructType=LWW_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


class _RunningCountsProcessor(StatefulProcessor):
    """Module-level (picklable) processor for :func:`running_counts_tws`."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("counts", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        prior = self._state.get() if self._state.exists() else (0, 0)
        events, batches = int(prior[0]), int(prior[1])
        n = 0
        for pdf in rows:
            n += len(pdf)
        events, batches = events + n, batches + 1
        self._state.update((events, batches))
        yield pd.DataFrame(
            {
                "table_name": [key[0]],
                "op": [key[1]],
                "events": [events],
                "batches": [batches],
            }
        )

    def close(self) -> None:
        pass
