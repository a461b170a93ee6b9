"""End-to-end pipeline assembly: source → handler → routing → records → sink.

The Spark re-expression of the reference main loop (connector.go:80-184 +
kafka/producer/*): a streaming (or batch) envelope DataFrame flows through
the user handler, topic routing, and record shaping, then into a sink with a
checkpoint. The checkpoint's offset commit after sink success reproduces the
reference's ack contract (B4, producer_batch.go:141-151): failed micro-batch
⇒ no commit ⇒ replay ⇒ at-least-once.

Ordering (SURVEY §4 "needs care"): within a micro-batch the Kafka sink writes
from parallel tasks, so global order is not preserved — the same real
guarantee as the reference gives per-key (key → partition). For strict
per-table WAL order, ``strict_order=True`` sorts each micro-batch by LSN and
produces from a single task via foreachBatch (documented cost: no sink-side
parallelism, exactly like the reference's single-threaded listener).
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass, field as dc_field
from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from go_pq_cdc_kafka_spark import handler as H
from go_pq_cdc_kafka_spark.envelope import filter_known_ops
from go_pq_cdc_kafka_spark.plans.routing import RoutingTable, resolve_topics
from go_pq_cdc_kafka_spark.streaming.kafka import KafkaProducerConfig, parse_size


# ---------------------------------------------------------------------------
# single-writer checkpoint guard (M2 failover parity)
# ---------------------------------------------------------------------------

#: checkpoint dir → the query currently writing through it (this process).
_ACTIVE_WRITERS: dict[str, StreamingQuery] = {}
_WRITERS_LOCK = threading.Lock()
_LOCK_FILE = "_writer.lock"


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except OSError:
        return False
    return True


def _acquire_checkpoint(checkpoint_location: str) -> str:
    """Refuse a second concurrent writer on one checkpoint dir.

    The reference's replication slot admits exactly one streamer — a second
    instance blocks until it can take the slot over (README.md:36-42). Spark
    has no broker-side arbiter, and two queries sharing a checkpoint corrupt
    offsets silently, so this guard enforces the slot semantics at start
    time: in-process via the active-writer registry, cross-process via a pid
    lock file inside the checkpoint dir (a lock held by a dead pid counts as
    released — that IS the takeover path)."""
    path = os.path.abspath(checkpoint_location)
    with _WRITERS_LOCK:
        q = _ACTIVE_WRITERS.get(path)
        if q is not None and q.isActive:
            raise RuntimeError(
                f"checkpoint {path!r} already has an active writer "
                f"(query id {q.id}); stop it before starting another — "
                "one checkpoint dir admits one writer, like the reference's "
                "replication slot (README.md:36-42)"
            )
        lock_path = os.path.join(path, _LOCK_FILE)
        if os.path.exists(lock_path):
            try:
                with open(lock_path) as f:
                    holder = int(f.read().split()[0])
            except (ValueError, OSError, IndexError):
                holder = None
            if holder is not None and holder != os.getpid() and _pid_alive(holder):
                raise RuntimeError(
                    f"checkpoint {path!r} is locked by live process {holder}; "
                    "refusing a second writer (dead holders are taken over "
                    "automatically)"
                )
        os.makedirs(path, exist_ok=True)
        with open(lock_path, "w") as f:
            f.write(f"{os.getpid()}\n")
    return path


def _guarded_start(
    checkpoint_location: str, start: Callable[[], StreamingQuery]
) -> StreamingQuery:
    path = _acquire_checkpoint(checkpoint_location)
    try:
        query = start()
    except BaseException:
        with _WRITERS_LOCK:
            _ACTIVE_WRITERS.pop(path, None)
        raise
    with _WRITERS_LOCK:
        _ACTIVE_WRITERS[path] = query
    return query


#: per-task produce result: row count plus the stage decomposition the
#: bottleneck hunt reads (pull = upstream decode/transform wait, marshal =
#: row assembly, send = wire encode + broker RTT, txn = KIP-98 RPCs)
_PRODUCE_SCHEMA = (
    "produced long, t_pull double, t_marshal double, t_send double, "
    "t_txn double"
)


def _collect_produced(acked: DataFrame) -> int:
    """Run the produce plan, propagate failures, return the row total.
    With SB_PROFILE=1 also print one JSON line aggregating the per-task
    stage timers (sums across tasks — divide by task count for means)."""
    row = acked.agg(
        F.sum("produced").alias("n"),
        F.sum("t_pull").alias("pull"),
        F.sum("t_marshal").alias("marshal"),
        F.sum("t_send").alias("send"),
        F.sum("t_txn").alias("txn"),
        F.count(F.lit(1)).alias("tasks"),
    ).first()
    if os.environ.get("SB_PROFILE") == "1":
        import json as _json

        print(
            "SB_PROFILE " + _json.dumps(
                {
                    "produced": row.n,
                    "tasks": row.tasks,
                    "t_pull_sum": round(row.pull or 0.0, 3),
                    "t_marshal_sum": round(row.marshal or 0.0, 3),
                    "t_send_sum": round(row.send or 0.0, 3),
                    "t_txn_sum": round(row.txn or 0.0, 3),
                }
            ),
            flush=True,
        )
    return row.n or 0


def _wire_produce_fn(
    wire_kwargs: dict,
    batch_caps: tuple[int, int],
    eos_group: str | None = None,
    eos_filter: bool = False,
):
    """Executor-side produce closure for ``mapInPandas`` over the record
    frame ``(topic, key, value[, headers])``. Flushes a produce request at
    the reference's B2 caps (producer_batch.go:73-104): ≥ ``max_count``
    records OR ≥ ``max_bytes`` accumulated key+value bytes.

    With ``eos_group`` set, rows additionally carry their source lineage
    (``src_topic``, ``src_partition``, ``src_offset``) and the task stages
    ``max(src_offset)+1`` per source partition into its transaction via
    TxnOffsetCommit before committing — the consume-transform-produce
    exactly-once shape (KIP-98): source positions and output become
    visible atomically, or neither does.

    ``eos_filter`` additionally makes the task DROP rows whose
    ``src_offset`` sits below the group's committed position for their
    source partition (OffsetFetch at task start, cached per partition).
    This is what turns transactional produce into exactly-once for a
    REPLAYED micro-batch: after a cold kill, Spark re-runs the last
    un-checkpointed batch, and without the filter every transaction that
    COMMITTED on the first attempt would commit its rows a second time.
    With it, the committed watermark (staged atomically with the first
    attempt's rows) masks exactly the rows that are already visible —
    the Kafka Streams EOS recipe, generalized to any source whose
    lineage offsets are monotone per partition across batches (a CDC
    stream's LSN is)."""
    max_count, max_bytes = batch_caps

    def produce(iterator):
        import time as _time

        import pandas as pd

        from go_pq_cdc_kafka_spark.streaming.kafka_wire import KafkaWireProducer

        # stage accounting (SB_PROFILE=1): where does the micro-batch wall
        # go INSIDE addBatch? t_pull = waiting on the upstream iterator
        # (source read + pgoutput decode + envelope/routing transforms all
        # surface here — mapInPandas is pull-based, so upstream cost is
        # the gap between Arrow batches), t_marshal = the row-assembly
        # loop, t_send = send_records (wire encode + broker RTT + acks),
        # t_txn = KIP-98 RPC overhead. Timer calls are per-Arrow-batch and
        # per-flush, so the accounting itself costs microseconds per
        # 10k-row batch.
        t_pull = t_marshal = t_send = t_txn = 0.0

        kwargs = dict(wire_kwargs)
        txn_prefix = kwargs.pop("transactional_id", None)
        if txn_prefix is not None:
            # one transaction per task, id = prefix-<task partition>: a
            # failed task's retry re-uses the id, so its InitProducerId
            # fences the stale attempt and aborts its open transaction —
            # read_committed consumers never see partial task output
            from pyspark import TaskContext

            ctx = TaskContext.get()
            kwargs["transactional_id"] = (
                f"{txn_prefix}-{ctx.partitionId() if ctx else 0}"
            )

        prod = None
        total = 0
        pending: list = []
        pending_bytes = 0
        committed = False
        nexts: dict[tuple[str, int], int] = {}  # eos: (src topic, part) → next
        floors: dict[tuple[str, int], int] = {}  # eos_filter: committed pos

        def floor_of(st: str, sp: int) -> int:
            k = (st, sp)
            if k not in floors:
                from go_pq_cdc_kafka_spark.streaming.kafka_wire import (
                    KafkaWireConsumer,
                )

                with KafkaWireConsumer(kwargs["bootstrap"]) as c:
                    floors[k] = c.fetch_committed(eos_group, st, [sp]).get(
                        sp, -1
                    )
            return floors[k]

        def flush():
            nonlocal pending, pending_bytes, total, t_send
            if pending:
                _t0 = _time.perf_counter()
                prod.send_records(pending)
                t_send += _time.perf_counter() - _t0
                total += len(pending)
                pending = []
                pending_bytes = 0

        def timed_pull(it):
            nonlocal t_pull
            while True:
                _t0 = _time.perf_counter()
                try:
                    item = next(it)
                except StopIteration:
                    t_pull += _time.perf_counter() - _t0
                    return
                t_pull += _time.perf_counter() - _t0
                yield item

        try:
            for pdf in timed_pull(iter(iterator)):
                if len(pdf) == 0:
                    continue
                if prod is None:
                    # first-batch producer construction (socket + API
                    # negotiation + InitProducerId) and begin_transaction
                    # are KIP-98/RPC cost, not row assembly — book them
                    # under t_txn so t_marshal stays comparable across
                    # rounds (round-11 advice: the init branch inside the
                    # _tm0 window skewed the stage attribution).
                    _in0 = _time.perf_counter()
                    prod = KafkaWireProducer(**kwargs)
                    if kwargs.get("transactional_id") is not None:
                        prod.begin_transaction()
                    t_txn += _time.perf_counter() - _in0
                _tm0, _snd0 = _time.perf_counter(), t_send
                if eos_group is not None:
                    if eos_filter:
                        import numpy as np

                        mask = np.ones(len(pdf), dtype=bool)
                        for st, sp in {
                            (st, int(sp))
                            for st, sp in zip(
                                pdf["src_topic"].tolist(),
                                pdf["src_partition"].tolist(),
                            )
                        }:
                            flo = floor_of(st, sp)
                            if flo > 0:
                                mask &= ~(
                                    (pdf["src_topic"] == st)
                                    & (pdf["src_partition"] == sp)
                                    & (pdf["src_offset"] < flo)
                                ).to_numpy()
                        if not mask.all():
                            pdf = pdf[mask]
                            if len(pdf) == 0:
                                continue
                    for st, sp, so in zip(
                        pdf["src_topic"].tolist(),
                        pdf["src_partition"].tolist(),
                        pdf["src_offset"].tolist(),
                    ):
                        k = (st, int(sp))
                        nxt = int(so) + 1
                        if nxt > nexts.get(k, 0):
                            nexts[k] = nxt
                cols = [pdf["topic"].tolist(), pdf["key"].tolist(),
                        pdf["value"].tolist()]
                heads = (
                    pdf["headers"].tolist()
                    if "headers" in pdf.columns
                    else [None] * len(pdf)
                )
                for topic, key, value, hs in zip(*cols, heads):
                    key = None if key is None else bytes(key)
                    value = None if value is None else bytes(value)
                    headers = (
                        []
                        if hs is None
                        else [
                            (h["key"], None if h["value"] is None else bytes(h["value"]))
                            for h in hs
                        ]
                    )
                    pending.append((topic, key, value, headers))
                    pending_bytes += len(key or b"") + len(value or b"")
                    if len(pending) >= max_count or pending_bytes >= max_bytes:
                        flush()
                # body time minus whatever flush() spent sending inside it
                t_marshal += (_time.perf_counter() - _tm0) - (t_send - _snd0)
            if prod is not None:
                flush()
                _tx0 = _time.perf_counter()
                if eos_group is not None:
                    by_topic: dict[str, dict[int, int]] = {}
                    for (st, sp), nxt in nexts.items():
                        by_topic.setdefault(st, {})[sp] = nxt
                    for st, offs in sorted(by_topic.items()):
                        prod.send_offsets_to_transaction(eos_group, st, offs)
                if kwargs.get("transactional_id") is not None:
                    prod.commit_transaction()
                t_txn += _time.perf_counter() - _tx0
            committed = True
        finally:
            if prod is not None:
                if not committed and kwargs.get("transactional_id") is not None:
                    try:
                        prod.abort_transaction()
                    except Exception:
                        pass  # fencing by the retry also cleans this up
                prod.close()
        yield pd.DataFrame(
            {
                "produced": [total],
                "t_pull": [round(t_pull, 4)],
                "t_marshal": [round(t_marshal, 4)],
                "t_send": [round(t_send, 4)],
                "t_txn": [round(t_txn, 4)],
            }
        )

    return produce


def write_kafka_wire(
    records_df: DataFrame,
    cfg: KafkaProducerConfig,
    strict_order: bool = False,
    order_col: str = "lsn",
) -> int:
    """Batch produce of a record frame ``(topic, key, value[, headers])``
    through the wire producer; returns the produced-record count. The batch
    twin of ``CdcPipeline.to_kafka_wire`` (and what its foreachBatch does
    per micro-batch)."""
    df = ordered_records(records_df, order_col) if strict_order else records_df
    wire_kwargs = cfg.wire_kwargs()
    caps = (cfg.producer_batch_size, parse_size(cfg.producer_batch_bytes))
    acked = df.mapInPandas(_wire_produce_fn(wire_kwargs, caps), schema=_PRODUCE_SCHEMA)
    return int(_collect_produced(acked))


def write_kafka_wire_eos(
    records_df: DataFrame,
    cfg: KafkaProducerConfig,
    group: str,
    align: str = "repartition",
) -> int:
    """Exactly-once consume-transform-produce (KIP-98): batch produce of a
    record frame that also carries its source lineage — ``src_topic``,
    ``src_partition``, ``src_offset`` (rename the ``kafkawire`` source's
    ``topic``/``partition``/``offset`` before adding output columns). Each
    task produces inside one transaction and stages ``max(src_offset)+1``
    per source partition into it, so the group's read positions and the
    output commit atomically: re-running the loop (with the source reading
    ``startingoffsets="committed"``, same ``group``) reprocesses nothing a
    committed transaction covered, and an aborted task's offsets never
    advance. This upgrades the reference's publish-then-ack loop
    (consumer.go:141-157 — at-least-once across a crash between publish
    and ack) to exactly-once.

    Contract (the Kafka Streams EOS topology shape): a source partition's
    offsets must ride exactly ONE task's transaction — if two tasks hold
    pieces of one partition's range, a later-range task can commit and
    advance the group past an earlier-range task that aborted, silently
    skipping records on committed-resume. ``align`` controls how that
    premise is enforced:

    - ``"repartition"`` (default, always safe): hash-repartition on
      ``(src_topic, src_partition)`` and sort within partitions by
      ``src_offset``, so each source partition's whole batch range rides
      one task and is produced in offset order — correct even when the
      ``kafkawire`` source's ``minpartitions`` option split the range, or
      an upstream shuffle scattered it. Costs one exchange per batch.
    - ``"assume"`` (zero-shuffle fast path): the caller guarantees the
      chain is narrow — only map-side ops between a source that plans one
      task per source partition and this sink, and in particular that the
      source was NOT configured with ``minpartitions``. Nothing verifies
      this; use only when you own the whole read→transform→write chain.

    Rows filtered out by the transform don't advance offsets beyond
    ``max(src_offset)+1`` of the surviving rows (a trailing filtered run
    is re-read next run and filtered again — idempotent, never
    duplicated)."""
    if align not in ("repartition", "assume"):
        raise ValueError(f"align must be 'repartition' or 'assume', got {align!r}")
    if cfg.transactional_id is None:
        raise ValueError(
            "write_kafka_wire_eos requires cfg.transactional_id — offsets "
            "can only be staged inside a transaction"
        )
    missing = {"src_topic", "src_partition", "src_offset"} - set(
        records_df.columns
    )
    if missing:
        raise ValueError(
            f"records_df lacks source lineage columns {sorted(missing)}; "
            "rename the kafkawire source's topic/partition/offset columns"
        )
    if align == "repartition":
        records_df = _align_by_source(records_df)
    wire_kwargs = cfg.wire_kwargs()
    caps = (cfg.producer_batch_size, parse_size(cfg.producer_batch_bytes))
    acked = records_df.mapInPandas(
        _wire_produce_fn(wire_kwargs, caps, eos_group=group),
        schema=_PRODUCE_SCHEMA,
    )
    return int(_collect_produced(acked))


def _align_by_source(records_df: DataFrame) -> DataFrame:
    """One task per source partition: hash-repartition on the lineage key
    and restore per-partition offset order. Partition count is inherited
    (``spark.sql.shuffle.partitions`` / AQE coalescing); several whole
    source partitions sharing a task is fine — a split one never is."""
    return records_df.repartition(
        F.col("src_topic"), F.col("src_partition")
    ).sortWithinPartitions("src_topic", "src_partition", "src_offset")


def ordered_records(batch_df: DataFrame, order_col: str = "lsn") -> DataFrame:
    """Strict-order produce shape: one partition, rows sorted by the WAL
    position (``lsn``), the ordering column dropped before the write.

    This is the Spark analogue of the reference's single-threaded listener
    ordering contract (connector.go:129-184 dispatches events in WAL order;
    producer_batch.go:150 appends in arrival order): the produced sequence
    within a micro-batch IS changelog order. ``coalesce(1)`` first and
    ``sortWithinPartitions`` second so the sort is the last exchange-free
    node before the write — nothing downstream can re-shuffle it away.
    """
    return batch_df.coalesce(1).sortWithinPartitions(order_col).drop(order_col)


@dataclass
class CdcPipeline:
    """Composable pipeline over an envelope DataFrame (stream or batch).

    ``handlers`` are DataFrame→DataFrame transforms applied in order (the
    reference's single Handler callback generalized to a chain); they may
    add a ``handler_topic`` column to override routing per event
    (connector.go:186-192)."""

    source: DataFrame
    routing: RoutingTable = dc_field(default_factory=RoutingTable)
    handlers: list[Callable[[DataFrame], DataFrame]] = dc_field(default_factory=list)
    pk_field: str = "id"
    include_headers: bool = True

    def records(self, carry_cols: tuple[str, ...] = ()) -> DataFrame:
        df = filter_known_ops(self.source)
        has_override = False
        for h in self.handlers:
            df = h(df)
        has_override = "handler_topic" in df.columns
        df = resolve_topics(
            df,
            self.routing,
            handler_topic_col="handler_topic" if has_override else None,
        )
        if has_override:
            df = df.drop("handler_topic")
        return H.to_kafka_records(
            df,
            pk_field=self.pk_field,
            include_headers=self.include_headers,
            carry_cols=carry_cols,
        )

    # ------------------------------------------------------------------
    # sinks
    # ------------------------------------------------------------------

    def to_kafka(
        self,
        cfg: KafkaProducerConfig,
        checkpoint_location: str,
        strict_order: bool = False,
        default_topic: str | None = None,
    ) -> StreamingQuery:
        """Streaming Kafka sink with checkpoint-commit ack semantics."""
        rec = self.records(carry_cols=("lsn",) if strict_order else ())
        if default_topic is not None:
            rec = rec.withColumn(
                "topic", F.coalesce(F.col("topic"), F.lit(default_topic))
            )
        writer_opts = cfg.sink_options(checkpoint_location)
        if not strict_order:
            return _guarded_start(
                checkpoint_location,
                lambda: (
                    rec.writeStream.format("kafka")
                    .options(**writer_opts)
                    .trigger(**cfg.trigger_kwargs())
                    .start()
                ),
            )

        # strict WAL order: carry lsn, sort + single-task produce per batch
        kafka_opts = {
            k: v
            for k, v in writer_opts.items()
            if k.startswith("kafka.") or k == "includeHeaders"
        }

        def produce_sorted(batch_df: DataFrame, _batch_id: int) -> None:
            (
                ordered_records(batch_df)
                .write.format("kafka")
                .options(**kafka_opts)
                .save()
            )

        return _guarded_start(
            checkpoint_location,
            lambda: (
                rec.writeStream.foreachBatch(produce_sorted)
                .option("checkpointLocation", checkpoint_location)
                .trigger(**cfg.trigger_kwargs())
                .start()
            ),
        )

    def to_kafka_wire(
        self,
        cfg: KafkaProducerConfig,
        checkpoint_location: str,
        strict_order: bool = False,
        default_topic: str | None = None,
        trigger: dict | None = None,
        ordering: str | None = None,
    ) -> StreamingQuery:
        """Streaming sink through the from-scratch wire producer
        (streaming/kafka_wire.py) — no spark-sql-kafka jar required.

        Executor-parallel: each task of the micro-batch opens its own
        producer (the shape a multi-node Java-client deployment has anyway)
        and produces its Arrow batches; a failed task fails the micro-batch,
        so the checkpoint does not commit and the batch replays — the same
        at-least-once ack contract as ``to_kafka`` (producer_batch.go:141-151).

        ``ordering`` picks the delivery-order contract:

        - ``None``    — task-parallel, no cross-task order (what the
          jar-backed sink gives). Within one task records stay in plan
          order.
        - ``"key"``   — the REFERENCE'S REAL GUARANTEE (single-threaded
          listener → kafka-go key hashing, README.md:36-42): all events of
          one key arrive in WAL order on one Kafka partition. One extra
          shuffle (repartition by key) + an in-task LSN sort buys it while
          KEEPING sink-side parallelism — strictly stronger than the
          jar-backed sink, which cannot sort inside the producer.
        - ``"total"`` — strict global WAL order through ONE sorted task
          (the documented single-writer cost; ``strict_order=True`` is the
          legacy spelling).
        """
        if strict_order:
            ordering = "total"
        if ordering not in (None, "key", "total"):
            raise ValueError(f"ordering must be None|'key'|'total', got {ordering!r}")
        rec = self.records(carry_cols=("lsn",) if ordering else ())
        if default_topic is not None:
            rec = rec.withColumn(
                "topic", F.coalesce(F.col("topic"), F.lit(default_topic))
            )
        wire_kwargs = cfg.wire_kwargs()  # validate config at assembly time
        batch_caps = (cfg.producer_batch_size, parse_size(cfg.producer_batch_bytes))

        def produce_batch(batch_df: DataFrame, _batch_id: int) -> None:
            if ordering == "total":
                df = ordered_records(batch_df)
            elif ordering == "key":
                # same key → same task → same murmur2 partition, LSN-sorted
                # within the task ⇒ per-key WAL order on the broker
                df = (
                    batch_df.repartition(F.col("topic"), F.col("key"))
                    .sortWithinPartitions("lsn")
                    .drop("lsn")
                )
            else:
                df = batch_df
            acked = df.mapInPandas(
                _wire_produce_fn(wire_kwargs, batch_caps),
                schema=_PRODUCE_SCHEMA,
            )
            _collect_produced(acked)  # run + propagate failures

        return _guarded_start(
            checkpoint_location,
            lambda: (
                rec.writeStream.foreachBatch(produce_batch)
                .option("checkpointLocation", checkpoint_location)
                .trigger(**(trigger or cfg.trigger_kwargs()))
                .start()
            ),
        )

    def to_kafka_wire_eos(
        self,
        cfg: KafkaProducerConfig,
        checkpoint_location: str,
        group: str,
        progress_partitions: int = 64,
        default_topic: str | None = None,
        trigger: dict | None = None,
    ) -> StreamingQuery:
        """Exactly-once streaming produce (KIP-98) for the CDC loop — the
        measured upgrade over ``to_kafka_wire``'s at-least-once contract
        (the reference's own contract, producer_batch.go:141-151: a crash
        between publish and ack replays the batch).

        How exactly-once survives a micro-batch REPLAY (the cold-kill
        case): records are hash-aligned into ``progress_partitions``
        deterministic lineage partitions (``xxhash64(key)`` — stable
        across replays), each task produces its slice inside ONE
        transaction and stages ``max(lsn)+1`` per lineage partition into
        the consumer group via TxnOffsetCommit, so the watermark commits
        atomically with the rows. On replay, every task first reads the
        group's committed watermark and drops rows below it — a first
        attempt that committed contributes nothing twice, one that
        aborted left no watermark (and no visible rows) and reproduces
        everything. Correctness rests on two properties this pipeline
        has by construction: micro-batches are LSN-ordered slices of the
        WAL (batch N's offsets all exceed batch N-1's), and a batch's
        record set is a deterministic function of its checkpointed frame
        range. ``read_committed`` consumers therefore see every change
        event exactly once across crashes on either side of the sink.

        The per-task transactional id is ``cfg.transactional_id`` +
        the task partition, stable across retries, so InitProducerId
        FENCES a zombie first attempt (its open transaction aborts)
        before the retry produces."""
        if cfg.transactional_id is None:
            raise ValueError(
                "to_kafka_wire_eos requires cfg.transactional_id"
            )
        rec = self.records(carry_cols=("lsn",))
        if default_topic is not None:
            rec = rec.withColumn(
                "topic", F.coalesce(F.col("topic"), F.lit(default_topic))
            )
        progress_topic = f"{group}.progress"
        wire_kwargs = cfg.wire_kwargs()  # validate config at assembly time
        batch_caps = (
            cfg.producer_batch_size, parse_size(cfg.producer_batch_bytes)
        )

        def produce_batch(batch_df: DataFrame, _batch_id: int) -> None:
            df = (
                batch_df.withColumn("src_topic", F.lit(progress_topic))
                .withColumn(
                    "src_partition",
                    F.pmod(
                        F.xxhash64(F.col("key")),
                        F.lit(progress_partitions),
                    ).cast("int"),
                )
                .withColumn("src_offset", F.col("lsn"))
                .drop("lsn")
            )
            acked = _align_by_source(df).mapInPandas(
                _wire_produce_fn(
                    wire_kwargs, batch_caps, eos_group=group, eos_filter=True
                ),
                schema=_PRODUCE_SCHEMA,
            )
            _collect_produced(acked)  # run + propagate failures

        return _guarded_start(
            checkpoint_location,
            lambda: (
                rec.writeStream.foreachBatch(produce_batch)
                .option("checkpointLocation", checkpoint_location)
                .trigger(**(trigger or cfg.trigger_kwargs()))
                .start()
            ),
        )

    def to_parquet(
        self, path: str, checkpoint_location: str, trigger: dict | None = None
    ) -> StreamingQuery:
        """File sink (exactly-once) — the test-tier stand-in for Kafka and the
        lake-landing production path."""
        w = (
            self.records()
            .writeStream.format("parquet")
            .option("path", path)
            .option("checkpointLocation", checkpoint_location)
        )
        if trigger:
            w = w.trigger(**trigger)
        return _guarded_start(checkpoint_location, w.start)

    def to_memory(self, name: str, trigger: dict | None = None) -> StreamingQuery:
        w = self.records().writeStream.format("memory").queryName(name)
        if trigger:
            w = w.trigger(**trigger)
        return w.start()

    def run_batch(self) -> DataFrame:
        """snapshot_only mode (connector.go:80-94): the same lineage, bounded;
        returns the record DataFrame for a batch write."""
        return self.records()
