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

from dataclasses import dataclass, field as dc_field
from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from go_pq_cdc_kafka_spark import handler as H
from go_pq_cdc_kafka_spark.envelope import filter_known_ops
from go_pq_cdc_kafka_spark.plans.routing import RoutingTable, resolve_topics
from go_pq_cdc_kafka_spark.streaming.kafka import KafkaProducerConfig


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
            return (
                rec.writeStream.format("kafka")
                .options(**writer_opts)
                .trigger(**cfg.trigger_kwargs())
                .start()
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

        return (
            rec.writeStream.foreachBatch(produce_sorted)
            .option("checkpointLocation", checkpoint_location)
            .trigger(**cfg.trigger_kwargs())
            .start()
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
        return w.start()

    def to_memory(self, name: str, trigger: dict | None = None) -> StreamingQuery:
        w = self.records().writeStream.format("memory").queryName(name)
        if trigger:
            w = w.trigger(**trigger)
        return w.start()

    def run_batch(self) -> DataFrame:
        """snapshot_only mode (connector.go:80-94): the same lineage, bounded;
        returns the record DataFrame for a batch write."""
        return self.records()
