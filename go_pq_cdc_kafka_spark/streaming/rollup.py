"""Incremental continuous aggregate: stream-maintained fine rollup tier.

The batch half lives in ``operators/timeseries.py`` (``rollup_fine`` /
``rollup_coarse``); this module keeps the fine tier current as events
stream in — the Spark analogue of a TimescaleDB continuous aggregate
refresh policy (the reference's users are hypertable users,
connector.go:204-209).

Design: each micro-batch is reduced to its OWN algebraic partials
(n / decimal sum / min / max per (bucket, keys)) and appended — never
merged in place. Because every statistic is re-aggregable, readers merge
partials at query time with one tiny groupBy over the partial store,
which is orders of magnitude smaller than the raw stream (one row per
bucket-key per batch, vs one per event).

Why append-only instead of upsert: an upsert sink needs a mutable table
format; appends are format-agnostic (plain parquet here), idempotent to
replay at the partial level (each batch lands under its own ``_batch_id``,
so a checkpoint-replayed batch overwrites nothing and a reader can
de-duplicate on it if the sink ever double-lands), and compaction is a
standard maintenance pass (``operators/maintenance.py``) that re-reduces
partials without touching raw data — exactly how the fine tier stays
small at 100 TB of raw events.

foreachBatch writes plain batch appends (NOT a streaming parquet sink):
a streaming sink's ``_spark_metadata`` log would hide files written by
any batch compactor sharing the directory (see streaming/handoff.py).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from go_pq_cdc_kafka_spark.operators import timeseries as TS


def stream_fine_rollup(
    events: DataFrame,
    out_path: str,
    checkpoint: str,
    ts_col: str = "ts",
    step_seconds: int = 900,
    keys: Sequence[str] = ("event_type",),
    value_col: str = "value",
) -> StreamingQuery:
    """Start a stream that maintains the fine-partial store at
    ``out_path``. The caller owns stopping the query."""
    keys = list(keys)

    def _land(batch_df: DataFrame, batch_id: int) -> None:
        part = TS.rollup_fine(
            batch_df, ts_col, step_seconds, keys, value_col
        ).withColumn("_batch_id", F.lit(batch_id))
        part.write.mode("append").parquet(out_path)

    return (
        events.writeStream.foreachBatch(_land)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def stream_histogram_sketches(
    events: DataFrame,
    out_path: str,
    checkpoint: str,
    cell_cols: Sequence[str],
    value_cents_col: str,
    width_cents: int,
    nbins: int,
) -> StreamingQuery:
    """Stream-maintained histogram-sketch store: each micro-batch reduces
    to its own (cell, bin, n) partial and appends — the quantile twin of
    :func:`stream_fine_rollup`, with the same append-only/idempotent
    rationale. Counts are integers, so the merged store equals the batch
    histogram of the undivided stream BIT-FOR-BIT (pin in tests), a
    stronger guarantee than the HLL tier can make."""
    cells = list(cell_cols)

    def _land(batch_df: DataFrame, batch_id: int) -> None:
        from go_pq_cdc_kafka_spark.operators import sketches as SKCH

        part = SKCH.histogram_cell_sketches(
            batch_df, cells, F.col(value_cents_col), width_cents, nbins
        ).withColumn("_batch_id", F.lit(batch_id))
        part.write.mode("append").parquet(out_path)

    return (
        events.writeStream.foreachBatch(_land)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_histogram_sketches(
    spark: SparkSession, path: str, cell_cols: Sequence[str]
) -> DataFrame:
    """Merge the streamed partial store into the canonical histogram."""
    from go_pq_cdc_kafka_spark.operators import sketches as SKCH

    return SKCH.histogram_rollup(spark.read.parquet(path), list(cell_cols))


def read_fine_rollup(
    spark: SparkSession,
    path: str,
    keys: Sequence[str] = ("event_type",),
    bucket_name: str = "bucket",
) -> DataFrame:
    """Merge the partial store back into the canonical fine rollup —
    bit-identical to ``rollup_fine`` over the full raw history, because
    every partial statistic is algebraic (decimal sums re-accumulate
    exactly; count/min/max trivially)."""
    parts = spark.read.parquet(path)
    return parts.groupBy(bucket_name, *keys).agg(
        F.sum("n").cast("bigint").alias("n"),
        # rollup_fine emits sum(decimal(27,6)) = decimal(37,6); cast the
        # re-merged sum back to that type so merged == rollup_fine exactly
        F.sum("_dec_sum").cast("decimal(37,6)").alias("_dec_sum"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )
