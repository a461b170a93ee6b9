"""Stream-maintained incremental view: signed-delta aggregate over a CDC
changelog.

The rollup tier (streaming/rollup.py) maintains aggregates over an
INSERT-ONLY event stream; this module is its changelog counterpart — the
stream carries updates and deletes, so each event contributes a SIGNED
delta to the maintained view (the retraction/insertion algebra used by
Flink changelog aggregation and Materialize):

    insert / snapshot read  →  (+1, +value)
    update                  →  ( 0, new − old)
    delete                  →  (−1, −old)

Pre-images (`old`) must arrive ON the event — the REPLICA IDENTITY FULL
contract the reference's source honors (reference README replica-identity
docs; S4 in SURVEY §2) and envelope.py projects. With pre-images on the
event, the algebra is fully COMMUTATIVE: micro-batch boundaries, batch
order, and partition order are all irrelevant to the merged result, a
strictly stronger replay story than LWW (which needs per-key ordering).

Landing shape matches the rollup tier on purpose: each micro-batch
reduces to its OWN per-group partial (count delta, decimal sum delta) and
APPENDS under its `_batch_id` — O(Δ) per batch regardless of accumulated
view size, format-agnostic plain parquet, idempotent to replay at the
partial level, compactable by re-reduction. Readers merge partials with
one tiny groupBy at query time.

All value arithmetic runs in decimal(27,6), where `a + (b − a) == b`
holds exactly — the merged view equals a from-scratch recompute over the
final table state bit-for-bit (pinned in tests/test_ivm.py against the
same recompute the `cdc_incremental_agg` registry oracle uses).

Batch half: `queries.cdc_incremental_agg` (one-shot, pre-images via LAG).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

_DEC = "decimal(27,6)"

#: op spellings that count as "row came into existence" (pgoutput INSERT,
#: Debezium 'c', snapshot/backfill reads 'r'/SNAPSHOT — envelope.py ops)
_INSERT_OPS = ("INSERT", "SNAPSHOT", "c", "r")
_UPDATE_OPS = ("UPDATE", "u")
_DELETE_OPS = ("DELETE", "d")


def changelog_delta_partials(
    batch: DataFrame,
    keys: Sequence[str | Column],
    value_col: str = "value",
    pre_col: str = "pre_value",
    op_col: str = "op",
) -> DataFrame:
    """Reduce one changelog slice to per-group signed-delta partials
    ``(keys…, cnt_delta, sum_delta)``. Pure batch function — usable
    one-shot or inside foreachBatch; partials from any partition of the
    changelog sum to the same view (commutative algebra, see module doc).
    """
    op = F.col(op_col)
    # Both images coalesce to 0 so NULL transitions retract correctly:
    # UPDATE x→NULL must emit -x (a recompute's SUM skips the NULL), and
    # INSERT/DELETE of a NULL value must contribute 0 — an uncoalesced
    # val makes `val - pre` NULL, which F.sum silently drops, leaving
    # the maintained view stuck at the pre-image.
    val = F.coalesce(F.col(value_col).cast(_DEC), F.lit(0).cast(_DEC))
    pre = F.coalesce(F.col(pre_col).cast(_DEC), F.lit(0).cast(_DEC))
    cnt = (
        F.when(op.isin(*_DELETE_OPS), F.lit(-1))
        .when(op.isin(*_UPDATE_OPS), F.lit(0))
        .when(op.isin(*_INSERT_OPS), F.lit(1))
        .otherwise(F.lit(0))  # Begin/Commit/Relation/Truncate: dropped (S2)
        .cast("long")
    )
    delta = (
        F.when(op.isin(*_DELETE_OPS), -pre)
        .when(op.isin(*_UPDATE_OPS), val - pre)
        .when(op.isin(*_INSERT_OPS), val)
        .otherwise(F.lit(0).cast(_DEC))
    )
    return (
        batch.groupBy(*keys)
        .agg(
            F.sum(cnt).alias("cnt_delta"),
            F.sum(delta).cast(_DEC).alias("sum_delta"),
        )
    )


def stream_ivm_view(
    changelog: DataFrame,
    out_path: str,
    checkpoint: str,
    keys: Sequence[str],
    value_col: str = "value",
    pre_col: str = "pre_value",
    op_col: str = "op",
) -> StreamingQuery:
    """Start a stream that maintains the delta-partial store at
    ``out_path`` from a changelog stream. The caller owns stopping the
    query. foreachBatch lands plain batch appends (not a streaming parquet
    sink) for the same `_spark_metadata` reason as streaming/rollup.py."""
    keys = list(keys)

    def _land(batch_df: DataFrame, batch_id: int) -> None:
        part = changelog_delta_partials(
            batch_df, keys, value_col, pre_col, op_col
        ).withColumn("_batch_id", F.lit(batch_id))
        part.write.mode("append").parquet(out_path)

    return (
        changelog.writeStream.foreachBatch(_land)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_ivm_view(
    spark: SparkSession, path: str, keys: Sequence[str]
) -> DataFrame:
    """Merge the delta-partial store into the maintained view
    ``(keys…, n_rows, total)`` — equal to a from-scratch aggregate over
    the final table state (groups whose rows were all deleted vanish,
    exactly as a recompute would omit them)."""
    keys = list(keys)
    parts = spark.read.parquet(path)
    return (
        parts.groupBy(*keys)
        .agg(
            F.sum("cnt_delta").alias("n_rows"),
            F.sum("sum_delta").cast(_DEC).alias("total"),
        )
        .filter(F.col("n_rows") > 0)
    )
