"""Mergeable distinct-count sketches (Apache DataSketches HLL via Spark).

``approx_count_distinct`` (the ``distinct_approx`` query) answers one
question once; SKETCHES are the 100 TB production shape: materialize one
compact binary sketch per fine-grained cell (day × type), then answer any
coarser rollup — any date range, any type subset — by UNIONING sketches,
never rescanning the raw events. Union is associative/commutative, so
incremental maintenance is append-only: sketch today's partition, union
with history.

Spark-side this is ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate`` (Apache DataSketches HLL_4; sketches are
cross-job stable bytes that can be persisted in parquet BINARY columns).
DuckDB has no compatible sketch implementation, so these operators carry
no SQL oracle — tests pin (a) estimate accuracy against exact distinct
counts and (b) the merge identity: estimating a union of per-cell
sketches equals sketching the union of the cells' raw data.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def hll_cell_sketches(
    df: DataFrame,
    cell_cols: Sequence[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distinct values per cell (the
    materialization pass — run once per ingest batch/partition). lg_k=12
    is ~2.5 KB per cell at <2% relative error."""
    return df.groupBy(*cell_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


def hll_rollup(
    sketches: DataFrame,
    rollup_cols: Sequence[str],
) -> DataFrame:
    """Answer a coarser rollup from materialized sketches alone: union the
    cell sketches per rollup group and estimate. No raw-data rescan; the
    shuffle moves KB-sized sketch blobs, not events."""
    return (
        sketches.groupBy(*rollup_cols)
        .agg(F.hll_union_agg(F.col("sketch")).alias("sketch"))
        .select(
            *rollup_cols,
            F.hll_sketch_estimate(F.col("sketch")).alias("approx_distinct"),
        )
    )
