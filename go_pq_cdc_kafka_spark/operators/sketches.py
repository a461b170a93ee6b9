"""Mergeable sketches: HLL distinct counts + exact-arithmetic histograms.

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


# ---------------------------------------------------------------------------
# Equi-width histogram sketches (mergeable AND exactly oracle-checkable)
# ---------------------------------------------------------------------------
#
# The same materialize-once/merge-anywhere tier as HLL, but for quantiles —
# and unlike HLL (whose bytes are engine-specific, hence rows-only checks),
# a histogram sketch is a (bin → integer count) table built with pure
# integer arithmetic: value in cents, bin = cents div width. Merge =
# summing counts; a quantile is the first bin whose cumulative count
# crosses q% of the total (integer comparison ``cum*100 >= pct*total``, no
# float rounding anywhere). Every tier is therefore bit-identical in any
# engine — DuckDB oracles check the whole pipeline exactly.
#
# 100 TB posture: the cell pass is one groupBy over the raw data (map-side
# combinable, fixed nbins keys per cell); every later rollup shuffles only
# (cells × nbins) count rows, never the events. Accuracy is the bin width:
# the quantile is exact to ±width/2, the classic equi-width trade.


def histogram_cell_sketches(
    df: DataFrame,
    cell_cols: Sequence[str],
    value_cents,
    width_cents: int,
    nbins: int,
) -> DataFrame:
    """(cell → bin → count) histogram of an integer-cents value column.

    ``value_cents`` must already be integral (cast upstream with
    ``CAST(ROUND(x*100) AS BIGINT)`` so Spark and any oracle agree
    bit-for-bit). Bins clamp into [0, nbins-1]."""
    v = value_cents.cast("bigint")
    # integer floor-division without a float round-trip hazard: the
    # numerator (v - v % w) is an exact multiple of w and far below 2^53,
    # so the double division is exact in every engine
    quotient = ((v - (v % F.lit(width_cents))) / F.lit(width_cents)).cast(
        "bigint"
    )
    bin_col = F.least(
        F.lit(int(nbins - 1)).cast("bigint"),
        F.greatest(F.lit(0).cast("bigint"), quotient),
    )
    return df.groupBy(
        *cell_cols,
        bin_col.alias("bin"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


def countmin_cell_sketches(
    df: DataFrame,
    cell_cols: Sequence[str],
    key_col: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Count-min sketch per cell: the frequency member of the mergeable
    family (HLL = distinct, histogram = quantiles, CM = counts).

    ``d`` hash rows × ``w`` buckets; each key increments one bucket per
    row, chosen by the engine's cross-engine 60-bit md5 hash salted with
    the row index — fully deterministic integer arithmetic, so unlike
    library CM implementations this one is EXACTLY replicable in SQL and
    carries a DuckDB oracle. A point estimate (``countmin_estimate``) is
    the MIN over the d rows' buckets: always >= the true count, equal when
    no collision wins every row.

    100 TB posture: one map-side-combinable groupBy with at most
    cells × d × w output rows (d·w = 1024 here — KBs per cell); merge =
    summing counts, append-only like the other sketch tiers."""
    from go_pq_cdc_kafka_spark.functions.text import hash64

    rb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("int").alias("row"),
                    F.pmod(
                        hash64(
                            F.concat(
                                F.lit(f"{i}:"), F.col(key_col).cast("string")
                            )
                        ),
                        F.lit(w),
                    )
                    .cast("bigint")
                    .alias("bucket"),
                )
                for i in range(d)
            ]
        )
    )
    return (
        df.select(*cell_cols, rb.alias("rb"))
        .select(*cell_cols, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .groupBy(*cell_cols, "row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def countmin_rollup(cells: DataFrame, rollup_cols: Sequence[str]) -> DataFrame:
    """Merge cell CM sketches to a coarser grouping: counts add."""
    return cells.groupBy(*rollup_cols, "row", "bucket").agg(
        F.sum("n").cast("long").alias("n")
    )


def countmin_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Point-estimate each candidate key against a (row, bucket, n) sketch:
    min over the d rows, 0 for buckets the sketch never touched.

    The sketch is first merged to one count per (row, bucket) — a no-op
    shuffle of at most d*w rows on already-merged input, but essential
    when the caller passes cell-level sketches (extra cell columns →
    multiple rows per bucket): taking MIN over per-cell PARTIAL counts
    would silently underestimate and break the CM >=-true-count
    guarantee."""
    from go_pq_cdc_kafka_spark.functions.text import hash64

    sketch = sketch.groupBy("row", "bucket").agg(
        F.sum("n").cast("long").alias("n")
    )

    rb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("int").alias("row"),
                    F.pmod(
                        hash64(
                            F.concat(
                                F.lit(f"{i}:"), F.col(key_col).cast("string")
                            )
                        ),
                        F.lit(w),
                    )
                    .cast("bigint")
                    .alias("bucket"),
                )
                for i in range(d)
            ]
        )
    )
    cand_rb = candidates.select(key_col, rb.alias("rb")).select(
        key_col,
        F.col("rb.row").alias("row"),
        F.col("rb.bucket").alias("bucket"),
    )
    return (
        cand_rb.join(sketch, ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("n"), F.lit(0)))
            .cast("long")
            .alias("cm_estimate")
        )
    )


def histogram_rollup(
    hist: DataFrame, rollup_cols: Sequence[str]
) -> DataFrame:
    """Merge cell histograms to a coarser grouping: counts just add."""
    return hist.groupBy(*rollup_cols, "bin").agg(
        F.sum("n").cast("long").alias("n")
    )


def histogram_quantiles(
    hist: DataFrame,
    group_cols: Sequence[str],
    width_cents: int,
    pcts: Sequence[int] = (50, 95, 99),
) -> DataFrame:
    """Per-group quantile bin edges from a (group, bin, n) histogram.

    Integer-only: the p-th percentile is the lowest bin whose cumulative
    count satisfies ``cum * 100 >= p * total``; the reported edge is
    ``bin * width_cents`` (the bin's lower bound, in cents)."""
    from pyspark.sql import Window

    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    c = hist.select(
        *group_cols,
        "bin",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_all).alias("total"),
    )
    aggs = [
        (
            F.min(
                F.when(
                    F.col("cum") * 100 >= F.lit(int(p)) * F.col("total"),
                    F.col("bin"),
                )
            )
            * F.lit(width_cents)
        )
        .cast("long")
        .alias(f"p{p}_edge_cents")
        for p in pcts
    ]
    aggs.append(F.max("total").cast("long").alias("n_rows"))
    return c.groupBy(*group_cols).agg(*aggs)
