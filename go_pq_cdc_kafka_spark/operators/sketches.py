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


# ---------------------------------------------------------------------------
# KMV (bottom-k) sketches — mergeable distinct-count + uniform value sample
# ---------------------------------------------------------------------------
#
# The k-minimum-values / theta-sketch family (Bar-Yossef et al. 2002;
# Apache DataSketches' theta): per cell, keep the k SMALLEST hash values of
# the distinct items. Two payoffs from one sketch:
#   - distinct estimate: hashes are uniform on [0, H), so the kth-smallest
#     h_k ≈ k/n · H  ⇒  n̂ = (k-1)·H / h_k (the unbiased KMV estimator);
#   - the k survivors are a uniform random sample of the DISTINCT items
#     (sampled by hash, not by row frequency), so sample order statistics
#     estimate quantiles of the distinct-value distribution.
# Merge = union two sketches' hash sets, re-take the k smallest — exactly
# how the rollup below answers coarser groupings without rescanning rows.
#
# Everything is md5-derived and integer-exact, so unlike the HLL tier this
# sketch IS DuckDB-oracle-checkable bit-for-bit: hashes live in [0, 2^40)
# (double-exact, so the one estimator division is the same IEEE op in both
# engines), ties broken by item value, and the n<k case degrades to the
# EXACT count (h_k undefined ⇒ estimator bypassed).

_KMV_H = 1 << 40


def kmv_cell_sketches(
    df: DataFrame,
    cell_cols: Sequence[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Bottom-k sketch of ``value_col``'s distinct values per cell.

    One distinct-shuffle (map-side combinable groupBy, the same cost any
    exact distinct pays) + one per-cell top-k window over DISTINCT items
    only — never a per-row window. The sketch row is a sorted
    array<struct<h,v>> of at most k entries: compact enough to persist in a
    parquet column and union forever after."""
    from pyspark.sql import Window

    from go_pq_cdc_kafka_spark.functions.text import hash64

    dist = df.select(*cell_cols, F.col(value_col).alias("v")).distinct()
    hashed = dist.withColumn(
        "h", hash64(F.col("v").cast("string")) % F.lit(_KMV_H)
    )
    w = Window.partitionBy(*cell_cols).orderBy("h", "v")
    return (
        hashed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .groupBy(*cell_cols)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("h"), F.col("v")))
            ).alias("sketch"),
        )
    )


def kmv_rollup(
    sketches: DataFrame, rollup_cols: Sequence[str], k: int = 64
) -> DataFrame:
    """Merge cell sketches to a coarser grouping: union the hash sets,
    re-take the k smallest. Shuffles only (cells × ≤k) sketch entries —
    never the raw rows (hash-distinct across cells: the same item reaches
    every cell with the same h, v)."""
    from pyspark.sql import Window

    entries = (
        sketches.select(
            *rollup_cols, F.explode("sketch").alias("e")
        )
        .select(*rollup_cols, "e.h", "e.v")
        .distinct()
    )
    w = Window.partitionBy(*rollup_cols).orderBy("h", "v")
    return (
        entries.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .groupBy(*rollup_cols)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("h"), F.col("v")))
            ).alias("sketch"),
        )
    )


def kmv_estimate(sketches: DataFrame, k: int = 64) -> DataFrame:
    """Distinct estimate + sample order statistics from a sketch column.

    n_sample < k ⇒ the sketch saw every distinct item: the estimate is the
    exact count. Otherwise n̂ = (k-1)·H / h_k — one double division of
    exactly-representable integers (h < 2^40 < 2^53), identical in any
    IEEE engine. ``sample_median`` is the sample's middle item by hash
    order re-sorted by value — a uniform-over-distinct-items estimator of
    the value median."""
    n_sample = F.size("sketch")
    h_k = F.element_at("sketch", -1)["h"]
    vals = F.array_sort(
        F.transform(F.col("sketch"), lambda e: e["v"])
    )
    return sketches.select(
        *[c for c in sketches.columns if c != "sketch"],
        n_sample.cast("long").alias("n_sample"),
        F.when(n_sample < k, n_sample.cast("double"))
        .otherwise(
            F.lit(float(k - 1))
            * (F.lit(float(_KMV_H)) / h_k.cast("double"))
        )
        .alias("est_distinct"),
        F.element_at(
            vals,
            (((n_sample + 1) - ((n_sample + 1) % 2)) / F.lit(2)).cast("int"),
        ).alias("sample_median"),
    )


def kmv_sql(
    cell_col: str,
    value_col: str,
    table: str,
    k: int = 64,
    all_label: str = "ALL",
) -> str:
    """DuckDB twin of cell sketches + ALL-rollup + estimates, for oracle
    parity of the full materialize→merge→estimate pipeline."""
    from go_pq_cdc_kafka_spark.functions.text import hash64_sql

    h = f"({hash64_sql(f'CAST(v AS VARCHAR)')} % {_KMV_H})"
    est = (
        f"CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE) "
        f"ELSE {float(k - 1)} * ({float(_KMV_H)} / CAST(MAX(h) AS DOUBLE)) END"
    )
    # sample median: middle element (1-indexed ceil(n/2)) of the sample's
    # values sorted ascending
    med = "(list_sort(list(v)))[CAST((COUNT(*) + 1 - (COUNT(*) + 1) % 2) / 2 AS BIGINT)]"
    return f"""
WITH dist AS (
  SELECT DISTINCT {cell_col} AS cell, {value_col} AS v FROM {table}
),
hashed AS (SELECT cell, v, {h} AS h FROM dist),
ranked AS (
  SELECT cell, v, h,
         ROW_NUMBER() OVER (PARTITION BY cell ORDER BY h, v) AS rk
  FROM hashed
),
cells AS (SELECT cell, v, h FROM ranked WHERE rk <= {k}),
merged_ranked AS (
  SELECT v, h, ROW_NUMBER() OVER (ORDER BY h, v) AS rk
  FROM (SELECT DISTINCT v, h FROM cells)
),
merged AS (SELECT '{all_label}' AS cell, v, h FROM merged_ranked WHERE rk <= {k}),
unioned AS (SELECT * FROM cells UNION ALL SELECT * FROM merged)
SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_sample,
       {est} AS est_distinct,
       {med} AS sample_median
FROM unioned
GROUP BY cell
ORDER BY cell
"""
