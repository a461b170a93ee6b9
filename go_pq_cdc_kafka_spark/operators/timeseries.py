"""Time-series operators: time bucketing, gap-fill (LOCF), hierarchical
rollup.

The reference routes TimescaleDB hypertable chunks back to their parent
table (connector.go:204-209 via timescaledb.HyperTables) — i.e. its users
are Timescale users. These operators supply the analytics half of that
world (``time_bucket``, ``time_bucket_gapfill`` + ``locf``, continuous
aggregates) as Spark-native plans.

Scale posture:

- ``bucket()`` is a pure Column expression (floor-divide on the epoch),
  JVM-side, codegen-friendly — no UDF.
- ``gapfill_locf`` builds the dense grid with ``sequence()``+``explode``
  from per-key (min, max) bounds: the bounds aggregate is map-side
  combinable and tiny (one row per key); the explode is narrow (no
  shuffle). The left join then shuffles on (keys, bucket) and the LOCF
  window re-shuffles on keys — two exchanges total, both on the series
  key, so skew follows series cardinality, not row count. Callers are
  expected to gap-fill *bucketed* (already aggregated) series, so the
  grid size is bounded by span/step × n_keys, not by raw event count.
- ``rollup_fine``/``rollup_coarse`` implement the continuous-aggregate
  split: a fine-grained partial rollup that is cheap to maintain
  incrementally (count/sum/min/max are all algebraic — re-aggregable
  without touching raw data), and a coarse re-aggregation over it. At
  100 TB the fine rollup is the thing you materialize (it is
  append-only per closed bucket); every coarser resolution derives from
  it with a shuffle that is orders of magnitude smaller than the raw
  scan. Sums are kept in DECIMAL(27,6) in the fine tier so the coarse
  re-aggregation is exact and order-independent (see queries._dsum).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def bucket(ts: Column, step_seconds: int) -> Column:
    """Truncate a timestamp to its ``step_seconds`` bucket start.

    Equivalent to DuckDB/Timescale ``time_bucket(INTERVAL, ts)`` for
    steps that divide a day (epoch-aligned, like time_bucket's default
    origin 2000-01-03 for sub-week intervals — both are midnight-aligned
    so the grids coincide for such steps).
    """
    epoch = F.unix_timestamp(ts)
    return F.timestamp_seconds((epoch - (epoch % step_seconds)).cast("long"))


def gapfill_locf(
    bucketed: DataFrame,
    bucket_col: str,
    step_seconds: int,
    keys: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """Densify a bucketed series per key and forward-fill missing values.

    ``bucketed`` must have one row per (keys, bucket). The grid spans
    each key's own [min(bucket), max(bucket)] — mirroring Timescale's
    ``time_bucket_gapfill`` + ``locf()``. The first grid point per key
    is by construction observed, so no leading NULLs survive.
    """
    keys = list(keys)
    bounds = bucketed.groupBy(*keys).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    grid = bounds.select(
        *keys,
        F.explode(
            F.sequence(
                F.col("_lo"),
                F.col("_hi"),
                F.expr(f"INTERVAL {int(step_seconds)} SECONDS"),
            )
        ).alias(bucket_col),
    )
    joined = grid.join(bucketed, on=[*keys, bucket_col], how="left")
    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        *keys,
        bucket_col,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )


def gapfill_interpolate(
    bucketed: DataFrame,
    bucket_col: str,
    step_seconds: int,
    keys: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Densify a bucketed series and LINEARLY interpolate missing values —
    Timescale's ``interpolate()`` — in pure INTEGER arithmetic:

        v = v0 + (v1 - v0) * (t - t0) div (t1 - t0)

    with ``value_col`` in integer units (e.g. cents) and t in epoch
    seconds. Spark's ``div`` and DuckDB's ``//`` both truncate toward
    zero, so the filled values are bit-identical cross-engine where a
    float lerp would drift with evaluation order. Outside the observed
    span (no bracketing point) the nearest observation fills (LOCF
    before the end, NOCB before the start). Two windows per key — same
    shuffle count as LOCF."""
    keys = list(keys)
    bounds = bucketed.groupBy(*keys).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    grid = bounds.select(
        *keys,
        F.explode(
            F.sequence(
                F.col("_lo"),
                F.col("_hi"),
                F.expr(f"INTERVAL {int(step_seconds)} SECONDS"),
            )
        ).alias(bucket_col),
    )
    joined = grid.join(bucketed, on=[*keys, bucket_col], how="left")
    # TIMESTAMP_NTZ refuses a direct bigint cast; hop through TIMESTAMP
    # (session tz is pinned to UTC by session.get_spark, so epochs agree)
    t = F.col(bucket_col).cast("timestamp").cast("long")
    obs_t = F.when(F.col(value_col).isNotNull(), t)
    back = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last(value_col, ignorenulls=True).over(back)
    prev_t = F.last(obs_t, ignorenulls=True).over(back)
    next_v = F.first(value_col, ignorenulls=True).over(fwd)
    next_t = F.first(obs_t, ignorenulls=True).over(fwd)
    return (
        joined.withColumn("_pv", prev_v)
        .withColumn("_pt", prev_t)
        .withColumn("_nv", next_v)
        .withColumn("_nt", next_t)
        .withColumn(f"{bucket_col}_epoch", t)
        .withColumn(
            value_col,
            F.when(
                F.col("_pv").isNotNull()
                & F.col("_nv").isNotNull()
                & (F.col("_nt") != F.col("_pt")),
                F.col("_pv")
                + F.expr(
                    f"(_nv - _pv) * ({bucket_col}_epoch - _pt) div (_nt - _pt)"
                ),
            ).otherwise(F.coalesce(F.col("_pv"), F.col("_nv"))),
        )
        .select(*keys, bucket_col, value_col)
    )


def rollup_fine(
    df: DataFrame,
    ts_col: str,
    step_seconds: int,
    keys: Sequence[str],
    value_col: str,
    bucket_name: str = "bucket",
) -> DataFrame:
    """Fine-grained partial rollup (the materialized continuous aggregate).

    Emits algebraic partials only — n / decimal sum / min / max — so any
    coarser resolution can be derived exactly by re-aggregation.
    """
    return df.groupBy(
        bucket(F.col(ts_col), step_seconds).alias(bucket_name), *keys
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("decimal(27,6)")).alias("_dec_sum"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def rollup_coarse(
    fine: DataFrame,
    step_seconds: int,
    keys: Sequence[str],
    bucket_name: str = "bucket",
) -> DataFrame:
    """Re-aggregate a ``rollup_fine`` output to a coarser resolution.

    ``step_seconds`` must be a multiple of the fine step for buckets to
    nest. Exact: decimal sums re-accumulate without rounding; count and
    min/max are trivially re-aggregable.
    """
    return (
        fine.groupBy(
            bucket(F.col(bucket_name), step_seconds).alias(bucket_name), *keys
        )
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("_dec_sum").alias("_dec_sum"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .select(
            bucket_name,
            *keys,
            "n",
            F.col("_dec_sum").cast("double").alias("sum_value"),
            (F.col("_dec_sum").cast("double") / F.col("n").cast("double")).alias(
                "avg_value"
            ),
            "min_value",
            "max_value",
        )
    )


def ewma(
    df,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    alpha_num: int = 1,
    alpha_den: int = 4,
):
    """Per-series exponentially-weighted moving average — the smoothing/
    trend primitive (seed s_1 = x_1; s_t = s_{t-1} + (x_t - s_{t-1})·α).

    EWMA is an ORDER-SENSITIVE fold, which no window frame expresses
    (every prefix re-weights), so each series is assembled into one
    ts-sorted array (``sort_array(collect_list(struct(...)))`` — ties
    broken by ``id_col`` for determinism) and folded with a higher-order
    ``aggregate`` whose accumulator carries the running smoothed array.
    The fold is the same IEEE sequence the SQL oracle's recursive CTE
    performs (α = num/den with a power-of-two ``den`` is exact in
    binary), so values match bit-for-bit.

    Scale posture: state is bounded per SERIES (one array per key), the
    same contract as gap-fill and sequence packing — callers smooth
    BUCKETED series, so array length is span/step, not raw event count.
    One shuffle (the per-key groupBy); the fold and the re-explode are
    map-side."""
    import pyspark.sql.functions as F

    alpha = float(alpha_num) / float(alpha_den)
    series = df.groupBy(key_col).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("ts"),
                    F.col(id_col).alias("rid"),
                    F.col(value_col).cast("double").alias("x"),
                )
            )
        ).alias("pts")
    )
    smoothed = series.select(
        key_col,
        F.aggregate(
            F.col("pts"),
            F.expr("CAST(array() AS array<double>)"),
            lambda acc, p: F.when(
                F.size(acc) == 0, F.array(p["x"])
            ).otherwise(
                F.concat(
                    acc,
                    F.array(
                        F.element_at(acc, -1)
                        + (p["x"] - F.element_at(acc, -1)) * F.lit(alpha)
                    ),
                )
            ),
        ).alias("sm"),
        F.col("pts"),
    )
    return (
        smoothed.select(
            key_col,
            F.posexplode(F.arrays_zip(F.col("pts"), F.col("sm"))).alias(
                "_i", "z"
            ),
        )
        .select(
            key_col,
            F.col("z.pts.ts").alias(ts_col),
            F.col("z.pts.rid").alias(id_col),
            F.col("z.pts.x").alias(value_col),
            F.col("z.sm").alias("ewma"),
        )
    )


def ewma_sql(
    key_expr: str,
    ts_expr: str,
    value_expr: str,
    id_expr: str,
    table: str,
    alpha_num: int = 1,
    alpha_den: int = 4,
) -> str:
    """DuckDB twin: the same fold as a recursive CTE over per-series row
    numbers — s(1) = x(1); s(n) = s(n-1) + (x(n) - s(n-1))·α, identical
    IEEE op order to the Spark fold."""
    alpha = float(alpha_num) / float(alpha_den)
    return f"""
WITH RECURSIVE ordered AS (
  SELECT {key_expr} AS k, {ts_expr} AS ts, {id_expr} AS rid,
         CAST({value_expr} AS DOUBLE) AS x,
         ROW_NUMBER() OVER (PARTITION BY {key_expr}
                            ORDER BY {ts_expr}, {id_expr}) AS rn
  FROM {table}
),
fold(k, ts, rid, x, rn, s) AS (
  SELECT k, ts, rid, x, rn, x FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.k, o.ts, o.rid, o.x, o.rn, f.s + (o.x - f.s) * {alpha}
  FROM fold f JOIN ordered o ON o.k = f.k AND o.rn = f.rn + 1
)
SELECT k, ts, rid, x, s AS ewma FROM fold
"""


def holt_linear(
    df,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    alpha_num: int = 1,
    alpha_den: int = 4,
    beta_num: int = 1,
    beta_den: int = 2,
):
    """Per-series Holt double-exponential smoothing (level + linear
    trend) — the forecasting primitive one rung above :func:`ewma`:

        l_1 = x_1;  b_1 = 0
        l_t = (l_{t-1} + b_{t-1}) + (x_t - (l_{t-1} + b_{t-1}))·α
        b_t = b_{t-1} + ((l_t - l_{t-1}) - b_{t-1})·β

    (the level update is written in EWMA residual form so the fold and
    the SQL oracle share one IEEE op order; α and β with power-of-two
    denominators are exact in binary ⇒ bit-for-bit parity).

    Same scale contract as :func:`ewma`: an ORDER-SENSITIVE fold no
    window frame expresses, so each BUCKETED series becomes one
    ts-sorted array folded with a higher-order ``aggregate`` whose
    accumulator is the growing array of (level, trend) structs; one
    per-key shuffle, everything else map-side, state bounded by
    series length."""
    import pyspark.sql.functions as F

    alpha = float(alpha_num) / float(alpha_den)
    beta = float(beta_num) / float(beta_den)
    series = df.groupBy(key_col).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("ts"),
                    F.col(id_col).alias("rid"),
                    F.col(value_col).cast("double").alias("x"),
                )
            )
        ).alias("pts")
    )

    def step(acc, p):
        lp = F.element_at(acc, -1)["l"]
        bp = F.element_at(acc, -1)["b"]
        pred = lp + bp
        level = pred + (p["x"] - pred) * F.lit(alpha)
        trend = bp + ((level - lp) - bp) * F.lit(beta)
        return F.when(
            F.size(acc) == 0,
            F.array(
                F.struct(
                    p["x"].alias("l"), F.lit(0.0).alias("b")
                )
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(F.struct(level.alias("l"), trend.alias("b"))),
            )
        )

    folded = series.select(
        key_col,
        F.col("pts"),
        F.aggregate(
            F.col("pts"),
            F.expr("CAST(array() AS array<struct<l:double,b:double>>)"),
            step,
        ).alias("lb"),
    )
    return (
        folded.select(
            key_col,
            F.posexplode(F.arrays_zip(F.col("pts"), F.col("lb"))).alias(
                "_i", "z"
            ),
        )
        .select(
            key_col,
            F.col("z.pts.ts").alias(ts_col),
            F.col("z.pts.rid").alias(id_col),
            F.col("z.pts.x").alias(value_col),
            F.col("z.lb.l").alias("level"),
            F.col("z.lb.b").alias("trend"),
        )
    )


def holt_linear_sql(
    key_expr: str,
    ts_expr: str,
    value_expr: str,
    id_expr: str,
    table: str,
    alpha_num: int = 1,
    alpha_den: int = 4,
    beta_num: int = 1,
    beta_den: int = 2,
) -> str:
    """DuckDB twin of :func:`holt_linear` — identical IEEE op order."""
    alpha = float(alpha_num) / float(alpha_den)
    beta = float(beta_num) / float(beta_den)
    return f"""
WITH RECURSIVE ordered AS (
  SELECT {key_expr} AS k, {ts_expr} AS ts, {id_expr} AS rid,
         CAST({value_expr} AS DOUBLE) AS x,
         ROW_NUMBER() OVER (PARTITION BY {key_expr}
                            ORDER BY {ts_expr}, {id_expr}) AS rn
  FROM {table}
),
fold(k, ts, rid, x, rn, l, b) AS (
  SELECT k, ts, rid, x, rn, x, CAST(0.0 AS DOUBLE) FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.k, o.ts, o.rid, o.x, o.rn,
         (f.l + f.b) + (o.x - (f.l + f.b)) * {alpha},
         f.b + ((((f.l + f.b) + (o.x - (f.l + f.b)) * {alpha}) - f.l) - f.b)
           * {beta}
  FROM fold f JOIN ordered o ON o.k = f.k AND o.rn = f.rn + 1
)
SELECT k, ts, rid, x, l AS level, b AS trend FROM fold
"""


def cusum(df, key_col: str, ts_col: str, value_col: str, id_col: str,
          ref_col: str):
    """Per-series one-sided CUSUM drift statistic (Page's test, the
    upward form): S_1 = max(0, x_1 - ref); S_t = max(0, S_{t-1} + x_t -
    ref) — the change-point primitive behind rate-shift alerting. An
    ORDER-SENSITIVE fold like :func:`ewma`, but ALL-INTEGER: with integer
    values and an integer per-series reference, every S_t is exact in
    both engines by construction — no power-of-two-fraction argument
    needed.

    Same scale contract as the other folds: each BUCKETED series becomes
    one ts-sorted array folded with a higher-order ``aggregate``; one
    per-key shuffle, state bounded by points-per-series."""
    import pyspark.sql.functions as F

    series = df.groupBy(key_col).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("ts"),
                    F.col(id_col).alias("rid"),
                    F.col(value_col).cast("long").alias("x"),
                    F.col(ref_col).cast("long").alias("ref"),
                )
            )
        ).alias("pts")
    )
    folded = series.select(
        key_col,
        F.col("pts"),
        F.aggregate(
            F.col("pts"),
            F.expr("CAST(array() AS array<bigint>)"),
            lambda acc, p: F.concat(
                acc,
                F.array(
                    F.greatest(
                        F.lit(0).cast("long"),
                        F.coalesce(
                            F.try_element_at(acc, F.lit(-1)),
                            F.lit(0).cast("long"),
                        )
                        + p["x"] - p["ref"],
                    )
                ),
            ),
        ).alias("cs"),
    )
    return (
        folded.select(
            key_col,
            F.posexplode(F.arrays_zip(F.col("pts"), F.col("cs"))).alias(
                "_i", "z"
            ),
        )
        .select(
            key_col,
            F.col("z.pts.ts").alias(ts_col),
            F.col("z.pts.rid").alias(id_col),
            F.col("z.pts.x").alias(value_col),
            F.col("z.pts.ref").alias("ref"),
            F.col("z.cs").alias("cusum"),
        )
    )


def cusum_sql(key_expr: str, ts_expr: str, value_expr: str, id_expr: str,
              ref_expr: str, table: str) -> str:
    """DuckDB twin: the same integer fold as a recursive CTE."""
    return f"""
WITH RECURSIVE ordered AS (
  SELECT {key_expr} AS k, {ts_expr} AS ts, {id_expr} AS rid,
         CAST({value_expr} AS BIGINT) AS x,
         CAST({ref_expr} AS BIGINT) AS ref,
         ROW_NUMBER() OVER (PARTITION BY {key_expr}
                            ORDER BY {ts_expr}, {id_expr}) AS rn
  FROM {table}
),
fold(k, ts, rid, x, ref, rn, s) AS (
  SELECT k, ts, rid, x, ref, rn, GREATEST(0, x - ref)
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.k, o.ts, o.rid, o.x, o.ref, o.rn, GREATEST(0, f.s + o.x - o.ref)
  FROM fold f JOIN ordered o ON o.k = f.k AND o.rn = f.rn + 1
)
SELECT k, ts, rid, x, ref, s AS cusum FROM fold
"""
