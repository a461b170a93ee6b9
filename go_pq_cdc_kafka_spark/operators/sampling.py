"""Deterministic sampling operators for corpus curation.

``DataFrame.sample`` is unusable for training-data pipelines at scale: it
is seeded per-partition, so the selected set changes whenever the input
repartitions, a task retries, or the corpus grows by one file. Both
operators here derive the sampling decision from a *hash of the row's own
key*, which makes the sample a pure function of the data:

- reproducible across runs, cluster sizes, and task retries;
- stable under appends (old rows keep their verdict when new data arrives —
  the property that makes incremental corpus refreshes diffable);
- expressible in ANSI SQL, so the DuckDB oracle checks the exact rows.

Both are single-pass Column expressions. The stratified variant costs one
shuffle on the strata key (the row_number window); the Bernoulli variant is
map-only and pushes nothing but a filter into the scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from go_pq_cdc_kafka_spark.functions import text as T


def _hash_key(id_col: Column) -> Column:
    # md5 of the decimal string rendering — engine-portable (see
    # functions.text.hash64) and uniform regardless of key distribution.
    return F.md5(id_col.cast("string"))


def stratified_sample(
    df: DataFrame, strata_cols: list[str], k: int, id_col: str
) -> DataFrame:
    """Per-stratum quota sample: the k rows with the smallest key-hash in
    each stratum, rank exposed as ``sample_rank``. Equal-size strata out of
    arbitrarily skewed ones — the balanced-mixture draw (per language, per
    source, per quality bucket) every pretraining data recipe needs.

    The id tie-break after the hash makes the order total even under md5
    collisions, so the selected set is unique, not merely uniform."""
    w = Window.partitionBy(*strata_cols).orderBy(
        _hash_key(F.col(id_col)), F.col(id_col)
    )
    return df.withColumn(
        "sample_rank", F.row_number().over(w).cast("long")
    ).filter(F.col("sample_rank") <= k)


def hash_fraction_sample(
    df: DataFrame, id_col: str, fraction: float, mod: int = 1_000_000
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose 60-bit key hash lands
    in the low ``fraction`` slice of residues mod ``mod``. Map-only — the
    predicate sits directly on the scan, no shuffle, no state."""
    threshold = int(fraction * mod)
    return df.filter(T.hash64(F.col(id_col).cast("string")) % mod < threshold)


def hash_fraction_sample_sql(id_expr: str, fraction: float, mod: int = 1_000_000) -> str:
    """DuckDB twin of the Bernoulli predicate (for oracle WHERE clauses)."""
    threshold = int(fraction * mod)
    return f"{T.hash64_sql(f'CAST({id_expr} AS VARCHAR)')} % {mod} < {threshold}"


def domain_mixture_sample(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    id_col: str,
    mod: int = 1_000_000,
) -> DataFrame:
    """Per-domain-rate Bernoulli sample: each domain is kept at its own
    fraction — the mixture-reweighting draw (up/down-sample sources or
    languages toward a target recipe) applied in one map-only pass.

    Domains absent from ``weights`` are dropped (weight 0). The keep
    decision hashes the row key, not the domain, so it stays stable under
    appends and independent across domains; the per-domain threshold is a
    broadcast-free literal CASE over the domain column."""
    thr = F.lit(0)
    for dom, frac in sorted(weights.items()):
        thr = F.when(F.col(domain_col) == dom, int(frac * mod)).otherwise(thr)
    return df.filter(T.hash64(F.col(id_col).cast("string")) % mod < thr)


def domain_mixture_sample_sql(
    domain_expr: str,
    weights: dict[str, float],
    id_expr: str,
    mod: int = 1_000_000,
) -> str:
    """DuckDB twin of the per-domain keep predicate."""
    cases = " ".join(
        f"WHEN '{d}' THEN {int(f * mod)}" for d, f in sorted(weights.items())
    )
    return (
        f"{T.hash64_sql(f'CAST({id_expr} AS VARCHAR)')} % {mod} < "
        f"(CASE {domain_expr} {cases} ELSE 0 END)"
    )


def token_budget_mixture(
    df: DataFrame,
    domain_col: str,
    budgets: dict[str, int],
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Mixture selection by TOKEN budget, not document rate: each source
    contributes documents (in deterministic hash-priority order) until its
    token budget fills — the way training recipes actually weight sources
    (a doc-rate mixture over-samples short documents; DoReMi-style weights
    are token shares).

    Deterministic: priority = md5-derived hash of the row key, selection =
    keep while the running token total (inclusive) stays within budget —
    one window shuffle keyed by the domain. Domains without a budget are
    dropped. A pathologically dominant source makes that source's window
    partition large; pre-thin with :func:`hash_fraction_sample` when one
    domain is orders of magnitude beyond its budget."""
    from pyspark.sql import Window

    bud = F.lit(0)
    for dom, b in sorted(budgets.items()):
        bud = F.when(F.col(domain_col) == dom, int(b)).otherwise(bud)
    w = (
        Window.partitionBy(domain_col)
        .orderBy(T.hash64(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("n_tokens", T.token_count(F.col(text_col)))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= bud)
    )


def token_budget_mixture_sql(
    domain_expr: str,
    budgets: dict[str, int],
    id_expr: str,
    text_expr: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin: same hash priority, same inclusive running total."""
    cases = " ".join(f"WHEN '{d}' THEN {int(b)}" for d, b in sorted(budgets.items()))
    toks = T.TOKENS_SQL.format(c=text_expr)
    return f"""
WITH sized AS (
  SELECT *, CAST(len({toks}) AS BIGINT) AS n_tokens,
         {T.hash64_sql(f'CAST({id_expr} AS VARCHAR)')} AS pri
  FROM {table}
),
running AS (
  SELECT *, CAST(SUM(n_tokens) OVER (
            PARTITION BY {domain_expr} ORDER BY pri, {id_expr}
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM sized
)
SELECT {id_expr} AS doc_id, {domain_expr} AS source, n_tokens, cum_tokens
FROM running
WHERE cum_tokens <= (CASE {domain_expr} {cases} ELSE 0 END)
ORDER BY source, cum_tokens
"""


def bucketed_row_number(
    df: DataFrame,
    partition_cols: list[str],
    bucket_col: Column,
    order_cols: list[Column],
    name: str,
) -> DataFrame:
    """Scalable ``ROW_NUMBER() OVER (PARTITION BY partition_cols ORDER BY
    order_cols)`` — the replacement for the unpartitioned (or
    few-partition) global window that WindowExec executes by moving the
    whole corpus through ONE task.

    Requires: ``bucket_col`` is monotone nondecreasing in ``order_cols``
    within every partition group (rows in bucket b all sort before rows
    in bucket b+1). Then the global ordinal decomposes exactly into

        local row_number within (partition_cols, bucket)   [parallel]
      + cumulative count of the preceding buckets          [broadcast]

    Cost: ONE full-data shuffle (hash on partition+bucket — the same
    volume the banned global window moves, but across #buckets tasks
    instead of one) plus a bucket-count aggregate whose size is bounded
    by #groups × #buckets, never by corpus rows. The cumulative-offset
    window below runs over that bounded aggregate, NOT the corpus — the
    sanctioned bounded-window pattern.
    """
    from pyspark.sql import Window

    staged = df.withColumn("_bkt", bucket_col)
    w_local = Window.partitionBy(*partition_cols, "_bkt").orderBy(*order_cols)
    local = staged.withColumn("_lrn", F.row_number().over(w_local))
    # counts from the POST-window branch: its exchange canonicalizes to
    # the same subtree as the window's own, so ReuseExchange shuffles the
    # corpus once, not once per branch
    counts = local.groupBy(*partition_cols, "_bkt").agg(
        F.count(F.lit(1)).alias("_bc")
    )
    w_off = (
        Window.partitionBy(*partition_cols)  # bounded-window: over the
        # #groups×#buckets count aggregate, never corpus rows
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.withColumn(
        "_off", F.coalesce(F.sum("_bc").over(w_off), F.lit(0))
    ).drop("_bc")
    joined = local.join(
        F.broadcast(offs), [*partition_cols, "_bkt"], "inner"
    )
    return (
        joined.withColumn(name, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_lrn", "_off", "_bkt")
    )


def bucketed_running_sum(
    df: DataFrame,
    partition_cols: list[str],
    bucket_col: Column,
    order_cols: list[Column],
    weight_col: Column,
    name: str,
    rank_name: str | None = None,
    total_name: str | None = None,
    count_name: str | None = None,
) -> DataFrame:
    """Scalable inclusive running sum — ``SUM(weight) OVER (PARTITION BY
    partition_cols ORDER BY order_cols ROWS UNBOUNDED PRECEDING)`` — by
    the same decomposition as :func:`bucketed_row_number` (which is this
    with weight 1): a LOW-CARDINALITY partition spec (a 3-value flag, a
    global fold) would drag the whole corpus through #groups tasks;
    bucketing by a monotone-in-order column keeps every window partition
    corpus-fraction sized while the broadcast per-bucket offsets make the
    sum exact.

    Same contract: ``bucket_col`` monotone nondecreasing in
    ``order_cols`` within every partition group. Weights must be
    integral/decimal for exactness (the offsets add across buckets);
    the output column keeps SUM(weight)'s natural type (long for
    integral weights, widened decimal for decimals, double for
    floats — no silent truncation).

    Fused companion outputs (round 12 — every one rides artifacts this
    pass already computes, so callers stop paying extra corpus passes):

    - ``rank_name``: the global ordinal, exactly
      :func:`bucketed_row_number` (row_number shares the local window's
      partition+order spec, so Catalyst collapses both into ONE Window
      node; the per-bucket row counts ride the same panel aggregate).
      Callers that ran BOTH helpers paid two corpus shuffles and then a
      corpus-scale join to line the columns up again.
    - ``total_name``: the per-partition-group weight total — a
      whole-frame window over the bounded (#groups × #buckets) panel,
      attached by the broadcast join that already happens. Callers that
      aggregated the corpus a second time for ``SUM(w) OVER (PARTITION
      BY g)`` drop that pass. TYPE NOTE (round-13 advisory): unlike
      ``rank_name``/``count_name`` (always cast long), ``total_name``
      keeps SUM's natural type — long for integral weights, widened
      decimal for decimals, double for floats — matching the main
      ``name`` output; callers whose oracle CASTs the total (e.g. to
      BIGINT) own that cast, exactly as they do for ``name``.
    - ``count_name``: the weight-1 twin of ``total_name`` (group row
      count); requires ``rank_name`` to be set too (it rides the same
      per-bucket row counts).
    """
    from pyspark.sql import Window

    if count_name and not rank_name:
        raise ValueError("count_name requires rank_name (shares its panel)")
    staged = df.withColumn("_bkt", bucket_col).withColumn("_wt", weight_col)
    w_local = (
        Window.partitionBy(*partition_cols, "_bkt")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = staged.withColumn("_lcs", F.sum("_wt").over(w_local))
    if rank_name:
        # row_number's implicit frame is the same ROWS UNBOUNDED
        # PRECEDING..CURRENT ROW — CollapseWindow fuses both expressions
        # into the one WindowExec over the one exchange
        w_rn = Window.partitionBy(*partition_cols, "_bkt").orderBy(*order_cols)
        local = local.withColumn("_lrn", F.row_number().over(w_rn))
    aggs = [F.sum("_wt").alias("_bs")]
    if rank_name:
        aggs.append(F.count(F.lit(1)).alias("_bc"))
    counts = local.groupBy(*partition_cols, "_bkt").agg(*aggs)
    w_off = (
        Window.partitionBy(*partition_cols)  # bounded-window: over the
        # #groups×#buckets weight-sum aggregate, never corpus rows
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.withColumn(
        "_off", F.coalesce(F.sum("_bs").over(w_off), F.lit(0))
    )
    if rank_name:
        offs = offs.withColumn(
            "_roff", F.coalesce(F.sum("_bc").over(w_off), F.lit(0))
        )
    if total_name or count_name:
        w_tot = Window.partitionBy(*partition_cols).orderBy("_bkt").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        if total_name:
            offs = offs.withColumn(total_name, F.sum("_bs").over(w_tot))
        if count_name:
            offs = offs.withColumn(
                count_name, F.sum("_bc").over(w_tot).cast("long")
            )
    offs = offs.drop("_bs", "_bc")
    joined = local.join(F.broadcast(offs), [*partition_cols, "_bkt"], "inner")
    out = joined.withColumn(name, F.col("_off") + F.col("_lcs"))
    if rank_name:
        out = out.withColumn(
            rank_name, (F.col("_roff") + F.col("_lrn")).cast("long")
        )
    return out.drop("_lcs", "_lrn", "_off", "_roff", "_wt", "_bkt")


def bucketed_running_max(
    df: DataFrame,
    partition_cols: list[str],
    bucket_col: Column,
    order_cols: list[Column],
    value_col: Column,
    name: str,
    inclusive: bool = True,
) -> DataFrame:
    """Scalable running max — ``MAX(value) OVER (PARTITION BY
    partition_cols ORDER BY order_cols ROWS UNBOUNDED PRECEDING [AND 1
    PRECEDING])`` — by the :func:`bucketed_row_number` decomposition:
    a local running max within each (partition, bucket) window [parallel]
    combined with the broadcast max of all PRECEDING buckets. Max is
    associative and order-insensitive across the bucket boundary, so the
    decomposition is exact for any bucket_col monotone nondecreasing in
    ``order_cols`` within every partition group (same contract as the
    sum/row-number twins).

    ``inclusive=False`` gives the EXCLUSIVE prefix (strictly preceding
    rows only — NULL when no predecessor exists), the form dominance /
    skyline tests need.
    """
    from pyspark.sql import Window

    staged = df.withColumn("_bkt", bucket_col).withColumn("_v", value_col)
    w_base = Window.partitionBy(*partition_cols, "_bkt").orderBy(*order_cols)
    w_local = w_base.rowsBetween(
        Window.unboundedPreceding,
        Window.currentRow if inclusive else -1,
    )
    local = staged.withColumn("_lmx", F.max("_v").over(w_local))
    # per-bucket INCLUSIVE maxes feed the cross-bucket prefix regardless
    # of the local frame: preceding buckets contribute all their rows
    counts = local.groupBy(*partition_cols, "_bkt").agg(
        F.max("_v").alias("_bm")
    )
    w_off = (
        Window.partitionBy(*partition_cols)  # bounded-window: over the
        # #groups×#buckets max aggregate, never corpus rows
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.withColumn("_off", F.max("_bm").over(w_off)).drop("_bm")
    joined = local.join(F.broadcast(offs), [*partition_cols, "_bkt"], "inner")
    merged = (
        F.when(F.col("_off").isNull(), F.col("_lmx"))
        .when(F.col("_lmx").isNull(), F.col("_off"))
        .otherwise(F.greatest(F.col("_lmx"), F.col("_off")))
    )
    return joined.withColumn(name, merged).drop("_lmx", "_off", "_v", "_bkt")
