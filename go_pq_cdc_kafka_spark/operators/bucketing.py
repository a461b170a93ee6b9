"""Co-located storage layouts: bucketed tables and range-clustered files.

Two write-side techniques that trade one write-time shuffle for ZERO
shuffles on every subsequent read — the storage half of the engine's
scale story (the plan half lives in tests/test_plans.py):

- :func:`write_bucketed` — hash-bucketed, per-bucket-sorted table writes
  (``DataFrameWriter.bucketBy``). Two tables bucketed on the same key
  with the same bucket count join with NO Exchange and NO Sort on either
  side: the scan itself satisfies the join's distribution requirement.
  For a fact table that is joined on the same key by many downstream
  queries (the orders⋈lineitem edge every TPC-H-shaped query shuffles),
  this converts a per-query 100 TB shuffle into a once-at-ingest cost.

- :func:`write_range_clustered` — range-partition + sort-within-partition
  parquet layout. Parquet keeps min/max stats per row group; writing
  rows range-clustered on a filter column makes those stats DISJOINT
  across files, so a range predicate prunes whole files/row-groups at
  scan time instead of reading and discarding. This is the layout freedom
  the engine's pushed-filter plans (PushedFilters in PLANS.md) need to
  actually skip bytes at 100 TB.

Reference parity note: go-pq-cdc-kafka has no storage layer of its own —
it streams into Kafka (reference config/config.go topic routing). These
helpers cover the SURVEY §2.B sink rows' "co-located join" obligation on
the Spark side, where materialized tables ARE part of the engine surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and, by default, per-bucket sorted)
    catalog table.

    Bucket count is a CONTRACT, not a tuning knob: every table that wants
    shuffle-free joins against this one must use the SAME ``num_buckets``
    on the SAME key — Spark only elides the exchange when the output
    partitionings match exactly. Sorting within buckets additionally
    elides the sort-merge join's per-side Sort, making the join a pure
    zip of pre-sorted streams — but read-side ordering propagation is
    gated on ``spark.sql.legacy.bucketedTableScan.outputOrdering=true``
    (off by default since Spark 3.0 because MULTI-file buckets would need
    a scan-time merge-sort; this writer repartitions to one file per
    bucket precisely so the conf is safe to enable). Exchange elision
    needs no conf.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if sort:
        # ONE file per bucket, or the sort metadata is useless: Spark only
        # elides the read-side Sort when each bucket is a single file (it
        # will not merge-sort multiple files per bucket at scan time).
        # repartition on the key uses the same Murmur3-pmod placement as
        # the bucket spec, so after this each task holds exactly one
        # bucket's rows and writes exactly one file.
        df = df.repartition(num_buckets, *keys)
    w = (
        df.write.format(format)
        .mode(mode)
        .bucketBy(num_buckets, keys[0], *keys[1:])
    )
    if sort:
        w = w.sortBy(keys[0], *keys[1:])
    w.saveAsTable(table)


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write parquet range-clustered on ``cluster_col``: rows are range-
    partitioned (global order across files) then sorted within each file,
    so every file's row-group min/max envelope on the column is narrow
    and disjoint — the precondition for footer-stats pruning to skip
    files on range predicates. One write-time range-exchange buys every
    future scan's skip."""
    (
        df.repartitionByRange(num_files, cluster_col)
        .sortWithinPartitions(cluster_col)
        .write.mode(mode)
        .parquet(path)
    )


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 32,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write parquet Z-ORDER (Morton) clustered on two or more integer-like
    columns: each column is min/max-normalized to ``bits`` fixed-point
    bits, the bits are interleaved into one Morton key, and files are
    range-partitioned + sorted on that key.

    Why not :func:`write_range_clustered` twice: single-column clustering
    gives one column a narrow per-file envelope and leaves every OTHER
    column's envelope at the full global range — a predicate on the second
    column prunes nothing. Morton interleaving makes every file a small
    hyper-rectangle in ALL clustered dimensions (envelope width shrinks
    ~num_files^(-1/d) per dimension), so parquet footer min/max stats
    prune files for predicates on ANY clustered column. Same trick as
    Delta/Iceberg OPTIMIZE ZORDER, built from Column bit-arithmetic.

    Scale shape: one broadcast 1-row min/max aggregate (bounded scalar),
    map-side key computation, one range exchange — identical cost profile
    to the single-column layout at any size.
    """
    import pyspark.sql.functions as F

    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns (use "
                         "write_range_clustered for one)")
    span = (1 << bits) - 1
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__max_{c}") for c in cols],
    )
    with_stats = df.join(F.broadcast(stats))
    # fixed-point normalize each column into [0, 2^bits)
    quant = {
        c: F.least(
            F.lit(span),
            F.floor(
                (F.col(c).cast("double") - F.col(f"__min_{c}"))
                / F.greatest(
                    F.col(f"__max_{c}") - F.col(f"__min_{c}"), F.lit(1e-300)
                )
                * span
            ).cast("long"),
        )
        for c in cols
    }
    # interleave: bit b of column i lands at position b*len(cols)+i
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            z = z + F.shiftleft(
                F.shiftright(quant[c], b).bitwiseAND(F.lit(1).cast("long")),
                b * len(cols) + i,
            )
    (
        with_stats.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])
        .write.mode(mode)
        .parquet(path)
    )


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (the bucketing
    metadata only survives a catalog read — ``spark.read.parquet`` on the
    same files would forget the distribution and reintroduce shuffles)."""
    return spark.table(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two pre-bucketed tables on their bucket keys. With matching
    bucket specs this plans with zero Exchange (verify via
    :func:`assert_colocated`)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def assert_colocated(df: DataFrame) -> None:
    """Raise if the physical plan contains any Exchange — the executable
    contract that a bucketed join/aggregation really is co-located (an
    assertion, not a log line, so pipelines fail fast when someone writes
    a side with the wrong bucket count and silently reintroduces the
    100 TB shuffle)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(f"plan is not co-located (Exchange present):\n{plan}")


def bucket_count_for(
    table_bytes: int, target_file_bytes: int = 256 << 20, cap: int = 100_000
) -> int:
    """Sizing rule: bucket count ~ table_size / target_file_size (128-256 MB
    compressed per bucket file). Too few buckets => giant files and no
    parallelism; too many => a small-file storm (every writing task emits
    one file per bucket). Capped so a petabyte table cannot demand more
    open file handles than a cluster can hold."""
    return max(1, min(cap, table_bytes // target_file_bytes))
