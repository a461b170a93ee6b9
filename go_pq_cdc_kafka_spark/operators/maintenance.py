"""Storage maintenance: small-file compaction and range-clustered writes.

A CDC sink that lands one file per micro-batch per partition produces the
classic small-files problem: at 100 TB a directory accumulates millions of
KB-sized parquet files, and every downstream scan pays per-file open cost
(driver listing, footer reads, task scheduling) that dwarfs the data read.
The reference engine stops at the Kafka boundary; this module covers the
landing zone its consumers write.

Two operators:

- :func:`compact_parquet` — rewrite a directory into ``ceil(bytes /
  target)`` right-sized files. File sizes come from the Hadoop
  ``FileSystem`` API (works for HDFS/S3A/local alike), the rewrite is one
  ``repartition`` (round-robin — compaction wants even bytes, not
  clustering), and the swap is write-to-sibling + rename. NOTE: directory
  rename is atomic on HDFS and POSIX but copy+delete on object stores —
  production S3 deployments should swap a table-format pointer (Delta /
  Iceberg commit) instead; the sibling-write pattern here is the part that
  transfers.
- :func:`clustered_write` — ``repartitionByRange`` + ``sortWithinPartitions``
  so every output file covers a disjoint range of the cluster key. Parquet
  footers then carry tight min/max stats and any engine (Spark row-group
  pruning, DuckDB/Trino file skipping) reads only the files a range
  predicate touches. Multi-column keys cluster lexicographically — great
  for (tenant, day) hierarchies, useless for independent range predicates
  on the second column alone (that needs Z-ordering, a table-format
  feature, out of scope here).

Both are bounded-memory: nothing collects to the driver except file
*metadata* (one (path, size) pair per file — the same listing every Spark
scan performs anyway).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jpath


def list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every parquet data file under ``path`` (recursive,
    skipping hidden/metadata entries such as ``_SUCCESS`` and
    ``_spark_metadata``)."""
    fs, jpath = _fs_and_path(spark, path)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")) or not name.endswith(".parquet"):
            continue
        out.append((st.getPath().toString(), int(st.getLen())))
    return out


def plan_compaction(
    spark: SparkSession, path: str, target_file_bytes: int = DEFAULT_TARGET_BYTES
) -> dict:
    """Decide whether ``path`` needs compaction and into how many files.

    Worth running when the file count exceeds the byte-optimal count — the
    signature of micro-batch landing zones."""
    files = list_data_files(spark, path)
    total = sum(sz for _, sz in files)
    n_target = max(1, math.ceil(total / target_file_bytes))
    return {
        "n_files": len(files),
        "total_bytes": total,
        "n_target_files": n_target,
        "needs_compaction": len(files) > n_target,
    }


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
    sort_cols: list[str] | None = None,
) -> dict:
    """Rewrite the parquet directory at ``path`` into right-sized files.

    With ``sort_cols`` the rewrite range-partitions + sorts (compaction and
    clustering in one pass — the usual nightly maintenance shape);
    otherwise round-robin for maximally even output sizes. Returns the
    compaction plan actually executed."""
    plan = plan_compaction(spark, path, target_file_bytes)
    n = plan["n_target_files"]
    df = spark.read.parquet(path)
    if sort_cols:
        df = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        df = df.repartition(n)

    fs, jpath = _fs_and_path(spark, path)
    tmp = jpath.suffix("._compact_tmp")
    df.write.mode("overwrite").parquet(tmp.toString())
    # swap: remove originals, move the rewrite into place
    fs.delete(jpath, True)
    if not fs.rename(tmp, jpath):
        raise IOError(f"compaction swap failed: rename {tmp} -> {jpath}")
    return plan


def clustered_write(
    df: DataFrame, path: str, cluster_cols: list[str], num_files: int
) -> None:
    """Write ``df`` as ``num_files`` parquet files with disjoint
    ``cluster_cols`` ranges (range partition + in-file sort), so range
    predicates on the cluster key skip whole files via footer min/max."""
    (
        df.repartitionByRange(num_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_value(cols: list, bits: int = 8):
    """Interleave ``bits``-bit ranks of each column into one Morton (Z)
    key — a pure Column expression (shifts and masks, whole-stage
    codegen), no UDF.

    Sorting by the Z key gives every output file a small hyper-rectangle
    of the key space instead of a thin slab: footer min/max stats on ALL
    interleaved columns stay tight simultaneously, so independent range
    predicates on any single column (or a box on several) skip files.
    Plain lexicographic clustering only achieves that for the leading
    column — the documented gap of :func:`clustered_write`.

    ``cols`` must already be integer ranks in [0, 2**bits). For skewed
    data derive ranks from quantiles, not min-max scaling (see
    :func:`minmax_rank`'s caveat).
    """
    import pyspark.sql.functions as F

    z = F.lit(0).cast("long")
    n = len(cols)
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def minmax_rank(df: DataFrame, col: str, bits: int = 8):
    """(df_with_scalars, rank_col): linear min-max scaling of ``col`` to a
    ``bits``-bit integer rank, the scalars attached by broadcast (no
    collect in the plan's hot path — one tiny agg).

    Caveat: min-max scaling puts heavy skew into few rank values; for
    production Z-ordering of skewed columns substitute approxQuantile
    cutpoints. The interleave (:func:`zorder_value`) is unchanged."""
    import pyspark.sql.functions as F

    lo_name, hi_name = f"_zlo_{col}", f"_zhi_{col}"
    scalars = df.agg(
        F.min(col).cast("double").alias(lo_name),
        F.max(col).cast("double").alias(hi_name),
    )
    out = df.crossJoin(F.broadcast(scalars))
    span = F.col(hi_name) - F.col(lo_name)
    frac = F.when(span > 0, (F.col(col).cast("double") - F.col(lo_name)) / span).otherwise(
        F.lit(0.0)
    )
    rank = F.least(
        F.floor(frac * (1 << bits)).cast("long"), F.lit((1 << bits) - 1)
    )
    return out, rank


def zorder_write(
    df: DataFrame, path: str, zcols: list[str], num_files: int, bits: int = 8
) -> None:
    """Write ``df`` as ``num_files`` parquet files clustered on the Morton
    interleave of ``zcols``: range-partition + sort on the Z key, then drop
    the helper columns. Multi-dimensional file skipping for the price of
    one extra sort column."""
    work = df
    ranks = []
    for c in zcols:
        work, r = minmax_rank(work, c, bits)
        ranks.append(r)
    work = work.withColumn("_zval", zorder_value(ranks, bits))
    (
        work.repartitionByRange(num_files, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval", *[f"_zlo_{c}" for c in zcols], *[f"_zhi_{c}" for c in zcols])
        .write.mode("overwrite")
        .parquet(path)
    )


def footer_stats(
    spark: SparkSession, path: str, key_col: str
) -> dict[str, int]:
    """MIN/MAX/COUNT of a column answered from parquet FOOTER metadata —
    no row-group data is decoded. The table-maintenance primitive behind
    "how big is this 100 TB table and what's its key range" (compaction
    planning, snapshot chunk sizing) where a full scan is absurd.

    Implementation: Spark's parquet aggregate pushdown
    (``spark.sql.parquet.aggregatePushdown``), which requires the V2
    DataSource reader; both confs are flipped for the duration of the
    call and restored, since the engine default stays on the V1 path.
    The plan is asserted in tests to carry ``PushedAggregation`` — if the
    pushdown silently stopped applying, the test fails rather than the
    query quietly becoming a scan."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.parquet.aggregatePushdown",
            "spark.sql.sources.useV1SourceList",
        )
    }
    try:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        row = (
            spark.read.parquet(path)
            .agg(
                F.min(key_col).alias("min_key"),
                F.max(key_col).alias("max_key"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            .collect()[0]
        )
        return {"min_key": row.min_key, "max_key": row.max_key, "n_rows": row.n_rows}
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Dynamic partition overwrite — the idempotent partition-level
    backfill every periodic ETL needs (re-run yesterday's job without
    touching any other day). Only the partitions PRESENT in ``df`` are
    replaced; all others survive untouched. Implemented with Spark's
    native ``partitionOverwriteMode=dynamic`` (a per-write option, not a
    session-level mutation, so concurrent writes elsewhere keep their own
    semantics). At scale this is a metadata-only swap per partition
    directory — no rewrite of unrelated data."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
