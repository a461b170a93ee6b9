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
