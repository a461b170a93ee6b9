"""Bucketed co-located joins — the shuffle-free path for repeated big joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both sides.
When the same join key is used repeatedly (orders ⋈ lineitem on orderkey every
day), pay the shuffle ONCE at write time: ``bucketBy(n, key)`` hash-partitions
files on disk, and Catalyst then plans a SortMergeJoin with **no Exchange** on
either side — each task reads matching bucket files directly. The reference
has no analogue (it never joins); this is pure Spark-side scale machinery
(SURVEY §4: "bucketing for co-located joins").

Rules that make the Exchange actually disappear (all enforced/encoded here):

- both sides bucketed by the SAME columns into the SAME bucket count
  (or a divisor — AQE coalesces);
- ``spark.sql.sources.bucketing.enabled`` on (default) and the join keys
  must be a superset of the bucket keys;
- bucket pruning: an equality filter on the bucket key scans 1/n of the
  files — visible as ``SelectedBucketsCount`` in the scan node.

Sizing: bucket count ≈ table_size / target_file_size (128-256 MB compressed).
A 10 TB fact at 256 MB → ~40k buckets; cap by cluster parallelism so each
task gets ≥1 bucket. Too few buckets ⇒ giant files + no parallelism; too
many ⇒ small-file storm (each writing task emits one file per bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed managed table. ``sortBy`` within buckets
    additionally removes the per-task Sort from later merge joins."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two pre-bucketed tables on their bucket keys. With matching
    bucket specs this plans with zero Exchange (verify via
    ``assert_colocated``)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def assert_colocated(df: DataFrame) -> None:
    """Raise if the physical plan still shuffles — the guard a pipeline calls
    after building a join that is SUPPOSED to ride the bucket layout."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(
            "bucketed join still shuffles — bucket specs mismatch "
            "(columns or counts) or bucketing disabled:\n" + plan
        )


def bucket_count_for(table_bytes: int, target_file_bytes: int = 256 << 20,
                     max_buckets: int = 100_000) -> int:
    """Bucket-count sizing rule (see module docstring)."""
    return max(1, min(max_buckets, table_bytes // max(1, target_file_bytes) or 1))
