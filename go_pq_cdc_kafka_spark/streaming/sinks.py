"""Effectively-once file output from a foreachBatch sink.

Structured Streaming's replay after a failure re-delivers the SAME
micro-batch with the SAME ``batchId`` (offsets come from the checkpoint).
The reference's contract is at-least-once with downstream dedup
(README.md:36-42; ack-after-flush, producer_batch.go:141-151); for file
outputs this module upgrades that to effectively-once with idempotent
batch directories, without the streaming parquet sink's ``_spark_metadata``
log (which hides files any OTHER writer adds to the directory — the
reason handoff.py's mixed snapshot+stream sink avoids it):

- each batch writes to ``<out>/batch=<id>/`` and then drops a
  ``_COMMITTED`` marker; a replayed batchId whose marker exists is a no-op
- a crash mid-write leaves no marker; the replay overwrites the partial
  directory and commits it
- readers list only committed directories, so partial output is never
  visible

The batch=<id> layout is plain hive partitioning: downstream Spark reads
get a ``batch`` column for free and prune on it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def foreach_batch_idempotent_parquet(out_path: str):
    """Build the foreachBatch callable. Use as
    ``records.writeStream.foreachBatch(foreach_batch_idempotent_parquet(p))``."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        target = os.path.join(out_path, f"batch={batch_id}")
        marker = os.path.join(target, "_COMMITTED")
        if os.path.exists(marker):
            return  # replayed batch: already durable, ack and move on
        batch_df.write.mode("overwrite").parquet(target)
        with open(marker, "w", encoding="utf-8"):
            pass

    return write


def read_committed(spark: SparkSession, out_path: str) -> DataFrame:
    """Read ONLY committed batch directories (partial/in-flight output is
    invisible). Raises if nothing has committed yet."""
    committed = [
        os.path.join(out_path, d)
        for d in sorted(os.listdir(out_path))
        if d.startswith("batch=")
        and os.path.exists(os.path.join(out_path, d, "_COMMITTED"))
    ]
    if not committed:
        raise FileNotFoundError(f"no committed batches under {out_path}")
    return spark.read.option("basePath", out_path).parquet(*committed)


def vacuum_uncommitted(out_path: str, min_age_seconds: float = 3600) -> list[str]:
    """Remove ``batch=<id>`` directories that never got their ``_COMMITTED``
    marker — the debris of a writer that crashed mid-batch (replay rewrote
    the batch under the same id only if the retry happened; an abandoned
    checkpoint leaves the partial dir forever). Only directories older
    than ``min_age_seconds`` are touched, so an IN-FLIGHT batch of a live
    query is never vacuumed. Returns the removed paths. Readers were never
    at risk (read_committed filters on the marker); this is storage
    hygiene, the moral equivalent of VACUUM on the file sink."""
    import shutil
    import time

    removed = []
    if not os.path.isdir(out_path):
        return removed
    cutoff = time.time() - min_age_seconds
    for d in sorted(os.listdir(out_path)):
        target = os.path.join(out_path, d)
        if not (d.startswith("batch=") and os.path.isdir(target)):
            continue
        if os.path.exists(os.path.join(target, "_COMMITTED")):
            continue
        if os.path.getmtime(target) > cutoff:
            continue
        shutil.rmtree(target)
        removed.append(target)
    return removed
