"""Bloom-filter runtime join pruning: reduce a fact table BEFORE its
shuffle join when even the dimension's filtered KEY SET is too large to
broadcast exactly.

The semi-join reduction play (queries.join_semi_reduced_fact) broadcasts
the exact key set — right whenever that set is small. One decade up the
filtered dimension holds millions of keys and the exact broadcast is tens
of MB of hash table; engines then reach for a Bloom filter: a CONSTANT-
size bitmap (sized at build time from the observed key count, ~16 bits
per key for ~0.1% false positives at k=3) that admits every true key and
a bounded fraction of impostors. The subsequent exact join eliminates the
impostors, so the final result is EXACTLY the plain join's — the bitmap
only prunes shuffle input, it never decides membership. This is the same
contract as Spark's own runtime row-group filtering
(spark.sql.optimizer.runtime.bloomFilter.enabled, which Spark only
injects below fixed creation thresholds) done explicitly in the plan so
the reduction is guaranteed, inspectable, and available to any join
shape.

Distributed build, no driver round-trip: every key contributes its k
probe positions map-side; a 64-bit-word aggregation ORs them into
``pmod(xxhash64(key, seed), m) div 64`` buckets (≤ m/64 groups — the
shuffle moves words, not keys), and one sparse MAP row (word index →
word) is assembled with ``map_from_entries``. Occupied words only: at
the recommended geometry (~16m bits for n keys) the map is ~16 bytes per
set word, bounded by k·n — single-digit MB per million keys, a
broadcast-safe one-row table. Probing is three pure JVM expressions per
row (hash, element_at, bit test) attached via a one-row broadcast join —
map-only on the fact side, no shuffle before the reduction.
"""

from __future__ import annotations

from functools import reduce as _reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def bloom_geometry(n_keys: int, bits_per_key: int = 16, cap_bits: int = 1 << 27) -> int:
    """Bitmap size for an observed key count: ``bits_per_key``·n rounded up
    to a multiple of 64, capped (2^27 bits = 16 MiB of words — past that the
    broadcast itself becomes the problem and the filter should be dropped or
    sharded). The default 16 bits/key with k=3 gives ~0.15% false positives
    ((1 - e^(-3/16))^3); the filter stays USEFUL (not correct — it is always
    correct) down to ~4 bits/key."""
    m = max(64, n_keys * bits_per_key)
    m = min(m, cap_bits)
    return (m + 63) // 64 * 64


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    # seed folded in as a second hash input — xxhash64 is variadic, so the
    # k probe functions are k independent column hashes of the SAME bytes
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def bloom_build(keys: DataFrame, key_col: str, m_bits: int, k: int = 3) -> DataFrame:
    """One-row DataFrame ``{_k: 1, _bloom: map<long, long>}`` — the sparse
    bitmap (word index → 64-bit word) over the distinct values of
    ``key_col``. Build cost: one map-side explode to k positions, one
    aggregation keyed by word index (≤ m_bits/64 groups), one single-row
    map assembly. Nothing touches the driver."""
    probes = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("_pos")
    )
    words = probes.select(
        F.expr("_pos div 64").alias("_w"),
        F.expr("shiftleft(cast(1 as bigint), cast(_pos % 64 as int))").alias("_b"),
    ).groupBy("_w").agg(F.expr("bit_or(_b)").alias("_word"))
    return words.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("_w", "_word")))
        ).alias("_bloom")
    ).withColumn("_k", F.lit(1))


def bloom_probe(
    df: DataFrame, key_col: str, bloom: DataFrame, m_bits: int, k: int = 3
) -> DataFrame:
    """Filter ``df`` to rows whose ``key_col`` the bloom table MAY contain
    (every true member passes; false positives pass at the geometry's
    designed rate and must be removed by a later exact join). The bloom row
    rides a one-row broadcast join; each probe is element_at + bit test —
    whole-stage-codegen expressions, no Python, no shuffle of ``df``."""
    probed = df.withColumn("_k", F.lit(1)).join(F.broadcast(bloom), "_k")
    # the PySpark shiftright wrapper takes only a literal bit count, so the
    # bit test is written in SQL (ShiftRight the expression DOES take a
    # column); a word absent from the sparse map is all-zero → coalesce 0
    conds = [
        F.expr(
            f"(shiftright(coalesce(element_at(_bloom, "
            f"pmod(xxhash64(`{key_col}`, {i}), {m_bits}) div 64), "
            f"cast(0 as bigint)), "
            f"cast(pmod(xxhash64(`{key_col}`, {i}), {m_bits}) % 64 as int)) "
            f"& 1) = 1"
        )
        for i in range(k)
    ]
    keep = _reduce(lambda a, c: a & c, conds)
    return probed.filter(keep).drop("_k", "_bloom")
