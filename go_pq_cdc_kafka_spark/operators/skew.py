"""Skew mitigation: salted two-phase aggregation and salted replicated joins.

AQE's skew-join splitting (on by default in session.RUNTIME_CONFS) handles
skew that materializes in shuffle files; these operators handle the cases AQE
cannot: a single hot GROUP BY key whose partial aggregate still funnels into
one reducer, and a hot join key against a dimension too big to broadcast.

Both are pure DataFrame compositions — results are exactly equal to the
unsalted form (asserted in tests/test_skew.py); only the shuffle layout
changes.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_SALT = "_salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    buckets: int = 32,
    salt_on: str | None = None,
    hot_keys: Sequence | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 aggregates on (keys, salt) — the hot key fans out over
    ``buckets`` reducers; phase 2 merges the per-salt partials on keys alone,
    touching at most ``buckets`` rows per key. Only algebraic merges are
    expressible: ``aggs`` maps output name → (merge_fn, partial_expr) where
    merge_fn ∈ {"sum", "min", "max"} re-aggregates the partial. count =
    ("sum", F.count(...)).

    ``hot_keys`` enables TARGETED salting (use it whenever the hot set is
    known or cheap to find via :func:`key_histogram`): only rows whose
    first key value is in the set get a nonzero salt; every cold key keeps
    salt 0 and therefore exactly ONE phase-1 group. Blanket salting
    multiplies the phase-1 group count by up to ``buckets`` for the entire
    keyspace — measured at sf10-skew (60M rows, 15M distinct keys, 8 hot):
    blanket salted collect_list ran 3.6× SLOWER than naive because 15M
    cold keys became up to 480M partial groups, while targeted salting
    adds only ``buckets×|hot|`` groups. Skew fixes must pay only where
    the skew is.

    The salt is deterministic (hash of ``salt_on`` or the whole row modulo
    buckets) — no RNG, so retried tasks salt identically (a nondeterministic
    salt breaks exactly-once under task retry).
    """
    salt_src = F.col(salt_on) if salt_on else F.struct(*df.columns)
    salt = F.pmod(F.hash(salt_src), F.lit(buckets))
    if hot_keys is not None:
        salt = F.when(
            F.col(keys[0]).isin(list(hot_keys)), salt
        ).otherwise(F.lit(0))
    salted = df.withColumn(_SALT, salt)
    partial = salted.groupBy(*keys, _SALT).agg(
        *[expr.alias(f"_p_{name}") for name, (_m, expr) in aggs.items()]
    )
    merge = {"sum": F.sum, "min": F.min, "max": F.max}
    return partial.groupBy(*keys).agg(
        *[
            merge[m](F.col(f"_p_{name}")).alias(name)
            for name, (m, _e) in aggs.items()
        ]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    buckets: int = 8,
    salt_on: str | None = None,
    how: str = "inner",
    hot_keys: Sequence | None = None,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot values of ``on`` and ``other`` is
    too large to broadcast: salt the skewed side (hot key spreads over
    ``buckets`` partitions), replicate each ``other`` row into all buckets
    (explode — bounded ``buckets``× inflation of the smaller side), join on
    (key, salt). Result rows are exactly the unsalted join's for ``inner``
    and ``left``; ``right``/``full`` are rejected because an unmatched
    ``other`` row exists once per replica and would be emitted ``buckets``
    times."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "semi", "left_anti", "leftanti", "anti"):
        raise ValueError(
            "salted_join supports inner/left/semi/anti joins only; "
            f"got {how!r} (the other side is replicated per salt bucket, so "
            "right/full outer would duplicate its unmatched rows)"
        )
    salt_src = F.col(salt_on) if salt_on else F.struct(*skewed.columns)
    salt = F.pmod(F.hash(salt_src), F.lit(buckets))
    if hot_keys is not None:
        # targeted: only hot keys fan out, and only hot `other` rows are
        # replicated — cold rows pay zero inflation (the blanket form
        # replicates the ENTIRE other side buckets×, which at scale costs
        # more than the skew it cures; see salted_agg's measured note)
        hot = list(hot_keys)
        salt = F.when(F.col(on).isin(hot), salt).otherwise(F.lit(0))
        replicas = F.when(
            F.col(on).isin(hot),
            F.sequence(F.lit(0), F.lit(buckets - 1)),
        ).otherwise(F.array(F.lit(0)))
        right = other.withColumn(_SALT, F.explode(replicas))
    else:
        right = other.withColumn(
            _SALT, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
        )
    left = skewed.withColumn(_SALT, salt)
    return left.join(right, [on, _SALT], how).drop(_SALT)


def key_histogram(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Skew diagnosis: per-key row counts, heaviest first — run this before
    choosing buckets (a 10^6:1 hot key wants more buckets than a 10:1)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc())
        .limit(top)
    )
