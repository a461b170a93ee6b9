"""Binned range join: point-in-interval joins WITHOUT an equi key.

Spark plans a bare range predicate (``p BETWEEN lo AND hi``) as
BroadcastNestedLoopJoin — O(|points|·|intervals|) comparisons, a
non-starter at 100 TB. Binning recovers an equi key: explode each interval
to the buckets it overlaps (``⌈span/width⌉`` rows), tag each point with its
bucket, hash-join on the bucket, then re-check the exact predicate. Cost
becomes O(matching-bucket mass); the bucket key is the shuffle key, so the
plan is an ordinary (broadcastable / AQE-skew-splittable) equi-join.

``bucket_width`` tunes replication vs selectivity: width ≈ median interval
span ⇒ ~2 buckets per interval.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_BUCKET = "_range_bucket"


def _point_bucket(point: Column, width: float) -> Column:
    return F.floor(point / F.lit(width)).cast("long")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """All (point, interval) pairs with ``lo <= point <= hi``, as a bucketed
    equi-join. Each qualifying pair emerges exactly once: the interval is
    replicated across its buckets, but the point lives in exactly one.

    The exact range predicate is part of the JOIN CONDITION (not a post-join
    filter), so ``how='left'`` keeps unmatched points as null-padded rows.
    ``'right'``/``'full'`` are rejected: an unmatched interval exists once
    per bucket replica, so outer-preserving the interval side would emit
    duplicates."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            "point_in_interval_join supports how='inner' or 'left' only; "
            f"got {how!r} (the interval side is bucket-replicated, so "
            "right/full outer would duplicate unmatched intervals)"
        )
    pts = points.withColumn(_BUCKET, _point_bucket(F.col(point_col), bucket_width))
    ivs = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    cond = (
        (pts[_BUCKET] == ivs[_BUCKET])
        & (pts[point_col] >= ivs[lo_col])
        & (pts[point_col] <= ivs[hi_col])
    )
    return pts.join(ivs, cond, how).drop(pts[_BUCKET]).drop(ivs[_BUCKET])


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bucket_width: float,
) -> DataFrame:
    """All (A, B) pairs whose intervals OVERLAP (``A.lo <= B.hi AND
    B.lo <= A.hi``), as a bucketed equi-join — the interval-interval
    sibling of :func:`point_in_interval_join` (calendar conflicts,
    session co-occurrence, validity-window intersection).

    Both sides replicate across their covered buckets, so a pair can
    co-occur in several buckets; the standard dedup-free guard keeps it
    exactly once — the pair only counts in the bucket containing
    ``greatest(A.lo, B.lo)`` (the overlap's left edge), no DISTINCT
    needed. The overlap predicate is part of the join condition; output
    is inner-only (outer semantics would duplicate the replicated sides).

    Scale: shuffle volume = interval count × mean buckets-per-interval;
    pick ``bucket_width`` near the typical interval length so that factor
    stays ~2. Both sides must fit the usual skew guidance (a single
    bucket holding a large fraction of both sides degenerates — widen the
    bucket or pre-split hot ranges)."""
    lb = left.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(l_lo) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(l_hi) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    rb = right.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(r_lo) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(r_hi) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    edge_bucket = F.floor(
        F.greatest(lb[l_lo], rb[r_lo]) / F.lit(bucket_width)
    ).cast("long")
    cond = (
        (lb[_BUCKET] == rb[_BUCKET])
        & (lb[l_lo] <= rb[r_hi])
        & (rb[r_lo] <= lb[l_hi])
        & (lb[_BUCKET] == edge_bucket)
    )
    return lb.join(rb, cond, "inner").drop(lb[_BUCKET]).drop(rb[_BUCKET])
