"""Sequence packing: assign documents to fixed token-budget bins.

LLM pretraining loaders concatenate documents into fixed-length sequences;
the shuffle-side question is which documents travel together. This operator
answers it with *contiguous greedy packing*: within each partition group,
documents are laid out in a deterministic order and a document starts in
the bin its running token total has reached — bin boundaries may split a
document (truncation-tolerant semantics, the common choice for pretraining
where a doc crossing the boundary is split across sequences).

Formally: ``pack_id = (sum of costs of all PRIOR docs in the group) div
budget``. That definition is

- exactly one window pass (running sum), no iteration, no driver loop;
- deterministic: same data → same packing, regardless of parallelism;
- ANSI-SQL expressible, so the oracle checks exact bin assignments.

Scale: the only shuffle is the window's partitionBy. Groups are user-chosen
(language, source, domain); within a group the window is sequential by
definition of a running sum — if a single group is bigger than an executor
can stream, pre-split it with an additional salt column (the bins then
restart per salt, which packing semantics tolerate).

Integer division is exact (`div`, not floating `/` + floor): at 100 TB the
running total overflows double's 2^53 integer range long before it
overflows BIGINT.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def pack_greedy(
    df: DataFrame,
    cost_col: str,
    budget: int,
    group_cols: list[str],
    order_col: str,
) -> DataFrame:
    """Add ``pack_id``: the token-budget bin of each row within its group."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum(F.col(cost_col).cast("long")).over(w), F.lit(0).cast("long"))
    return df.withColumn("pack_id", _int_div(prev, budget))


def _int_div(col: F.Column, divisor: int) -> F.Column:
    """Exact integer division of a non-negative BIGINT column: `-`/`%` stay
    in BIGINT, the final divide runs in DECIMAL (its argument is an exact
    multiple of the divisor, so the quotient is an integer — no double
    rounding above 2^53 the way `floor(x / d)` would)."""
    return (
        (col - col % F.lit(divisor)).cast("decimal(38,0)") / F.lit(divisor)
    ).cast("long")
