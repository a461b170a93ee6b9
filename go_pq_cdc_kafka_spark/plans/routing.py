"""Table→topic routing (reference R1-R4, connector.go:144-156 & 194-265).

Reference semantics reproduced exactly:

1. empty mapping ⇒ pass-through: every event keeps flowing and the
   handler-chosen topic is used (connector.go:196-199);
2. exact ``schema.table`` match wins (connector.go:201-203);
3. else TimescaleDB chunk → parent hypertable, then the parent is looked up
   (connector.go:204-209; upstream-maintained map);
4. else Postgres partition → parent by progressive ``_`` prefix: for tokens
   ``t1_t2_…_tn`` try ``t1``, ``t1_t2``, … ``t1_…_t(n-1)`` in order and take
   the FIRST (shortest) prefix present in the mapping (connector.go:249-265);
5. still no topic ⇒ the event is skipped-and-acked (connector.go:146-156) —
   here: filtered out (the streaming checkpoint commits dropped rows too);
6. a non-empty handler-set per-message topic overrides the routed default
   (connector.go:170-172, 186-192) — note routing runs BEFORE the handler,
   so a routing miss drops the event even if a handler would have set a
   topic.

The reference memoizes partition-parent resolution in a ``sync.Map``
(connector.go:221-247); vectorized literal-map expressions make that cache
unnecessary — the whole resolution is a projection (no join, no shuffle),
since the mapping is small driver-side config.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


@dataclass(frozen=True)
class RoutingTable:
    """``schema.table`` → topic mapping (README.md:249) plus the hypertable
    chunk→parent dimension (chunk full name → parent full name)."""

    table_topic_mapping: dict[str, str] = field(default_factory=dict)
    hypertables: dict[str, str] = field(default_factory=dict)

    @property
    def pass_through(self) -> bool:
        return not self.table_topic_mapping


def _lit_map(d: dict[str, str]) -> Column:
    pairs: list[Column] = []
    for k, v in d.items():
        pairs += [F.lit(k), F.lit(v)]
    return F.create_map(*pairs)


def routed_topic(routing: RoutingTable) -> Column:
    """Column expression: the routed default topic for each event (NULL on
    miss). Needs ``table_namespace``/``table_name`` columns."""
    if routing.pass_through:
        return F.lit(None).cast("string")
    mapping = _lit_map(routing.table_topic_mapping)
    full = F.concat_ws(".", F.col("table_namespace"), F.col("table_name"))
    exact = F.element_at(mapping, full)

    hyper = (
        F.element_at(mapping, F.element_at(_lit_map(routing.hypertables), full))
        if routing.hypertables
        else F.lit(None).cast("string")
    )

    # progressive-prefix partition parent: shortest mapped prefix wins
    tokens = F.split(F.col("table_name"), "_")
    candidates = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tokens) - 1, F.lit(1))),
        lambda i: F.concat_ws(
            ".",
            F.col("table_namespace"),
            F.array_join(F.slice(tokens, 1, i), "_"),
        ),
    )
    prefix_hits = F.filter(
        F.transform(candidates, lambda c: F.element_at(mapping, c)),
        lambda t: t.isNotNull(),
    )
    parent = F.when(F.size(tokens) > 1, F.element_at(
        F.concat(prefix_hits, F.array(F.lit(None).cast("string"))), 1
    )).otherwise(F.lit(None).cast("string"))

    return F.coalesce(exact, hyper, parent)


def resolve_topics(
    df: DataFrame,
    routing: RoutingTable,
    handler_topic_col: str | None = None,
    out_col: str = "topic",
) -> DataFrame:
    """Attach the final ``topic`` column and drop unroutable events.

    ``handler_topic_col`` is the optional per-message override column set by
    a handler (empty string = not set, as in the reference)."""
    override = (
        F.nullif(F.col(handler_topic_col), F.lit(""))
        if handler_topic_col
        else F.lit(None).cast("string")
    )
    if routing.pass_through:
        # empty mapping: pass-through, handler topic (possibly NULL) is it
        return df.withColumn(out_col, override)
    out = df.withColumn("_routed", routed_topic(routing))
    out = out.filter(F.col("_routed").isNotNull())  # skip-and-ack on miss
    return out.withColumn(out_col, F.coalesce(override, F.col("_routed"))).drop(
        "_routed"
    )


def resolve_topics_from_dimension(
    df: DataFrame,
    dim_path: str,
    handler_topic_col: str | None = None,
    out_col: str = "topic",
) -> DataFrame:
    """``resolve_topics`` against a LIVE routing dimension instead of a
    plan-baked literal map.

    The reference's routing state is not static: go-pq-cdc refreshes the
    TimescaleDB hypertable map behind the connector's back (sync.Map,
    connector.go:204-209), so a chunk created after startup still routes.
    A literal ``create_map`` can't do that — it is frozen at plan time.

    Streaming contract: call this INSIDE ``foreachBatch`` (each call does a
    fresh ``spark.read.parquet``, so the dimension is re-listed and re-read
    every micro-batch). Do NOT embed it in the streaming plan itself — a
    stream-static join pins the static side's file listing at query start,
    so neither appends nor overwrites of the dimension would ever be seen
    (verified behavior, see tests/test_routing.py).

    Scale: the dimension is table-count sized (thousands of rows), always
    broadcast — no shuffle on the stream side, same as the literal map.
    """
    spark = df.sparkSession
    dim = F.broadcast(
        spark.read.parquet(dim_path).select(
            F.col("full_table").alias("_dim_full"),
            F.col("topic").alias("_dim_topic"),
        )
    )
    full = F.concat_ws(".", F.col("table_namespace"), F.col("table_name"))
    override = (
        F.nullif(F.col(handler_topic_col), F.lit(""))
        if handler_topic_col
        else F.lit(None).cast("string")
    )
    return (
        df.withColumn("_full", full)
        .join(dim, F.col("_full") == F.col("_dim_full"), "left")
        .filter(F.col("_dim_topic").isNotNull())  # skip-and-ack on miss
        .withColumn(out_col, F.coalesce(override, F.col("_dim_topic")))
        .drop("_full", "_dim_full", "_dim_topic")
    )
