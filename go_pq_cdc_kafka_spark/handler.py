"""The user-transform layer — reference ``Handler`` (handler.go:5) re-expressed.

The reference's only extension point is ``type Handler func(event *Message)
[]kafka.Message`` — a per-event flatMap (1→N, N=0 drops the event but still
acks it, connector.go:158-168). Here the handler surface is *the whole
DataFrame API*: a handler is any ``DataFrame -> DataFrame`` transform over the
envelope. This module provides the conventional building blocks observed in
the reference's handlers and tests:

- T2 operation-field injection (README.md:186-187)
- T3 key extraction/serialization (example/simple/main.go:119)
- T4 header construction (example/snapshot/main.go:168-175)
- image choice: DELETE payloads render the pre-image
  (integration_test/connector_test.go:663-713)
- a ``mapInPandas`` escape hatch for arbitrary Python 1→N transforms

plus :func:`to_kafka_records`, the full record-shaping convention
(FIXTURES.md §3): ``{topic, key, value, headers}`` matching the Kafka sink's
expected columns.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from go_pq_cdc_kafka_spark.envelope import (
    OP_DELETE,
    SOURCE_CDC,
    SOURCE_SNAPSHOT,
)

# A Handler is any DataFrame transform over the envelope — composition with
# .transform() chains them, mirroring handler pipelines.
Handler = Callable[[DataFrame], DataFrame]


def choose_image(df: DataFrame, alias: str = "image") -> DataFrame:
    """DELETE → pre-image, everything else → post-image (the payload-choice
    convention in integration_test/connector_test.go:663-713)."""
    return df.withColumn(
        alias,
        F.when(F.col("op") == OP_DELETE, F.col("before")).otherwise(F.col("after")),
    )


def inject_operation(image: Column, op: Column) -> Column:
    """``data["operation"] = msg.Type`` before serialization
    (README.md:186-187; example/snapshot/main.go:165-166). Works for both
    struct images (withField) and map images (map_concat); NULL images stay
    NULL (both functions are null-propagating)."""
    return image.withField("operation", op)


def inject_operation_map(image: Column, op: Column) -> Column:
    """Map-typed image variant of :func:`inject_operation`."""
    return F.map_concat(image, F.create_map(F.lit("operation"), op))


def extract_key(image: Column, pk_field: str) -> Column:
    """PK → string bytes for the Kafka key (example/simple/main.go:119;
    int32/int64/float64 handling connector_test.go:668-678 — the string cast
    covers all of them)."""
    return image.getField(pk_field).cast("string").cast("binary")


def source_tag(op: Column) -> Column:
    """``source`` header value ∈ {initial-snapshot, cdc}
    (example/snapshot/README.md:88-113)."""
    return F.when(op == "SNAPSHOT", F.lit(SOURCE_SNAPSHOT)).otherwise(
        F.lit(SOURCE_CDC)
    )


def build_headers(op: Column, table: Column) -> Column:
    """operation/table/source headers (example/snapshot/main.go:168-175) in
    the Kafka sink's header shape ARRAY<STRUCT<key:STRING, value:BINARY>>."""
    def h(k: str, v: Column) -> Column:
        return F.struct(F.lit(k).alias("key"), v.cast("binary").alias("value"))

    return F.array(
        h("operation", op),
        h("table", table),
        h("source", source_tag(op)),
    )


def to_kafka_records(
    df: DataFrame,
    pk_field: str,
    include_headers: bool = True,
    topic_col: str = "topic",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Envelope → Kafka record columns ``(topic, key, value, headers)``.

    ``value`` is JSON of the chosen image with the injected ``operation``
    field (README.md:183-212); DELETE values render the pre-image. The
    ``topic`` column must already exist (see plans.routing). All JVM-side
    expressions — no Python in the hot path.

    ``carry_cols`` threads extra envelope columns (e.g. ``lsn`` for the
    strict-order sink) through the projection; callers drop them before the
    actual produce.
    """
    imaged = choose_image(df)
    image_t = dict(imaged.dtypes)["image"]
    inject = inject_operation_map if image_t.startswith("map") else inject_operation
    out = imaged.select(
        F.col(topic_col).alias("topic"),
        extract_key(F.col("image"), pk_field).alias("key"),
        F.to_json(inject(F.col("image"), F.col("op"))).cast("binary").alias("value"),
        *(
            [build_headers(F.col("op"), F.col("table_name")).alias("headers")]
            if include_headers
            else []
        ),
        *[F.col(c) for c in carry_cols],
    )
    return out


def flat_map_handler(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
) -> DataFrame:
    """Arbitrary-Python 1→N transform — the full-generality analogue of the
    reference Handler (handler.go:5). Arrow-batched ``mapInPandas``; the
    callable receives/returns pandas frames, and returning 0 rows for an
    input row drops that event (ack-and-skip, connector.go:159-168, is the
    checkpoint's job in Spark — dropped rows are still committed)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(_gen, schema=schema)


DEBEZIUM_OP = {"INSERT": "c", "UPDATE": "u", "DELETE": "d", "SNAPSHOT": "r"}


def debezium_value(
    op: Column,
    before: Column,
    after: Column,
    lsn: Column,
    source_name: str,
    schema_name: str,
    table_name: str,
) -> Column:
    """Debezium-compatible change-event VALUE as a JSON column — the
    migration surface for consumers already built against the Debezium
    PostgreSQL connector's envelope (a common pairing with the reference;
    its handler surface, handler.go:5, leaves the payload shape to the
    user). Field order and semantics follow Debezium's data-change-event
    layout: ``before`` / ``after`` images, a ``source`` block
    (connector, name, schema, table, lsn, snapshot flag), and the
    single-char ``op`` (c/u/d + r for snapshot reads).

    Conventions preserved from the reference's model: ``before`` is the
    REPLICA IDENTITY projection (key-only under the default identity —
    pass the key struct), ``after`` is null for deletes, and
    ``snapshot`` is the string flag Debezium uses. Nulls render
    explicitly (``ignoreNullFields=false``) so every event carries the
    full envelope shape. Pure Column expressions — JVM-side JSON
    serialization, no UDF."""
    op_char = (
        F.when(op == "INSERT", "c")
        .when(op == "UPDATE", "u")
        .when(op == "DELETE", "d")
        .when(op == "SNAPSHOT", "r")
    )
    source = F.struct(
        F.lit("postgresql").alias("connector"),
        F.lit(source_name).alias("name"),
        F.lit(schema_name).alias("schema"),
        F.lit(table_name).alias("table"),
        lsn.cast("long").alias("lsn"),
        F.when(op == "SNAPSHOT", "true").otherwise("false").alias("snapshot"),
    )
    return F.to_json(
        F.struct(
            before.alias("before"),
            after.alias("after"),
            source.alias("source"),
            op_char.alias("op"),
        ),
        {"ignoreNullFields": "false"},
    )
