"""The CDC change-event data model.

Reference semantics (message.go:9-76):

- ``Message{EventTime, TableName, TableNamespace, OldData, NewData, Type}``
- ``MessageType ∈ {INSERT, UPDATE, DELETE, SNAPSHOT}`` (message.go:64-71)
- population rules (message.go:20-62):

  =========  =========  =========  ===========================
  Type       before     after      event_time
  =========  =========  =========  ===========================
  INSERT     NULL       row        WAL message time
  UPDATE     pre-image  post-image WAL message time
  DELETE     pre-image  NULL       WAL message time
  SNAPSHOT   NULL       row        server time of snapshot read
  =========  =========  =========  ===========================

Any other WAL message kind (Begin/Commit/Relation/Truncate) is dropped by the
reference listener (connector.go:131-141 ``default: return``) — mirrored here
by :func:`filter_known_ops`.

Two schema tiers (SURVEY.md §1.4):

- **typed**: ``before``/``after`` are a per-table ``StructType`` — preferred;
  enables every relational operator and full Catalyst pruning.
- **dynamic**: ``before``/``after`` are ``MAP<STRING,STRING>`` — one stream
  can multiplex heterogeneous tables (reference multiplexes users+books
  through one listener, example/snapshot/main.go:106-110).

``lsn`` is the monotone source offset (the upstream replication slot LSN);
it drives ordering and last-write-wins materialization downstream.
"""

from __future__ import annotations

from typing import Iterable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import (
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OP_INSERT = "INSERT"
OP_UPDATE = "UPDATE"
OP_DELETE = "DELETE"
OP_SNAPSHOT = "SNAPSHOT"
KNOWN_OPS = (OP_INSERT, OP_UPDATE, OP_DELETE, OP_SNAPSHOT)

# Header / payload conventions (reference example/snapshot/main.go:164-179)
SOURCE_SNAPSHOT = "initial-snapshot"
SOURCE_CDC = "cdc"

_COMMON_FIELDS = [
    StructField("op", StringType(), False),
    StructField("event_time", TimestampType(), True),
    StructField("lsn", LongType(), True),
    StructField("table_namespace", StringType(), True),
    StructField("table_name", StringType(), True),
]


def typed_envelope_schema(row_schema: StructType) -> StructType:
    """Envelope with per-table typed before/after images."""
    return StructType(
        _COMMON_FIELDS
        + [
            StructField("before", row_schema, True),
            StructField("after", row_schema, True),
        ]
    )


def dynamic_envelope_schema() -> StructType:
    """Envelope with MAP<STRING,STRING> images (heterogeneous streams)."""
    m = MapType(StringType(), StringType(), True)
    return StructType(
        _COMMON_FIELDS
        + [StructField("before", m, True), StructField("after", m, True)]
    )


# ---------------------------------------------------------------------------
# type predicates (reference message.go:73-76)
# ---------------------------------------------------------------------------

def is_insert(op: Column | str = "op") -> Column:
    return F.col(op) == OP_INSERT if isinstance(op, str) else op == OP_INSERT


def is_update(op: Column | str = "op") -> Column:
    return F.col(op) == OP_UPDATE if isinstance(op, str) else op == OP_UPDATE


def is_delete(op: Column | str = "op") -> Column:
    return F.col(op) == OP_DELETE if isinstance(op, str) else op == OP_DELETE


def is_snapshot(op: Column | str = "op") -> Column:
    return F.col(op) == OP_SNAPSHOT if isinstance(op, str) else op == OP_SNAPSHOT


def filter_known_ops(df: DataFrame) -> DataFrame:
    """Drop unknown message kinds — the reference listener's ``default:
    return`` arm (connector.go:131-141); e.g. TRUNCATE is subscribed but
    never forwarded."""
    return df.filter(F.col("op").isin(*KNOWN_OPS))


# ---------------------------------------------------------------------------
# constructors (reference message.go:20-62) — vectorized over DataFrames
# ---------------------------------------------------------------------------

def _row_struct(df: DataFrame, cols: Iterable[str] | None = None) -> Column:
    names = list(cols) if cols else df.columns
    return F.struct(*[F.col(c) for c in names])


def _with_envelope(
    df: DataFrame,
    op: str,
    before: Column,
    after: Column,
    table_name: str,
    table_namespace: str,
    event_time: Column,
    lsn: Column,
) -> DataFrame:
    return df.select(
        F.lit(op).alias("op"),
        event_time.cast("timestamp").alias("event_time"),
        lsn.cast("long").alias("lsn"),
        F.lit(table_namespace).alias("table_namespace"),
        F.lit(table_name).alias("table_name"),
        before.alias("before"),
        after.alias("after"),
    )


def snapshot_events(
    df: DataFrame,
    table_name: str,
    table_namespace: str = "public",
    event_time: Column | None = None,
    lsn: Column | None = None,
) -> DataFrame:
    """Wrap a bounded table scan as SNAPSHOT events (message.go:53-62):
    before=NULL, after=row, event_time=read time. ``lsn`` defaults to 0 —
    snapshot rows precede every WAL position (README.md:50-54: snapshot
    happens before CDC handoff)."""
    row = df.schema
    return _with_envelope(
        df,
        OP_SNAPSHOT,
        F.lit(None).cast(row),
        _row_struct(df),
        table_name,
        table_namespace,
        event_time if event_time is not None else F.current_timestamp(),
        lsn if lsn is not None else F.lit(0),
    )


def insert_events(
    df: DataFrame,
    table_name: str,
    table_namespace: str = "public",
    event_time: Column | None = None,
    lsn: Column | None = None,
) -> DataFrame:
    """before=NULL, after=row (message.go:20-29)."""
    row = df.schema
    return _with_envelope(
        df,
        OP_INSERT,
        F.lit(None).cast(row),
        _row_struct(df),
        table_name,
        table_namespace,
        event_time if event_time is not None else F.current_timestamp(),
        lsn if lsn is not None else F.monotonically_increasing_id(),
    )


def update_events(
    old_new: DataFrame,
    table_name: str,
    table_namespace: str = "public",
    event_time: Column | None = None,
    lsn: Column | None = None,
) -> DataFrame:
    """``old_new`` must carry struct columns ``old`` and ``new``; before=old,
    after=new (message.go:31-40). Pre-image completeness is a capture-time
    property: replica identity FULL = all columns, DEFAULT = PK only
    (README.md:237) — see :func:`replica_identity_default`."""
    return old_new.select(
        F.lit(OP_UPDATE).alias("op"),
        (event_time if event_time is not None else F.current_timestamp())
        .cast("timestamp")
        .alias("event_time"),
        (lsn if lsn is not None else F.monotonically_increasing_id())
        .cast("long")
        .alias("lsn"),
        F.lit(table_namespace).alias("table_namespace"),
        F.lit(table_name).alias("table_name"),
        F.col("old").alias("before"),
        F.col("new").alias("after"),
    )


def delete_events(
    df: DataFrame,
    table_name: str,
    table_namespace: str = "public",
    event_time: Column | None = None,
    lsn: Column | None = None,
) -> DataFrame:
    """before=pre-image, after=NULL (message.go:42-51)."""
    row = df.schema
    return _with_envelope(
        df,
        OP_DELETE,
        _row_struct(df),
        F.lit(None).cast(row),
        table_name,
        table_namespace,
        event_time if event_time is not None else F.current_timestamp(),
        lsn if lsn is not None else F.monotonically_increasing_id(),
    )


def replica_identity_default(df: DataFrame, pk_cols: list[str]) -> DataFrame:
    """Project the pre-image down to PK columns — replica identity DEFAULT
    (README.md:237; per-table config example/simple/main.go:67-75). Applied
    to an envelope DataFrame; keeps ``after`` intact. Pure struct-field
    pruning, so Catalyst still prunes the parquet scan."""
    before_t = df.schema["before"].dataType
    pruned = F.when(
        F.col("before").isNull(), F.lit(None).cast(StructType([
            f for f in before_t.fields if f.name in pk_cols
        ]))
    ).otherwise(F.struct(*[F.col(f"before.{c}").alias(c) for c in pk_cols]))
    return df.withColumn("before", pruned)


def to_dynamic(df: DataFrame) -> DataFrame:
    """Typed envelope → dynamic envelope (MAP<STRING,STRING> images), for
    multiplexing heterogeneous tables into one stream. Timestamps render as
    ISO-8601; NULL struct → NULL map."""
    def as_map(side: str) -> Column:
        t: StructType = df.schema[side].dataType
        keys = F.array(*[F.lit(f.name) for f in t.fields])
        vals = F.array(*[F.col(f"{side}.{f.name}").cast("string") for f in t.fields])
        return F.when(F.col(side).isNull(), F.lit(None).cast(
            MapType(StringType(), StringType()))
        ).otherwise(F.map_from_arrays(keys, vals))

    return df.withColumn("before", as_map("before")).withColumn(
        "after", as_map("after")
    )


def from_kafka_records(
    df: DataFrame, default_namespace: str = "public"
) -> DataFrame:
    """Kafka record frame → dynamic envelope: the RE-INGEST adapter.

    Input is the schema both Kafka sources emit (``key``/``value`` binary,
    ``headers`` array<struct<key,value>>, ``offset``, ``timestamp`` — the
    jar-backed source and sources/kafka_source.py agree); the payload is
    the convention this engine's sink AND the reference connector write
    (README.md:183-212): the row image as JSON with an injected
    ``operation`` field, DELETE carrying the pre-image, op/table repeated
    in headers. So the relational tier (LWW, SCD2, event counts …) runs
    DIRECTLY over topics a deployed go-pq-cdc-kafka produces today — the
    consume half of the migration story.

    Envelope mapping:

    - ``op``          — ``operation`` header, falling back to the injected
      payload field (headers optional in the reference config)
    - ``lsn``         — the Kafka offset. Per-key monotone whenever the
      producer used key partitioning (both engines' default), which is
      exactly the per-key ordering LWW/SCD2 consumers key on; it is NOT a
      global WAL position across partitions.
    - ``event_time``  — the broker/record timestamp
    - images          — payload minus ``operation``; DELETE → before,
      everything else → after (inverse of handler.choose_image)
    """
    img = F.from_json(
        F.col("value").cast("string"), "map<string,string>"
    )
    # Kafka allows DUPLICATE header keys; map_from_entries would throw
    # under Spark's default duplicate-key policy (EXCEPTION) on topics from
    # external producers that repeat one. Fold last-occurrence-wins (the
    # lookup semantics librdkafka-style clients expose) — header arrays are
    # a handful of entries, so the per-row fold is O(n·small).
    hdr = F.aggregate(
        F.coalesce(
            F.col("headers"),
            F.array().cast("array<struct<key:string,value:binary>>"),
        ),
        F.create_map().cast("map<string,string>"),
        lambda acc, h: F.map_concat(
            F.map_filter(acc, lambda k, _v: k != h["key"]),
            F.create_map(h["key"], h["value"].cast("string")),
        ),
    )
    op = F.coalesce(
        F.element_at(hdr, "operation"), F.element_at(img, "operation")
    )
    image = F.map_filter(img, lambda k, _v: k != F.lit("operation"))
    null_map = F.lit(None).cast("map<string,string>")
    return df.select(
        op.alias("op"),
        F.col("timestamp").cast("timestamp").alias("event_time"),
        F.col("offset").cast("long").alias("lsn"),
        F.coalesce(
            F.element_at(hdr, "namespace"), F.lit(default_namespace)
        ).alias("table_namespace"),
        F.element_at(hdr, "table").alias("table_name"),
        F.when(op == OP_DELETE, image).otherwise(null_map).alias("before"),
        F.when(op == OP_DELETE, null_map).otherwise(image).alias("after"),
    )
