"""Snapshot source — bounded backfill before/instead of CDC.

Reference behavior (README.md:44-98; config example/snapshot/main.go:90-98):
chunked full-table scan at a consistent ``pg_export_snapshot()`` point,
default chunk 8000 rows, multi-instance work claiming with heartbeat/reclaim,
modes ``initial`` / ``never`` / ``snapshot_only``; rows surface as SNAPSHOT
events through the same downstream path.

Spark mapping (SURVEY §2.A S5): a partitioned JDBC read IS the chunked scan —
``partitionColumn/lowerBound/upperBound/numPartitions`` splits the key space,
Spark's scheduler replaces the chunk claim/heartbeat/reclaim machinery, and
task retry replaces crash recovery. ``initial`` mode's no-gap handoff =
record the slot LSN before the snapshot, start the stream from it
(sources.cdc).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from enum import Enum

from pyspark.sql import DataFrame, SparkSession

from go_pq_cdc_kafka_spark import envelope as env

#: plain SQL identifiers only — embedded quotes/control chars are rejected
#: rather than escaped (nothing legitimate in a CDC config needs them), so
#: a hostile schema/table/pk option can't smuggle SQL into the wire scan
_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_$]*$")
_NUMERIC_RE = re.compile(r"^-?\d+(\.\d+)?$")


def _quote_ident(name: str) -> str:
    """Validate + double-quote an identifier for interpolation into wire
    simple queries (quoting also stops case folding from surprising users
    with mixed-case table names)."""
    if not _IDENT_RE.match(name or ""):
        raise ValueError(f"invalid SQL identifier {name!r}")
    return f'"{name}"'


class SnapshotMode(str, Enum):
    INITIAL = "initial"
    NEVER = "never"
    SNAPSHOT_ONLY = "snapshot_only"


@dataclass(frozen=True)
class SnapshotConfig:
    """Mirrors the reference's snapshot config surface (README.md:242-248)."""

    mode: SnapshotMode = SnapshotMode.NEVER
    chunk_size: int = 8000  # reference default chunk 8000 rows
    # heartbeat/claim options exist in the reference for its hand-rolled
    # work-claiming; Spark's task scheduler owns that, so they are accepted
    # for config parity but unused:
    heartbeat_interval_s: int = 5
    claim_timeout_s: int = 30
    # reference cdc.snapshot.instanceId (auto hostname-pid): identifies the
    # worker in its hand-rolled chunk claiming; Spark task IDs serve that
    # role here, so the value is carried for config/metrics parity only
    instance_id: str | None = None


def plan_partitions(row_count: int, chunk_size: int, max_partitions: int = 2000) -> int:
    """Chunk count from table size — one JDBC partition per chunk, capped so a
    1000-executor cluster doesn't open 10^6 connections on a huge table."""
    return max(1, min(max_partitions, math.ceil(row_count / max(1, chunk_size))))


def snapshot_from_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    pk_col: str,
    lower: int,
    upper: int,
    row_count: int,
    cfg: SnapshotConfig = SnapshotConfig(),
    properties: dict[str, str] | None = None,
    table_namespace: str = "public",
) -> DataFrame:
    """Partitioned JDBC scan → SNAPSHOT envelope events.

    Consistency note: per-partition SELECTs run in separate transactions; for
    a moving table use a server-side exported snapshot
    (``SET TRANSACTION SNAPSHOT`` via ``sessionInitStatement``) or take the
    snapshot before opening writes, which is the reference's ``initial``-mode
    contract anyway."""
    props = {"driver": "org.postgresql.Driver", **(properties or {})}
    num = plan_partitions(row_count, cfg.chunk_size)
    df = spark.read.jdbc(
        url=url,
        table=table,
        column=pk_col,
        lowerBound=lower,
        upperBound=upper,
        numPartitions=num,
        properties=props,
    )
    return env.snapshot_events(df, table.split(".")[-1], table_namespace)


def snapshot_from_parquet(
    spark: SparkSession,
    path: str,
    table_name: str,
    table_namespace: str = "public",
) -> DataFrame:
    """Fixture-backed snapshot (test tier; also the production path for
    lake-resident tables).

    The scan is spread to the session's parallelism when the file plans
    fewer splits than cores (single-row-group small files): the envelope →
    handler → record stage downstream is CPU-heavy (JSON render, key/header
    encode), and without the spread it runs on however few partitions the
    footer planned — 3-of-32 cores for the 10 MB fixture, a 15x throughput
    loss measured at sf0.1. At production scale the file's own splits
    exceed the core count and the spread is a no-op (see
    catalog.spread_small_scan)."""
    from go_pq_cdc_kafka_spark.catalog import spread_small_scan

    df = spark.read.parquet(path)
    # deterministic-hash spread over the full row: the envelope serializes
    # every column into the change-event JSON, so no pruning is lost, and
    # the keyed repartition skips round-robin's hidden per-task input sort
    # (round-12: 1.12 s → 0.88 s for the sf0.1 snapshot source)
    return env.snapshot_events(
        spread_small_scan(df, key_cols=tuple(df.columns)),
        table_name,
        table_namespace,
    )


# ---------------------------------------------------------------------------
# snapshot over the wire (dependency-free; the reference's chunked scan)
# ---------------------------------------------------------------------------

def snapshot_events_over_wire(
    dsn: str,
    table: str,
    pk: str = "id",
    schema_name: str = "public",
    chunk_size: int = 8000,
    socket_factory=None,
) -> tuple[list[dict], int]:
    """Chunked full-table scan over the in-repo wire client
    (:mod:`~go_pq_cdc_kafka_spark.sources.wire`): keyset pagination
    (``WHERE pk > last ORDER BY pk LIMIT chunk`` — the reference's chunked
    scan, README.md:44-98, default chunk 8000) inside ONE ``REPEATABLE
    READ`` transaction, so every chunk sees the same consistent snapshot.
    Rows surface as SNAPSHOT envelope events (message.go:53-62) with
    ``lsn=0`` — WAL positions don't apply to snapshot rows.

    Returns ``(events, start_lsn)`` where ``start_lsn`` is the server's
    WAL position from ``IDENTIFY_SYSTEM`` captured BEFORE the scan: start
    the CDC stream from it for the reference's no-gap ``initial`` handoff
    (README.md:50-54) — changes committed during the snapshot replay from
    the WAL and the LWW materialization collapses them.

    This is the dependency-free single-connection tier (like the
    reference's own scan, one process pages through the table); at Spark
    scale prefer :func:`snapshot_from_jdbc`'s partitioned read, which
    splits the key space across executors. ``pk`` must be numeric (keyset
    literals are rendered unquoted; enforced per chunk).
    """
    from go_pq_cdc_kafka_spark.sources import wire

    ident_schema = _quote_ident(schema_name)
    ident_table = _quote_ident(table)
    ident_pk = _quote_ident(pk)
    conn = wire.ReplicationConnection(
        socket_factory=socket_factory, **wire.parse_dsn(dsn)
    ).connect()
    try:
        start_lsn = wire.parse_lsn(conn.identify_system()["xlogpos"])
        conn.simple_query("BEGIN ISOLATION LEVEL REPEATABLE READ")
        events: list[dict] = []
        last = None
        while True:
            pred = f" WHERE {ident_pk} > {last}" if last is not None else ""
            rows = conn.simple_query(
                f"SELECT * FROM {ident_schema}.{ident_table}{pred} "
                f"ORDER BY {ident_pk} LIMIT {int(chunk_size)}"
            )
            for r in rows:
                events.append(
                    {
                        "op": "SNAPSHOT",
                        "event_time": None,
                        "lsn": 0,
                        "table_namespace": schema_name,
                        "table_name": table,
                        "before": None,
                        "after": r,
                    }
                )
            if len(rows) < chunk_size:
                break
            last = rows[-1][pk]
            # the keyset literal is interpolated unquoted — enforce the
            # numeric-pk contract instead of trusting the server's bytes
            if last is None or not _NUMERIC_RE.match(str(last)):
                raise ValueError(
                    f"keyset pagination needs a numeric pk; got {last!r} "
                    f"for {pk!r}"
                )
        conn.simple_query("COMMIT")
        return events, start_lsn
    finally:
        conn.close()


def snapshot_df_over_wire(
    spark: SparkSession,
    dsn: str,
    table: str,
    pk: str = "id",
    schema_name: str = "public",
    chunk_size: int = 8000,
    socket_factory=None,
) -> tuple[DataFrame, int]:
    """:func:`snapshot_events_over_wire` as an envelope DataFrame ready for
    the same handler→routing→records lineage every other source feeds."""
    events, start_lsn = snapshot_events_over_wire(
        dsn, table, pk, schema_name, chunk_size, socket_factory
    )
    rows = [
        (
            e["op"],
            None,
            e["lsn"],
            e["table_namespace"],
            e["table_name"],
            e["before"],
            e["after"],
        )
        for e in events
    ]
    df = spark.createDataFrame(rows, env.dynamic_envelope_schema())
    return df, start_lsn


def chunk_ranges(lo: int, hi: int, n_chunks: int) -> list[tuple[int, int]]:
    """Split [lo, hi] (inclusive) into n contiguous integer ranges; the
    remainder spreads over the leading chunks so sizes differ by <= 1."""
    if hi < lo:
        return []
    n = max(1, int(n_chunks))
    span = hi - lo + 1
    base, rem = divmod(span, n)
    out, cur = [], lo
    for i in range(min(n, span)):
        size = base + (1 if i < rem else 0)
        out.append((cur, cur + size - 1))
        cur += size
    return out


def parallel_snapshot_over_wire(
    spark: SparkSession,
    dsn: str,
    table: str,
    pk: str = "id",
    schema_name: str = "public",
    n_chunks: int = 8,
    snapshot_name: str | None = None,
    chunk_size: int = 8000,
) -> DataFrame:
    """EXECUTOR-PARALLEL consistent snapshot over the wire client — the
    production initial-load pattern (Debezium's incremental/parallel
    snapshot): each of ``n_chunks`` tasks opens its own connection, runs

        BEGIN ISOLATION LEVEL REPEATABLE READ;
        SET TRANSACTION SNAPSHOT '<exported>';

    and scans one keyset range, so every chunk sees the SAME MVCC
    snapshot — the one the replication slot EXPORTED at creation
    (CREATE_REPLICATION_SLOT's ``snapshot_name``). Rows committed after
    the slot exists are invisible to every chunk and replay from the WAL
    instead: scan-then-stream has no gap and no dup, independent of scan
    duration or parallelism.

    CONTRACT: the connection that created the slot must stay OPEN and
    IDLE until this returns (Postgres invalidates the exported snapshot
    on its next command). Driver-side work is bounds discovery only (one
    MIN/MAX under the same snapshot); all row traffic is executor-side
    mapInPandas. ``pk`` must be integer-typed. Without ``snapshot_name``
    each chunk is READ-COMMITTED-consistent only per chunk — pass the
    exported name for cross-chunk consistency.

    At 100 TB the knobs are ``n_chunks`` (≈ cluster cores; each task
    streams its range in ``chunk_size`` keyset pages) and the server's
    capacity for N parallel sequential range scans."""
    from go_pq_cdc_kafka_spark.sources import wire
    from go_pq_cdc_kafka_spark.streaming.pg_sink import quote_literal

    ident_schema = _quote_ident(schema_name)
    ident_table = _quote_ident(table)
    ident_pk = _quote_ident(pk)
    snap_sql = (
        f"SET TRANSACTION SNAPSHOT {quote_literal(snapshot_name)}"
        if snapshot_name
        else None
    )

    bconn = wire.ReplicationConnection(**wire.parse_dsn(dsn)).connect()
    try:
        bconn.simple_query("BEGIN ISOLATION LEVEL REPEATABLE READ")
        if snap_sql:
            bconn.simple_query(snap_sql)
        row = bconn.simple_query(
            f"SELECT MIN({ident_pk}) AS lo, MAX({ident_pk}) AS hi "
            f"FROM {ident_schema}.{ident_table}"
        )[0]
        bconn.simple_query("COMMIT")
    finally:
        bconn.close()
    if row["lo"] is None:
        return spark.createDataFrame([], env.dynamic_envelope_schema())
    ranges = chunk_ranges(int(row["lo"]), int(row["hi"]), n_chunks)
    chunks = spark.createDataFrame(
        [(i, lo, hi) for i, (lo, hi) in enumerate(ranges)],
        "i int, lo long, hi long",
    )

    def scan(iterator):
        import pandas as pd

        from go_pq_cdc_kafka_spark.sources import wire as W

        for pdf in iterator:
            for _, lo, hi in pdf.itertuples(index=False):
                conn = W.ReplicationConnection(**W.parse_dsn(dsn)).connect()
                try:
                    conn.simple_query("BEGIN ISOLATION LEVEL REPEATABLE READ")
                    if snap_sql:
                        conn.simple_query(snap_sql)
                    last = int(lo) - 1
                    while True:
                        rows = conn.simple_query(
                            f"SELECT * FROM {ident_schema}.{ident_table} "
                            f"WHERE {ident_pk} > {last} "
                            f"AND {ident_pk} <= {int(hi)} "
                            f"ORDER BY {ident_pk} LIMIT {int(chunk_size)}"
                        )
                        if rows:
                            yield pd.DataFrame(
                                {
                                    "op": ["SNAPSHOT"] * len(rows),
                                    "event_time": [None] * len(rows),
                                    "lsn": [0] * len(rows),
                                    "table_namespace": [schema_name] * len(rows),
                                    "table_name": [table] * len(rows),
                                    "before": [None] * len(rows),
                                    "after": list(rows),
                                }
                            )
                        if len(rows) < chunk_size:
                            break
                        nxt = rows[-1][pk]
                        if nxt is None or not _NUMERIC_RE.match(str(nxt)):
                            raise ValueError(
                                f"keyset pagination needs a numeric pk; "
                                f"got {nxt!r} for {pk!r}"
                            )
                        last = int(nxt)
                    conn.simple_query("COMMIT")
                finally:
                    conn.close()

    return chunks.repartition(max(1, len(ranges)), "i").mapInPandas(
        scan, env.dynamic_envelope_schema()
    )
