"""PostgreSQL upsert sink — materialize a CDC-derived DataFrame back into
Postgres (the ``foreachBatch`` twin of the Kafka sink, for the common
"CDC → transform → serving table" loop; runs fully live in this repo's
test environment, where a Kafka broker cannot).

Delivery contract: the sink statement is ``INSERT ... ON CONFLICT (keys)
DO UPDATE SET col = EXCLUDED.col`` (plus ``DELETE`` for tombstones), which
is idempotent per row — replaying a micro-batch after a checkpoint
recovery converges to the same table state, giving effectively-once
semantics on top of Spark's at-least-once ``foreachBatch`` (same argument
as sinks.foreach_batch_idempotent_parquet, with the conflict target
playing the role of the batch marker).

One row per key per batch: feed LWW-collapsed batches
(operators.relational — collapse on the key by max lsn). Postgres itself
enforces this loudly ("ON CONFLICT DO UPDATE command cannot affect row a
second time") rather than silently last-writer-winning inside a statement.

Scale notes: each PARTITION opens one wire connection and writes
multi-row statements in ``chunk_rows`` chunks — executor-parallel,
nothing driver-side; per-partition throughput is bounded by the server's
single-connection ingest, and total by partitions × that (cap partitions
near the server's write capacity with ``df.coalesce``). Identifiers are
validated+quoted (sources.snapshot discipline) and values rendered as
escaped text literals — Postgres coerces per column type.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

from pyspark.sql import DataFrame


def quote_literal(v) -> str:
    """Render one Python value as a Postgres text literal. '' doubling is
    the only escape needed under standard_conforming_strings (the server
    default since 9.1); bytes render as hex bytea. Non-finite floats are
    rejected loudly (their text forms are type-dependent)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if not math.isfinite(v):
            raise ValueError(f"non-finite float {v!r} has no portable literal")
        return repr(v)
    if isinstance(v, (bytes, bytearray, memoryview)):
        return "'\\x" + bytes(v).hex() + "'"
    return "'" + str(v).replace("'", "''") + "'"


def build_upsert_sql(
    schema: str,
    table: str,
    columns: Sequence[str],
    key_cols: Sequence[str],
    rows: Sequence[Sequence],
) -> str:
    """One multi-row INSERT ... ON CONFLICT (keys) DO UPDATE statement."""
    from go_pq_cdc_kafka_spark.sources.snapshot import _quote_ident

    cols_sql = ", ".join(_quote_ident(c) for c in columns)
    keys_sql = ", ".join(_quote_ident(c) for c in key_cols)
    non_keys = [c for c in columns if c not in key_cols]
    if non_keys:
        action = "DO UPDATE SET " + ", ".join(
            f"{_quote_ident(c)} = EXCLUDED.{_quote_ident(c)}" for c in non_keys
        )
    else:
        action = "DO NOTHING"
    values = ", ".join(
        "(" + ", ".join(quote_literal(v) for v in row) + ")" for row in rows
    )
    return (
        f"INSERT INTO {_quote_ident(schema)}.{_quote_ident(table)} "
        f"({cols_sql}) VALUES {values} "
        f"ON CONFLICT ({keys_sql}) {action}"
    )


def build_insert_sql(
    schema: str,
    table: str,
    columns: Sequence[str],
    rows: Sequence[Sequence],
) -> str:
    """One plain multi-row INSERT (append-only path: no conflict target)."""
    from go_pq_cdc_kafka_spark.sources.snapshot import _quote_ident

    cols_sql = ", ".join(_quote_ident(c) for c in columns)
    values = ", ".join(
        "(" + ", ".join(quote_literal(v) for v in row) + ")" for row in rows
    )
    return (
        f"INSERT INTO {_quote_ident(schema)}.{_quote_ident(table)} "
        f"({cols_sql}) VALUES {values}"
    )


def build_delete_sql(
    schema: str,
    table: str,
    key_cols: Sequence[str],
    key_rows: Sequence[Sequence],
) -> str:
    """One multi-key DELETE (row-constructor IN list)."""
    from go_pq_cdc_kafka_spark.sources.snapshot import _quote_ident

    keys_sql = ", ".join(_quote_ident(c) for c in key_cols)
    tuples = ", ".join(
        "(" + ", ".join(quote_literal(v) for v in row) + ")" for row in key_rows
    )
    return (
        f"DELETE FROM {_quote_ident(schema)}.{_quote_ident(table)} "
        f"WHERE ({keys_sql}) IN ({tuples})"
    )


_COPY_ESC = {"\\": "\\\\", "\t": "\\t", "\n": "\\n", "\r": "\\r"}


def copy_text_value(v) -> str:
    """One value in COPY text format: ``\\N`` for null, t/f booleans, hex
    bytea, and backslash/tab/newline/CR escaped per the COPY spec."""
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, (bytes, bytearray, memoryview)):
        return "\\\\x" + bytes(v).hex()  # \x…, backslash doubled for COPY
    if isinstance(v, float) and not math.isfinite(v):
        raise ValueError(f"non-finite float {v!r} has no portable literal")
    s = str(v)
    for raw, esc in _COPY_ESC.items():
        if raw in s:
            s = s.replace(raw, esc)
    return s


def copy_text_row(values) -> bytes:
    return ("\t".join(copy_text_value(v) for v in values) + "\n").encode("utf-8")


def stage_and_upsert(
    conn,
    schema: str,
    table: str,
    columns: Sequence[str],
    key_cols: Sequence[str],
    rows,
    stage_name: str,
) -> None:
    """COPY the rows into a session-local temp stage, then one
    INSERT .. SELECT .. ON CONFLICT merge — the bulk-upsert fast path
    (COPY ingest beats multi-row INSERT literals by ~an order of
    magnitude; the merge is one set-based statement server-side)."""
    from go_pq_cdc_kafka_spark.sources.snapshot import _quote_ident

    target = f"{_quote_ident(schema)}.{_quote_ident(table)}"
    stage = _quote_ident(stage_name)
    cols_sql = ", ".join(_quote_ident(c) for c in columns)
    keys_sql = ", ".join(_quote_ident(c) for c in key_cols)
    non_keys = [c for c in columns if c not in key_cols]
    action = (
        "DO UPDATE SET "
        + ", ".join(
            f"{_quote_ident(c)} = EXCLUDED.{_quote_ident(c)}" for c in non_keys
        )
        if non_keys
        else "DO NOTHING"
    )
    conn.simple_query(
        f"CREATE TEMP TABLE {stage} "
        f"(LIKE {target} INCLUDING DEFAULTS)"
    )
    try:
        conn.copy_in(
            f"COPY {stage} ({cols_sql}) FROM STDIN",
            (copy_text_row(r) for r in rows),
        )
        conn.simple_query(
            f"INSERT INTO {target} ({cols_sql}) "
            f"SELECT {cols_sql} FROM {stage} "
            f"ON CONFLICT ({keys_sql}) {action}"
        )
    finally:
        conn.simple_query(f"DROP TABLE IF EXISTS {stage}")


def foreach_batch_pg_upsert(
    dsn: str,
    table: str,
    key_cols: Sequence[str],
    schema: str = "public",
    op_col: str | None = None,
    chunk_rows: int = 500,
    use_copy: bool = False,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function upserting each micro-batch into
    ``schema.table``. With ``op_col`` set, rows whose op is ``DELETE``
    become deletes (tombstone handling); every other op upserts. Data
    columns = the DataFrame's columns minus ``op_col``. ``use_copy``
    switches the upsert path from multi-row INSERT literals to
    COPY-into-temp-stage + one set-based merge (:func:`stage_and_upsert`)
    — the bulk path for 6-figure batches."""
    key_cols = list(key_cols)

    def fn(df: DataFrame, batch_id: int) -> None:
        import pandas as pd  # noqa: F401 — mapInPandas contract

        data_cols = [c for c in df.columns if c != op_col]
        missing = [k for k in key_cols if k not in data_cols]
        if missing:
            raise ValueError(f"key columns {missing} absent from batch")

        def part(iterator):
            import pandas as pd

            from go_pq_cdc_kafka_spark.sources import wire

            conn = None
            n = 0
            try:
                for pdf in iterator:
                    if not len(pdf):
                        continue
                    if conn is None:
                        conn = wire.ReplicationConnection(
                            **wire.parse_dsn(dsn)
                        ).connect()
                    if op_col is not None:
                        deletes = pdf[pdf[op_col] == "DELETE"]
                        upserts = pdf[pdf[op_col] != "DELETE"]
                    else:
                        deletes, upserts = pdf.iloc[0:0], pdf
                    if use_copy and len(upserts):
                        import uuid as _uuid

                        rows = (
                            tuple(None if pd.isna(v) else v for v in r)
                            for r in upserts[data_cols].itertuples(index=False)
                        )
                        stage_and_upsert(
                            conn, schema, table, data_cols, key_cols, rows,
                            f"sg_stage_{_uuid.uuid4().hex[:12]}",
                        )
                        n += len(upserts)
                    else:
                        for lo in range(0, len(upserts), chunk_rows):
                            chunk = upserts.iloc[lo : lo + chunk_rows]
                            rows = [
                                tuple(None if pd.isna(v) else v for v in r)
                                for r in chunk[data_cols].itertuples(index=False)
                            ]
                            conn.simple_query(
                                build_upsert_sql(
                                    schema, table, data_cols, key_cols, rows
                                )
                            )
                            n += len(rows)
                    for lo in range(0, len(deletes), chunk_rows):
                        chunk = deletes.iloc[lo : lo + chunk_rows]
                        keys = [
                            tuple(None if pd.isna(v) else v for v in r)
                            for r in chunk[key_cols].itertuples(index=False)
                        ]
                        conn.simple_query(
                            build_delete_sql(schema, table, key_cols, keys)
                        )
                        n += len(keys)
            finally:
                if conn is not None:
                    conn.close()
            yield pd.DataFrame({"rows": [n]})

        # count() forces every partition exactly once (write_avro pattern)
        df.mapInPandas(part, "rows long").count()

    return fn


def ensure_ledger(conn, schema: str, ledger_table: str) -> None:
    """Create the applied-batches ledger if absent. Concurrent tasks can
    race CREATE TABLE IF NOT EXISTS onto the same catalog row (a known
    Postgres quirk — IF NOT EXISTS checks then inserts without a lock);
    the loser's duplicate-key error is identical in effect to success."""
    from go_pq_cdc_kafka_spark.sources.snapshot import _quote_ident
    from go_pq_cdc_kafka_spark.sources.wire import WireError

    try:
        conn.simple_query(
            f"CREATE TABLE IF NOT EXISTS "
            f"{_quote_ident(schema)}.{_quote_ident(ledger_table)} ("
            "target text NOT NULL, batch_id bigint NOT NULL, "
            "part_id int NOT NULL, applied_at timestamptz DEFAULT now(), "
            "PRIMARY KEY (target, batch_id, part_id))"
        )
    except WireError as e:
        if "already exists" not in str(e) and "duplicate key" not in str(e):
            raise


def foreach_batch_pg_append_eos(
    dsn: str,
    table: str,
    schema: str = "public",
    ledger_table: str = "spark_applied_batches",
    chunk_rows: int = 500,
    use_copy: bool = False,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function appending each micro-batch into
    ``schema.table`` EXACTLY ONCE — the keyless twin of
    :func:`foreach_batch_pg_upsert` for event/audit streams with no
    natural primary key, where ON CONFLICT idempotence has nothing to
    hang off.

    Each task runs ONE server-side transaction: it first claims the
    ``(target, batch_id, partition_id)`` row in the ledger table with
    ``INSERT .. ON CONFLICT DO NOTHING RETURNING 1``; an empty RETURNING
    means an earlier attempt of this (batch, partition) already
    committed, so the task rolls back and writes nothing. Otherwise the
    data rows go in (multi-row INSERT literals, or ``COPY`` straight
    into the target with ``use_copy`` — append needs no temp stage) and
    the claim commits ATOMICALLY with them. Every failure mode lands on
    the right side: a crash before COMMIT leaves neither claim nor rows
    (server aborts the transaction on disconnect, Spark retries clean);
    a network failure after COMMIT makes the retry see the claim and
    skip; a concurrent speculative attempt blocks on the claim's unique
    index until the winner commits, then reads conflict → skip. Same
    contract as ``sinks.foreach_batch_idempotent_parquet``, with the
    ledger playing the manifest's role. Micro-batch replays from a
    checkpoint re-plan the same source offsets into the same partitions,
    which is what makes (batch_id, partition_id) a stable claim key."""
    from go_pq_cdc_kafka_spark.sources.snapshot import _quote_ident

    target_literal = quote_literal(f"{schema}.{table}")

    def fn(df: DataFrame, batch_id: int) -> None:
        import pandas as pd  # noqa: F401 — mapInPandas contract

        data_cols = list(df.columns)

        def part(iterator):
            import pandas as pd
            from pyspark import TaskContext

            from go_pq_cdc_kafka_spark.sources import wire

            ctx = TaskContext.get()
            part_id = ctx.partitionId() if ctx else 0
            conn = None
            n = 0
            claimed = False
            try:
                for pdf in iterator:
                    if not len(pdf):
                        continue
                    if conn is None:
                        conn = wire.ReplicationConnection(
                            **wire.parse_dsn(dsn)
                        ).connect()
                        ensure_ledger(conn, schema, ledger_table)
                        conn.simple_query("BEGIN")
                        got = conn.simple_query(
                            f"INSERT INTO {_quote_ident(schema)}."
                            f"{_quote_ident(ledger_table)} "
                            f"(target, batch_id, part_id) VALUES "
                            f"({target_literal}, {int(batch_id)}, "
                            f"{int(part_id)}) "
                            f"ON CONFLICT (target, batch_id, part_id) "
                            f"DO NOTHING RETURNING 1"
                        )
                        if not got:
                            # an earlier attempt committed this partition
                            conn.simple_query("ROLLBACK")
                            break
                        claimed = True
                    if use_copy:
                        cols_sql = ", ".join(
                            _quote_ident(c) for c in data_cols
                        )
                        rows = (
                            tuple(None if pd.isna(v) else v for v in r)
                            for r in pdf[data_cols].itertuples(index=False)
                        )
                        conn.copy_in(
                            f"COPY {_quote_ident(schema)}."
                            f"{_quote_ident(table)} ({cols_sql}) FROM STDIN",
                            (copy_text_row(r) for r in rows),
                        )
                        n += len(pdf)
                    else:
                        for lo in range(0, len(pdf), chunk_rows):
                            chunk = pdf.iloc[lo : lo + chunk_rows]
                            rows = [
                                tuple(None if pd.isna(v) else v for v in r)
                                for r in chunk[data_cols].itertuples(
                                    index=False
                                )
                            ]
                            conn.simple_query(
                                build_insert_sql(
                                    schema, table, data_cols, rows
                                )
                            )
                            n += len(rows)
                if claimed:
                    conn.simple_query("COMMIT")
            except BaseException:
                if conn is not None and claimed:
                    try:
                        conn.simple_query("ROLLBACK")
                    except Exception:
                        pass  # server aborts the txn on disconnect anyway
                raise
            finally:
                if conn is not None:
                    conn.close()
            yield pd.DataFrame({"rows": [n]})

        df.mapInPandas(part, "rows long").count()

    return fn


def pg_type_for(dt) -> str:
    """Spark type → PostgreSQL column type (loud on unmapped types)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.LongType):
        return "bigint"
    if isinstance(dt, T.IntegerType):
        return "integer"
    if isinstance(dt, (T.ShortType, T.ByteType)):
        return "smallint"
    if isinstance(dt, T.DoubleType):
        return "double precision"
    if isinstance(dt, T.FloatType):
        return "real"
    if isinstance(dt, T.StringType):
        return "text"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.BinaryType):
        return "bytea"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampType):
        return "timestamptz"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.DecimalType):
        return f"numeric({dt.precision},{dt.scale})"
    raise ValueError(f"no PostgreSQL mapping for Spark type {dt}")


def build_create_table_sql(
    schema: str,
    table: str,
    spark_schema,
    key_cols: Sequence[str],
    op_col: str | None = None,
) -> str:
    """CREATE TABLE IF NOT EXISTS <target> (cols..., PRIMARY KEY (keys))
    from a DataFrame schema — the serving-table bootstrap. Key columns
    get NOT NULL (primary-key requirement); ``op_col`` is excluded (it
    routes upsert-vs-delete, it is not data)."""
    from go_pq_cdc_kafka_spark.sources.snapshot import _quote_ident

    cols = []
    for f in spark_schema.fields:
        if f.name == op_col:
            continue
        null_sql = " NOT NULL" if f.name in key_cols else ""
        cols.append(f"{_quote_ident(f.name)} {pg_type_for(f.dataType)}{null_sql}")
    keys_sql = ", ".join(_quote_ident(c) for c in key_cols)
    return (
        f"CREATE TABLE IF NOT EXISTS "
        f"{_quote_ident(schema)}.{_quote_ident(table)} "
        f"({', '.join(cols)}, PRIMARY KEY ({keys_sql}))"
    )


def ensure_table(
    dsn: str,
    table: str,
    spark_schema,
    key_cols: Sequence[str],
    schema: str = "public",
    op_col: str | None = None,
) -> None:
    """Create the serving table if absent (idempotent)."""
    from go_pq_cdc_kafka_spark.sources import wire

    conn = wire.ReplicationConnection(**wire.parse_dsn(dsn)).connect()
    try:
        conn.simple_query(
            build_create_table_sql(schema, table, spark_schema, key_cols, op_col)
        )
    finally:
        conn.close()
