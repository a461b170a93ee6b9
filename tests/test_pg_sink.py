"""PostgreSQL upsert sink: statement building + escaping (no server);
the live round-trip is tests/live/test_live_pg.py."""

import pytest

from go_pq_cdc_kafka_spark.streaming import pg_sink as PS


def test_quote_literal_escaping():
    assert PS.quote_literal(None) == "NULL"
    assert PS.quote_literal(True) == "TRUE"
    assert PS.quote_literal(False) == "FALSE"
    assert PS.quote_literal(42) == "42"
    assert PS.quote_literal(-1.5) == "-1.5"
    assert PS.quote_literal("it's") == "'it''s'"
    assert PS.quote_literal("a\\b") == "'a\\b'"  # backslash is literal
    assert PS.quote_literal(b"\x00\xff") == "'\\x00ff'"
    with pytest.raises(ValueError, match="non-finite"):
        PS.quote_literal(float("nan"))


def test_build_upsert_sql_shape():
    sql = PS.build_upsert_sql(
        "public", "users", ["id", "name", "v"], ["id"],
        [(1, "a'b", None), (2, "c", 3)],
    )
    assert sql == (
        'INSERT INTO "public"."users" ("id", "name", "v") '
        "VALUES (1, 'a''b', NULL), (2, 'c', 3) "
        'ON CONFLICT ("id") DO UPDATE SET "name" = EXCLUDED."name", '
        '"v" = EXCLUDED."v"'
    )


def test_build_upsert_all_key_cols_do_nothing():
    sql = PS.build_upsert_sql("public", "t", ["a", "b"], ["a", "b"], [(1, 2)])
    assert sql.endswith('ON CONFLICT ("a", "b") DO NOTHING')


def test_build_delete_sql_shape():
    sql = PS.build_delete_sql("public", "users", ["id"], [(1,), (2,)])
    assert sql == 'DELETE FROM "public"."users" WHERE ("id") IN ((1), (2))'


def test_hostile_identifiers_rejected():
    with pytest.raises(ValueError, match="identifier"):
        PS.build_upsert_sql("public", 'u"; DROP TABLE x;--', ["id"], ["id"], [(1,)])
    with pytest.raises(ValueError, match="identifier"):
        PS.build_delete_sql("public", "users", ["id; --"], [(1,)])


def test_copy_text_encoding():
    assert PS.copy_text_value(None) == "\\N"
    assert PS.copy_text_value(True) == "t"
    assert PS.copy_text_value(7) == "7"
    assert PS.copy_text_value("a\tb\nc\\d\re") == "a\\tb\\nc\\\\d\\re"
    assert PS.copy_text_value(b"\x01\xff") == "\\\\x01ff"
    with pytest.raises(ValueError, match="non-finite"):
        PS.copy_text_value(float("inf"))
    assert PS.copy_text_row([1, None, "x"]) == b"1\t\\N\tx\n"


def test_build_create_table_sql_maps_types_and_keys():
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("name", T.StringType(), True),
            T.StructField("amount", T.DecimalType(12, 2), True),
            T.StructField("seen", T.TimestampNTZType(), True),
            T.StructField("blob", T.BinaryType(), True),
            T.StructField("op", T.StringType(), True),
        ]
    )
    sql = PS.build_create_table_sql("public", "serve", schema, ["id"], op_col="op")
    assert sql == (
        'CREATE TABLE IF NOT EXISTS "public"."serve" '
        '("id" bigint NOT NULL, "name" text, "amount" numeric(12,2), '
        '"seen" timestamp, "blob" bytea, PRIMARY KEY ("id"))'
    )


def test_pg_type_unmapped_raises():
    from pyspark.sql import types as T

    with pytest.raises(ValueError, match="no PostgreSQL mapping"):
        PS.pg_type_for(T.ArrayType(T.LongType()))


def test_build_insert_sql_shape():
    from go_pq_cdc_kafka_spark.streaming.pg_sink import build_insert_sql

    sql = build_insert_sql(
        "public", "events", ["id", "note"], [(1, "a'b"), (2, None)]
    )
    assert sql == (
        'INSERT INTO "public"."events" ("id", "note") '
        "VALUES (1, 'a''b'), (2, NULL)"
    )


def test_append_eos_rejects_hostile_identifiers():
    import pytest

    from go_pq_cdc_kafka_spark.streaming.pg_sink import build_insert_sql

    with pytest.raises(ValueError):
        build_insert_sql("public", 'x"; DROP TABLE y;--', ["id"], [(1,)])
