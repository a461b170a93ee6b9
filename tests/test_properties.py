"""Property-based cross-engine parity: the text/hash formulas are defined
twice (Spark Columns + DuckDB SQL) and MUST agree on arbitrary input, not
just the fixtures. Hypothesis drives both engines with the same random
strings; any divergence in regex dialect, hash, or fold order fails here
before it fails in the driver's oracle gate.

Strategy notes: one Spark job per hypothesis example would be minutes-slow,
so examples are batched — hypothesis generates a LIST of strings, each list
becomes one two-engine comparison."""

import duckdb
import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from go_pq_cdc_kafka_spark.functions import text as T

# printable-ish text incl. unicode, whitespace runs, punctuation
texts = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8",
            exclude_characters="'\\\x00",  # SQL-literal safe; parity, not escaping, is under test
            exclude_categories=("Cs",),
        ),
        min_size=0,
        max_size=80,
    ),
    min_size=1,
    max_size=12,
)

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def both_engines(spark, rows, spark_col, duck_expr):
    """Run one expression over the same strings in both engines."""
    df = spark.createDataFrame([(i, s) for i, s in enumerate(rows)], "i long, t string")
    got = [
        r.o for r in df.select(spark_col(F.col("t")).alias("o")).orderBy("i").collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE x (i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO x VALUES (?, ?)", list(enumerate(rows)))
    want = [r[0] for r in con.execute(
        f"SELECT {duck_expr.format(c='t')} FROM x ORDER BY i"
    ).fetchall()]
    return got, want


@given(texts)
@SETTINGS
def test_token_count_parity(spark, rows):
    got, want = both_engines(
        spark,
        rows,
        T.token_count,
        "CAST(length(" + T.TOKENS_SQL + ") AS BIGINT)",
    )
    assert got == want


@given(texts)
@SETTINGS
def test_bag_fingerprint_parity(spark, rows):
    got, want = both_engines(
        spark, rows, T.bag_fingerprint, T.BAG_FINGERPRINT_SQL
    )
    assert got == want


@given(texts)
@SETTINGS
def test_rolling_fingerprint_parity(spark, rows):
    got, want = both_engines(
        spark, rows, T.rolling_fingerprint, T.rolling_fingerprint_sql("{c}")
    )
    assert got == want


@given(texts)
@SETTINGS
def test_hash64_parity(spark, rows):
    got, want = both_engines(spark, rows, T.hash64, T.hash64_sql("{c}"))
    assert got == want


@given(texts)
@SETTINGS
def test_shingles_parity(spark, rows):
    got, want = both_engines(
        spark,
        rows,
        lambda c: T.shingles(c, 3),
        T.shingles_sql("{c}", 3),
    )
    assert [sorted(g) for g in got] == [sorted(w) for w in want]


@given(texts)
@SETTINGS
def test_bag_fingerprint_token_order_invariant(spark, rows):
    """Metamorphic: permuting whitespace-separated tokens never changes the
    bag fingerprint."""
    df = spark.createDataFrame([(i, s) for i, s in enumerate(rows)], "i long, t string")
    out = df.select(
        T.bag_fingerprint(F.col("t")).alias("a"),
        T.bag_fingerprint(
            F.array_join(F.reverse(T.tokens(F.col("t"))), " ")
        ).alias("b"),
    ).collect()
    assert all(r.a == r.b for r in out)
