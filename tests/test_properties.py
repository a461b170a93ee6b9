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
    # literal replace, not str.format: regex quantifiers like {2,} in the
    # expression would be misread as format fields
    want = [r[0] for r in con.execute(
        f"SELECT {duck_expr.replace('{c}', 't')} FROM x ORDER BY i"
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


# PII-bearing text: random unicode mixed with generated emails/phones so the
# redaction regexes exercise both matching and non-matching paths.
pii_texts = st.lists(
    st.one_of(
        st.text(
            alphabet=st.characters(
                codec="utf-8",
                exclude_characters="'\\\x00",
                exclude_categories=("Cs",),
            ),
            max_size=60,
        ),
        st.from_regex(r"[a-z]{1,8}@[a-z]{1,6}\.(com|io|org)", fullmatch=True).map(
            lambda e: f"mail {e} end"
        ),
        st.from_regex(r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}", fullmatch=True).map(
            lambda p: f"call {p} now"
        ),
    ),
    min_size=1,
    max_size=10,
)


@given(pii_texts)
@SETTINGS
def test_redact_pii_parity(spark, rows):
    got, want = both_engines(spark, rows, T.redact_pii, T.redact_pii_sql("{c}"))
    assert got == want


@given(pii_texts)
@SETTINGS
def test_pii_counts_parity(spark, rows):
    got, want = both_engines(
        spark, rows, T.email_count, T.pii_count_sql("{c}", T.EMAIL_RE)
    )
    assert got == want
    got_p, want_p = both_engines(
        spark, rows, T.phone_count, T.pii_count_sql("{c}", T.PHONE_RE)
    )
    assert got_p == want_p


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2000)),
        min_size=1,
        max_size=40,
    )
)
@SETTINGS
def test_pack_greedy_parity(spark, rows):
    """Bin assignment matches the SQL window formulation on random costs."""
    import duckdb

    from go_pq_cdc_kafka_spark.operators import packing as PK

    data = [(g, i, c) for i, (g, c) in enumerate(rows)]
    df = spark.createDataFrame(data, "g int, id int, cost long")
    got = sorted(
        (r.g, r.id, r.pack_id)
        for r in PK.pack_greedy(df, "cost", 1000, ["g"], "id").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE x (g INTEGER, id INTEGER, cost BIGINT)")
    con.executemany("INSERT INTO x VALUES (?, ?, ?)", data)
    want = [
        tuple(r)
        for r in con.execute(
            """
            WITH c AS (
              SELECT g, id, COALESCE(SUM(cost) OVER (
                PARTITION BY g ORDER BY id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
              FROM x
            )
            SELECT g, id, CAST(prev // 1000 AS BIGINT) FROM c ORDER BY g, id
            """
        ).fetchall()
    ]
    assert got == want


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


@given(texts)
@SETTINGS
def test_ngrams_all_parity(spark, rows):
    """Non-distinct bigram extraction (repetition metrics) agrees on
    arbitrary unicode — order and multiplicity both matter here."""
    got, want = both_engines(
        spark,
        rows,
        lambda c: T.ngrams_all(c, 2),
        T.ngrams_all_sql("{c}", 2),
    )
    assert [list(g) for g in got] == [list(w) for w in want]


@given(texts)
@SETTINGS
def test_shingles_parity(spark, rows):
    """Distinct 5-gram shingles (decontamination keys) agree — set
    equality per row (engines may order list_distinct differently)."""
    got, want = both_engines(
        spark,
        rows,
        lambda c: T.shingles(c, 5),
        T.shingles_sql("{c}", 5),
    )
    assert [sorted(g) for g in got] == [sorted(w) for w in want]


# -- whole-operator parity: duplicated-span removal --------------------------

# tiny vocabulary => cross-doc duplicate blocks occur constantly, driving
# the interesting paths (removal, reassembly order, fully-emptied docs)
word = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
docs_strategy = st.lists(
    st.lists(word, min_size=1, max_size=9).map(" ".join),
    min_size=2,
    max_size=8,
)


@given(docs_strategy, st.integers(min_value=1, max_value=3))
@SETTINGS
def test_block_removal_parity(spark, docs, width):
    """duplicate_block_removal vs its DuckDB twin on arbitrary small-vocab
    corpora: same survivors, same reassembled text, same counts — including
    ragged tails and docs whose every block was boilerplate."""
    from go_pq_cdc_kafka_spark.operators import dedup as DD

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = [
        (r.doc_id, r.kept_blocks, r.removed_blocks, r.text_clean)
        for r in DD.duplicate_block_removal(df, width=width)
        .orderBy("doc_id")
        .collect()
    ]

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", list(enumerate(docs)))
    want = con.execute(
        DD.duplicate_block_removal_sql(width=width, min_docs=2)
    ).fetchall()
    assert got == want


# -- pgoutput decoder round-trip --------------------------------------------
#
# The decoder's hot paths (fixed-offset TupleData parse, first-byte Insert
# dispatch, buffered wire framing) were hand-optimized; this property pins
# them against ARBITRARY schemas and values, not just the fixture tables:
# random column names/counts, unicode text values (including NULs and
# empty strings — 't' values are length-prefixed, so both are legal),
# NULL and unchanged-TOAST markers, across insert/update/delete in one
# transaction.

_colname = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00",
                           exclude_categories=("Cs",)),
    min_size=1,
    max_size=12,
)
_value = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=40,
    ),
)


@st.composite
def _tables(draw):
    ncols = draw(st.integers(min_value=1, max_value=8))
    names = draw(
        st.lists(_colname, min_size=ncols, max_size=ncols, unique=True)
    )
    rows = draw(
        st.lists(
            st.lists(_value, min_size=ncols, max_size=ncols),
            min_size=1,
            max_size=6,
        )
    )
    return names, rows


@given(_tables())
@settings(max_examples=60, deadline=None)
def test_pgoutput_decoder_roundtrip_arbitrary_schema(table):
    from tests.test_pgoutput import (
        begin, commit, delete, insert, rel_msg, tup, update, xlogdata,
    )
    from go_pq_cdc_kafka_spark.sources import pgoutput as PO

    names, rows = table
    cols = [(1 if i == 0 else 0, n, 25, -1) for i, n in enumerate(names)]
    frames = [xlogdata(1, rel_msg(cols=cols)), xlogdata(2, begin())]
    lsn = 100
    for r in rows:
        lsn += 1
        frames.append(xlogdata(lsn, insert(tup(*r))))
    # one update carrying an old image, one delete with a key image
    frames.append(xlogdata(lsn + 1, update(tup(*rows[0]), old=tup(*rows[-1]))))
    frames.append(xlogdata(lsn + 2, delete(tup(*rows[0]))))
    frames.append(xlogdata(lsn + 3, commit()))

    events = list(PO.decode_replication_stream(iter(frames)))
    assert [e["op"] for e in events] == (
        ["INSERT"] * len(rows) + ["UPDATE", "DELETE"]
    )
    for ev, r in zip(events, rows):
        assert ev["after"] == dict(zip(names, r))
        assert ev["before"] is None
        assert ev["event_time"] is not None
    upd, dele = events[-2], events[-1]
    assert upd["after"] == dict(zip(names, rows[0]))
    assert upd["before"] == dict(zip(names, rows[-1]))
    assert dele["before"] == dict(zip(names, rows[0]))
    assert dele["after"] is None
    # resume contract: every event's lsn is the XLogData wal_start
    assert [e["lsn"] for e in events] == list(
        range(101, 101 + len(rows))
    ) + [lsn + 1, lsn + 2]


@given(
    vals=st.lists(st.integers(min_value=-(10**9), max_value=10**9),
                  min_size=1, max_size=300),
    split=st.integers(min_value=0, max_value=300),
    k=st.sampled_from([4, 16, 32]),
)
@SETTINGS
def test_kmv_merge_equals_direct_sketch(spark, vals, split, k):
    """Bottom-k mergeability is EXACT, for any values, any split point,
    any k: union two cells' sketches, re-take k smallest == sketch the
    union directly. This is the property that makes materialize-once /
    roll-up-anywhere sound."""
    from go_pq_cdc_kafka_spark.operators import sketches as SKCH

    split = min(split, len(vals))
    rows = [("a", v) for v in vals[:split]] + [("b", v) for v in vals[split:]]
    if not rows:
        return
    df = spark.createDataFrame(rows, "cell string, v long")
    cells = SKCH.kmv_cell_sketches(df, ["cell"], "v", k=k)
    merged = SKCH.kmv_rollup(
        cells.withColumn("cell", F.lit("ALL")), ["cell"], k=k
    ).collect()
    direct = SKCH.kmv_cell_sketches(
        df.withColumn("cell", F.lit("ALL")), ["cell"], "v", k=k
    ).collect()
    assert merged[0].sketch == direct[0].sketch
    # and the estimator is exact whenever the sketch saw everything
    est = SKCH.kmv_estimate(
        SKCH.kmv_cell_sketches(
            df.withColumn("cell", F.lit("ALL")), ["cell"], "v", k=k
        ),
        k=k,
    ).collect()[0]
    n_distinct = len(set(vals))
    if n_distinct < k:
        assert est.est_distinct == float(n_distinct)


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False, width=64),
        min_size=1, max_size=40,
    ),
)
@SETTINGS
def test_ewma_fold_bit_parity_with_duckdb(spark, vals):
    """The EWMA fold's bit-for-bit cross-engine claim, on arbitrary
    doubles (not just fixture values): Spark's sorted-array aggregate and
    DuckDB's recursive CTE must produce IDENTICAL doubles, because both
    run the same IEEE sequence with an exact-binary alpha."""
    from go_pq_cdc_kafka_spark.operators import timeseries as TS

    rows = [("k", i, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, ts long, rid long, x double")
    got = {
        r.ts: r.ewma for r in TS.ewma(df, "k", "ts", "x", "rid").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (k VARCHAR, ts BIGINT, rid BIGINT, x DOUBLE)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    want = dict(
        con.execute(
            "SELECT ts, ewma FROM ("
            + TS.ewma_sql("k", "ts", "x", "rid", "t")
            + ")"
        ).fetchall()
    )
    assert got == want  # EXACT equality, no tolerance


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),            # partition group
            st.integers(min_value=-50, max_value=50),  # order/bucket value
            st.integers(min_value=-1000, max_value=1000),  # payload
        ),
        min_size=1,
        max_size=40,
    ),
    n_buckets=st.integers(min_value=1, max_value=5),
)
@SETTINGS
def test_bucketed_running_family_matches_global_window(spark, rows, n_buckets):
    """bucketed_row_number / bucketed_running_sum / bucketed_running_max
    must equal their single-window definitions for ARBITRARY data and any
    bucket width, as long as the bucket is monotone in the order key —
    including duplicate order keys, negative values, and the exclusive
    max frame (first-row NULL)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from go_pq_cdc_kafka_spark.operators.sampling import (
        bucketed_row_number,
        bucketed_running_max,
        bucketed_running_sum,
    )

    df = spark.createDataFrame(
        [(g, v, x, i) for i, (g, v, x) in enumerate(rows)],
        "g string, v int, x long, id int",
    )
    width = max(1, 101 // n_buckets)
    bucket = F.floor((F.col("v") + 50) / width).cast("int")
    order = [F.col("v").asc(), F.col("id").asc()]
    base = Window.partitionBy("g").orderBy(*order)
    inc = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    exc = base.rowsBetween(Window.unboundedPreceding, -1)

    got = bucketed_row_number(df, ["g"], bucket, order, "rn")
    got = bucketed_running_sum(got, ["g"], bucket, order, F.col("x"), "cs")
    got = bucketed_running_max(got, ["g"], bucket, order, F.col("x"), "im")
    got = bucketed_running_max(
        got, ["g"], bucket, order, F.col("x"), "em", inclusive=False
    )
    exp = (
        df.withColumn("rn", F.row_number().over(base).cast("long"))
        .withColumn("cs", F.sum("x").over(inc))
        .withColumn("im", F.max("x").over(inc))
        .withColumn("em", F.max("x").over(exc))
    )
    key = lambda r: (r.g, r.id)  # noqa: E731
    g_rows = sorted(got.collect(), key=key)
    e_rows = sorted(exp.collect(), key=key)
    assert [
        (r.g, r.id, r.rn, r.cs, r.im, r.em) for r in g_rows
    ] == [(r.g, r.id, r.rn, r.cs, r.im, r.em) for r in e_rows]
