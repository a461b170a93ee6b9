"""Property checks for the round-10 statistical query kernels.

The oracle gate proves Spark == DuckDB on the fixtures; these prove the
FORMULATION itself — the integer/micro-quantized reformulations the
queries use for cross-engine determinism must equal the textbook
definitions on arbitrary data, ties and all. Each property evaluates the
registry's oracle-SQL shape in DuckDB (cheap, no Spark session per
example) against a brute-force Python reference.

Covers: agg_spearman_daily's doubled-average-rank trick,
agg_ks_two_sample's cross-multiplied integer supremum,
agg_theil_index's micro-quantized transcendental terms, and
events_gap_profile's explicit (n+1)/2, (9n+9)/10 rank convention.
"""

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=60, deadline=None)

ints = st.lists(st.integers(min_value=0, max_value=9), min_size=3, max_size=40)
pos_ints = st.lists(
    st.integers(min_value=1, max_value=10**6), min_size=2, max_size=60
)


def _avg_ranks(vals):
    """Textbook average ranks (ties share the mean of their positions)."""
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
            j += 1
        avg = (i + j) / 2 + 1
        for k in range(i, j + 1):
            ranks[order[k]] = avg
        i = j + 1
    return ranks


def _pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    if den <= 0:
        return None  # constant series: rho undefined
    return (n * sxy - sx * sy) / math.sqrt(den)


@given(ints, ints)
@SETTINGS
def test_spearman_doubled_rank_trick(xs, ys):
    """2*avg_rank = 2*RANK() + tie_count - 1 stays integer, and Pearson
    over doubled ranks equals Pearson over average ranks (the affine
    invariance agg_spearman_daily relies on)."""
    n = min(len(xs), len(ys))
    xs, ys = xs[:n], ys[:n]
    ref_rx, ref_ry = _avg_ranks(xs), _avg_ranks(ys)
    expect = _pearson(ref_rx, ref_ry)

    con = duckdb.connect()
    con.execute("CREATE TABLE d (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO d VALUES (?, ?)", list(zip(xs, ys)))
    rows = con.execute(
        """
        SELECT 2 * RANK() OVER (ORDER BY x) + COUNT(*) OVER (PARTITION BY x) - 1,
               2 * RANK() OVER (ORDER BY y) + COUNT(*) OVER (PARTITION BY y) - 1
        FROM d
        """
    ).fetchall()
    rx2 = [r[0] for r in rows]
    ry2 = [r[1] for r in rows]
    assert all(r == int(r) for r in rx2)  # the trick stays integer
    assert sorted(rx2) == sorted(int(2 * r) for r in ref_rx)
    got = _pearson(rx2, ry2)
    if expect is None:
        assert got is None
    else:
        assert abs(got - expect) < 1e-9


@given(pos_ints, pos_ints)
@SETTINGS
def test_ks_integer_supremum(a, b):
    """The cross-multiplied integer gap max |cum_a*n_b - cum_b*n_a| /
    (n_a*n_b) equals the textbook two-sample KS statistic
    sup_x |F_a(x) - F_b(x)| over the pooled support."""
    n_a, n_b = len(a), len(b)
    support = sorted(set(a) | set(b))
    expect = max(
        abs(
            sum(1 for v in a if v <= x) / n_a
            - sum(1 for v in b if v <= x) / n_b
        )
        for x in support
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE d (v BIGINT, g INT)")
    con.executemany(
        "INSERT INTO d VALUES (?, ?)",
        [(v, 0) for v in a] + [(v, 1) for v in b],
    )
    got = con.execute(
        """
        WITH panel AS (
          SELECT v, SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS c_a,
                 SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS c_b
          FROM d GROUP BY v
        ),
        cum AS (
          SELECT SUM(c_a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
                 SUM(c_b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb,
                 SUM(c_a) OVER () AS na, SUM(c_b) OVER () AS nb
          FROM panel
        )
        SELECT MAX(ABS(ca * nb - cb * na)) * 1.0 / (MAX(na) * MAX(nb))
        FROM cum
        """
    ).fetchone()[0]
    assert abs(got - expect) < 1e-12


@given(st.lists(st.integers(min_value=1, max_value=10**9), min_size=2, max_size=50))
@SETTINGS
def test_theil_micro_quantization(cents):
    """Micro-quantizing each (x/mu)*ln(x/mu) term to int64 keeps the Theil
    index within 1e-6 * 1 of the direct float computation (each term's
    quantization error is <= 0.5e-6, averaged over n it stays below the
    round-6 output resolution)."""
    n = len(cents)
    total = sum(cents)
    direct = sum(
        (x * n / total) * math.log(x * n / total) for x in cents
    ) / n
    micro = sum(
        round(1_000_000 * (x * n / total) * math.log(x * n / total))
        for x in cents
    ) / 1_000_000 / n
    assert abs(micro - direct) <= 1e-6


@given(st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=80))
@SETTINGS
def test_gap_percentile_rank_convention(gaps):
    """p50 = smallest value whose cumulative count reaches (n+1)//2 is the
    lower median; p90 at (9n+9)//10 is the ceil-indexed 90th percentile —
    i.e. exactly sorted(gaps)[ceil(q*n)-1]."""
    s = sorted(gaps)
    n = len(s)
    expect_p50 = s[(n + 1) // 2 - 1]
    expect_p90 = s[(9 * n + 9) // 10 - 1]

    con = duckdb.connect()
    con.execute("CREATE TABLE d (g BIGINT)")
    con.executemany("INSERT INTO d VALUES (?)", [(g,) for g in gaps])
    got = con.execute(
        """
        WITH hist AS (SELECT g, COUNT(*) AS c FROM d GROUP BY g),
        cum AS (
          SELECT g, SUM(c) OVER (ORDER BY g ROWS UNBOUNDED PRECEDING) AS cc,
                 SUM(c) OVER () AS n
          FROM hist
        )
        SELECT MIN(CASE WHEN cc >= (n + 1) // 2 THEN g END),
               MIN(CASE WHEN cc >= (9 * n + 9) // 10 THEN g END)
        FROM cum
        """
    ).fetchone()
    assert got == (expect_p50, expect_p90)
