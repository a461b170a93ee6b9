"""Query registry — every operator claimed in SURVEY.md §2 as a runnable
query with (where expressible) a DuckDB-equivalent ANSI-SQL oracle.

Cross-engine determinism rules (so the driver's value-hash matches):

- per-row arithmetic stays in DOUBLE (IEEE ops are bit-identical everywhere);
- aggregation of doubles goes through CAST(expr AS DECIMAL(27,6)) → SUM
  (exact, order-independent) → CAST(... AS DOUBLE); scale 6 is chosen so the
  cast never actually rounds (see ``_dsum``);
- averages are ``CAST(sum_decimal AS DOUBLE) / CAST(count AS DOUBLE)`` —
  deterministic double division of identical inputs — never the engine's
  own ``avg`` over doubles (partial-aggregation order varies);
- every computed column is aliased identically in Spark and SQL;
- integer sums are cast to BIGINT on both sides (DuckDB would widen to
  HUGEINT).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from go_pq_cdc_kafka_spark.catalog import load_table, spread_small_scan


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB-runnable ANSI SQL; None → rows-only check
    category: str
    description: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, category: str, description: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        # A duplicate name would silently shadow the earlier definition in
        # the dict, leaving dead code that future edits patch by mistake
        # (this happened once: two scan_orc_roundtrip defs). Fail loudly.
        if name in REGISTRY:
            raise ValueError(f"query {name!r} registered twice")
        REGISTRY[name] = QueryDef(name, fn, oracle, category, description)
        return fn

    return deco


def _dsum(col, scale: int = 6) -> F.Column:
    """Order-independent double sum: decimal-exact accumulate, double out.

    Scale 6 matters: fixture monetary values have ≤2 decimal digits and the
    per-row expressions multiply at most three of them, so the double's
    shortest decimal repr has ≤6 fractional digits — the decimal cast is then
    exact in BOTH engines (Spark rounds the shortest repr, DuckDB rounds the
    exact binary expansion; at a digit position where nothing is cut off they
    agree bit-for-bit)."""
    return F.sum(col.cast(f"decimal(27,{scale})")).cast("double")


# ===========================================================================
# Aggregation (SURVEY §2.B: hash/sort agg, partial+final via Catalyst)
# ===========================================================================

@register(
    "agg_pricing_summary",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,6))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(27,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    category="aggregation",
    description="TPC-H Q1-style pricing summary; flagship query.",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1)).cast("long")
    # Round-12: the fixture files are single-row-group parquet, so the scan
    # plus the eight DECIMAL(27,6) partial sums ran in ONE task (908 ms of
    # the 1.33 s wall at sf0.1 — event-log stage s50). Spreading the
    # filtered 6-column projection moves the decimal work onto every core;
    # the shuffle carries only the projected columns and the spread is a
    # no-op once the input's own splits exceed the core count (guide §2.2/
    # §2.3: project before the exchange, size partitions from the data).
    proj = (
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
    )
    base = spread_small_scan(
        li.filter(
            F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
        ).select(*proj),
        # hash-spread on the consumed projection itself: every column is
        # read downstream anyway (no pruning lost) and the deterministic
        # key skips round-robin's per-task input sort
        key_cols=proj,
    )
    return (
        base.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            (_dsum(F.col("l_quantity")) / cnt.cast("double")).alias("avg_qty"),
            (_dsum(F.col("l_extendedprice")) / cnt.cast("double")).alias("avg_price"),
            (_dsum(F.col("l_discount")) / cnt.cast("double")).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_minmax_count",
    oracle="""
SELECT
  o_orderpriority,
  COUNT(*) AS n_orders,
  COUNT(DISTINCT o_custkey) AS n_customers,
  CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
  CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    category="aggregation",
    description="MIN/MAX/COUNT/COUNT DISTINCT per group (SURVEY §2.B aggregation row).",
)
def agg_minmax_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
            F.min("o_totalprice").cast("double").alias("min_price"),
            F.max("o_totalprice").cast("double").alias("max_price"),
            _dsum(F.col("o_totalprice")).alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_rollup",
    oracle="""
SELECT
  COALESCE(l_returnflag, 'ALL') AS returnflag,
  COALESCE(l_linestatus, 'ALL') AS linestatus,
  COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
""",
    category="grouping-sets",
    description="ROLLUP hierarchy totals — one Expand + hash aggregate, single shuffle.",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            _dsum(F.col("l_quantity")).alias("sum_qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "agg_cube",
    oracle="""
SELECT
  COALESCE(l_returnflag, 'ALL') AS returnflag,
  COALESCE(l_linestatus, 'ALL') AS linestatus,
  COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
""",
    category="grouping-sets",
    description="CUBE over two dims — all grouping combinations in one pass.",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "distinct_segments",
    oracle="""
SELECT DISTINCT c_mktsegment, c_nationkey
FROM customer
ORDER BY c_mktsegment, c_nationkey
""",
    category="distinct",
    description="Exact DISTINCT over a two-column projection (dedup baseline).",
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct().orderBy(
        "c_mktsegment", "c_nationkey"
    )


# ===========================================================================
# Projection / filter (pushdown-verified in tests)
# ===========================================================================

@register(
    "scan_filter_project",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem
WHERE l_quantity > 45.0 AND l_returnflag = 'R'
ORDER BY l_orderkey, l_linenumber
""",
    category="scan",
    description="Filter + projection; predicate reaches the parquet scan.",
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") > 45.0) & (F.col("l_returnflag") == "R"))
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# ===========================================================================
# Joins
# ===========================================================================

@register(
    "join_equi_broadcast",
    oracle="""
SELECT r.r_name AS region, n.n_name AS nation,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS sum_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
ORDER BY region, nation
""",
    category="join",
    description="Two broadcast hash joins (dims) + aggregation.",
)
def join_equi_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            _dsum(F.col("c_acctbal")).alias("sum_acctbal"),
        )
        .orderBy("region", "nation")
    )


@register(
    "join_multiway_fact",
    oracle="""
SELECT n.n_name AS nation, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS order_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey  = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name, order_year
ORDER BY nation, order_year
""",
    category="join",
    description="Fact-fact shuffle join + broadcast dims, TPC-H Q5 flavor.",
)
def join_multiway_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hint policy (round 6): only the BOUNDED dim (nation, 25 rows
    forever) carries a broadcast hint. Customer is SF-scaled — hinting it
    pins a plan that dies at some scale; unhinted, Catalyst/AQE broadcast
    it while it fits the threshold and shuffle it beyond, which is the
    only 100 TB-correct answer."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    # Round-12: all three joins plan as BroadcastHashJoin, so without a
    # spread the whole probe+partial-agg pipeline runs inside the fact
    # scan's task — one core on the single-row-group fixture (event-log
    # stage s24: 697 ms serial of the 1.38 s wall). Spread the 3-column
    # fact projection (all consumed, nothing to prune; no-op at real
    # splits): 1.59 s → 0.92 s steady-state, results exceptAll-identical.
    proj = ("l_orderkey", "l_extendedprice", "l_discount")
    li = spread_small_scan(li.select(*proj), key_cols=proj)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy("nation", "order_year")
    )


@register(
    "join_left_outer",
    oracle="""
SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
GROUP BY c.c_custkey
ORDER BY c.c_custkey
""",
    category="join",
    description="Left outer join preserving unmatched left rows (null-padded).",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("n_orders"))
        .orderBy("c_custkey")
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
ORDER BY c_custkey
""",
    category="join",
    description="Left semi join — existence filter, right side never materialized.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti",
    oracle="""
SELECT o_orderkey, o_orderstatus
FROM orders
WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
ORDER BY o_orderkey
""",
    category="join",
    description="Orders with no lineitems (non-empty in the fixtures).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_anti")
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    )


@register(
    "join_range_theta",
    oracle="""
SELECT p.p_partkey, p.p_size, COUNT(*) AS n_matching
FROM part p
JOIN lineitem l
  ON l.l_partkey = p.p_partkey
 AND l.l_quantity BETWEEN p.p_size AND p.p_size + 10
GROUP BY p.p_partkey, p.p_size
ORDER BY p.p_partkey
""",
    category="join",
    description="Equi key + range predicate (band) join.",
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The equi key carries the join (hash/SMJ partitioning on partkey);
    the band predicate is a post-join filter, NOT the join strategy — so
    no broadcast hint: ``part`` scales with the corpus (2M rows at sf10,
    unbounded at 100 TB) and must stay shuffle-joinable; AQE may still
    broadcast it at small SF where it genuinely fits."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_partkey == p.p_partkey)
        & (li.l_quantity >= p.p_size)
        & (li.l_quantity <= p.p_size + 10)
    )
    return (
        li.join(p, cond)
        .groupBy("p_partkey", "p_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_matching"))
        .orderBy("p_partkey")
    )


# ===========================================================================
# Window functions
# ===========================================================================

@register(
    "window_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) t
WHERE rk <= 3
ORDER BY o_custkey, rk
""",
    category="window",
    description="Top-3 orders per customer — rank-based top-k.",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-12: same single-exchange shape as cdc_lww_materialize —
    # RangePartitioning(o_custkey) serves both the window clustering and
    # the final orderBy's distribution (2 Exchange → 1; 0.58 s → 0.49 s at
    # sf0.1, exceptAll-identical). o_custkey is SF-scaled, so the range
    # partitions stay balanced as the corpus grows.
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    ).repartitionByRange("o_custkey")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
        .orderBy("o_custkey", "rk")
    )


@register(
    "window_running_lag",
    oracle="""
SELECT user_id, event_id, value,
       CAST(SUM(CAST(value AS DECIMAL(27,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
       LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
       LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
FROM events
ORDER BY user_id, event_id
""",
    category="window",
    description="Running sum + lag/lead analytic frame.",
)
def window_running_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.sum(F.col("value").cast("decimal(27,6)")).over(frame).cast("double").alias("running_value"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    ).orderBy("user_id", "event_id")


@register(
    "sort_global_topk",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
    category="sort",
    description="Global top-k — Spark plans TakeOrderedAndProject (no full sort).",
)
def sort_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# ===========================================================================
# Set operations
# ===========================================================================

@register(
    "setop_union_intersect_except",
    oracle="""
WITH big_cust AS (
  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000.0
), auto_cust AS (
  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
)
SELECT 'union' AS src, custkey FROM (SELECT custkey FROM big_cust UNION SELECT custkey FROM auto_cust)
UNION ALL
SELECT 'intersect' AS src, custkey FROM (SELECT custkey FROM big_cust INTERSECT SELECT custkey FROM auto_cust)
UNION ALL
SELECT 'except' AS src, custkey FROM (SELECT custkey FROM big_cust EXCEPT SELECT custkey FROM auto_cust)
ORDER BY src, custkey
""",
    category="setop",
    description="UNION ALL / INTERSECT / EXCEPT composed in one query.",
)
def setop_union_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = o.filter(F.col("o_totalprice") > 250000.0).select(
        F.col("o_custkey").alias("custkey")
    )
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("custkey")
    )
    parts = [
        big.union(auto).distinct().select(F.lit("union").alias("src"), "custkey"),
        big.intersect(auto).select(F.lit("intersect").alias("src"), "custkey"),
        big.distinct().exceptAll(auto.distinct()).select(
            F.lit("except").alias("src"), "custkey"
        ),
    ]
    out = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return out.orderBy("src", "custkey")


# ===========================================================================
# Scalar function families (string / datetime / math / array / json)
# ===========================================================================

@register(
    "func_string",
    oracle="""
SELECT p_partkey,
       UPPER(p_brand) AS brand_upper,
       SUBSTRING(p_name, 1, 8) AS name_prefix,
       LPAD(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
       CONCAT(p_brand, ':', p_type) AS brand_type,
       LENGTH(p_name) AS name_len,
       REGEXP_REPLACE(p_type, '[aeiou]', '_') AS devoweled
FROM part
WHERE p_name LIKE '%ol%'
ORDER BY p_partkey
""",
    category="function-string",
    description="ISBN-style LPAD from the reference fixtures (example/snapshot/init.sql:32).",
)
def func_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").like("%ol%"))
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
            F.length("p_name").cast("long").alias("name_len"),
            F.regexp_replace(F.col("p_type"), "[aeiou]", "_").alias("devoweled"),
        )
        .orderBy("p_partkey")
    )


@register(
    "func_datetime",
    oracle="""
SELECT DATE_TRUNC('month', o_orderdate) AS order_month,
       COUNT(*) AS n_orders,
       CAST(MIN(EXTRACT(DOW FROM o_orderdate)) AS INTEGER) AS min_dow
FROM orders
GROUP BY order_month
ORDER BY order_month
""",
    category="function-datetime",
    description="Date/time functions: trunc, extract, intervals, unix epoch.",
)
def func_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("order_month"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            # DuckDB DOW: Sunday=0; Spark dayofweek: Sunday=1
            F.min(F.dayofweek("o_orderdate") - 1).cast("int").alias("min_dow"),
        )
        .orderBy("order_month")
    )


@register(
    "func_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ABS(l_discount - 0.05) AS disc_dev,
       FLOOR(l_quantity) AS qty_floor,
       CEIL(l_extendedprice / 1000.0) AS price_k,
       MOD(l_orderkey, 7) AS key_mod,
       SQRT(l_quantity) AS qty_sqrt
FROM lineitem
WHERE l_linenumber = 1 AND l_orderkey <= 1000
ORDER BY l_orderkey
""",
    category="function-math",
    description="Math functions: rounding, abs, arithmetic, integer division.",
)
def func_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_linenumber") == 1) & (F.col("l_orderkey") <= 1000))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
            F.floor("l_quantity").cast("double").alias("qty_floor"),
            F.ceil(F.col("l_extendedprice") / 1000.0).cast("double").alias("price_k"),
            (F.col("l_orderkey") % 7).alias("key_mod"),
            F.sqrt("l_quantity").alias("qty_sqrt"),
        )
        .orderBy("l_orderkey")
    )


@register(
    "func_array",
    oracle="""
SELECT word, COUNT(*) AS n
FROM (SELECT UNNEST(STRING_SPLIT(p_type, ' ')) AS word FROM part) t
GROUP BY word
ORDER BY n DESC, word
""",
    category="function-array",
    description="Array construction, explode, contains, sort (SURVEY §2.B array row).",
)
def func_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split(F.col("p_type"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "word")
    )


@register(
    "func_json",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    category="function-json",
    description="JSON functions: to_json, get_json_object, schema-on-read extraction.",
)
def func_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Round-12: the JSON parse runs inside the scan's partial-agg stage —
    # serial on the single-row-group fixture. Spread the two consumed
    # columns (props is row-unique: no pruning lost, hash uniform);
    # 0.43 s → 0.38 s at sf0.1, no-op at real splits.
    ev = spread_small_scan(
        ev.select("event_type", "props"), key_cols=("event_type", "props")
    )
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(k.cast("long")).cast("long").alias("sum_k"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# CDC-tier queries (the reference's own pipeline semantics, batch-checkable)
# ===========================================================================

def _orders_changelog_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic changelog over orders: snapshot, then updates on
    keys %10==0 (price bump), then deletes on keys %7==0. Mirrors the
    reference E2E recipe (FIXTURES.md §2).

    Round-12 note: a single-scan variant (one decode, conditional
    struct-array explode per row) was prototyped to remove two of the three
    input passes — and measured SLOWER at sf0.1 (0.62 s vs 0.36 s for the
    bare changelog, and +0.6 s on each consumer): the per-row
    array-of-struct build + higher-order filter + Generate costs more CPU
    than two extra scan branches that run concurrently and codegen to
    trivial projections. The three passes stay — they are map-parallel and
    the branches share the parquet page cache."""
    o = load_table(spark, sf_dir, "orders")
    snap = o.select(
        F.col("o_orderkey").alias("pk"),
        F.lit("SNAPSHOT").alias("op"),
        F.col("o_totalprice").alias("price"),
        F.lit(0).cast("long").alias("lsn"),
    )
    upd = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            F.col("o_orderkey").alias("pk"),
            F.lit("UPDATE").alias("op"),
            (F.col("o_totalprice") * 1.1).alias("price"),
            F.lit(1).cast("long").alias("lsn"),
        )
    )
    dele = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            F.col("o_orderkey").alias("pk"),
            F.lit("DELETE").alias("op"),
            F.lit(None).cast("double").alias("price"),
            F.lit(2).cast("long").alias("lsn"),
        )
    )
    return snap.unionByName(upd).unionByName(dele)


_ORDERS_CHANGELOG_SQL = """
  SELECT o_orderkey AS pk, 'SNAPSHOT' AS op, o_totalprice AS price, CAST(0 AS BIGINT) AS lsn
  FROM orders
  UNION ALL
  SELECT o_orderkey, 'UPDATE', o_totalprice * 1.1, CAST(1 AS BIGINT)
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey, 'DELETE', NULL, CAST(2 AS BIGINT)
  FROM orders WHERE o_orderkey % 7 = 0
"""


@register(
    "cdc_debezium_envelope",
    oracle=f"""
WITH changelog AS ({_ORDERS_CHANGELOG_SQL})
SELECT pk, lsn,
       to_json(struct_pack(
         before := CASE WHEN op = 'DELETE' THEN struct_pack(pk := pk) END,
         after := CASE WHEN op <> 'DELETE' THEN struct_pack(
             pk := pk,
             amount_cents := CAST(ROUND(price * 100) AS BIGINT)) END,
         source := struct_pack(
             connector := 'postgresql',
             name := 'spark-graft',
             "schema" := 'public',
             "table" := 'orders',
             lsn := CAST(lsn AS BIGINT),
             snapshot := CASE WHEN op = 'SNAPSHOT' THEN 'true'
                              ELSE 'false' END),
         op := CASE op WHEN 'INSERT' THEN 'c' WHEN 'UPDATE' THEN 'u'
                       WHEN 'DELETE' THEN 'd' ELSE 'r' END
       )) AS value
FROM changelog
ORDER BY pk, lsn
""",
    category="cdc",
    description="Debezium-compatible data-change-event JSON (before/after "
    "images, source block with lsn + snapshot flag, single-char op "
    "c/u/d/r) rendered with pure Column expressions + to_json "
    "(handler.debezium_value) — the migration surface for consumers "
    "built against the Debezium PostgreSQL connector. before is the "
    "REPLICA IDENTITY DEFAULT projection (key-only, reference S4 "
    "parity); after is null for deletes; null fields render explicitly. "
    "The oracle builds the SAME JSON with DuckDB's to_json/struct_pack — "
    "byte-for-byte string equality, so field order, null rendering, and "
    "escaping are all pinned cross-engine. Map-only lineage.",
)
def cdc_debezium_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_pq_cdc_kafka_spark import handler as H

    log = _orders_changelog_spark(spark, sf_dir)
    cents = F.round(F.col("price") * 100).cast("long")
    value = H.debezium_value(
        op=F.col("op"),
        before=F.when(F.col("op") == "DELETE", F.struct(F.col("pk"))),
        after=F.when(
            F.col("op") != "DELETE",
            F.struct(F.col("pk"), cents.alias("amount_cents")),
        ),
        lsn=F.col("lsn"),
        source_name="spark-graft",
        schema_name="public",
        table_name="orders",
    )
    return log.select("pk", "lsn", value.alias("value")).orderBy("pk", "lsn")


@register(
    "cdc_avro_value_roundtrip",
    oracle=f"""
WITH changelog AS ({_ORDERS_CHANGELOG_SQL})
SELECT pk, op, price, lsn
FROM changelog
ORDER BY pk, lsn
""",
    category="cdc",
    description="Kafka value serialization as Confluent-framed Avro "
    "(magic 0x00 + schema-id + datum — the Debezium/Schema-Registry wire "
    "format), using the from-scratch datum codec (sources/avro.to_avro/"
    "from_avro, Arrow-batched pandas UDFs — no spark-avro jar): the orders "
    "changelog is struct-packed, encoded to binary, decoded back, and "
    "every field must survive bit-exactly (the oracle reads the plain "
    "changelog). The deterministic encoder means retried batches produce "
    "byte-identical Kafka values — idempotent-producer friendly.",
)
def cdc_avro_value_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_pq_cdc_kafka_spark.sources.avro import from_avro, to_avro

    value_schema = {
        "type": "record",
        "name": "orders_value",
        "fields": [
            {"name": "pk", "type": ["null", "long"]},
            {"name": "op", "type": ["null", "string"]},
            {"name": "price", "type": ["null", "double"]},
            {"name": "lsn", "type": ["null", "long"]},
        ],
    }
    # Round-12: the union of three narrow scans plans ≤3 partitions, so the
    # pure-Python per-datum codec (necessarily row-wise — it's the
    # from-spec byte encoder) ran on ≤3 cores: 9.0 s of the sweep's 9.5 s
    # at sf0.1. Spread on the unique (pk, lsn) key before the Python
    # boundary (guide §4: parallelize the expensive UDF stage; no-op once
    # the input has real splits). All four columns are consumed by the
    # encoder, so nothing prunable is lost.
    log = spread_small_scan(
        _orders_changelog_spark(spark, sf_dir), key_cols=("pk", "lsn")
    )
    encoded = log.select(
        to_avro(value_schema, confluent_schema_id=1)(
            F.struct("pk", "op", "price", "lsn")
        ).alias("value")
    )
    return (
        encoded.select(from_avro(value_schema, confluent=True)("value").alias("d"))
        .select("d.pk", "d.op", "d.price", "d.lsn")
        .orderBy("pk", "lsn")
    )


@register(
    "cdc_lww_materialize",
    oracle=f"""
WITH changelog AS ({_ORDERS_CHANGELOG_SQL}),
ranked AS (
  SELECT pk, op, price,
         ROW_NUMBER() OVER (PARTITION BY pk ORDER BY lsn DESC) AS rn
  FROM changelog
)
SELECT pk, op AS last_op, price
FROM ranked
WHERE rn = 1 AND op <> 'DELETE'
ORDER BY pk
""",
    category="cdc",
    description="Last-write-wins table materialization from a change stream "
    "(row_number over pk by LSN desc; SURVEY §2.B stateful ops).",
)
def cdc_lww_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-12: range-partition by pk ONCE — RangePartitioning(pk) satisfies
    # the window's ClusteredDistribution(pk) AND the final orderBy(pk)'s
    # OrderedDistribution, so the plan needs a single exchange and a single
    # sort instead of hash-exchange → window → sample → range-exchange →
    # sort (guide §2.4: operations keyed the same way share one exchange).
    # Plan: 2 Exchange → 1, 3 Sort → 1; 0.92 s → 0.59 s at sf0.1,
    # exceptAll-identical. pk is the order key — corpus-cardinality, so
    # range partitions stay balanced at any scale.
    log = _orders_changelog_spark(spark, sf_dir).repartitionByRange("pk")
    w = Window.partitionBy("pk").orderBy(F.col("lsn").desc())
    return (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "DELETE"))
        .select("pk", F.col("op").alias("last_op"), "price")
        .orderBy("pk")
    )


@register(
    "cdc_event_counts",
    oracle=f"""
WITH changelog AS ({_ORDERS_CHANGELOG_SQL})
SELECT op, COUNT(*) AS n, COUNT(DISTINCT pk) AS n_keys
FROM changelog
GROUP BY op
ORDER BY op
""",
    category="cdc",
    description="Operation-type dispatch counts over a change stream (S2).",
)
def cdc_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = _orders_changelog_spark(spark, sf_dir)
    return (
        log.groupBy("op")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("pk").cast("long").alias("n_keys"),
        )
        .orderBy("op")
    )


@register(
    "cdc_sink_records",
    oracle=f"""
WITH changelog AS ({_ORDERS_CHANGELOG_SQL})
SELECT 'orders.cdc' AS topic,
       CAST(pk AS VARCHAR) AS key,
       CONCAT('{{"pk":', CAST(pk AS VARCHAR), ',"operation":"', op, '"}}') AS value,
       op AS header_operation,
       CASE WHEN op = 'SNAPSHOT' THEN 'initial-snapshot' ELSE 'cdc' END AS header_source
FROM changelog
ORDER BY key, header_operation
""",
    category="cdc",
    description="Kafka record shaping: topic routing, key/value/header "
    "conventions (reference T2-T4, R1).",
)
def cdc_sink_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = _orders_changelog_spark(spark, sf_dir)
    return (
        log.select(
            F.lit("orders.cdc").alias("topic"),
            F.col("pk").cast("string").alias("key"),
            F.concat(
                F.lit('{"pk":'),
                F.col("pk").cast("string"),
                F.lit(',"operation":"'),
                F.col("op"),
                F.lit('"}'),
            ).alias("value"),
            F.col("op").alias("header_operation"),
            F.when(F.col("op") == "SNAPSHOT", F.lit("initial-snapshot"))
            .otherwise(F.lit("cdc"))
            .alias("header_source"),
        )
        .orderBy("key", "header_operation")
    )


# ===========================================================================
# Training-data operators (north-star tier): text analysis, dedup,
# similarity search, multimodal plumbing — all on documents/embeddings
# ===========================================================================

from go_pq_cdc_kafka_spark.functions import multimodal as MM  # noqa: E402
from go_pq_cdc_kafka_spark.functions import text as T  # noqa: E402
from go_pq_cdc_kafka_spark.operators import dedup as DD  # noqa: E402
from go_pq_cdc_kafka_spark.operators import similarity as SIM  # noqa: E402

# Session-scoped materialization of the valved near-dup pair index.
# Four registry queries (maxdf pairs, cluster resolve, BFS, leakage-safe
# split) consume the IDENTICAL (threshold, max_df) pair graph, and pair
# generation dominates each of them (~60 s of every consumer's wall at
# sf10 before sharing). A real curation pipeline materializes this index
# once and reuses it; this cache is that materialization at session
# scope — an eager localCheckpoint (pinned executor blocks, immune to
# spark.catalog.clearCache()) keyed by (application, sf_dir, params) so
# a new session or different corpus can never read a stale index.
_PAIR_INDEX_CACHE: dict = {}


def _valved_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5, max_df: int = 64
) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, threshold, max_df)
    df = _PAIR_INDEX_CACHE.get(key)
    if df is None:
        # drop entries from stopped sessions (their checkpoint blocks died
        # with the executors) and bound the cache
        for k in [k for k in _PAIR_INDEX_CACHE if k[0] != key[0]]:
            del _PAIR_INDEX_CACHE[k]
        if len(_PAIR_INDEX_CACHE) > 8:
            _PAIR_INDEX_CACHE.clear()
        raw = load_table(spark, sf_dir, "documents")
        n = raw.count()  # footer-only metadata job
        d = spread_small_scan(raw)
        # the result is eagerly checkpointed for the four consumer
        # queries, so the operator's internal pins only ever serve this
        # ONE build — below the ~100k-doc boundary they are pure barrier
        # cost (and linger uselessly after the checkpoint)
        df = DD.ngram_jaccard_pairs(
            d, threshold=threshold, max_df=max_df, persist=n > 100_000
        ).localCheckpoint(eager=True)
        _PAIR_INDEX_CACHE[key] = df
    return df


@register(
    "text_token_count",
    oracle="""
SELECT doc_id,
       CAST(length(list_filter(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ \t\n\r\f\x0B]+'), t -> t != '')) AS BIGINT) AS n_tokens,
       CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe
FROM documents
ORDER BY doc_id
""",
    category="text-analysis",
    description="Whitespace + BPE-ish regex token counting.",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.bpe_token_count(F.col("text")).alias("n_bpe"),
    ).orderBy("doc_id")


@register(
    "text_quality_score",
    oracle=f"""
SELECT doc_id,
{T.QUALITY_SQL.format(c="text")}
FROM documents
ORDER BY doc_id
""",
    category="text-analysis",
    description="Length/punct/stopword-ratio quality scoring.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    feats = T.quality_features(F.col("text"))
    return d.select(
        "doc_id", *[c.alias(name) for name, c in feats.items()]
    ).orderBy("doc_id")


@register(
    "text_lang_id",
    oracle=f"""
SELECT {T.lang_id_sql("text")} AS lang_pred, COUNT(*) AS n
FROM documents
GROUP BY lang_pred
ORDER BY lang_pred
""",
    category="text-analysis",
    description="Marker-word-heuristic language ID (argmax of n-gram hits).",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(T.lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("lang_pred")
    )


@register(
    "text_fingerprint_groups",
    oracle=f"""
SELECT {T.BAG_FINGERPRINT_SQL.format(c="text")} AS fp,
       CAST(MIN(doc_id) AS BIGINT) AS keeper,
       COUNT(*) AS n_copies
FROM documents
GROUP BY fp
ORDER BY fp
""",
    category="dedup",
    description="Bag-fingerprint document hashing (exact-dedup groups).",
)
def text_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    return DD.dup_groups(d).orderBy("fp")


@register(
    "dedup_exact_survivors",
    oracle=f"""
WITH fps AS (
  SELECT doc_id, {T.BAG_FINGERPRINT_SQL.format(c="text")} AS fp FROM documents
),
ranked AS (
  SELECT doc_id, fp, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM fps
)
SELECT doc_id, fp FROM ranked WHERE rn = 1 ORDER BY doc_id
""",
    category="dedup",
    description="Exact dedup: lowest-id survivor per fingerprint.",
)
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    return DD.exact_dedup(d).select("doc_id", "fp").orderBy("doc_id")


@register(
    "dedup_ngram_jaccard",
    oracle=DD.ngram_jaccard_pairs_sql(threshold=0.5),
    category="dedup",
    description="Near-dup pairs by exact word-3-gram Jaccard via inverted "
    "shingle index (no all-pairs scan).",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load_table(spark, sf_dir, "documents")
    n = raw.count()  # footer-only metadata job
    d = spread_small_scan(raw)
    # pins defend against re-deriving the corpus-scaled shingle index
    # (3 consumers); below ~100k docs the three materialization barriers
    # cost more than the recompute they avoid (round-12 A/B at 5k docs:
    # 1.73 → 1.23 s, bit-identical) — same boundary as the minhash
    # semi_filter switch
    return DD.ngram_jaccard_pairs(
        d, threshold=0.5, persist=n > 100_000
    ).orderBy("doc_a", "doc_b")


@register(
    "dedup_ngram_jaccard_maxdf",
    oracle=DD.ngram_jaccard_pairs_sql(threshold=0.5, max_df=64),
    category="dedup",
    description="Capped-vocabulary n-gram Jaccard: the max_df valve drops "
    "shingles shared by >64 docs BEFORE the self-join, bounding pair work "
    "to Sum(df<=64 squared) regardless of boilerplate mass — the scale "
    "path of dedup_ngram_jaccard (a shingle in k docs alone contributes "
    "k^2 candidate rows; one phrase in 10^6 docs is 10^12 rows unvalved). "
    "Jaccard is exact over the capped shingle space, so pairs overlapping "
    "only in boilerplate never surface.",
)
def dedup_ngram_jaccard_maxdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6 sf10 evidence: the exact variant is Θ(Σ df²) by design and
    ran past 10 minutes at 500k docs (every fixture shingle appears in
    ~100 replicas — pure boilerplate mass); this valved variant finishes
    in seconds at the same SF because the capped vocabulary removes the
    quadratic stop-shingle work before it is ever materialized."""
    return _valved_pairs(spark, sf_dir).orderBy("doc_a", "doc_b")


@register(
    "dedup_minhash_lsh",
    oracle=DD.minhash_lsh_pairs_sql(num_perms=16, bands=4, threshold=0.5),
    category="dedup",
    description="MinHash(16)+LSH(4 bands) candidate generation with exact "
    "Jaccard verification.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load_table(spark, sf_dir, "documents")
    # sf100 lesson (same class as dedup_embedding_cosine): past ~1M docs
    # the hinted shuffle-hash verification joins can exceed one task's
    # hash-build budget after AQE coalesces the under-estimated candidate
    # shuffle; sort-merge spills gracefully there. Count BEFORE the
    # spread repartition so it stays a footer-only metadata job.
    n = raw.count()
    d = spread_small_scan(raw, key_cols=("doc_id",))
    # eager rides the same switch: below ~1M docs the three materialization
    # barriers cost more than the duplicated cheap subtrees they prevent
    # (round-12 A/B: 2.0 s lazy vs 2.3 s eager at sf0.1); past it the
    # race duplicates corpus-scale passes (round-11 sf100 event log: twin
    # ~80 s stages), so serialize the cache builds.
    return DD.minhash_lsh_pairs(
        d, num_perms=16, bands=4, threshold=0.5,
        pair_join="merge" if n > 1_000_000 else "shuffle_hash",
        eager=n > 1_000_000,
        # the candidate-doc semi filter pays for itself once the index is
        # big enough that re-shuffling it dominates two extra stages
        # (round-9 sf10: 4x win at 500k docs; round-12 sf0.1: 0.4 s cost
        # at 5k docs) — switch well below the measured-win scale
        semi_filter=n > 100_000,
        # pins ride the same boundary: they defend against re-deriving
        # the corpus-scaled index/signature subtrees, and below it the
        # materialization barriers cost more than the recompute (round-12
        # A/B at 5k docs: 1.88 → 1.23 s, bit-identical)
        persist=n > 100_000,
        # round 13: below the same boundary the whole verify subsystem is
        # replaced by a map-side array_intersect on band rows carrying the
        # shingle sets (2.1x at 50k docs, result-identical); above it the
        # band-exchange payload loses to the join chain (500k-doc A/B:
        # 40-50 s vs 60-109 s) so the verify joins stand
        band_local=n <= 100_000,
    ).orderBy("doc_a", "doc_b")


@register(
    "dedup_simhash",
    oracle=DD.simhash_sql(bits=32),
    category="dedup",
    description="32-bit SimHash fingerprints from token-bit majority votes.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    return DD.simhash(d, bits=32).orderBy("doc_id")


@register(
    "sim_cosine_topk",
    oracle=SIM.cosine_topk_sql(k=5, query_pred="vec_id < 5"),
    category="similarity",
    description="Brute-force exact cosine top-5 (broadcast queries, "
    "decimal-exact dot products).",
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # keyed corpus spread (round 12, the sim_knn_label_eval pattern): the
    # per-pair decimal dots fuse into the single-row-group scan task
    # otherwise; no-op at real splits, bit-identical (exceptAll 0/0)
    c = spread_small_scan(e, key_cols=("vec_id",))
    return SIM.cosine_topk(
        # .limit(5) == no-op on the <=5-row unique-key filter; it puts a
        # GlobalLimit under the broadcast so the plan gate can PROVE the
        # BNLJ build side bounded instead of trusting the predicate
        e.filter(F.col("vec_id") < 5).limit(5), c, k=5
    ).orderBy("query_id", "rk")


@register(
    "sim_lsh_topk",
    oracle=SIM.lsh_cosine_topk_sql(dim=64, k=5, planes=4, query_pred="vec_id < 5"),
    category="similarity",
    description="Sign-LSH bucketed ANN top-5 (deterministic md5-derived "
    "hyperplanes; bucket equi-join replaces the cross product).",
)
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # keyed corpus spread (round 12): the 4 decimal plane dots + norm per
    # corpus vector ran inside the serial scan task; no-op at real splits
    return SIM.lsh_cosine_topk(
        e.filter(F.col("vec_id") < 5),
        spread_small_scan(e, key_cols=("vec_id",)),
        dim=64, k=5, planes=4,
    ).orderBy("query_id", "rk")


@register(
    "multimodal_decode_features",
    oracle="""
SELECT doc_id, md5(text) AS payload_md5, CAST(strlen(text) AS BIGINT) AS payload_bytes
FROM documents
ORDER BY doc_id
""",
    category="multimodal",
    description="Binary-payload feature extraction through Arrow-batched "
    "mapInPandas (md5+size as the deterministic stand-in for a real decoder).",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return MM.extract_features(payloads).orderBy("doc_id")


@register(
    "multimodal_image_stats",
    oracle="""
SELECT n.n_nationkey AS doc_id,
       CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CAST(SUM((n.n_nationkey*31 + r.i*7 + c.i*3) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((n.n_nationkey*31 + r.i*7 + c.i*3 + 11) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((n.n_nationkey*31 + r.i*7 + c.i*3 + 22) % 256) AS BIGINT) AS sum_b
FROM nation n,
     (SELECT UNNEST(range(4)) AS i) r,
     (SELECT UNNEST(range(4)) AS i) c
GROUP BY n.n_nationkey
ORDER BY doc_id
""",
    category="multimodal",
    description="REAL image decode on executors: 4x4 24-bit BMPs are "
    "synthesized per nation key inside one mapInPandas stage (pixel "
    "(r,c,k) = (key*31+r*7+c*3+k*11) mod 256, encoded via the from-spec "
    "BMP writer with bottom-up BGR rows + 4-byte padding), then a second "
    "stage parses the actual BMP bytes back (functions/multimodal."
    "decode_image) and emits integer-exact per-channel pixel sums. The "
    "oracle recomputes the sums from the generating formula — any header, "
    "stride, row-order or channel-order bug in the codec breaks the "
    "match. Map-only lineage; payloads never leave the task.",
)
def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    def synth(batches):
        for pdf in batches:
            ids, payloads = [], []
            for nk in pdf["n_nationkey"]:
                nk = int(nk)
                r = np.arange(4).reshape(4, 1, 1)
                c = np.arange(4).reshape(1, 4, 1)
                k = np.arange(3).reshape(1, 1, 3)
                arr = ((nk * 31 + r * 7 + c * 3 + k * 11) % 256).astype(np.uint8)
                ids.append(nk)
                payloads.append(MM.encode_bmp(arr))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    n = load_table(spark, sf_dir, "nation").select("n_nationkey")
    media = n.mapInPandas(synth, "doc_id long, payload binary")
    return MM.image_stats(media).orderBy("doc_id")


@register(
    "multimodal_audio_stats",
    oracle="""
SELECT n.n_nationkey AS doc_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(600 AS BIGINT) AS n_samples,
       CAST(1 AS INT) AS channels,
       CAST(75 AS BIGINT) AS duration_ms,
       CAST(SUM(ABS((n.n_nationkey*13 + i.i*7) % 199 - 99)) AS BIGINT) AS sum_abs,
       CAST(SUM(((n.n_nationkey*13 + i.i*7) % 199 - 99)
                * ((n.n_nationkey*13 + i.i*7) % 199 - 99)) AS BIGINT) AS sum_sq
FROM nation n, (SELECT UNNEST(range(600)) AS i) i
GROUP BY n.n_nationkey
ORDER BY doc_id
""",
    category="multimodal",
    description="REAL audio decode on executors: 600-sample 8 kHz mono "
    "PCM WAVs synthesized per nation key (sample_i = (key*13+i*7) mod 199 "
    "- 99, int16, stdlib wave writer), then parsed back by functions/"
    "multimodal.decode_audio and reduced to integer signal statistics "
    "(|x| and x^2 sums — RMS is one sqrt away). The oracle recomputes "
    "from the generating formula, pinning RIFF parsing, sample width and "
    "frame count exactly. Map-only; no shuffle.",
)
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    def synth(batches):
        for pdf in batches:
            ids, payloads = [], []
            for nk in pdf["n_nationkey"]:
                nk = int(nk)
                i = np.arange(600, dtype=np.int64)
                samples = ((nk * 13 + i * 7) % 199 - 99).astype(np.int16)
                ids.append(nk)
                payloads.append(MM.encode_wav(samples, 8000))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    n = load_table(spark, sf_dir, "nation").select("n_nationkey")
    media = n.mapInPandas(synth, "doc_id long, payload binary")
    return MM.audio_stats(media).orderBy("doc_id")


# ===========================================================================
# Round-1 widening: as-of join, grouping sets, approx distinct, rolling
# fingerprint, embedding near-dup, IVF ANN
# ===========================================================================

@register(
    "join_asof",
    oracle="""
WITH tagged AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, 1 AS marker
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, epoch_us(ts) AS us, event_id, 0 AS marker
  FROM events WHERE event_type = 'error'
),
filled AS (
  SELECT user_id, us, event_id, marker,
         LAST_VALUE(CASE WHEN marker = 0 THEN us END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY us, marker, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_error_us
  FROM tagged
)
SELECT event_id, user_id, us AS click_us, last_error_us,
       us - last_error_us AS gap_us
FROM filled WHERE marker = 1
ORDER BY event_id
""",
    category="join-asof",
    description="Backward as-of join (each click -> latest prior error of "
    "the same user) via the union-marker + last(ignorenulls) window — one "
    "shuffle on the key, no per-key loops (SURVEY §2.B range/as-of row).",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # catalog.load_table already normalized ts to TIMESTAMP_NTZ (µs); with
    # the session tz pinned to UTC this equals DuckDB's epoch_us(ts)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", us.alias("us"), "event_id", F.lit(1).alias("marker")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", us.alias("us"), "event_id", F.lit(0).alias("marker")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "marker", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = clicks.unionByName(errors).withColumn(
        "last_error_us",
        F.last(
            F.when(F.col("marker") == 0, F.col("us")), ignorenulls=True
        ).over(w),
    )
    return (
        filled.filter(F.col("marker") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("us").alias("click_us"),
            "last_error_us",
            (F.col("us") - F.col("last_error_us")).alias("gap_us"),
        )
        .orderBy("event_id")
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
""",
    category="aggregation",
    description="GROUPING SETS partial aggregates (SURVEY §2.B grouping "
    "sets row) — Catalyst expands to a single Expand+hash-agg, one shuffle.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_price
FROM _gs_orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
"""
    )


@register(
    "distinct_approx",
    # The HLL++ estimate itself is engine-specific, so the hashed output
    # carries the EXACT count plus a boolean error-bound assertion: the
    # oracle pins within_2pct = TRUE, so an estimate drifting past 2%
    # relative error hash-mismatches — an oracle-checkable accuracy
    # contract instead of a rows-only row count.
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS within_2pct
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    category="aggregation",
    description="approx_count_distinct (HLL++ at rsd=0.01) per event type "
    "— the sketch path for 100 TB cardinality estimation. Output asserts "
    "|approx-exact|/exact <= 0.02 as a column the DuckDB oracle checks, "
    "so the sketch's accuracy (not just its row count) is independently "
    "verified; exactness itself is checked by distinct_segments.",
)
def distinct_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Round-12 restructure (bit-identical, exceptAll 0/0): dedup the
    # (event_type, user_id) pairs FIRST, then count + sketch the distinct
    # stream. Mixing count_distinct with approx_count_distinct in one
    # aggregate planned an Expand (×2 of every input row) feeding both; a
    # plain distinct shuffles each pair once and the exact count becomes
    # count(*). The HLL++ register state is duplicate-idempotent (per-
    # bucket max of hashes), so the estimate over the deduped pairs is
    # byte-identical to the one over raw rows. 2.47 → 1.24 s at sf0.1.
    # (A keyed spread before the aggregate was prototyped and measured
    # SLOWER both on the old shape (4.3 → 5.8 s) and this one (1.24 →
    # 1.38 s) — the rsd=0.01 sketches are 2^14 registers each, so extra
    # partials cost more to build+merge than the serial pass they save.)
    return (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("_approx"),
            F.count(F.lit(1)).cast("long").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= 0.02 * F.col("exact_users")
            ).alias("within_2pct"),
        )
        .orderBy("event_type")
    )


@register(
    "text_rolling_fingerprint",
    oracle=f"""
SELECT doc_id, {T.rolling_fingerprint_sql("text")} AS roll_fp
FROM documents
ORDER BY doc_id
""",
    category="text-analysis",
    description="Order-sensitive Rabin-Karp rolling hash over the token "
    "sequence (document fingerprinting; complements the order-invariant "
    "bag fingerprint).",
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # keyed spread (round 12): the per-char rolling-hash HOF fused into
    # the serial single-row-group scan task; no-op at real splits
    d = spread_small_scan(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        key_cols=("doc_id",),
    )
    return d.select(
        "doc_id", T.rolling_fingerprint(F.col("text")).alias("roll_fp")
    ).orderBy("doc_id")


def _cosine_planes(n: int) -> int:
    """Hyperplane count scaled to the corpus: 2^planes buckets should keep
    the expected bucket near ~60 vectors so the bucketed self-join stays
    ~C(60,2) x buckets instead of quadratic. planes=2 exactly at n<=500 (the
    sf0.01 oracle gate, where the static SQL twin uses planes=2). The
    round-6 sf10 sweep caught the constant-planes version: 2 planes = 4
    buckets at ANY size, so 500k vectors made ~N^2/4 candidate pairs and
    filled the sandbox disk with ~70 GB of spill. Capped at 16 (65k
    buckets) — beyond that an IVF/PQ index (operators/similarity.py) is
    the right tool, not bucketed exact scoring."""
    q = max(1, (n + 499) // 500)
    planes = 2 + (q - 1).bit_length() + (1 if q > 1 else 0)
    return min(16, planes)


@register(
    "dedup_embedding_cosine",
    oracle=SIM.cosine_dedup_pairs_sql(dim=64, threshold=0.4, planes=2),
    category="dedup",
    description="Embedding-cosine near-dup pairs, LSH-bucketed self-join "
    "(never all-|N|^2 pairs); hyperplane count scales with corpus size so "
    "bucket population stays bounded (planes=2 at the sf0.01 oracle gate, "
    "matching the static SQL twin).",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_table(spark, sf_dir, "embeddings")
    # bounded scalar action (one row-count job over parquet metadata) —
    # the same class of driver-side scalar the IVF centroid table uses;
    # count the BARE scan so it stays a footer-only metadata job
    n = base.count()
    # keyed spread (round 12): the quantize+bucket+norm projection that
    # cosine_dedup_pairs eagerly materializes fuses into the scan stage,
    # which plans ONE task over the single-row-group fixture; vec_id and
    # embedding are both consumed downstream so nothing prunable is lost.
    # No-op at real splits.
    e = spread_small_scan(base, key_cols=("vec_id",))
    planes = _cosine_planes(n)
    # sf100 lesson: past ~1M vectors the hinted shuffle-hash scoring joins
    # can hit a >1 GB single-task hash build (AQE coalesces the candidate
    # side on an under-estimate); sort-merge spills gracefully there and
    # costs nothing measurable at the sizes where SHJ also works.
    return SIM.cosine_dedup_pairs(
        e, dim=64, threshold=0.4, planes=planes,
        pair_join="merge" if n > 1_000_000 else "shuffle_hash",
    ).orderBy("vec_a", "vec_b")


@register(
    "sim_ivf_topk",
    oracle=SIM.ivf_topk_sql(dim=64, k=5, n_centroids=8, query_pred="vec_id < 5"),
    category="similarity",
    description="IVF ANN top-5 (nprobe=1): deterministic seeded centroids, "
    "inverted-file cluster assignment, probe-one-cluster search.",
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # keyed corpus spread (round 12): cluster assignment scores |C|×k
    # centroid dots per corpus vector inside the serial scan task
    # otherwise; no-op at real splits
    return SIM.ivf_topk(
        e.filter(F.col("vec_id") < 5),
        spread_small_scan(e, key_cols=("vec_id",)),
        dim=64, k=5, n_centroids=8,
    ).orderBy("query_id", "rk")


@register(
    "sim_ivf_trained_topk",
    # Iterative Lloyd training isn't single-statement SQL, so the trained
    # lists themselves can't be replicated in DuckDB — instead the hashed
    # output asserts the contracts that matter: k results per query,
    # ranks aligned with non-increasing cosine, and recall@5 >= 4/5
    # against the EXACT top-5 computed in the same job. The oracle pins
    # all three TRUE/constant, so a recall or ordering regression
    # hash-mismatches. (Exact recall numbers per config are additionally
    # pinned in tests/test_training_ops.py.)
    oracle="""
SELECT CAST(vec_id AS BIGINT) AS query_id,
       CAST(5 AS BIGINT) AS n_results,
       TRUE AS cos_nonincreasing,
       TRUE AS recall_ok
FROM embeddings WHERE vec_id < 5
ORDER BY query_id
""",
    category="similarity",
    description="IVF ANN top-5 with k-means-trained centroids (3 Lloyd "
    "rounds, nprobe=2): the production-shape coarse quantizer — balanced "
    "inverted lists, probe-cost/recall dial. Output is the per-query "
    "accuracy contract (result count, rank/cosine monotonicity, "
    "recall@5 >= 0.8 vs the exact top-5), oracle-checked.",
)
def sim_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # Lloyd training drives jobs at construction; unspread, every
    # assignment round ran its |C|×k double-HOF scoring inside the serial
    # single-row-group scan task (round 12: ~3 s construct at sf0.1).
    e = spread_small_scan(
        load_table(spark, sf_dir, "embeddings"), key_cols=("vec_id",)
    )
    q = e.filter(F.col("vec_id") < 5).limit(5)  # limit == no-op bound on the unique-key filter (plan-gate proof)
    ivf = SIM.ivf_topk(
        q, e, dim=64, k=5, n_centroids=8, nprobe=2, train_iters=3
    )
    exact = SIM.cosine_topk(q, e, k=5)
    w = Window.partitionBy("query_id").orderBy("rk")
    flagged = ivf.withColumn(
        "_ok",
        F.coalesce(
            F.col("cos_sim") <= F.lag("cos_sim").over(w), F.lit(True)
        ),
    )
    hits = (
        ivf.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return (
        flagged.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_results"),
            F.bool_and(F.col("_ok")).alias("cos_nonincreasing"),
        )
        .join(hits, "query_id", "left")
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            "n_results",
            "cos_nonincreasing",
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= 4).alias("recall_ok"),
        )
        .orderBy("query_id")
    )


from go_pq_cdc_kafka_spark.streaming import windows as W  # noqa: E402


@register(
    "window_tumbling_hourly",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY window_start, event_type
ORDER BY window_start, event_type
""",
    category="window-eventtime",
    description="Tumbling 1-hour event-time window aggregation (F.window; "
    "same operator the streaming tier uses with a watermark — SURVEY §2.B "
    "tumbling-windows row). One shuffle on (window, key).",
)
def window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return W.tumbling_agg(
        ev, ts_col="ts", duration="1 hour", keys=("event_type",), value_col="value"
    ).orderBy("window_start", "event_type")


@register(
    "window_session_gap",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, value,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
marked AS (
  SELECT user_id, ts, value,
         CASE WHEN prev_ts IS NULL
                   OR ts - prev_ts > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_session
  FROM ordered
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT MIN(ts) AS session_start, user_id,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
    category="window-eventtime",
    description="Session windows with a 30-minute gap (F.session_window; "
    "gaps-and-islands SQL as the oracle twin — SURVEY §2.B session-windows "
    "row).",
)
def window_session_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return W.session_agg(
        ev, ts_col="ts", gap="30 minutes", keys=("user_id",), value_col="value"
    ).orderBy("user_id", "session_start")


from go_pq_cdc_kafka_spark.operators import skew as SK  # noqa: E402


@register(
    "agg_skew_salted",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
       CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    category="aggregation",
    description="Salted two-phase aggregation on a low-cardinality (hence "
    "skew-prone) key — identical results to the plain GROUP BY oracle; the "
    "hot key fans out over 32 salt buckets before the final merge.",
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        SK.salted_agg(
            li.select("l_returnflag", "l_quantity"),
            keys=["l_returnflag"],
            aggs={
                "n": ("sum", F.count(F.lit(1)).cast("long")),
                "sum_qty": ("sum", F.sum(F.col("l_quantity").cast("decimal(27,6)"))),
                "max_qty": ("max", F.max("l_quantity")),
            },
            buckets=32,
            salt_on="l_quantity",
        )
        .select(
            "l_returnflag",
            F.col("n").cast("long").alias("n"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
            F.col("max_qty").cast("double").alias("max_qty"),
        )
        .orderBy("l_returnflag")
    )


from go_pq_cdc_kafka_spark.operators import rangejoin as RJ  # noqa: E402


@register(
    "join_range_binned",
    oracle="""
WITH sizes AS (SELECT DISTINCT p_size FROM part)
SELECT s.p_size,
       COUNT(*) AS n_points,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty
FROM sizes s
JOIN lineitem l
  ON l.l_quantity >= s.p_size AND l.l_quantity <= s.p_size + 10
GROUP BY s.p_size
ORDER BY s.p_size
""",
    category="join",
    description="Pure point-in-interval join (no equi key) via bucketed "
    "binning: interval explodes to overlapped buckets, point hashes to one, "
    "equi-join on the bucket replaces the nested-loop range scan.",
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    sizes = (
        p.select("p_size").distinct()
        .withColumn("lo", F.col("p_size").cast("double"))
        .withColumn("hi", (F.col("p_size") + 10).cast("double"))
    )
    # spread the 1-column point projection (round 12): the broadcast-bucket
    # probe expands ~11x and feeds the partial aggregate, all inside the
    # single-row-group scan task otherwise. Round-robin, not keyed:
    # l_quantity has only 50 distinct values, far too few for an even hash
    # spread (guide §2.5's 20-100x rule).
    joined = RJ.point_in_interval_join(
        spread_small_scan(li.select("l_quantity")),
        sizes, "l_quantity", "lo", "hi", bucket_width=10.0
    )
    return (
        joined.groupBy("p_size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.sum(F.col("l_quantity").cast("decimal(27,6)")).cast("double").alias("sum_qty"),
        )
        .orderBy("p_size")
    )


# ===========================================================================
# Coverage widening: map funcs, stats, percentiles, frames, pivot/unpivot,
# correlated subquery, csv/json scan roundtrip (SURVEY §2.B rows)
# ===========================================================================

@register(
    "func_map",
    oracle="""
SELECT p_partkey,
       (MAP {'brand': p_brand, 'type': p_type})['brand'][1] AS brand,
       array_to_string(map_keys(MAP {'brand': p_brand, 'type': p_type}), ',') AS key_list,
       CAST(cardinality(MAP {'brand': p_brand, 'type': p_type}) AS INTEGER) AS n_keys
FROM part
WHERE p_partkey < 100
ORDER BY p_partkey
""",
    category="function-map",
    description="MapType construction, element_at, map_keys, size.",
)
def func_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return (
        p.filter(F.col("p_partkey") < 100)
        .select(
            "p_partkey",
            F.element_at(m, "brand").alias("brand"),
            F.array_join(F.map_keys(m), ",").alias("key_list"),
            F.size(m).alias("n_keys"),
        )
        .orderBy("p_partkey")
    )


# Statistical aggregates are NOT computed with the engines' stddev/corr —
# their partial-aggregation order varies, so the last double bits differ.
# Instead: decimal-exact power sums (order-independent) + one deterministic
# double formula evaluated identically in both engines.
_STATS_FORMULA = """
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       (s2q - s1q * s1q / n) / (n - 1.0) AS var_qty,
       SQRT((s2q - s1q * s1q / n) / (n - 1.0)) AS std_qty,
       (spq - s1q * s1p / n)
         / (SQRT(s2q - s1q * s1q / n) * SQRT(s2p - s1p * s1p / n)) AS corr_qty_price
FROM (
  -- decimal -> double via FLOOR split: DuckDB's direct decimal->double cast
  -- is not correctly rounded above ~2^47 (1-ulp drift vs Spark). The integer
  -- part is < 2^53 (exact in both) and the fractional part is a small
  -- decimal whose conversion is correctly rounded in both; one double add
  -- recombines them identically.
  SELECT l_returnflag,
         CAST(n AS DOUBLE) AS n,
         CAST(FLOOR(d1q) AS DOUBLE) + CAST(d1q - FLOOR(d1q) AS DOUBLE) AS s1q,
         CAST(FLOOR(d2q) AS DOUBLE) + CAST(d2q - FLOOR(d2q) AS DOUBLE) AS s2q,
         CAST(FLOOR(d1p) AS DOUBLE) + CAST(d1p - FLOOR(d1p) AS DOUBLE) AS s1p,
         CAST(FLOOR(d2p) AS DOUBLE) + CAST(d2p - FLOOR(d2p) AS DOUBLE) AS s2p,
         CAST(FLOOR(dpq) AS DOUBLE) + CAST(dpq - FLOOR(dpq) AS DOUBLE) AS spq
  FROM (
    -- cast each FACTOR to decimal before multiplying (a double product's
    -- shortest repr exceeds the cast scale, so CAST(product AS DECIMAL)
    -- rounds differently per engine; decimal*decimal is exact in both).
    -- DECIMAL(19,6), not (18,6): DuckDB stores width<=18 in int64, which
    -- overflows on the multiply.
    SELECT l_returnflag,
           COUNT(*) AS n,
           SUM(CAST(l_quantity AS DECIMAL(19,6))) AS d1q,
           SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS d2q,
           SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS d1p,
           SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS d2p,
           SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS dpq
    FROM lineitem GROUP BY l_returnflag
  ) raw
) t
ORDER BY l_returnflag
"""


@register(
    "agg_stats",
    oracle=_STATS_FORMULA,
    category="aggregation",
    description="Variance/stddev/correlation via order-independent decimal "
    "power sums (map-side combinable; one shuffle).",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # keyed spread of the 3-column projection (round 12, same shape as
    # agg_pricing_summary): the five DECIMAL(19,6) power-sum partials
    # fused into the single-row-group scan task. The decimal sums are
    # order-independent by construction (that is the whole point of the
    # formula — see _STATS_FORMULA header), so repartitioning cannot move
    # the result; all three columns are consumed by the aggregate.
    # No-op at real splits.
    li = spread_small_scan(
        load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_quantity", "l_extendedprice"
        ),
        key_cols=("l_returnflag", "l_quantity", "l_extendedprice"),
    )
    li.createOrReplaceTempView("lineitem")
    return spark.sql(_STATS_FORMULA)


@register(
    "agg_percentile",
    oracle="""
SELECT c_mktsegment,
       quantile_disc(c_acctbal, 0.5) AS med_bal,
       quantile_disc(c_acctbal, 0.9) AS p90_bal,
       CAST(COUNT(*) AS BIGINT) AS n
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    category="aggregation",
    description="Exact discrete percentiles (no interpolation — an actual "
    "order statistic, so cross-engine bit-identical).",
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c_acctbal)").alias("med_bal"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY c_acctbal)").alias("p90_bal"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "window_frame_positional",
    oracle="""
SELECT event_id, user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_in_frame,
       MIN(value) OVER w AS min_v,
       MAX(value) OVER w AS max_v,
       FIRST_VALUE(value) OVER w AS first_v,
       LAST_VALUE(value) OVER w AS last_v
FROM events
WHERE user_id < 50
WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
""",
    category="window",
    description="ROWS frame with positional/extremal functions only (frame "
    "sums over doubles are association-order-dependent; min/max/first/last "
    "are exact).",
)
def window_frame_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        ev.filter(F.col("user_id") < 50)
        .select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).cast("long").alias("n_in_frame"),
            F.min("value").over(w).alias("min_v"),
            F.max("value").over(w).alias("max_v"),
            F.first("value").over(w).alias("first_v"),
            F.last("value").over(w).alias("last_v"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "pivot_status_priority",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS urgent,
       CAST(COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS high,
       CAST(COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS medium,
       CAST(COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS notspec,
       CAST(COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS low
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    category="pivot",
    description="groupBy().pivot() with an explicit value list (explicit "
    "values skip the extra distinct-scan Spark otherwise runs).",
)
def pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .agg(F.count(F.lit(1)).cast("long"))
    )
    renames = {
        "1-URGENT": "urgent",
        "2-HIGH": "high",
        "3-MEDIUM": "medium",
        "4-NOT SPECIFIED": "notspec",
        "5-LOW": "low",
    }
    for old, new in renames.items():
        piv = piv.withColumnRenamed(old, new)
    return piv.select(
        "o_orderstatus",
        *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c) for c in renames.values()],
    ).orderBy("o_orderstatus")


@register(
    "unpivot_part_metrics",
    oracle="""
SELECT p_partkey, name AS metric, value AS val
FROM (
  UNPIVOT (SELECT p_partkey, CAST(p_size AS DOUBLE) AS size, p_retailprice AS retailprice FROM part)
  ON size, retailprice INTO NAME name VALUE value
)
WHERE p_partkey < 500
ORDER BY p_partkey, metric
""",
    category="pivot",
    description="Wide-to-long melt (DataFrame.unpivot) — narrow relation "
    "out, no shuffle (map-side transform).",
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_partkey") < 500)
        .select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").alias("retailprice"),
        )
        .unpivot(["p_partkey"], ["size", "retailprice"], "metric", "val")
        .orderBy("p_partkey", "metric")
    )


@register(
    "subquery_correlated",
    oracle="""
SELECT c.c_custkey, c.c_acctbal
FROM customer c
WHERE c.c_acctbal > (
  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(27,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
)
ORDER BY c.c_custkey
""",
    category="subquery",
    description="Correlated scalar subquery, decorrelated to a broadcast "
    "join against the per-nation aggregate (what Catalyst/any optimizer "
    "does; 25 nations → broadcast, no row-at-a-time re-execution).",
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    nation_avg = c.groupBy("c_nationkey").agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("nation_avg")
    )
    return (
        c.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    )


@register(
    "scan_csv_json_roundtrip",
    oracle="""
SELECT fmt, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
FROM (
  SELECT 'csv' AS fmt, o_orderstatus, o_orderkey FROM orders
  UNION ALL
  SELECT 'json' AS fmt, o_orderstatus, o_orderkey FROM orders
)
GROUP BY fmt, o_orderstatus
ORDER BY fmt, o_orderstatus
""",
    category="scan",
    description="CSV and JSON scans (SURVEY §2.B file-format row): parquet "
    "rewritten as csv+json, read back with explicit schemas, aggregated; "
    "columns restricted to losslessly-serializable types.",
)
def scan_csv_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    base = tempfile.mkdtemp(prefix="scan_rt_")
    csv_dir, json_dir = os.path.join(base, "csv"), os.path.join(base, "json")
    o.write.mode("overwrite").option("header", True).csv(csv_dir)
    o.write.mode("overwrite").json(json_dir)
    schema = "o_orderkey BIGINT, o_orderstatus STRING"
    frm_csv = spark.read.schema(schema).option("header", True).csv(csv_dir)
    frm_json = spark.read.schema(schema).json(json_dir)
    both = frm_csv.withColumn("fmt", F.lit("csv")).unionByName(
        frm_json.withColumn("fmt", F.lit("json"))
    )
    return (
        both.groupBy("fmt", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
        )
        .orderBy("fmt", "o_orderstatus")
    )


@register(
    "scan_binaryfile_ingest",
    # The oracle reconstructs the expected bytes from the nation view (the
    # files' content is derived from it deterministically) — the same
    # no-shared-tmp-path pattern as scan_schema_evolution.
    oracle="""
SELECT n_nationkey,
       CAST(octet_length(encode(repeat(n_name, 3))) AS BIGINT) AS length,
       md5(repeat(n_name, 3)) AS content_md5
FROM nation
WHERE n_nationkey < 10
ORDER BY n_nationkey
""",
    category="scan",
    description="binaryFile source (the multimodal ingest path: images/"
    "audio/video land as opaque binary + file metadata before any decode "
    "UDF runs): write small binary blobs, read them back with "
    "format('binaryFile'), surface (key, byte length, md5 of content). "
    "At 100 TB this scan parallelizes per file and never materializes "
    "blobs driver-side; pathGlobFilter/recursiveFileLookup prune the "
    "listing.",
)
def scan_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    n = load_table(spark, sf_dir, "nation")
    rows = (
        n.filter(F.col("n_nationkey") < 10)
        .select("n_nationkey", "n_name")
        .collect()  # 10 rows: fixture-file synthesis only, not a data path
    )
    base = tempfile.mkdtemp(prefix="scan_bin_")
    for r in rows:
        with open(os.path.join(base, f"{r.n_nationkey:04d}.bin"), "wb") as f:
            f.write((r.n_name * 3).encode("utf-8"))
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(base)
        .select(
            F.regexp_extract(F.col("path"), r"(\d{4})\.bin$", 1)
            .cast("long")
            .alias("n_nationkey"),
            F.col("length"),
            F.md5(F.col("content")).alias("content_md5"),
        )
        .orderBy("n_nationkey")
    )


@register(
    "scan_avro_roundtrip",
    oracle="""
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(MAX(o_orderdate) AS VARCHAR) AS max_date
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    category="scan",
    description="Avro scan via the from-scratch OCF codec (sources/avro.py; "
    "public Avro 1.11 spec — no spark-avro jar in this env): orders is "
    "re-written as deflate-compressed Avro container files executor-side "
    "(one file per partition, mapInPandas, no driver materialization), read "
    "back through binaryFile + distributed block decode, and aggregated. "
    "The oracle reads the same rows from parquet — every value (keys, "
    "cents, timestamps) must survive the format round-trip exactly. At "
    "100 TB the parallelism unit is the container file, same as the JVM "
    "reader; read_avro prefers the native avro format when the jar exists.",
)
def scan_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from go_pq_cdc_kafka_spark.sources.avro import read_avro, write_avro

    # spread before the Python-boundary encoder (guide §4 / round-12, same
    # fix as cdc_avro_value_roundtrip): the single-row-group orders scan
    # plans ONE partition, so the from-spec pure-Python OCF encoder — and,
    # because write_avro emits one container file per partition, the
    # binaryFile decode on the way back — ran on one core. The key is the
    # pk; every column is consumed by the encoder so nothing prunable is
    # lost. No-op at real splits.
    o = spread_small_scan(
        load_table(spark, sf_dir, "orders"), key_cols=("o_orderkey",)
    )
    base = os.path.join(tempfile.mkdtemp(prefix="scan_avro_"), "orders")
    write_avro(o, base, codec="deflate")
    back = read_avro(spark, base)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("sum_cents"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias(
                "max_date"
            ),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "scan_avro_schema_evolution",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(SUM(CASE WHEN o_orderkey % 2 = 0
                     THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                     ELSE -1 END) AS BIGINT) AS sum_cents_or_default
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    category="scan",
    description="Avro schema RESOLUTION under the driver gate: even-key "
    "orders are written as v2 container files (pk, status, cents), "
    "odd-key orders as v1 (pk, status, legacy marker — no cents), into "
    "ONE directory; read_avro(reader_schema=v2') resolves each file "
    "under its own embedded writer schema (v1 rows take the cents "
    "default -1 and drop the legacy field; the marker proves dropped-"
    "field skipping consumed the bytes). The oracle reconstructs the "
    "same aggregate from parquet with a CASE on key parity — defaults, "
    "field skipping, and per-file dispatch are all value-checked. This "
    "is the long-lived-topic-archive read path (files from different "
    "connector versions in one scan).",
)
def scan_avro_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from go_pq_cdc_kafka_spark.sources.avro import read_avro, write_avro

    v2_reader = {
        "type": "record",
        "name": "orders_evo",
        "fields": [
            {"name": "pk", "type": ["null", "long"]},
            {"name": "status", "type": ["null", "string"]},
            # union default must match the FIRST branch (Avro spec), so a
            # non-null default needs the long branch first
            {"name": "cents", "type": ["long", "null"], "default": -1},
        ],
    }
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = os.path.join(tempfile.mkdtemp(prefix="scan_avro_evo_"), "mixed")
    # v1 files: odd keys, legacy column, NO cents (written first).
    # spread AFTER the projection (round 12): the encoder consumes every
    # projected column, the single-row-group scan plans one partition, and
    # write_avro parallelism (and the binaryFile decode parallelism on the
    # way back) is the partition count — same fix as scan_avro_roundtrip.
    write_avro(
        spread_small_scan(
            o.filter(F.col("o_orderkey") % 2 == 1).select(
                F.col("o_orderkey").alias("pk"),
                F.col("o_orderstatus").alias("status"),
                F.lit("old").alias("legacy"),
            ),
            key_cols=("pk",),
        ),
        base,
    )
    # v2 files: even keys, cents present — same directory
    write_avro(
        spread_small_scan(
            o.filter(F.col("o_orderkey") % 2 == 0).select(
                F.col("o_orderkey").alias("pk"),
                F.col("o_orderstatus").alias("status"),
                cents.alias("cents"),
            ),
            key_cols=("pk",),
        ),
        base,
    )
    back = read_avro(spark, base, reader_schema=v2_reader)
    return (
        back.groupBy(F.col("status").alias("o_orderstatus"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("pk").cast("long").alias("sum_key"),
            F.sum("cents").cast("long").alias("sum_cents_or_default"),
        )
        .orderBy("o_orderstatus")
    )


from go_pq_cdc_kafka_spark.functions import udfs as U  # noqa: E402


@register(
    "udaf_grouped_sum_squares",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
            AS BIGINT) AS sum_sq
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    category="udf-surface",
    description="User-defined AGGREGATEs (GROUPED_AGG pandas_udf, Series "
    "-> scalar) in groupBy().agg — the UDAF tier of the UDF surface "
    "(UDTF and scalar/grouped-map pandas tiers are covered by "
    "text_chunk_udtf / functions.udfs). Spark forbids mixing GROUPED_AGG "
    "with non-pandas aggregates in one agg, so the row count is a second "
    "pandas UDAF. Integer sum-of-squares keeps the oracle exact: the SQL "
    "twin is SUM(x*x), so only the UDAF machinery is under test, not "
    "float accumulation order.",
)
def udaf_grouped_sum_squares(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            U.count_udaf(F.col("qty")).cast("long").alias("n"),
            U.sum_squares_udaf(F.col("qty")).cast("long").alias("sum_sq"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "text_chunk_udtf",
    oracle=U.chunk_words_sql(),
    category="udf-surface",
    description="Spark 4 Python UDTF via LATERAL join: document → "
    "20-token chunks (the training-data chunking step); streams through "
    "the task with no intermediate array explode.",
)
def text_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("chunk_words", U.ChunkWordsUDTF)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk, c.n_tokens
        FROM documents d, LATERAL chunk_words(d.text) c
        ORDER BY d.doc_id, c.chunk_idx
        """
    )


# ---------------------------------------------------------------------------
# flagship composites — multi-operator TPC-H-shaped pipelines exercising
# join order, broadcast selection, partial aggregation, and top-k together
# (the shapes a 100 TB analytics user actually runs; each one's plan is the
# scale plan: dims broadcast, one fact-fact shuffle, rank-filtered top-k)
# ---------------------------------------------------------------------------

@register(
    "composite_shipping_priority",
    oracle="""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    category="composite",
    description="TPC-H Q3 shape (shipping priority): segment-filtered "
    "customer joined into orders⋈lineitem (auto-broadcast while it fits, "
    "shuffle at scale - no pinned hint on an SF-scaled dim), top-10. "
    "Filters push to all three scans; only the fact-fact join shuffles.",
)
def composite_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-30 00:00:00").cast("timestamp_ntz")
    )
    return (
        li.join(
            orders.join(
                cust, F.col("c_custkey") == F.col("o_custkey")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "composite_local_supplier_volume",
    oracle="""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = n_nationkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    category="composite",
    description="TPC-H Q5 shape (local supplier volume): five joins — "
    "region/nation broadcast (bounded); customer/supplier join adaptively "
    "(SF-scaled, no pinned hint), one orders⋈lineitem "
    "shuffle — revenue per nation where supplier and customer share it.",
)
def composite_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(cust, F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(dims, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("n_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "composite_returned_items",
    oracle="""
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    category="composite",
    description="TPC-H Q10 shape (returned items): revenue lost to returns "
    "per customer, nation (bounded) decoded via broadcast, customer "
    "joined adaptively, top-20 by revenue.",
)
def composite_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "func_bitwise",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
       CAST(o_orderkey | 4096 AS BIGINT) AS with_flag,
       CAST(xor(o_orderkey, 21845) AS BIGINT) AS xored,
       CAST(o_orderkey << 2 AS BIGINT) AS shifted_l,
       CAST(o_orderkey >> 3 AS BIGINT) AS shifted_r,
       CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
FROM orders
WHERE o_orderkey < 200
ORDER BY o_orderkey
""",
    category="functions",
    description="Bitwise function family: and/or/xor/shifts/popcount — "
    "partition-id packing and bitmap tricks a pipeline engine needs.",
)
def func_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return (
        o.filter(k < 200)
        .select(
            "o_orderkey",
            k.bitwiseAND(F.lit(255)).cast("long").alias("low_byte"),
            k.bitwiseOR(F.lit(4096)).cast("long").alias("with_flag"),
            k.bitwiseXOR(F.lit(21845)).cast("long").alias("xored"),
            F.shiftleft(k, 2).cast("long").alias("shifted_l"),
            F.shiftright(k, 3).cast("long").alias("shifted_r"),
            F.bit_count(k).cast("int").alias("popcount"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "func_conditional",
    oracle="""
SELECT c_custkey,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_folded,
       LEAST(c_acctbal, 5000.0) AS capped_bal,
       GREATEST(c_acctbal, 0.0) AS floored_bal,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END AS bal_band,
       IF(c_nationkey % 2 = 0, 'even', 'odd') AS nation_parity
FROM customer
WHERE c_custkey < 300
ORDER BY c_custkey
""",
    category="functions",
    description="Conditional/null family: coalesce, nullif, least/greatest, "
    "CASE, if — the null-taming layer of every ETL projection.",
)
def func_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return (
        c.filter(F.col("c_custkey") < 300)
        .select(
            "c_custkey",
            F.coalesce(
                F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
            ).alias("segment_folded"),
            F.least(bal, F.lit(5000.0)).alias("capped_bal"),
            F.greatest(bal, F.lit(0.0)).alias("floored_bal"),
            F.when(bal < 0, "debt").when(bal < 5000, "mid").otherwise("high").alias(
                "bal_band"
            ),
            F.when(F.col("c_nationkey") % 2 == 0, "even")
            .otherwise("odd")
            .alias("nation_parity"),
        )
        .orderBy("c_custkey")
    )


@register(
    "func_regexp",
    oracle="""
SELECT c_custkey,
       regexp_extract(c_name, '#(\\d+)', 1) AS cust_num,
       regexp_replace(c_name, '\\d', '', 'g') AS letters_only,
       regexp_matches(c_name, '^Customer#0*1?\\d$') AS tiny_id,
       CAST(length(regexp_replace(c_name, '[^0]', '', 'g')) AS INTEGER) AS zero_count
FROM customer
WHERE c_custkey < 300
ORDER BY c_custkey
""",
    category="functions",
    description="Regexp family: extract/replace/match over an "
    "engine-portable pattern subset (no lookaround, explicit classes).",
)
def func_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    name = F.col("c_name")
    return (
        c.filter(F.col("c_custkey") < 300)
        .select(
            "c_custkey",
            F.regexp_extract(name, r"#(\d+)", 1).alias("cust_num"),
            F.regexp_replace(name, r"\d", "").alias("letters_only"),
            name.rlike(r"^Customer#0*1?\d$").alias("tiny_id"),
            F.length(F.regexp_replace(name, r"[^0]", "")).cast("int").alias(
                "zero_count"
            ),
        )
        .orderBy("c_custkey")
    )


@register(
    "composite_corpus_curation",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, text,
{T.QUALITY_SQL.format(c="text")}
  FROM documents
),
enriched AS (
  SELECT doc_id,
         ROUND(quality_score, 9) AS q,
         {T.lang_id_sql("text")} AS lang_pred,
         {T.BAG_FINGERPRINT_SQL.format(c="text")} AS fp
  FROM scored
),
kept AS (SELECT * FROM enriched WHERE q >= 0.25),
survivors AS (
  SELECT lang_pred, q,
         ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM kept
)
SELECT lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(ROUND(q, 6) AS DECIMAL(27,6))) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_quality
FROM survivors
WHERE rn = 1
GROUP BY lang_pred
ORDER BY lang_pred
""",
    category="composite",
    description="Corpus-curation pipeline: quality-score filter → language "
    "ID → exact dedup (lowest-id survivor) → per-language stats. The "
    "training-data tier's flagship composition — all Column expressions, "
    "one fingerprint shuffle + one language aggregation.",
)
def composite_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    feats = T.quality_features(F.col("text"))
    enriched = d.select(
        "doc_id",
        F.round(feats["quality_score"], 9).alias("q"),
        T.lang_id(F.col("text")).alias("lang_pred"),
        T.bag_fingerprint(F.col("text")).alias("fp"),
    ).filter(F.col("q") >= 0.25)
    w = Window.partitionBy("fp").orderBy("doc_id")
    survivors = (
        enriched.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    )
    cnt = F.count(F.lit(1)).cast("long")
    return (
        survivors.groupBy("lang_pred")
        .agg(
            cnt.alias("n_docs"),
            (
                F.sum(F.round(F.col("q"), 6).cast("decimal(27,6)")).cast("double")
                / cnt.cast("double")
            ).alias("avg_quality"),
        )
        .orderBy("lang_pred")
    )


# ---------------------------------------------------------------------------
# Composite batch 2 — the remaining TPC-H shapes expressible on the reduced
# schema (no partsupp / shipmode / commitdate columns in the fixtures, so
# Q2/Q9/Q11/Q16/Q20 have no home; predicates are adapted where a column is
# missing but the *plan shape* each query exists to exercise is preserved).
# ---------------------------------------------------------------------------

@register(
    "composite_nation_volume_pairs",
    oracle="""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(volume AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    category="composite",
    description="TPC-H Q7 shape (volume shipping): nation self-joined twice "
    "(supplier side, customer side) with a cross-side OR pair predicate. "
    "Both dim chains are pre-filtered to the two nations of interest and "
    "broadcast, so only orders⋈lineitem shuffles; the OR itself can only "
    "apply post-join (it spans both sides) — same as Catalyst plans the SQL.",
)
def composite_nation_volume_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = ("NATION_1", "NATION_2")
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("s_nk"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("s_nk"),
        )
        .filter(F.col("supp_nation").isin(*nations))
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("c_nk"),
                    F.col("n_name").alias("cust_nation"),
                )
            ),
            F.col("c_nationkey") == F.col("c_nk"),
        )
        .filter(F.col("cust_nation").isin(*nations))
        .select("c_custkey", "cust_nation")
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    pair = (
        (F.col("supp_nation") == nations[0]) & (F.col("cust_nation") == nations[1])
    ) | ((F.col("supp_nation") == nations[1]) & (F.col("cust_nation") == nations[0]))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_dsum(F.col("volume")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "composite_priority_line_audit",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
    category="composite",
    description="TPC-H Q12 shape (conditional counts over a fact-fact join; "
    "l_shipmode is absent from the fixture so l_linestatus carries the "
    "grouping role). The CASE folds into the partial aggregate - one "
    "shuffle of pre-combined counts, not of rows.",
)
def composite_priority_line_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "composite_promo_revenue",
    oracle="""
SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))
                 ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)
       AS DOUBLE) AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
""",
    category="composite",
    description="TPC-H Q14 shape (promo revenue ratio): part joined into "
    "a month of lineitem, conditional-sum ratio in one aggregate pass. Both "
    "sums accumulate in decimal so the final double division is the same "
    "bits in either engine.",
)
def composite_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp_ntz"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(27,6)")
    zero = F.lit(0).cast("decimal(27,6)")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast("double")
    total = F.sum(rev).cast("double")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(((F.lit(100.0) * promo) / total).cast("double").alias("promo_revenue_pct"))
    )


@register(
    "composite_large_orders",
    oracle="""
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
    category="composite",
    description="TPC-H Q18 shape (large-volume customers): IN over a "
    "grouped-HAVING subquery becomes a semi-join against the aggregated "
    "lineitem; the re-aggregation reuses the same l_orderkey hash "
    "partitioning, and customer decodes via an adaptive join.",
)
def composite_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,6)")).alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_key"),
                F.col("l_orderkey") == F.col("big_key"), "leftsemi")
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_dsum(F.col("l_quantity")).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "composite_brand_disjunction",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 20)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#2'  AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
""",
    category="composite",
    description="TPC-H Q19 shape (disjunction of conjunctions spanning both "
    "join sides). Catalyst extracts the single-side residues of the OR — "
    "part gets brand∈{…}, lineitem gets l_quantity∈[1,50] — and pushes them "
    "below the broadcast join; the full disjunction applies post-join.",
)
def composite_brand_disjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#4") & sz.between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#19") & sz.between(10, 30) & q.between(10, 35))
        | ((F.col("p_brand") == "Brand#2") & sz.between(20, 50) & q.between(20, 50))
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


_Q11_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  AS DECIMAL(38,0))) AS cents
  FROM lineitem GROUP BY l_suppkey
)
SELECT r.l_suppkey AS s_suppkey, s.s_name,
       CAST(r.cents AS BIGINT) AS revenue_cents
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.cents * 95 > (SELECT SUM(cents) FROM rev)
ORDER BY revenue_cents DESC, s_suppkey
"""


@register(
    "composite_important_suppliers",
    oracle=_Q11_SQL,
    category="composite",
    description="TPC-H Q11-shaped 'important share' query adapted to the "
    "fixture schema: suppliers whose revenue exceeds ~1.05% of GLOBAL "
    "revenue — a grouped aggregate filtered against a scalar subquery "
    "over the same CTE. Cross-engine exactness: per-row cents are BIGINT "
    "but the global total overflows 2^63 at large SF, so sums accumulate "
    "as DECIMAL(38,0) and the threshold compares rev*95 > total "
    "(multiplication, never division — no rounding-mode drift). Catalyst "
    "plans the scalar subquery as a broadcast single-row join; the CTE "
    "aggregates once and feeds both sides. Same SQL both engines.",
)
def composite_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q11_SQL)


_Q21_SQL = """
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  GROUP BY l.l_orderkey, l.l_suppkey
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late lt
JOIN supplier s ON s.s_suppkey = lt.l_suppkey
WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = lt.l_orderkey
          AND l2.l_suppkey <> lt.l_suppkey)
  AND NOT EXISTS (
        SELECT 1 FROM late lt2
        WHERE lt2.l_orderkey = lt.l_orderkey
          AND lt2.l_suppkey <> lt.l_suppkey)
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@register(
    "composite_sole_late_suppliers",
    oracle=_Q21_SQL,
    category="composite",
    description="TPC-H Q21-shaped 'suppliers who kept orders waiting' "
    "adapted to the fixture schema (ship > 60 days after order date "
    "stands in for receipt > commit): EXISTS + NOT EXISTS correlated "
    "subqueries over a shared late-lineitems CTE — Catalyst rewrites "
    "them to one LeftSemi and one LeftAnti join on l_orderkey, exactly "
    "the decorrelated plan a 100 TB run needs (no per-row subquery "
    "execution). Multi-supplier orders where ONLY this supplier shipped "
    "late; top-20 by wait count. Same SQL both engines.",
)
def composite_sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "orders", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q21_SQL)


@register(
    "composite_wealthy_inactive",
    oracle="""
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS total_bal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE)
    FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
    category="composite",
    description="TPC-H Q22 shape (global-sales opportunity): scalar subquery "
    "(mean positive balance) + NOT EXISTS anti-join. The scalar aggregate is "
    "a 1-row broadcast-nested-loop (exactly how Catalyst plans the SQL, no "
    "driver collect); the anti side is pre-filtered to urgent orders before "
    "the shuffle. Every fixture customer has orders, so the original "
    "no-orders-at-all predicate is sharpened to no-urgent-orders.",
)
def composite_wealthy_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_bal")
        )
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(27,6)")).cast("double").alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# Training-data tier batch 2: cluster resolution, deterministic sampling,
# sequence packing, PII redaction.
# ---------------------------------------------------------------------------
from go_pq_cdc_kafka_spark.operators import cluster as CL  # noqa: E402
from go_pq_cdc_kafka_spark.operators import packing as PK  # noqa: E402
from go_pq_cdc_kafka_spark.operators import sampling as SA  # noqa: E402


@register(
    "dedup_cluster_resolve",
    oracle=f"""
WITH RECURSIVE pairs AS (
{DD.ngram_jaccard_pairs_sql(threshold=0.5, max_df=64)}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(id, comp) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id
)
SELECT CAST(id AS BIGINT) AS doc_id, CAST(MIN(comp) AS BIGINT) AS cluster_id
FROM reach GROUP BY id ORDER BY doc_id
""",
    category="dedup",
    description="Duplicate-cluster resolution: near-dup pairs (word-3-gram "
    "Jaccard ≥ 0.5 over the max_df-capped shingle space) resolved to "
    "connected components by iterative min-label propagation — A~B, B~C "
    "collapse into one group even when A~C was never scored. Oracle is the "
    "transitive closure as a recursive CTE. Candidate generation uses the "
    "capped-vocabulary pair operator: the round-6 sf10 sweep caught the "
    "exact variant feeding this query spilling ~70 GB of Theta(Sum df^2) "
    "stop-shingle pairs before failing — at scale the valve is not "
    "optional for a pair-graph consumer.",
)
def dedup_cluster_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _valved_pairs(spark, sf_dir)
    return CL.connected_components(pairs).orderBy("doc_id")


@register(
    "sample_stratified_docs",
    oracle="""
SELECT doc_id, lang, sample_rank FROM (
  SELECT doc_id, lang,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT) AS sample_rank
  FROM documents
) r
WHERE sample_rank <= 20
ORDER BY lang, sample_rank
""",
    category="sampling",
    description="Stratified quota sample: 20 docs per language, selected by "
    "key-hash rank — deterministic under retries, repartitioning, and "
    "corpus appends (unlike DataFrame.sample's per-partition seeding).",
)
def sample_stratified_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        SA.stratified_sample(d, ["lang"], 20, "doc_id")
        .select("doc_id", "lang", "sample_rank")
        .orderBy("lang", "sample_rank")
    )


@register(
    "sample_hash_fraction",
    oracle=f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
FROM events
WHERE {SA.hash_fraction_sample_sql("event_id", 0.1)}
GROUP BY event_type
ORDER BY event_type
""",
    category="sampling",
    description="Deterministic 10% Bernoulli sample by key-hash residue — "
    "map-only, the predicate rides the scan; summarised per event type.",
)
def sample_hash_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        SA.hash_fraction_sample(ev, "event_id", 0.1)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            _dsum(F.col("value")).alias("sum_value"),
        )
        .orderBy("event_type")
    )


@register(
    "pack_token_budget",
    oracle=f"""
WITH t AS (
  SELECT lang, doc_id,
         CAST(length({T.TOKENS_SQL.format(c="text")}) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT lang, doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS prev
  FROM t
)
SELECT lang, CAST(prev // 2048 AS BIGINT) AS pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM c
GROUP BY lang, pack_id
ORDER BY lang, pack_id
""",
    category="packing",
    description="Sequence packing: contiguous greedy fill of 2048-token "
    "bins per language (pack_id = prior running total div budget — one "
    "window pass, exact BIGINT arithmetic, no iteration).",
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    t = d.select(
        "lang", "doc_id", T.token_count(F.col("text")).alias("n_tokens")
    )
    return (
        PK.pack_greedy(t, "n_tokens", 2048, ["lang"], "doc_id")
        .groupBy("lang", "pack_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
        )
        .orderBy("lang", "pack_id")
    )


@register(
    "text_pii_redact",
    oracle=f"""
WITH b AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or call +1-555-'
              || lpad(CAST(doc_id % 7919 AS VARCHAR), 4, '0') AS body
  FROM documents WHERE doc_id < 40
)
SELECT doc_id,
       {T.pii_count_sql("body", T.EMAIL_RE)} AS n_emails,
       {T.pii_count_sql("body", T.PHONE_RE)} AS n_phones,
       {T.redact_pii_sql("body")} AS redacted
FROM b ORDER BY doc_id
""",
    category="text",
    description="PII redaction: emails and international phone numbers "
    "replaced with typed tags (patterns in the RE2 ∩ Java-regex common "
    "dialect). The fixture corpus carries no PII, so a deterministic "
    "email+phone is injected per doc and then scrubbed — the oracle checks "
    "the exact redacted strings.",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    body = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call +1-555-"),
        F.lpad((F.col("doc_id") % 7919).cast("string"), 4, "0"),
    )
    return (
        d.select(
            "doc_id",
            T.email_count(body).alias("n_emails"),
            T.phone_count(body).alias("n_phones"),
            T.redact_pii(body).alias("redacted"),
        )
        .orderBy("doc_id")
    )


# ===========================================================================
# Time-series (reference: TimescaleDB hypertable users — connector.go:204-209
# routes chunk events to the parent hypertable; these queries supply the
# analytics half of that world: time_bucket, gapfill+locf, continuous-agg
# style hierarchical rollup). operators/timeseries.py
# ===========================================================================

from go_pq_cdc_kafka_spark.operators import timeseries as TS  # noqa: E402


@register(
    "ts_rollup_hierarchical",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY bucket, event_type
ORDER BY bucket, event_type
""",
    category="timeseries",
    description="Continuous-aggregate-style hierarchical rollup: 15-min "
    "fine partials (algebraic only: n/decimal-sum/min/max) re-aggregated "
    "exactly to 1-hour resolution. The oracle computes the hourly answer "
    "directly from raw events — equality proves the partial tier is "
    "lossless, which is what makes it safe to materialize at 100 TB and "
    "derive every coarser resolution without re-scanning raw data.",
)
def ts_rollup_hierarchical(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    fine = TS.rollup_fine(ev, "ts", 900, keys=("event_type",), value_col="value")
    return TS.rollup_coarse(fine, 3600, keys=("event_type",)).orderBy(
        "bucket", "event_type"
    )


@register(
    "ts_gapfill_locf",
    oracle="""
WITH b AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket,
         CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value,
         COUNT(*) AS n
  FROM events WHERE value > 300 GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM b GROUP BY 1
),
grid AS (
  SELECT event_type, UNNEST(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket
  FROM bounds
)
SELECT g.event_type, g.bucket,
       LAST_VALUE(b.sum_value IGNORE NULLS) OVER w AS sum_value,
       LAST_VALUE(b.n IGNORE NULLS) OVER w AS n
FROM grid g LEFT JOIN b USING (event_type, bucket)
WINDOW w AS (PARTITION BY g.event_type ORDER BY g.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY event_type, bucket
""",
    category="timeseries",
    description="time_bucket_gapfill + locf: hourly buckets of a sparse "
    "series (value > 300 keeps ~2 obs/100 h per key) densified with "
    "sequence()+explode over per-key bounds, missing buckets forward-"
    "filled by an ignorenulls last() window. Grid size is span x keys, "
    "independent of raw row count.",
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 300)
    bucketed = ev.groupBy(
        "event_type", TS.bucket(F.col("ts"), 3600).alias("bucket")
    ).agg(_dsum(F.col("value")).alias("sum_value"), F.count(F.lit(1)).alias("n"))
    return TS.gapfill_locf(
        bucketed, "bucket", 3600, keys=("event_type",), value_cols=("sum_value", "n")
    ).orderBy("event_type", "bucket")


@register(
    "ts_gapfill_interpolate",
    oracle="""
WITH b AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE value > 300 GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM b GROUP BY 1
),
grid AS (
  SELECT event_type, UNNEST(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket
  FROM bounds
),
j AS (
  SELECT g.event_type, g.bucket, CAST(epoch(g.bucket) AS BIGINT) AS t,
         b.cents,
         CASE WHEN b.cents IS NOT NULL
              THEN CAST(epoch(g.bucket) AS BIGINT) END AS obs_t
  FROM grid g LEFT JOIN b USING (event_type, bucket)
),
w AS (
  SELECT event_type, bucket, t, cents,
         LAST_VALUE(cents IGNORE NULLS) OVER back AS pv,
         LAST_VALUE(obs_t IGNORE NULLS) OVER back AS pt,
         FIRST_VALUE(cents IGNORE NULLS) OVER fwd AS nv,
         FIRST_VALUE(obs_t IGNORE NULLS) OVER fwd AS nt
  FROM j
  WINDOW back AS (PARTITION BY event_type ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         fwd AS (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, bucket,
       CAST(CASE WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt <> pt
                 THEN pv + ((nv - pv) * (t - pt)) // (nt - pt)
                 ELSE COALESCE(pv, nv) END AS BIGINT) AS cents
FROM w
ORDER BY event_type, bucket
""",
    category="timeseries",
    description="time_bucket_gapfill + INTERPOLATE (Timescale's "
    "interpolate()): the same sparse hourly series as ts_gapfill_locf, "
    "but missing buckets fill by LINEAR interpolation between the "
    "bracketing observations — computed entirely in integer cents with "
    "truncating division (Spark div == DuckDB // on these operands), so "
    "the filled values match bit-for-bit where a float lerp would drift "
    "with evaluation order. Outside the observed span the nearest "
    "observation fills. Two windows per key, same shuffle count as LOCF "
    "(operators/timeseries.gapfill_interpolate).",
)
def ts_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 300)
    bucketed = ev.groupBy(
        "event_type", TS.bucket(F.col("ts"), 3600).alias("bucket")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    return (
        TS.gapfill_interpolate(
            bucketed, "bucket", 3600, keys=("event_type",), value_col="cents"
        )
        .select("event_type", "bucket", F.col("cents").cast("long"))
        .orderBy("event_type", "bucket")
    )


# ===========================================================================
# Corpus search + decontamination + repetition (training-data tier)
# ===========================================================================

from go_pq_cdc_kafka_spark.operators import dedup as DD  # noqa: E402
from go_pq_cdc_kafka_spark.operators import search as SEARCH  # noqa: E402


@register(
    "text_decontaminate",
    oracle=DD.ngram_contamination_sql(n=5, eval_mod=17),
    category="dedup",
    description="Benchmark decontamination: training docs sharing any "
    "word 5-gram with the held-out eval slice (doc_id % 17 == 0) are "
    "flagged with overlap counts (GPT-3/PaLM-style n-gram collision "
    "pass). Eval shingle index broadcasts; corpus side is map-only "
    "explode + one groupBy(doc_id) — O(corpus shingles), never "
    "corpus x eval.",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    corpus = d.filter(F.col("doc_id") % 17 != 0)
    eval_docs = d.filter(F.col("doc_id") % 17 == 0)
    return DD.ngram_contamination(corpus, eval_docs, n=5).orderBy("doc_id")


@register(
    "text_repetition_score",
    oracle=f"""
WITH grams AS (
  SELECT doc_id, UNNEST({T.ngrams_all_sql('text', 2)}) AS g FROM documents
),
counts AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS total_bigrams,
       CAST(SUM(c) - COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
         AS dup_bigram_frac,
       CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_bigram_frac
FROM counts GROUP BY doc_id ORDER BY doc_id
""",
    category="text",
    description="Gopher-style repetition quality rules: per-doc duplicate-"
    "bigram fraction and top-bigram mass over ALL (non-distinct) word "
    "bigrams. Integer-ratio doubles only (exact in both engines). One "
    "explode + two groupBys keyed by doc_id — scales with token count.",
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    # tokens bound in their own projection first — see shingles_from_tokens
    grams = d.select("doc_id", T.tokens(F.col("text")).alias("_toks")).select(
        "doc_id", F.explode(T.ngrams_all_from_tokens(F.col("_toks"), 2)).alias("g")
    )
    counts = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    tot = F.sum("c")
    return (
        counts.groupBy("doc_id")
        .agg(
            tot.cast("bigint").alias("total_bigrams"),
            (
                (tot - F.count(F.lit(1))).cast("double")
                / tot.cast("double")
            ).alias("dup_bigram_frac"),
            (F.max("c").cast("double") / tot.cast("double")).alias(
                "top_bigram_frac"
            ),
        )
        .orderBy("doc_id")
    )


_BM25_TERMS = ("vector", "spark", "merge", "customer")


@register(
    "search_bm25_topk",
    oracle=SEARCH.bm25_topk_sql(_BM25_TERMS, k=15),
    category="search",
    description="Okapi BM25 top-15 lexical search (k1=1.2, b=0.75; "
    "rational idf, fixed-point int64 scores — see operators/search.py "
    "for the exactness argument). One corpus-sized shuffle for tf; df "
    "and corpus totals broadcast back; ties broken by doc_id.",
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NO spread here (round-12 A/B: 1.2-2.0 s spread vs 0.86-1.1 s
    # unspread): the posting-list groupBys parallelize the scoring and
    # the added full-payload exchange costs more than the serial tokenize
    d = load_table(spark, sf_dir, "documents")
    return SEARCH.bm25_topk(d, _BM25_TERMS, k=15).orderBy("rk")


_PHRASE = ("slow", "hash", "batch")


@register(
    "search_phrase_positions",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {T.TOKENS_SQL.format(c="text")} AS ts FROM documents
),
pos AS (
  SELECT doc_id,
         unnest([{{'t': ts[i+1], 'p': i}}
                 for i in generate_series(0, len(ts) - 1)]) AS u
  FROM toks
),
m AS (
  SELECT t0.doc_id, t0.p
  FROM (SELECT doc_id, u.p AS p FROM pos WHERE u.t = '{_PHRASE[0]}') t0
  JOIN (SELECT doc_id, u.p - 1 AS p FROM pos WHERE u.t = '{_PHRASE[1]}') t1
    USING (doc_id, p)
  JOIN (SELECT doc_id, u.p - 2 AS p FROM pos WHERE u.t = '{_PHRASE[2]}') t2
    USING (doc_id, p)
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
       CAST(MIN(p) AS INT) AS first_pos
FROM m GROUP BY doc_id ORDER BY doc_id
""",
    category="search",
    description="Exact PHRASE search ('slow hash batch') via a positional "
    "inverted index (operators/search.positional_index + phrase_match): "
    "the index is filtered to the phrase's terms BEFORE any join, so the "
    "positional-intersection joins touch O(postings of those terms), not "
    "O(corpus positions); term i+1 joins on (doc_id, pos-i). Shares the "
    "deterministic tokenizer with BM25/dedup (property-tested against "
    "the DuckDB twin). At 100 TB the index is precomputed and bucketed "
    "by term; the per-query plan is identical.",
)
def search_phrase_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    return SEARCH.phrase_match(d, _PHRASE).orderBy("doc_id")


@register(
    "graph_bfs_hops",
    oracle=f"""
WITH RECURSIVE pairs AS (
{DD.ngram_jaccard_pairs_sql(threshold=0.5, max_df=64)}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
seeds AS (SELECT DISTINCT src AS doc_id FROM edges WHERE src % 10 = 0),
bfs(doc_id, hops) AS (
  SELECT doc_id, 0 FROM seeds
  UNION ALL
  SELECT e.dst, b.hops + 1
  FROM bfs b JOIN edges e ON e.src = b.doc_id
  WHERE b.hops < 3
)
SELECT doc_id, CAST(MIN(hops) AS INT) AS min_hops
FROM bfs GROUP BY doc_id ORDER BY doc_id
""",
    category="graph",
    description="Depth-bounded multi-source BFS (<=3 hops) over the "
    "near-dup pair graph from seed docs (doc_id % 10 == 0), as an "
    "iterative node-frontier loop (operators/cluster.bfs_min_hops): each "
    "level is one frontier⋈edges equi-join collapsed to DISTINCT nodes and "
    "anti-joined against visited, so intermediate state is node-bounded — "
    "a k-clique costs O(k) rows per level, where the path-enumerating "
    "recursive-CTE formulation (kept as the DuckDB oracle) pays O(k^hops). "
    "Levels localCheckpoint to stop lineage growth.",
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the shared index is already checkpointed, so the per-level BFS
    # references read pinned blocks instead of re-running candidate+verify
    pairs = _valved_pairs(spark, sf_dir)
    seeds = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .filter(F.col("doc_id") % 10 == 0)
        .distinct()
    )
    out = (
        CL.bfs_min_hops(pairs, seeds, max_hops=3)
        .select("doc_id", F.col("min_hops").cast("int").alias("min_hops"))
        .orderBy("doc_id")
    )
    return out


_COPURCHASE_EDGES_SQL = """
  SELECT prev AS src, l_suppkey AS dst FROM (
    SELECT l_suppkey,
           LAG(l_suppkey) OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_suppkey) AS prev
    FROM lineitem) t
  WHERE prev IS NOT NULL AND prev <> l_suppkey
"""


def _copurchase_edges_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier co-purchase multigraph: consecutive-linenumber supplier
    pairs within each order (one LAG window pass). The sort key includes
    l_suppkey because the fixture carries duplicate (orderkey, linenumber)
    pairs that would otherwise make the window nondeterministic."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey"
    )
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_suppkey")
    return (
        li.withColumn("prev", F.lag("l_suppkey").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("prev") != F.col("l_suppkey")))
        .select(F.col("prev").alias("src"), F.col("l_suppkey").alias("dst"))
    )


@register(
    "graph_triangle_suppliers",
    oracle=f"""
WITH e0 AS ({_COPURCHASE_EDGES_SQL}),
canon AS (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
  FROM e0 WHERE src <> dst
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT lo AS node FROM canon UNION ALL SELECT hi FROM canon
  ) GROUP BY node
),
tri AS (
  SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
  FROM canon e1
  JOIN canon e2 ON e2.lo = e1.hi
  JOIN canon e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
),
per_node AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY node
)
SELECT d.node, d.deg,
       CAST(COALESCE(p.triangles, 0) AS BIGINT) AS triangles
FROM deg d LEFT JOIN per_node p ON p.node = d.node
ORDER BY d.node
""",
    category="graph",
    description="Per-node triangle counts over the (deduplicated, "
    "undirected) supplier co-purchase graph via the degree-ordering "
    "wedge join (Suri & Vassilvitskii WWW'11): edges orient toward the "
    "(deg,id)-larger endpoint, so wedge work per node is bounded by "
    "sqrt(2|E|) and a popular hub cannot blow up the join — the 100-TB "
    "posture the naive x<y<z SQL enumeration (kept as the DuckDB "
    "oracle) lacks. Three uniform-key shuffles; each triangle counted "
    "exactly once at its unique (deg,id)-minimal apex.",
)
def graph_triangle_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT triangle count — Θ(Σ deg²) wedges by nature. At sf10 the
    co-purchase graph's wedge set (~2e9 rows) out-spills this sandbox's
    disk, so the sf10 sweep records this variant as an explicit skip
    (SPARK_GRAFT_SWEEP_SKIP) and the DOULION edge-sampled twin
    (graph_triangle_sampled, p=1/10, unbiased 1/p³ estimator) is the
    documented scale path — the same exact-vs-valved split as
    dedup_ngram_jaccard vs its max_df variant."""
    # |edges| ≤ |lineitem| by construction (one edge per consecutive line
    # pair), so the footer-only lineitem count bounds the adjacency
    # broadcast: ≤3M rows → ≤~24 MB of out-adjacency, and the dense-graph
    # intersect path drops the Θ(Σ d_out²)-row wedge shuffle (22.3 → 4.0 s
    # at sf0.1, bit-identical). Past the bound, the broadcast would be
    # corpus-scaled — keep the shuffle wedge join (which sf10 skips in
    # favor of the DOULION twin anyway).
    n = load_table(spark, sf_dir, "lineitem").count()
    edges = _copurchase_edges_spark(spark, sf_dir)
    return CL.triangle_count(
        edges, strategy="adjacency" if n <= 3_000_000 else "wedge"
    ).orderBy("node")


@register(
    "graph_triangle_sampled",
    oracle=f"""
WITH e0 AS ({_COPURCHASE_EDGES_SQL}),
canon AS (
  SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
  FROM e0 WHERE src <> dst
),
samp AS (
  SELECT lo, hi FROM canon
  WHERE (CAST(lo AS BIGINT) * 1000003 + hi) % 10 = 0
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT lo AS node FROM samp UNION ALL SELECT hi FROM samp
  ) GROUP BY node
),
tri AS (
  SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
  FROM samp e1
  JOIN samp e2 ON e2.lo = e1.hi
  JOIN samp e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
),
per_node AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY node
)
SELECT d.node, d.deg,
       CAST(COALESCE(p.triangles, 0) AS BIGINT) AS triangles
FROM deg d LEFT JOIN per_node p ON p.node = d.node
ORDER BY d.node
""",
    category="graph",
    description="Triangle counting on a DOULION-style uniform edge sample "
    "(Tsourakakis et al., KDD'09): canonical edges are kept when a "
    "deterministic LCG mix of the endpoint pair lands in 1/10 of the "
    "residue space, then the degree-ordered wedge join runs exactly on "
    "the sampled subgraph (global triangle estimate = total/p^3 with "
    "p=0.1). This is the SCALE PATH twin of graph_triangle_suppliers: "
    "the dense co-purchase fixture graph at sf10 has ~45M edges and "
    "average degree ~900, so exact enumeration is Θ(Σd_out²) ≈ 2e10 "
    "wedge rows — a many-node-cluster workload by construction; p=0.1 "
    "cuts the wedge mass ~100× (sampling is the standard practice at "
    "that density). The hash is an arithmetic mix both engines compute "
    "identically, so the DuckDB oracle reproduces the exact same "
    "subgraph and the gate stays exact-match.",
)
def graph_triangle_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _copurchase_edges_spark(spark, sf_dir)
    lo = F.least(F.col("src"), F.col("dst")).cast("long")
    hi = F.greatest(F.col("src"), F.col("dst")).cast("long")
    sampled = edges.filter((lo * F.lit(1000003) + hi) % 10 == 0)
    return CL.triangle_count(sampled).orderBy("node")


def _pagerank_oracle_sql(iterations: int = 3, damping: int = 85,
                         scale: int = 1_000_000_000_000) -> str:
    """Unrolled-CTE DuckDB twin of operators/cluster.pagerank_fixed —
    generated for the same iteration count so the two stay in lockstep."""
    its = []
    for k in range(1, iterations + 1):
        its.append(f"""
it{k} AS (
  SELECT n.node,
         CAST((({100 - damping} * p.s0) // 100)
              + (({damping} * COALESCE(c.contrib, 0)) // 100) AS BIGINT)
           AS score
  FROM nodes n CROSS JOIN params p
  LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM(s.score // o.outdeg) AS BIGINT) AS contrib
    FROM e JOIN it{k-1} s ON s.node = e.src
           JOIN outdeg o ON o.node = e.src
    GROUP BY e.dst
  ) c ON c.node = n.node
)""")
    return f"""
WITH e AS ({_COPURCHASE_EDGES_SQL}),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
outdeg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
           FROM e GROUP BY src),
params AS (SELECT CAST({scale} // COUNT(*) AS BIGINT) AS s0 FROM nodes),
it0 AS (SELECT node, p.s0 AS score FROM nodes CROSS JOIN params p),
{",".join(its)}
SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, node) AS INT) AS rk,
       CAST(node AS BIGINT) AS s_suppkey, s.s_name,
       CAST(score AS BIGINT) AS score
FROM it{iterations} JOIN supplier s ON s.s_suppkey = node
ORDER BY score DESC, node
LIMIT 20
"""


@register(
    "graph_pagerank_suppliers",
    oracle=_pagerank_oracle_sql(),
    category="graph",
    description="Fixed-point integer PageRank (3 iterations, d=0.85, 1e12 "
    "probability micro-units) over the supplier co-purchase multigraph — "
    "edges are consecutive-linenumber supplier pairs within each order "
    "(one LAG window pass). All arithmetic is BIGINT +, integer div, SUM: "
    "associative and order-independent, so the DuckDB unrolled-CTE twin "
    "matches bit-for-bit where a float PageRank would drift per shuffle "
    "order. Each iteration is one scores⋈edges join + one groupBy(dst) "
    "with localCheckpoint against lineage growth (operators/cluster."
    "pagerank_fixed); edges/degrees persist once. Top 20 by score with "
    "supplier names, deterministic node-id tiebreak.",
)
def graph_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    edges = _copurchase_edges_spark(spark, sf_dir)
    scores = CL.pagerank_fixed(edges, iterations=3)
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    # Unpartitioned window is deliberate and scale-safe: it runs strictly
    # AFTER .limit(20), so the single partition the WindowExec warning
    # complains about holds 20 rows at any data scale (TakeOrderedAndProject
    # does the distributed top-k; the window only numbers the survivors).
    wr = Window.orderBy(F.desc("score"), F.asc("node"))
    top = (
        scores.orderBy(F.desc("score"), F.asc("node"))
        .limit(20)
        .withColumn("rk", F.row_number().over(wr).cast("int"))
    )
    return (
        F.broadcast(top).join(sup, top["node"] == sup["s_suppkey"])
        .select(
            "rk",
            F.col("s_suppkey").cast("long"),
            "s_name",
            F.col("score").cast("long"),
        )
        .orderBy("rk")
    )


_MIX_WEIGHTS = {"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.25, "zh": 0.25}


@register(
    "sample_domain_mixture",
    oracle=f"""
SELECT doc_id, lang, source
FROM documents
WHERE {SA.domain_mixture_sample_sql('lang', _MIX_WEIGHTS, 'doc_id')}
ORDER BY doc_id
""",
    category="sampling",
    description="Mixture reweighting: per-language keep rates (en 1.0, "
    "de/fr 0.5, es/zh 0.25) applied as one deterministic hash-Bernoulli "
    "pass — the up/down-sampling step that turns a raw crawl into a "
    "target pretraining recipe. Map-only: the CASE threshold and hash "
    "predicate sit on the scan; stable under appends and retries.",
)
def sample_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        SA.domain_mixture_sample(d, "lang", _MIX_WEIGHTS, "doc_id")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


@register(
    "text_rarity_score",
    oracle=SEARCH.rarity_scores_sql(),
    category="text",
    description="Word-rarity curation signals: mean corpus document-"
    "frequency of each doc's tokens and hapax-token count (the OCR-"
    "garbage tell). Integer-ratio doubles only; df joins back on term, "
    "skew bounded by vocabulary size.",
)
def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    return SEARCH.rarity_scores(d).orderBy("doc_id")


@register(
    "multimodal_frame_sample",
    # the oracle windows CHARACTERS while the engine windows BYTES; they
    # coincide because the fixture corpus is pure ASCII (asserted in
    # tests/test_training_ops.py) — md5(varchar) hashes its utf-8 bytes
    oracle="""
WITH p AS (
  SELECT doc_id, text AS payload, octet_length(CAST(text AS BLOB)) AS n
  FROM documents
)
SELECT doc_id, CAST(i AS INT) AS frame_no,
       md5(substring(payload, CAST(i AS INT) * 64 + 1, 64)) AS frame_md5
FROM p, UNNEST(generate_series(0, least(3, greatest(1, n // 64) - 1))) t(i)
ORDER BY doc_id, frame_no
""",
    category="multimodal",
    description="Video frame-sampling plumbing (1->N rows per binary "
    "payload) through Arrow-batched mapInPandas: deterministic 64-byte "
    "windows stand in for keyframes (real decoder is a documented stub; "
    "batch shape, schema, and fan-out are the real contract). No shuffle "
    "— the explode happens inside the Arrow batch.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return MM.sample_frames(payloads, every_n_bytes=64, max_frames=4).orderBy(
        "doc_id", "frame_no"
    )


# ===========================================================================
# Round-2 continuation: quantized ANN, SCD2 history, semi-join reduction,
# substring-level dedup inventory, time-series outlier detection
# ===========================================================================

@register(
    "sim_quantized_topk",
    oracle=SIM.quantized_topk_sql(k=5, query_pred="vec_id < 5"),
    category="similarity",
    description="Top-5 neighbors by int8-quantized dot product: symmetric "
    "per-vector scalar quantization (floor(x*127/max|x|)) cuts scanned "
    "bytes 4x at 100 TB and scores with exact integer MACs — "
    "cross-engine-exact with no decimal accumulator.",
)
def sim_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread_small_scan(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < 5).limit(5)  # limit == no-op bound on the unique-key filter (plan-gate proof)
    return SIM.quantized_topk(q, e, k=5).orderBy("query_id", "rk")


@register(
    "cdc_scd2_history",
    oracle=f"""
WITH changelog AS ({_ORDERS_CHANGELOG_SQL})
SELECT pk, op, price,
       lsn AS valid_from_lsn,
       LEAD(lsn) OVER (PARTITION BY pk ORDER BY lsn) AS valid_to_lsn,
       (LEAD(lsn) OVER (PARTITION BY pk ORDER BY lsn) IS NULL
        AND op <> 'DELETE') AS is_current
FROM changelog
ORDER BY pk, valid_from_lsn
""",
    category="cdc",
    description="SCD Type-2 history materialization from a change stream: "
    "each version carries [valid_from_lsn, valid_to_lsn) via LEAD over "
    "(pk, lsn); open-ended non-DELETE versions are current. One window "
    "shuffle on pk — the same partitioning LWW uses, so at scale the two "
    "materializations share one exchange.",
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = _orders_changelog_spark(spark, sf_dir)
    w = Window.partitionBy("pk").orderBy("lsn")
    nxt = F.lead("lsn").over(w)
    return (
        log.select(
            "pk",
            "op",
            "price",
            F.col("lsn").alias("valid_from_lsn"),
            nxt.alias("valid_to_lsn"),
            (nxt.isNull() & (F.col("op") != "DELETE")).alias("is_current"),
        )
        .orderBy("pk", "valid_from_lsn")
    )


@register(
    "cdc_incremental_agg",
    oracle=f"""
WITH changelog AS ({_ORDERS_CHANGELOG_SQL}),
ranked AS (
  SELECT pk, op, price,
         ROW_NUMBER() OVER (PARTITION BY pk ORDER BY lsn DESC) AS rn
  FROM changelog
),
final_state AS (
  SELECT pk, price FROM ranked WHERE rn = 1 AND op <> 'DELETE'
)
SELECT pk % 50 AS shard,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(price AS DECIMAL(27,6))) AS DOUBLE) AS total_price
FROM final_state
GROUP BY shard
ORDER BY shard
""",
    category="cdc",
    description="Incremental materialized-view maintenance: a per-shard "
    "COUNT/SUM aggregate is maintained from the change stream by signed "
    "DELTAS — insert/snapshot contributes (+1, +price), update contributes "
    "(0, new − old), delete contributes (−1, −old) — and never recomputed "
    "from base data (the standard retraction/insertion IVM algebra, as in "
    "Flink's changelog aggregation and Materialize). Pre-images come from "
    "LAG over (pk, lsn) here; in the live path they arrive on the event "
    "itself under REPLICA IDENTITY FULL (reference S4, "
    "reference config README replica-identity docs). The ORACLE recomputes "
    "the aggregate from the final LWW state — value equality IS the IVM "
    "correctness contract (deltas reproduce the recompute exactly), which "
    "holds bit-for-bit because all delta arithmetic runs in decimal(27,6) "
    "where a + (b − a) == b (doubles would break this). Scale shape: one "
    "window shuffle on pk (shared with LWW/SCD2's partitioning) + one "
    "map-side delta projection + one shard groupBy — the aggregate-update "
    "cost is O(Δ), independent of the accumulated view size, which is the "
    "whole point of IVM at 100 TB.",
)
def cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = _orders_changelog_spark(spark, sf_dir)
    w = Window.partitionBy("pk").orderBy("lsn")
    dec = lambda c: c.cast("decimal(27,6)")  # noqa: E731
    pre = F.lag(dec(F.col("price"))).over(w)
    cnt_delta = (
        F.when(F.col("op") == "DELETE", F.lit(-1))
        .when(F.col("op") == "UPDATE", F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
    )
    zero = F.lit(0).cast("decimal(27,6)")
    sum_delta = (
        F.when(F.col("op") == "DELETE", -F.coalesce(pre, zero))
        .when(F.col("op") == "UPDATE", dec(F.col("price")) - F.coalesce(pre, zero))
        .otherwise(dec(F.col("price")))
    )
    return (
        log.select(
            (F.col("pk") % 50).alias("shard"),
            cnt_delta.alias("cnt_delta"),
            sum_delta.alias("sum_delta"),
        )
        .groupBy("shard")
        .agg(
            F.sum("cnt_delta").alias("n_rows"),
            F.sum("sum_delta").cast("double").alias("total_price"),
        )
        .filter(F.col("n_rows") > 0)
        .orderBy("shard")
    )


@register(
    "join_semi_reduced_fact",
    oracle="""
SELECT o.o_orderdate,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
GROUP BY o.o_orderdate
ORDER BY o.o_orderdate
""",
    category="join",
    description="Semi-join reduction: when the dim side is too big to "
    "broadcast but its FILTERED key set is not, broadcast just the keys as "
    "a left-semi prefilter so the fact table is reduced BEFORE the "
    "shuffle join pays for it (the runtime-filter / Bloom-pushdown play, "
    "done explicitly in the plan). The main join is hinted merge to model "
    "the non-broadcastable case; plan-asserted in tests/test_plans.py.",
)
def join_semi_reduced_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
    )
    keys = o.select("o_orderkey")
    reduced = li.join(
        F.broadcast(keys), li["l_orderkey"] == keys["o_orderkey"], "left_semi"
    )
    joined = reduced.join(
        o.hint("merge"), reduced["l_orderkey"] == o["o_orderkey"]
    )
    return (
        joined.groupBy("o_orderdate")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
        .orderBy("o_orderdate")
    )


_TW_W = 8  # tokens per window


@register(
    "dedup_token_windows",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
),
g AS (
  SELECT doc_id,
         unnest([array_to_string(tokens[i:i+{_TW_W - 1}], ' ')
                 for i in generate_series(1, len(tokens) - {_TW_W - 1})]) AS gram
  FROM tok
  WHERE len(tokens) >= {_TW_W}
)
SELECT gram,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_occ,
       MIN(doc_id) AS first_doc
FROM g
GROUP BY gram
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY n_occ DESC, gram
LIMIT 100
""",
    category="dedup",
    description=f"Substring-level (RefinedWeb-style) duplicated-span "
    f"inventory: every {_TW_W}-token sliding window, grouped corpus-wide; "
    f"spans seen in 2+ docs ranked by occurrence. The explode is map-side "
    f"(sequence+slice inside the task, no Python); the only shuffle is the "
    f"gram groupBy, and the final ordering is TakeOrdered (no global sort).",
)
def dedup_token_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    # split bound in its own projection first (no CSE inside transform
    # lambdas — an inline split re-runs per array element, O(tokens²))
    toks = F.col("_toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(_TW_W - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, _TW_W)),
    )
    return (
        d.select("doc_id", F.split(F.col("text"), " ").alias("_toks"))
        .filter(F.size(toks) >= _TW_W)
        .select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occ"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_occ").desc(), "gram")
        .limit(100)
    )


@register(
    "ts_zscore_outliers",
    # All aggregates are EXACT integers (value has <=2 frac digits -> cents
    # as BIGINT; squares of cents fit: (5e4)^2 * 1e7 rows ~ 2.5e16 < 2^63).
    # Every double is then derived from identical integer inputs through an
    # identical expression tree -> bit-identical across engines.
    oracle="""
WITH cents AS (
  SELECT event_type, DATE_TRUNC('day', ts) AS day,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
),
buckets AS (
  SELECT event_type, day,
         COUNT(*) AS bn,
         CAST(SUM(c) AS BIGINT) AS bs,
         CAST(SUM(c * c) AS BIGINT) AS bss
  FROM cents GROUP BY event_type, day
),
typ AS (
  SELECT event_type,
         CAST(CAST(SUM(bn) AS BIGINT) AS DOUBLE) AS n,
         CAST(CAST(SUM(bs) AS BIGINT) AS DOUBLE) AS s,
         CAST(CAST(SUM(bss) AS BIGINT) AS DOUBLE) AS ss
  FROM buckets GROUP BY event_type
)
SELECT b.event_type, b.day,
       CAST(b.bs AS DOUBLE) / CAST(b.bn AS DOUBLE) / 100.0 AS bucket_mean,
       (CAST(b.bs AS DOUBLE) / CAST(b.bn AS DOUBLE) - t.s / t.n) /
         sqrt((t.ss - t.s / t.n * t.s) / (t.n - 1.0) + 1e-9) AS z
FROM buckets b JOIN typ t USING (event_type)
ORDER BY event_type, day
""",
    category="timeseries",
    description="Per-day bucket z-score outlier detection against the "
    "event-type's distribution of daily means. Two partial-aggregable "
    "shuffles (day buckets, then per-type moments) — the type-level stats "
    "are tiny and broadcast back. Exact-integer cents keep the oracle "
    "bit-identical.",
)
def ts_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = ev.select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    buckets = cents.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("bn"),
        F.sum("c").cast("long").alias("bs"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("bss"),
    )
    bmean = F.col("bs").cast("double") / F.col("bn").cast("double")
    typ = buckets.groupBy("event_type").agg(
        F.sum("bn").cast("long").cast("double").alias("n"),
        F.sum("bs").cast("long").cast("double").alias("s"),
        F.sum("bss").cast("long").cast("double").alias("ss"),
    )
    tmean = F.col("s") / F.col("n")
    bvar = (F.col("ss") - tmean * F.col("s")) / (F.col("n") - F.lit(1.0))
    return (
        buckets.join(F.broadcast(typ), "event_type")
        .select(
            "event_type",
            "day",
            (bmean / F.lit(100.0)).alias("bucket_mean"),
            ((bmean - tmean) / F.sqrt(bvar + F.lit(1e-9))).alias("z"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "dedup_block_removal",
    oracle=DD.duplicate_block_removal_sql(width=8, min_docs=2),
    category="dedup",
    description="CCNet-style duplicated-span REMOVAL: documents rewritten "
    "with every corpus-duplicated 8-token block dropped (the mutation step "
    "after dedup_token_windows' inventory). Blocking is map-side Column "
    "exprs; census is one hash-groupBy; removal one anti-join; reassembly "
    "one doc groupBy — no all-pairs stage.",
)
def dedup_block_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    return DD.duplicate_block_removal(d, width=8, min_docs=2).orderBy("doc_id")


@register(
    "scan_orc_roundtrip",
    oracle="""
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(p_partkey) AS BIGINT) AS sum_key
FROM part
GROUP BY p_brand
ORDER BY p_brand
""",
    category="scan",
    description="ORC scan (SURVEY §2.B file-format row): parquet rewritten "
    "as ORC, read back with an explicit schema, aggregated — exercises the "
    "columnar ORC reader path end-to-end.",
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    base = tempfile.mkdtemp(prefix="scan_orc_")
    orc_dir = os.path.join(base, "orc")
    p.write.mode("overwrite").orc(orc_dir)
    frm = spark.read.schema("p_partkey BIGINT, p_brand STRING").orc(orc_dir)
    return (
        frm.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("p_partkey").cast("long").alias("sum_key"),
        )
        .orderBy("p_brand")
    )


@register(
    "window_distribution_funcs",
    oracle="""
SELECT c_custkey, c_mktsegment,
       NTILE(4)       OVER w AS quartile,
       PERCENT_RANK() OVER w AS pr,
       CUME_DIST()    OVER w AS cd,
       NTH_VALUE(c_custkey, 2) OVER (PARTITION BY c_mktsegment
                                     ORDER BY c_acctbal, c_custkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING) AS second_key
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey
""",
    category="window",
    description="Distribution window functions (ntile/percent_rank/"
    "cume_dist/nth_value) with a tie-broken total order so results are "
    "engine-portable; both ratios are exact small-int divisions, so the "
    "doubles are bit-identical across engines.",
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("c_custkey", 2).over(wfull).alias("second_key"),
    ).orderBy("c_custkey")


@register(
    "func_variant",
    oracle="""
SELECT o_orderkey,
       CAST(json_extract(j, '$.key') AS BIGINT) AS key_back,
       CAST(json_extract_string(j, '$.status') AS VARCHAR) AS status_back,
       CAST(json_extract(j, '$.cents') AS BIGINT) AS cents_back
FROM (
  SELECT o_orderkey,
         '{"key":' || o_orderkey || ',"status":"' || o_orderstatus ||
         '","cents":' || CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR) || '}' AS j
  FROM orders
  WHERE o_orderkey % 100 = 0
)
ORDER BY o_orderkey
""",
    category="functions",
    description="Semi-structured VARIANT path (Spark 4): JSON text -> "
    "parse_json to an open VARIANT value -> typed variant_get extraction. "
    "The engine-native encoding scans/filters without re-parsing text per "
    "access; the oracle walks the same JSON with DuckDB's json_extract. "
    "Identical JSON is constructed in both engines from integer-exact parts.",
)
def func_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    j = F.concat(
        F.lit('{"key":'),
        F.col("o_orderkey").cast("string"),
        F.lit(',"status":"'),
        F.col("o_orderstatus"),
        F.lit('","cents":'),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
        F.lit("}"),
    )
    return (
        o.withColumn("v", F.parse_json(j))
        .select(
            "o_orderkey",
            F.expr("variant_get(v, '$.key', 'bigint')").alias("key_back"),
            F.expr("variant_get(v, '$.status', 'string')").alias("status_back"),
            F.expr("variant_get(v, '$.cents', 'bigint')").alias("cents_back"),
        )
        .orderBy("o_orderkey")
    )


from go_pq_cdc_kafka_spark.operators import expectations as EX  # noqa: E402


@register(
    "quality_expectations",
    oracle="""
WITH wide AS (
  SELECT
    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderkey_not_null,
    CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS o_orderkey_unique,
    CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS o_totalprice_positive,
    CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F') THEN 1 ELSE 0 END) AS BIGINT) AS o_orderstatus_in_domain
  FROM orders
),
rules AS (
  SELECT 'o_orderkey_not_null' AS rule, o_orderkey_not_null AS violations FROM wide
  UNION ALL SELECT 'o_orderkey_unique', o_orderkey_unique FROM wide
  UNION ALL SELECT 'o_totalprice_positive', o_totalprice_positive FROM wide
  UNION ALL SELECT 'o_orderstatus_in_domain', o_orderstatus_in_domain FROM wide
  UNION ALL
  SELECT 'o_custkey_fk', CAST(COUNT(*) AS BIGINT)
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL
)
SELECT rule, violations FROM rules ORDER BY rule
""",
    category="quality",
    description="Declarative data-quality expectations (Deequ/dbt-test "
    "style): N row-local rules + exact uniqueness compile to ONE "
    "aggregation pass; the FK rule adds one anti-join against distinct "
    "parent keys. The in_domain rule is deliberately violated ('P' status "
    "rows exist) so the check surface is provably live.",
)
def quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rules = EX.check(
        o,
        [
            EX.not_null("o_orderkey"),
            EX.unique("o_orderkey"),
            EX.positive("o_totalprice"),
            EX.in_domain("o_orderstatus", ["O", "F"]),
        ],
    )
    fk = EX.foreign_key(o, "o_custkey", c, "c_custkey")
    return rules.unionByName(fk).orderBy("rule")


from go_pq_cdc_kafka_spark.operators import sketches as SKCH  # noqa: E402


@register(
    "sketch_hll_rollup",
    # DataSketches HLL bytes are engine-specific, so the hashed output is
    # the EXACT per-type distinct count plus a boolean asserting the
    # union-rollup estimate lands within 5% of it (lg_k=12 is ~1.6%
    # typical) — the oracle pins TRUE, turning the accuracy-of-the-merge
    # contract into an oracle-checkable column instead of a rows-only
    # check. Merge identity is additionally pinned in
    # tests/test_sketches.py.
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS within_5pct
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    category="aggregation",
    description="Mergeable HLL sketches: one sketch per (day, event_type) "
    "cell, then per-type distinct-user rollups answered by UNIONING the "
    "cell sketches — the materialize-once/roll-up-anywhere shape that "
    "avoids rescanning raw events at 100 TB. Output asserts the merged "
    "estimate is within 5% of the exact count (computed here only for "
    "the oracle contract; production rollups never rescan).",
)
def sketch_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    cells = SKCH.hll_cell_sketches(ev, ["day", "event_type"], "user_id")
    rolled = SKCH.hll_rollup(cells, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).cast("long").alias("exact_users")
    )
    return (
        rolled.join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_distinct") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("within_5pct"),
        )
        .orderBy("event_type")
    )


@register(
    "func_higher_order",
    oracle="""
WITH per_order AS (
  -- one combined sort keyed (linenumber, cents, qty): linenumber is NOT
  -- unique per order in the fixture, so the tie-break must cover both
  -- payloads to keep the two projected vectors aligned across engines
  SELECT l_orderkey,
         list(CAST(round(l_extendedprice*100) AS BIGINT)
              ORDER BY l_linenumber, CAST(round(l_extendedprice*100) AS BIGINT),
                       CAST(l_quantity AS BIGINT)) AS cents,
         list(CAST(l_quantity AS BIGINT)
              ORDER BY l_linenumber, CAST(round(l_extendedprice*100) AS BIGINT),
                       CAST(l_quantity AS BIGINT)) AS qtys
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey,
       CAST(list_sum(cents) AS BIGINT) AS total_cents,
       CAST(len(list_filter(cents, x -> x > 2000000)) AS BIGINT) AS n_big,
       CAST(list_sum(list_transform(list_zip(cents, qtys), t -> t[1] * t[2]))
            AS BIGINT) AS dot
FROM per_order
WHERE l_orderkey % 50 = 0
ORDER BY l_orderkey
""",
    category="functions",
    description="Higher-order array functions (SURVEY §2.B array/map row, "
    "lambda tier): per-order price vectors folded with aggregate(), "
    "filter(), and zip_with() — all inside whole-stage codegen, integer-"
    "exact (cents), order pinned by linenumber so both engines agree.",
)
def func_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 50 == 0
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    qty = F.col("l_quantity").cast("long")
    # single sorted struct array, then project both vectors from it: the
    # fixture's linenumber is not unique per order, so sorting each vector
    # separately would misalign the zip pairing (struct sort is
    # lexicographic over (ln, c, q) — same total order as the oracle)
    sorted_lines = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("l_linenumber").alias("ln"), cents.alias("c"), qty.alias("q")
            )
        )
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.transform(sorted_lines, lambda s: s["c"]).alias("cents"),
        F.transform(sorted_lines, lambda s: s["q"]).alias("qtys"),
    )
    zero = F.lit(0).cast("long")
    return per_order.select(
        "l_orderkey",
        F.aggregate("cents", zero, lambda acc, x: acc + x).alias("total_cents"),
        F.size(F.filter("cents", lambda x: x > 2_000_000)).cast("long").alias("n_big"),
        F.aggregate(
            F.zip_with("cents", "qtys", lambda a, b: a * b), zero, lambda acc, x: acc + x
        ).alias("dot"),
    ).orderBy("l_orderkey")


@register(
    "agg_listagg",
    oracle="""
SELECT c_nationkey,
       string_agg(c_name, ',' ORDER BY c_name) AS names,
       CAST(COUNT(*) AS BIGINT) AS n
FROM customer
WHERE c_custkey % 40 = 0
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
    category="aggregation",
    description="Ordered string aggregation (listagg WITHIN GROUP / "
    "string_agg): deterministic because the concat order is total.",
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 40 == 0)
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.expr("listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name)").alias(
                "names"
            ),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "join_lateral_topn",
    oracle="""
SELECT n.n_nationkey, l.c_custkey, l.c_acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
) l
ORDER BY n.n_nationkey, l.c_acctbal DESC, l.c_custkey
""",
    category="join",
    description="Correlated LATERAL subquery join (per-nation top-2 "
    "customers by balance, tie-broken): the dependent-join surface — "
    "Catalyst decorrelates it into a ranked window rather than executing "
    "one subquery per outer row.",
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n.n_nationkey, l.c_custkey, l.c_acctbal
        FROM nation n, LATERAL (
          SELECT c_custkey, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) l
        ORDER BY n.n_nationkey, l.c_acctbal DESC, l.c_custkey
        """
    )


@register(
    "sample_epoch_shuffle",
    oracle="""
SELECT md5('42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key, doc_id
FROM documents
ORDER BY shuffle_key
""",
    category="sampling",
    description="Seeded deterministic epoch shuffle: md5(seed || id) as "
    "the sort key gives a reproducible global permutation of the corpus "
    "(same seed => same order on any cluster, any partitioning — the "
    "training-epoch contract). Executes as a range-partitioned sort, the "
    "shape that totals 100 TB without a single-node bottleneck; changing "
    "the seed reshuffles with zero data movement beforehand.",
)
def sample_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("42:"), F.col("doc_id").cast("string")))
    return d.select(key.alias("shuffle_key"), "doc_id").orderBy("shuffle_key")


@register(
    "join_null_safe",
    oracle="""
WITH keyed AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 0 THEN NULL
              ELSE o_orderkey % 7 END AS grp
  FROM orders
),
dim AS (
  SELECT DISTINCT grp,
         COALESCE('g' || CAST(grp AS VARCHAR), 'unbucketed') AS bucket
  FROM keyed
)
SELECT d.bucket,
       CAST(COUNT(k.o_orderkey) AS BIGINT) AS n_orders,
       CAST(MIN(k.o_orderkey) AS BIGINT) AS min_key
FROM keyed k JOIN dim d ON k.grp IS NOT DISTINCT FROM d.grp
GROUP BY d.bucket
ORDER BY d.bucket
""",
    category="join",
    description="Null-safe equality join (<=> / IS NOT DISTINCT FROM) "
    "against a bounded dimension: NULL keys MATCH the dimension's NULL "
    "row — the rows a plain equi-join silently drops land in the "
    "'unbucketed' bucket instead. Null-safe equality is a valid hash key, "
    "so the plan stays a (broadcast) hash join, not a nested loop.",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6 sf10 lesson: the original self-join shape paired an
    SF-scaled population on 8 distinct keys — Θ(n²/8) output rows
    (2e10 at sf10), a query whose ANSWER grows quadratically. Null-safe
    semantics need a null key to survive a join, not a quadratic blow-up,
    so the fact side now probes a DISTINCT-key dimension (≤8 rows at any
    SF, broadcast) and aggregates — linear in the input forever."""
    o = load_table(spark, sf_dir, "orders")
    keyed = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(None))
        .otherwise(F.col("o_orderkey") % 7)
        .alias("grp"),
    )
    dim = keyed.select("grp").distinct().select(
        "grp",
        F.coalesce(
            F.concat(F.lit("g"), F.col("grp").cast("string")),
            F.lit("unbucketed"),
        ).alias("bucket"),
    )
    return (
        keyed.alias("k")
        .join(
            F.broadcast(dim.alias("d")),
            F.col("k.grp").eqNullSafe(F.col("d.grp")),
        )
        .groupBy("bucket")
        .agg(
            F.count("o_orderkey").cast("long").alias("n_orders"),
            F.min("o_orderkey").cast("long").alias("min_key"),
        )
        .orderBy("bucket")
    )


@register(
    "join_full_outer",
    oracle="""
WITH a AS (
  SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_cust
  FROM customer WHERE c_acctbal > 9800 GROUP BY c_nationkey
),
b AS (
  SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_supp
  FROM supplier WHERE s_acctbal > 4000 GROUP BY s_nationkey
)
SELECT COALESCE(a.nk, b.nk) AS nk, a.n_cust, b.n_supp
FROM a FULL OUTER JOIN b ON a.nk = b.nk
ORDER BY nk
""",
    category="join",
    description="Full outer join of two filtered aggregates: unmatched "
    "rows from BOTH sides survive null-padded (the filters make each side "
    "miss nations the other has). Completes the outer-join family with "
    "join_left_outer.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9800)
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 4000)
    a = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).cast("long").alias("n_cust")
    )
    b = s.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).cast("long").alias("n_supp")
    )
    return (
        a.join(b, "nk", "full_outer")
        .select(F.col("nk"), "n_cust", "n_supp")
        .orderBy("nk")
    )


@register(
    "agg_filter_clause",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_done,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
            FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS open_cents
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    category="aggregation",
    description="SQL-standard FILTER clause on aggregates: per-group "
    "conditional counts/sums in ONE pass (no self-joins, no pivot) — "
    "integer cents keep both engines bit-identical.",
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_done,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS open_cents
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


_TREE_ROLLUP_SQL = """
WITH RECURSIVE edges AS (
  SELECT c_custkey AS child,
         CAST(FLOOR(c_custkey / 10) AS BIGINT) AS parent,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
),
walk(node, anc, depth, bal_cents) AS (
  SELECT child, child, 0, bal_cents FROM edges
  UNION ALL
  SELECT w.node, e.parent, w.depth + 1, w.bal_cents
  FROM walk w JOIN edges e ON e.child = w.anc
  WHERE e.parent > 0
)
SELECT anc AS ancestor,
       CAST(COUNT(*) AS BIGINT) AS n_subtree,
       CAST(MAX(depth) AS INT) AS max_depth,
       CAST(SUM(bal_cents) AS BIGINT) AS subtree_bal_cents
FROM walk
GROUP BY anc
ORDER BY ancestor
"""


@register(
    "recursive_tree_rollup",
    oracle=_TREE_ROLLUP_SQL,
    category="recursive",
    description="Hierarchical (org-chart / category-tree) rollup via Spark "
    "4's native WITH RECURSIVE: an implicit tree (parent = custkey DIV 10) "
    "is walked upward to materialize the ancestor closure, then each "
    "ancestor aggregates its whole subtree (count, max depth, balance in "
    "integer cents for cross-engine exactness). Iteration bound: depth = "
    "digits of the max key, i.e. O(log10 n) recursion rounds — at 100 TB "
    "(~1e10 keys) that is 10 rounds, each one frontier-sized equi-join; "
    "the closure is n*log10(n) rows, not quadratic, because the walk "
    "ascends a tree (single parent per node), never a general graph. The "
    "DuckDB oracle is the very same recursive SQL.",
)
def recursive_tree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_TREE_ROLLUP_SQL)


@register(
    "scan_partition_pruned",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    category="scan",
    description="Hive-style partition pruning: orders rewritten "
    "partitionBy(o_orderpriority), then read with an IN filter that prunes "
    "3 of 5 directories at PLANNING time (PartitionFilters on the scan, "
    "plan-asserted) — at 100 TB the pruned partitions are never listed, "
    "let alone read. The complement of footer_stats' row-group skipping.",
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    pdir = os.path.join(tempfile.mkdtemp(prefix="scan_part_"), "orders_part")
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(pdir)
    return (
        spark.read.parquet(pdir)
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
        )
        .orderBy("o_orderpriority")
    )


_BOOL_AGG_SQL = """
SELECT o_orderpriority,
       CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big,
       bool_and(o_totalprice > 900) AS all_above_floor,
       bool_or(o_orderstatus = 'F') AS any_finished,
       CAST(max_by(o_orderkey,
                   CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                        AS DECIMAL(38,0)) * 1000000000000
                   + o_orderkey) AS BIGINT) AS priciest_order
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "agg_boolean_argmax",
    oracle=_BOOL_AGG_SQL,
    category="aggregation",
    description="SQL-standard boolean/conditional aggregates — count_if, "
    "bool_and, bool_or — plus max_by (argmax) with a composite "
    "DECIMAL(38,0) cents*1e12+key ordering value so price ties can't make "
    "the chosen argmax engine-dependent. The decimal width keeps the key "
    "term below the price term for any orderkey < 1e12 (TPC-H keys reach "
    "~6e11 only at SF~100k, and the 38-digit headroom never overflows — "
    "a BIGINT ordering value would wrap at realistic scale). Same SQL "
    "text runs in both engines; one partial+final hash aggregate.",
)
def agg_boolean_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_BOOL_AGG_SQL)


_RANGE_FRAME_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_in_band,
       CAST(SUM(cents) OVER w AS BIGINT) AS sum_band_cents
FROM (
  SELECT o_custkey, o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY cents
  RANGE BETWEEN 1000000 PRECEDING AND CURRENT ROW
)
ORDER BY o_custkey, o_orderkey
"""


@register(
    "window_range_frame",
    oracle=_RANGE_FRAME_SQL,
    category="window",
    description="Value-based RANGE window frame (vs the positional ROWS "
    "frames of window_frame_positional): per customer, how many orders "
    "fall within $10,000 below each order's price, and their total — the "
    "band is defined by VALUE distance, so peers with equal keys are all "
    "in-frame (well-defined under ties). Integer cents keep both engines "
    "bit-identical; one shuffle on the partition key.",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RANGE_FRAME_SQL)


@register(
    "dedup_semantic_clusters",
    # k-means-trained cluster IDS are engine-specific, so per-cluster
    # counts can't be pinned in SQL — the hashed output asserts the
    # algorithm's engine-independent invariants instead: every embedding
    # is assigned exactly once, and every non-empty cluster keeps at
    # least one survivor but never more than its members (the
    # keep-preferred minimum member always survives by construction).
    # The exact keep rule is additionally pinned by
    # tests/test_training_ops.py::test_semantic_dedup_*.
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS total_members,
       TRUE AS all_assigned_once,
       TRUE AS every_cluster_keeps_some
FROM embeddings
""",
    category="dedup",
    description="SemDeDup (Abbas et al. 2023): embedding-space semantic "
    "dedup — k-means clusters bound the pairwise work, cosine scored "
    "within clusters only, and of each near-dup group the member with the "
    "LOWEST centroid-cosine survives (the paper's diversity-keeping "
    "rule). Output is the oracle-checked invariant row (assignment "
    "totality, per-cluster 1 <= kept <= members). Pair cost is "
    "sum(cluster^2), dialed by k; shuffle key is the cluster id "
    "(balanced by the trained quantizer).",
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # count from the bare scan (cheapest), then spread for the Lloyd
    # rounds + within-cluster scoring — unspread, every training
    # assignment ran serially in the single-row-group scan task (6.3 s
    # of construct at sf0.1, round 12).
    base = load_table(spark, sf_dir, "embeddings")
    e = spread_small_scan(base, key_cols=("vec_id",))
    # k grows with the corpus (SemDeDup's own k does, for exactly this
    # reason): the round-6 sf10 sweep caught the constant k=8 making
    # ~N^2/8 within-cluster pairs at 500k vectors. Small corpora keep the
    # Lloyd-trained flat path (oracle-gate behavior unchanged); past the
    # cutover, flat N x k assignment is itself the bottleneck (the k=707
    # Lloyd run timed out at sf10), so large corpora use k ~ N/128 seeded
    # centroids with IVF-style two-level assignment — N x (64 + k/64)
    # scored candidates — and ~N^2/k pair work. The oracle pins
    # invariants (assignment totality, per-cluster keep bounds), not
    # cluster ids, so k and the assignment strategy are performance
    # dials at every SF.
    n = base.count()  # bounded scalar action, same class as the k*dim collect
    # 0.4 matches dedup_embedding_cosine's fixture threshold: the synthetic
    # corpus is near-uniform (typical cos ~0.2), with planted similar pairs
    # above 0.4 — production text embeddings would use ~0.95
    if n <= 20_000:
        import math

        k = max(8, min(128, math.isqrt(n) if n > 500 else 8))
        cents = SIM.train_centroids(e, n_centroids=k, iters=3)
        res = SIM.semantic_dedup(e, cents, threshold=0.4)
    else:
        import math

        # k at the two-level-assignment optimum, not a fixed cap: total
        # score-op mass is N*(c + k/c) assignment + N^2/k within-cluster
        # pairs; with c = sqrt(k) this is N*2*sqrt(k) + N^2/k, minimized
        # at k = N^(2/3) — total Theta(N^(4/3)). The round-10 cap of 4096
        # let the average cluster grow with N past 500k vectors (at 2M:
        # 488 members -> ~1e9 pair scores, the attributed superlinear
        # term of the 856 s sf100 wall; at k=N^(2/3) the same corpus does
        # ~256M pair + ~500M assignment scores). N^(4/3) is inherent to
        # exact within-cluster scoring with a two-level quantizer — a
        # deeper assignment tree (N^(5/4) at three levels) is the next
        # step beyond ~1e8 vectors, not a bigger flat k.
        k = max(256, min(65_536, round(n ** (2.0 / 3.0))))
        coarse_n = max(16, min(1024, round(math.sqrt(k))))
        cents = e.orderBy("vec_id").limit(k).select(
            F.col("vec_id").cast("long").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        )
        assigned = SIM.hierarchical_assign(
            e, cents, coarse_n=coarse_n, id_col="vec_id", vec="embedding",
            out_id="vec_id",
        )
        res = SIM.semantic_dedup(e, cents, threshold=0.4, assigned=assigned)
    per_cluster = res.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum(F.col("kept").cast("long")).cast("long").alias("n_kept"),
    )
    bounds = per_cluster.agg(
        F.sum("n_members").cast("long").alias("total_members"),
        F.bool_and(
            (F.col("n_kept") >= 1) & (F.col("n_kept") <= F.col("n_members"))
        ).alias("every_cluster_keeps_some"),
    )
    assigned_once = res.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.count_distinct(F.col("vec_id")).cast("long").alias("_nd"),
        F.bool_and(F.col("cluster").isNotNull()).alias("_nn"),
    ).select(
        ((F.col("_n") == F.col("_nd")) & F.col("_nn")).alias(
            "all_assigned_once"
        )
    )
    # 1-row × 1-row attachment as a literal-key equi-join (broadcast)
    return (
        bounds.withColumn("_k", F.lit(1))
        .join(F.broadcast(assigned_once.withColumn("_k", F.lit(1))), "_k")
        .select(
            "total_members", "all_assigned_once", "every_cluster_keeps_some"
        )
    )


@register(
    "scan_schema_evolution",
    oracle="""
WITH old AS (
  SELECT n_nationkey, n_name, CAST(NULL AS BIGINT) AS n_extra
  FROM nation WHERE n_nationkey < 10
), new AS (
  SELECT n_nationkey, n_name, n_regionkey * 100 AS n_extra
  FROM nation WHERE n_nationkey >= 10
)
SELECT n_nationkey, n_name, n_extra
FROM (SELECT * FROM old UNION ALL SELECT * FROM new)
ORDER BY n_nationkey
""",
    category="scan",
    description="Parquet schema evolution (mergeSchema): an old partition "
    "written without a column and a new partition with it read as ONE "
    "table — missing columns surface as NULLs, the lake-pipeline "
    "append-new-columns contract. Spark merges footers at planning time; "
    "at 100 TB turn on spark.sql.parquet.mergeSchema only on evolving "
    "prefixes (footer merge costs a file-listing pass).",
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    n = load_table(spark, sf_dir, "nation")
    root = os.path.join(tempfile.mkdtemp(prefix="scan_evo_"), "nation_evo")
    n.filter(F.col("n_nationkey") < 10).select(
        "n_nationkey", "n_name"
    ).write.mode("overwrite").parquet(os.path.join(root, "v=1"))
    n.filter(F.col("n_nationkey") >= 10).select(
        "n_nationkey",
        "n_name",
        (F.col("n_regionkey") * 100).cast("long").alias("n_extra"),
    ).write.mode("overwrite").parquet(os.path.join(root, "v=2"))
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(root)
        .select("n_nationkey", "n_name", "n_extra")
        .orderBy("n_nationkey")
    )


@register(
    "func_try_arithmetic",
    oracle="""
SELECT o_orderkey,
       TRY_CAST(o_orderpriority AS BIGINT) AS prio_as_int,
       TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_rank,
       CAST(o_orderkey AS DOUBLE)
         / NULLIF(CAST(o_orderkey % 5 AS DOUBLE), 0.0) AS safe_div
FROM orders
WHERE o_orderkey <= 200
ORDER BY o_orderkey
""",
    category="functions",
    description="Error-safe expression surface: TRY_CAST returns NULL on "
    "unparseable input instead of failing the job (a malformed row in a "
    "100 TB scan must not kill the query), and try_divide gives "
    "NULL-on-zero division (oracle spells it NULLIF — same semantics). "
    "Map-only.",
)
def func_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") <= 200)
        .select(
            "o_orderkey",
            F.col("o_orderpriority").try_cast("bigint").alias("prio_as_int"),
            F.expr("substr(o_orderpriority, 1, 1)")
            .try_cast("bigint")
            .alias("prio_rank"),
            F.try_divide(
                F.col("o_orderkey").cast("double"),
                (F.col("o_orderkey") % 5).cast("double"),
            ).alias("safe_div"),
        )
        .orderBy("o_orderkey")
    )


_FUNNEL_SQL = """
WITH base AS (
  SELECT user_id, event_type, event_id, ts
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
),
marked AS (
  SELECT user_id, event_type, event_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_sess
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_type, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sess_id
  FROM marked
),
funnel AS (
  SELECT user_id, sess_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
  FROM sess GROUP BY user_id, sess_id
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS sessions,
       CAST(COUNT(t_view) AS BIGINT) AS sess_view,
       CAST(COUNT(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT)
         AS sess_view_click,
       CAST(COUNT(CASE WHEN t_click > t_view AND t_buy > t_click THEN 1 END)
            AS BIGINT) AS sess_full_funnel
FROM funnel GROUP BY user_id ORDER BY user_id
"""


@register(
    "window_session_funnel",
    oracle=_FUNNEL_SQL,
    category="window-eventtime",
    description="Sessionized conversion funnel (view -> click -> purchase "
    "inside a 30-minute-gap session): gaps-and-islands sessionization, "
    "per-session first-touch timestamps per step, then strict-order step "
    "comparisons (NULL-safe: a missing step never counts). The classic "
    "product-analytics query; two keyed window passes + one groupBy, all "
    "shuffles on user_id. Identical SQL text runs in both engines.",
)
def window_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_FUNNEL_SQL)


@register(
    "setop_bag_semantics",
    oracle="""
WITH o_keys AS (
  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000.0
), c_keys AS (
  SELECT c_custkey AS custkey FROM customer
)
SELECT 'intersect_all' AS src, custkey
FROM (SELECT custkey FROM o_keys INTERSECT ALL SELECT custkey FROM c_keys)
UNION ALL
SELECT 'except_all' AS src, custkey
FROM (SELECT custkey FROM o_keys EXCEPT ALL SELECT custkey FROM c_keys)
ORDER BY src, custkey
""",
    category="setop",
    description="Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL): "
    "multiplicity-preserving variants Catalyst plans as dedicated "
    "count-tracking aggregates, not the DISTINCT-based operators of the "
    "plain set ops — a customer with 3 qualifying orders appears min(3,1) "
    "times in the intersection and 2 times in the difference. One shuffle "
    "per operand pair.",
)
def setop_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    o_keys = o.filter(F.col("o_totalprice") > 150000.0).select(
        F.col("o_custkey").alias("custkey")
    )
    c_keys = c.select(F.col("c_custkey").alias("custkey"))
    parts = [
        o_keys.intersectAll(c_keys).select(
            F.lit("intersect_all").alias("src"), "custkey"
        ),
        o_keys.exceptAll(c_keys).select(
            F.lit("except_all").alias("src"), "custkey"
        ),
    ]
    out = parts[0].unionByName(parts[1])
    return out.orderBy("src", "custkey")


_CORR_SQL = """
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS sx,
         SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  AS DECIMAL(38,0))) AS sy,
         SUM(CAST(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                  AS DECIMAL(38,0))) AS sxx,
         SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  AS DECIMAL(38,0))) AS syy,
         SUM(CAST(CAST(l_quantity AS BIGINT)
                  * CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  AS DECIMAL(38,0))) AS sxy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9)
       AS corr_qty_price
FROM m
ORDER BY l_returnflag
"""


@register(
    "agg_corr_moments",
    oracle=_CORR_SQL,
    category="aggregation",
    description="Pearson correlation via integer MOMENT SUMS (n, Sx, Sy, "
    "Sxx, Syy, Sxy — quantity is integral, price in cents). Per-row "
    "PRODUCTS stay < 2^63 (cents^2 ~ 1e14) but their per-group SUMS do "
    "not once a group holds ~1e5 rows, so every moment accumulates as "
    "DECIMAL(38,0): exact in both engines up to ~1e24 rows per group, "
    "far past 100 TB. ONE final double expression, rounded to 9 decimals. "
    "Shuffle-order-independent where the built-in corr() is not (its "
    "float partials accumulate in partition order) — the cross-engine-"
    "determinism trick generalized from _dsum to second-order statistics. "
    "Same SQL both engines.",
)
def agg_corr_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_CORR_SQL)


_CM_HASH = (
    "CAST(concat('0x', substr(md5(CAST({i} AS VARCHAR) || ':' || "
    "CAST({k} AS VARCHAR)), 1, 15)) AS BIGINT) % 256"
)


@register(
    "sketch_countmin_frequencies",
    oracle=f"""
WITH rbs AS (
  SELECT e.event_type, rw.i AS rw,
         {_CM_HASH.format(i="rw.i", k="e.user_id")} AS bucket
  FROM events e, (SELECT UNNEST(range(4)) AS i) rw
),
cells AS (
  SELECT event_type, rw, bucket, COUNT(*) AS n
  FROM rbs GROUP BY event_type, rw, bucket
),
merged AS (
  SELECT rw, bucket, CAST(SUM(n) AS BIGINT) AS n
  FROM cells GROUP BY rw, bucket
),
cand AS (SELECT DISTINCT user_id FROM events WHERE user_id % 7 = 0),
cand_rb AS (
  SELECT c.user_id, rw.i AS rw,
         {_CM_HASH.format(i="rw.i", k="c.user_id")} AS bucket
  FROM cand c, (SELECT UNNEST(range(4)) AS i) rw
),
est AS (
  SELECT cr.user_id, CAST(MIN(COALESCE(m.n, 0)) AS BIGINT) AS cm_estimate
  FROM cand_rb cr LEFT JOIN merged m USING (rw, bucket)
  GROUP BY cr.user_id
),
exact AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
  FROM events GROUP BY user_id
)
SELECT e.user_id, x.exact_n, e.cm_estimate,
       CAST(e.cm_estimate - x.exact_n AS BIGINT) AS overcount
FROM est e JOIN exact x USING (user_id)
ORDER BY e.user_id
""",
    category="sketch",
    description="Count-min sketch tier — the frequency member of the "
    "mergeable family (HLL=distinct, histogram=quantiles, CM=counts): "
    "4x256 salted-md5 buckets built per event_type cell, MERGED to a "
    "global sketch by summing counts, then point-estimated for a "
    "deterministic candidate set next to the exact counts (overcount >= 0 "
    "always; 0 unless a key collides on every row). Pure integer "
    "arithmetic on a cross-engine hash, so unlike library CM sketches the "
    "whole tier carries an EXACT DuckDB oracle. Cells are d*w = 1KB rows "
    "each at any scale.",
)
def sketch_countmin_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = SKCH.countmin_cell_sketches(ev, ["event_type"], "user_id")
    merged = SKCH.countmin_rollup(cells, [])
    cands = ev.filter(F.col("user_id") % 7 == 0).select("user_id").distinct()
    est = SKCH.countmin_estimate(merged, cands, "user_id")
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            "exact_n",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("exact_n"))
            .cast("long")
            .alias("overcount"),
        )
        .orderBy("user_id")
    )


_HIST_WIDTH_CENTS = 11000  # $110 bins over l_extendedprice (≈900..104950)
_HIST_NBINS = 1000


@register(
    "sketch_histogram_quantiles",
    oracle=f"""
WITH b AS (
  SELECT l_returnflag AS flag,
         LEAST({_HIST_NBINS - 1},
               GREATEST(0, CAST(round(l_extendedprice * 100) AS BIGINT)
                           // {_HIST_WIDTH_CENTS})) AS bin
  FROM lineitem
),
b2 AS (
  SELECT flag, bin FROM b
  UNION ALL
  SELECT 'ALL' AS flag, bin FROM b
),
h AS (SELECT flag, bin, COUNT(*) AS n FROM b2 GROUP BY flag, bin),
c AS (
  SELECT flag, bin, n,
         SUM(n) OVER (PARTITION BY flag ORDER BY bin) AS cum,
         SUM(n) OVER (PARTITION BY flag) AS total
  FROM h
)
SELECT flag,
       CAST(MIN(CASE WHEN cum * 100 >= 50 * total THEN bin END)
            * {_HIST_WIDTH_CENTS} AS BIGINT) AS p50_edge_cents,
       CAST(MIN(CASE WHEN cum * 100 >= 95 * total THEN bin END)
            * {_HIST_WIDTH_CENTS} AS BIGINT) AS p95_edge_cents,
       CAST(MIN(CASE WHEN cum * 100 >= 99 * total THEN bin END)
            * {_HIST_WIDTH_CENTS} AS BIGINT) AS p99_edge_cents,
       CAST(MAX(total) AS BIGINT) AS n_rows
FROM c GROUP BY flag ORDER BY flag
""",
    category="sketch",
    description="Mergeable equi-width histogram sketch tier with an EXACT "
    "oracle (unlike HLL, whose bytes are engine-specific): one integer-"
    "cents binning pass per cell (map-side-combinable groupBy, fixed "
    f"{_HIST_NBINS} bins), then any coarser rollup — here the per-"
    "returnflag histograms MERGED into a global 'ALL' tier — by summing "
    "counts, never rescanning events. Quantiles are integer comparisons "
    "(cum*100 >= p*total) on bin edges, so Spark and DuckDB agree "
    "bit-for-bit. At 100 TB rollups shuffle (cells x bins) count rows "
    "only; accuracy is the +-width/2 equi-width trade.",
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    cells = SKCH.histogram_cell_sketches(
        li.select(F.col("l_returnflag").alias("flag"), cents.alias("cents")),
        ["flag"],
        F.col("cents"),
        width_cents=_HIST_WIDTH_CENTS,
        nbins=_HIST_NBINS,
    )
    # merge tier: the global histogram comes from the per-flag sketches
    # alone (counts add) — the raw table is scanned exactly once above
    merged = cells.unionByName(
        SKCH.histogram_rollup(cells.withColumn("flag", F.lit("ALL")), ["flag"])
    )
    return (
        SKCH.histogram_quantiles(
            merged, ["flag"], width_cents=_HIST_WIDTH_CENTS, pcts=(50, 95, 99)
        )
        .orderBy("flag")
    )


# ===========================================================================
# Driver-window rotation
# ===========================================================================
# The driver's correctness gate caps at 50 entries taken in iteration
# order, so only the first 50 entries of the dict __spark_entry__.queries()
# returns get the per-round spark-vs-DuckDB hash check; the rest are
# verified by the (stricter) local tools/oracle_check.py sweep. To rotate
# independent driver coverage across rounds, ``driver_window_order`` sorts
# names so queries no prior driver window has checked come first.
#
# IMPORTANT: the library itself is hermetic — REGISTRY stays in
# registration order and importing this module never reads harness output
# files. Only __spark_entry__ (the driver contract) applies the rotation,
# at call time. Round 2's window covered these 50:

_DRIVER_CHECKED_PRIOR_ROUNDS: set[str] = {
    "agg_pricing_summary", "agg_minmax_count", "agg_rollup", "agg_cube",
    "distinct_segments", "scan_filter_project", "join_equi_broadcast",
    "join_multiway_fact", "join_left_outer", "join_semi", "join_anti",
    "join_range_theta", "window_topk_per_group", "window_running_lag",
    "sort_global_topk", "setop_union_intersect_except", "func_string",
    "func_datetime", "func_math", "func_array", "func_json",
    "cdc_lww_materialize", "cdc_event_counts", "cdc_sink_records",
    "text_token_count", "text_quality_score", "text_lang_id",
    "text_fingerprint_groups", "dedup_exact_survivors",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "sim_cosine_topk", "sim_lsh_topk", "multimodal_decode_features",
    "join_asof", "agg_grouping_sets", "distinct_approx",
    "text_rolling_fingerprint", "dedup_embedding_cosine", "sim_ivf_topk",
    "sim_ivf_trained_topk", "window_tumbling_hourly", "window_session_gap",
    "agg_skew_salted", "join_range_binned", "func_map", "agg_stats",
    "agg_percentile", "window_frame_positional",
}


def _driver_checked_rounds(root: str | None = None) -> dict[str, int]:
    """``{query name: most recent driver round that HASH-verified it}`` —
    the hard-coded round-2 set above (minus its rows-only members — they
    only ever produced ``no_oracle`` records) at round 2, overlaid with
    every ``CORRECTNESS_r{N}.json`` record whose hash_match is true at
    round N — so the rotation keeps itself current each round without
    manual edits, and a query whose oracle contract is new (e.g. a
    rows-only query later upgraded to an oracle-checkable one) counts as
    fresh until the driver has actually hash-checked it once.

    ``root`` overrides the directory scanned for CORRECTNESS files
    (tests simulate future rounds with it); default is the repo root."""
    import glob
    import json
    import os
    import re

    checked = {
        name: 2
        for name in _DRIVER_CHECKED_PRIOR_ROUNDS
        # in the r2 window but recorded only as no_oracle there
        if name not in ("distinct_approx", "sim_ivf_trained_topk")
    }
    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path, encoding="utf-8") as f:
                records = json.load(f)
        except (OSError, ValueError):
            continue
        for name, rec in records.items():
            if isinstance(rec, dict) and rec.get("hash_match") is True:
                checked[name] = max(checked.get(name, 0), rnd)
    return checked


def _driver_checked_so_far() -> set[str]:
    """Every query name any prior round's driver gate already HASH-verified."""
    return set(_driver_checked_rounds())


def driver_window_order(root: str | None = None) -> list[str]:
    """Registry names ordered for the driver's 50-entry correctness window:

    1. oracle-checkable queries NO prior driver round has verified (the
       independent-coverage growth the rotation exists for),
    2. oracle-checkable queries a prior round already verified, ordered
       LEAST-RECENTLY-CHECKED first — once every query has been checked
       (round 4 reached that point), this keeps the 50-entry window
       cycling through the full registry every ~3 rounds instead of
       re-checking the same first-50-by-registration forever,
    3. rows-only queries (oracle=None) last — the driver can only report
       ``no_oracle`` for them, so they must never consume a hash-check
       slot.

    Ties (same tier, same last-checked round) fall back to registration
    order (deterministic). Pure function of REGISTRY plus whatever
    CORRECTNESS_r*.json the driver has dropped in the repo root (or
    ``root``); the REGISTRY itself is never mutated."""
    rounds = _driver_checked_rounds(root)
    reg_pos = {n: i for i, n in enumerate(REGISTRY)}

    def key(name: str) -> tuple[int, int, int]:
        if REGISTRY[name].oracle is None:
            return (2, 0, reg_pos[name])
        if name not in rounds:
            return (0, 0, reg_pos[name])
        return (1, rounds[name], reg_pos[name])

    return sorted(REGISTRY, key=key)


# ===========================================================================
# Round-4 continuation: tf-idf keyword extraction, Gopher quality gates
# ===========================================================================

@register(
    "text_tfidf_topk",
    oracle=SEARCH.tfidf_topk_terms_sql(k=3),
    category="text-analysis",
    description="Top-3 most distinctive terms per document (tf·idf with "
    "reciprocal-df idf — rank-equivalent to tf·log(N/df) and exactly "
    "computable: score = tf*1e9 div df in both engines). One corpus "
    "shuffle for tf, vocabulary-sized df join, doc-keyed top-k window.",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    return SEARCH.tfidf_topk_terms(d, k=3).orderBy("doc_id", "rank")


@register(
    "quality_gopher_rules",
    oracle=f"""
SELECT doc_id,
  {T.GOPHER_SQL.format(toks=T.TOKENS_SQL.format(c="text"), c="text")},
  (CAST(length({T.TOKENS_SQL.format(c="text")}) AS BIGINT) BETWEEN 50 AND 100000
   AND CAST(list_sum(list_transform({T.TOKENS_SQL.format(c="text")}, t -> length(t))) * 100 AS BIGINT)
       // NULLIF(CAST(length({T.TOKENS_SQL.format(c="text")}) AS BIGINT), 0) BETWEEN 300 AND 1000
   AND CAST(length(regexp_extract_all({T.ascii_lower_sql('text')},
       '\\b(the|a|an|and|or|of|to|in|is|it)\\b')) AS BIGINT) >= 2) AS passes_gopher
FROM documents
ORDER BY doc_id
""",
    category="quality",
    description="Gopher-style pretraining quality gates (word count, mean "
    "word length in integer cents, stopword hits) with the pass/fail "
    "conjunction — map-only Column exprs, no shuffle; exactly the rule "
    "evaluation you fan over 100 TB before any dedup pass.",
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    # keyed spread (round 12): the gopher-rule token scans fused into the
    # serial single-row-group scan task; no-op at real splits
    d = spread_small_scan(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        key_cols=("doc_id",),
    )
    g = T.gopher_rules(F.col("text"))
    return d.select(
        "doc_id",
        g["word_count"].alias("word_count"),
        g["mean_word_len_x100"].alias("mean_word_len_x100"),
        g["stop_hits"].alias("stop_hits"),
        g["passes_gopher"].alias("passes_gopher"),
    ).orderBy("doc_id")


def _simhash_bits(n: int, bands: int = 4) -> int:
    """Fingerprint width scaled to the corpus so the banded self-join's
    RANDOM band collisions stay ~linear in n instead of quadratic:
    E[candidates] ~ bands * n^2 / 2^width, so width >= log2(n/25) keeps it
    under ~50n. Fixed 8-bit bands are exactly the blowup the round-6 sf10
    sweep caught: 4 * C(500k,2) / 256 ~ 2e9 candidate rows (4 GiB task
    pages, unbounded spill). Floor of 8 bits (32-bit fingerprint) keeps
    n <= ~6k — including the sf0.01 oracle gate, whose static SQL twin
    uses bits=32 — byte-identical to the unscaled version. The original
    15-bit ceiling (hash64's 60 usable bits / 4 bands) was exactly what
    the round-10 sf100 sweep caught: at 5M docs width saturated at 15
    and 4 * C(5M,2) / 2^15 ~ 1.5e9 RANDOM collisions parked a quadratic
    straggler task in the banded self-join. simhash now widens to a
    second independent 60-bit word past 60 bits (operators/dedup.py),
    raising the ceiling to 30-bit bands — good to n ~ 25 * 2^30 ~ 2.7e10
    docs before the same wall returns."""
    import math

    width = max(8, math.ceil(math.log2(max(n, 26) / 25)))
    return bands * min(30, width)


@register(
    "dedup_simhash_pairs",
    oracle=DD.simhash_pairs_sql(bits=32, bands=4, max_hamming=3),
    category="dedup",
    description="SimHash near-dup PAIRS via banded Hamming LSH: 4 bands "
    "over corpus-width-scaled fingerprints (8-bit bands / 32 bits at the "
    "sf0.01 oracle gate, matching the static SQL twin; up to 15-bit "
    "bands / 60 bits at 500k docs so random band collisions stay linear "
    "in n), exact bit_count(xor) <= 3 verification on candidates only — "
    "at which threshold the pigeonhole guarantee makes banding COMPLETE "
    "(distance < bands is never missed). Same single posexplode band "
    "self-join plan as MinHash-LSH.",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    # bounded scalar action (row count over parquet metadata) — the same
    # class of driver-side scalar _cosine_planes uses
    bits = _simhash_bits(d.count())
    return DD.simhash_pairs(
        d, bits=bits, bands=4, max_hamming=3
    ).orderBy("doc_a", "doc_b")


# ===========================================================================
# Round-5 continuation: PNG decode, Kafka consumer groups, snappy Avro
# ===========================================================================

@register(
    "multimodal_png_stats",
    oracle="""
SELECT n.n_nationkey AS doc_id,
       CAST(5 AS INT) AS width, CAST(6 AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CAST(SUM((n.n_nationkey*17 + r.i*13 + c.i*5) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((n.n_nationkey*17 + r.i*13 + c.i*5 + 7) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((n.n_nationkey*17 + r.i*13 + c.i*5 + 14) % 256) AS BIGINT) AS sum_b
FROM nation n,
     (SELECT UNNEST(range(6)) AS i) r,
     (SELECT UNNEST(range(5)) AS i) c
GROUP BY n.n_nationkey
ORDER BY doc_id
""",
    category="multimodal",
    description="REAL PNG decode on executors (codec implemented from the "
    "public spec: chunk CRC-32 verification, stdlib-zlib inflate, all five "
    "scanline filters): 5x6 truecolor PNGs are synthesized per nation key "
    "inside one mapInPandas stage (pixel (r,c,k) = (key*17+r*13+c*5+k*7) "
    "mod 256) with the scanline FILTER TYPE varying by key (key mod 5 — "
    "None/Sub/Up/Average/Paeth all exercised), then a second stage parses "
    "the actual PNG bytes back (functions/multimodal.decode_image) and "
    "emits integer-exact per-channel pixel sums. The oracle recomputes the "
    "sums from the generating formula — any filter-reconstruction, "
    "inflate-framing or CRC bug in the codec breaks the match. Map-only "
    "lineage; payloads never leave the task.",
)
def multimodal_png_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    def synth(batches):
        for pdf in batches:
            ids, payloads = [], []
            for nk in pdf["n_nationkey"]:
                nk = int(nk)
                r = np.arange(6).reshape(6, 1, 1)
                c = np.arange(5).reshape(1, 5, 1)
                k = np.arange(3).reshape(1, 1, 3)
                arr = ((nk * 17 + r * 13 + c * 5 + k * 7) % 256).astype(np.uint8)
                ids.append(nk)
                payloads.append(MM.encode_png(arr, filter_type=nk % 5))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    n = load_table(spark, sf_dir, "nation").select("n_nationkey")
    media = n.mapInPandas(synth, "doc_id long, payload binary")
    return MM.image_stats(media).orderBy("doc_id")


@register(
    "scan_avro_snappy_roundtrip",
    oracle="""
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(c_custkey) AS BIGINT) AS sum_key,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    category="scan",
    description="Avro scan under the SNAPPY codec, both halves from the "
    "public specs (sources/avro.py): customer is re-written as snappy "
    "container files executor-side — blocks compressed by the from-spec "
    "pure-Python snappy emitter (varint preamble, literal/copy tags) with "
    "Avro's big-endian CRC32-of-uncompressed suffix — then read back "
    "through binaryFile + the from-spec snappy DEcompressor (overlapping-"
    "copy run repetition, preamble length check, CRC validation) and "
    "aggregated. The oracle reads the same rows from parquet: every key "
    "and cent must survive compress→decompress exactly. Same file-level "
    "parallelism as the deflate path.",
)
def scan_avro_snappy_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from go_pq_cdc_kafka_spark.sources.avro import read_avro, write_avro

    # spread before the Python-boundary encode/decode (round 12; see
    # scan_avro_roundtrip) — customer is 15k rows at sf0.1, so the win is
    # small, but the serial-encoder shape is the same
    c = spread_small_scan(
        load_table(spark, sf_dir, "customer"), key_cols=("c_custkey",)
    )
    base = os.path.join(tempfile.mkdtemp(prefix="scan_avro_snappy_"), "customer")
    write_avro(c, base, codec="snappy")
    back = read_avro(spark, base)
    return (
        back.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("c_custkey").cast("long").alias("sum_key"),
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
            .cast("long")
            .alias("sum_cents"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "multimodal_jpeg_stats",
    oracle="""
SELECT n.n_nationkey AS doc_id,
       CAST(20 AS INT) AS width, CAST(12 AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CAST(240 * ((n.n_nationkey*41 + 7) % 256) AS BIGINT) AS sum_r,
       CAST(240 * ((n.n_nationkey*41 + 7) % 256) AS BIGINT) AS sum_g,
       CAST(240 * ((n.n_nationkey*41 + 7) % 256) AS BIGINT) AS sum_b
FROM nation n
ORDER BY doc_id
""",
    category="multimodal",
    description="REAL baseline-JPEG decode on executors (codec implemented "
    "from the public ITU T.81 spec: marker parsing, canonical Huffman "
    "entropy decode with byte-unstuffing, DC prediction, dequant + IDCT, "
    "chroma upsampling, YCbCr->RGB): solid-gray 20x12 JPEGs are "
    "synthesized per nation key with the STRUCTURE varying by key — "
    "grayscale, 4:4:4 color, or 4:2:0 subsampled (key mod 3), restart "
    "markers every 2 MCUs on odd keys — and decoded distributed. A solid "
    "block is DC-only, and with a DC quant step of 8 quantization is "
    "lossless, so the lossy codec becomes BIT-EXACT on these fixtures: "
    "the oracle's closed-form pixel sums (w*h*gray per channel) pin "
    "Huffman tables, EXTEND sign recovery, restart resync, partial-MCU "
    "cropping and the color conversion exactly. Map-only lineage.",
)
def multimodal_jpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from go_pq_cdc_kafka_spark.functions.jpeg import encode_jpeg

    def synth(batches):
        q8 = np.full((8, 8), 8, np.int32)
        for pdf in batches:
            ids, payloads = [], []
            for nk in pdf["n_nationkey"]:
                nk = int(nk)
                g = (nk * 41 + 7) % 256
                arr = np.full((12, 20, 3), g, np.uint8)
                kw = dict(luma_qtable=q8, chroma_qtable=q8,
                          restart_interval=2 if nk % 2 else 0)
                if nk % 3 == 0:
                    payload = encode_jpeg(arr, grayscale=True, **kw)
                elif nk % 3 == 1:
                    payload = encode_jpeg(arr, **kw)
                else:
                    payload = encode_jpeg(arr, subsample=True, **kw)
                ids.append(nk)
                payloads.append(payload)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    n = load_table(spark, sf_dir, "nation").select("n_nationkey")
    media = n.mapInPandas(synth, "doc_id long, payload binary")
    return MM.image_stats(media).orderBy("doc_id")


@register(
    "multimodal_gif_stats",
    oracle="""
SELECT n.n_nationkey AS doc_id,
       CAST(17 AS INT) AS width, CAST(11 AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CAST(SUM((((r.i*31 + c.i*7 + n.n_nationkey) % 8) * 37
                 + n.n_nationkey*5) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((((r.i*31 + c.i*7 + n.n_nationkey) % 8) * 59
                 + n.n_nationkey*11) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((((r.i*31 + c.i*7 + n.n_nationkey) % 8) * 83
                 + n.n_nationkey*17) % 256) AS BIGINT) AS sum_b
FROM nation n,
     (SELECT UNNEST(range(11)) AS i) r,
     (SELECT UNNEST(range(17)) AS i) c
GROUP BY n.n_nationkey
ORDER BY doc_id
""",
    category="multimodal",
    description="REAL GIF decode on executors (codec implemented from the "
    "public GIF89a spec: variable-width LSB-first LZW with CLEAR/EOI and "
    "dictionary growth, color-table lookup, 4-pass interlace reordering): "
    "17x11 8-color GIFs are synthesized per nation key — palette AND "
    "pixel pattern both closed-form in the key, interlaced on odd keys — "
    "then parsed back through functions/gif.decode_gif distributed and "
    "reduced to per-channel pixel sums. The oracle recomputes the sums "
    "from the generating formulas, pinning LZW decode and palette "
    "resolution exactly (row-order bugs are pinned separately by the "
    "full-array unit test, since sums are permutation-invariant). "
    "Map-only lineage; payloads never leave the task.",
)
def multimodal_gif_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from go_pq_cdc_kafka_spark.functions.gif import encode_gif

    def synth(batches):
        for pdf in batches:
            ids, payloads = [], []
            for nk in pdf["n_nationkey"]:
                nk = int(nk)
                i = np.arange(8)
                pal = np.stack(
                    [(i * 37 + nk * 5) % 256, (i * 59 + nk * 11) % 256,
                     (i * 83 + nk * 17) % 256],
                    axis=1,
                ).astype(np.uint8)
                r = np.arange(11).reshape(11, 1)
                c = np.arange(17).reshape(1, 17)
                idx = ((r * 31 + c * 7 + nk) % 8).astype(np.uint8)
                ids.append(nk)
                payloads.append(encode_gif(idx, pal, interlace=bool(nk % 2)))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    n = load_table(spark, sf_dir, "nation").select("n_nationkey")
    media = n.mapInPandas(synth, "doc_id long, payload binary")
    return MM.image_stats(media).orderBy("doc_id")


@register(
    "composite_order_count_distribution",
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    category="composite",
    description="TPC-H Q13 shape (customer distribution): LEFT OUTER join "
    "with an ON-clause residual predicate (urgent orders excluded INSIDE "
    "the join, so excluded-only customers still appear with count 0 — the "
    "semantics a WHERE clause would silently break), per-customer "
    "COUNT(join key) counting matches only, then a second aggregation "
    "into the count-of-counts histogram. Two shuffles, both partial+final "
    "hash aggregates; integer-exact.",
)
def composite_order_count_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey",
                                                   "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "composite_top_revenue_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS total_rev_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_rev_cents
FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev_cents = (SELECT MAX(total_rev_cents) FROM revenue)
ORDER BY s.s_suppkey
""",
    category="composite",
    description="TPC-H Q15 shape (top supplier): a revenue CTE aggregated "
    "once and consumed TWICE — as the join input and inside the scalar "
    "MAX subquery — the classic view-reuse pattern. Catalyst plans the "
    "scalar max as a 1-row broadcast against the re-aggregated subtree; "
    "revenue is integer cents (round-then-sum) so the max comparison is "
    "exact cross-engine, and ties return every maximal supplier in both "
    "engines identically.",
)
def composite_top_revenue_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
                ).cast("long")
            )
            .cast("long")
            .alias("total_rev_cents")
        )
    )
    max_rev = rev.agg(F.max("total_rev_cents").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        s.join(rev, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(max_rev))
        .filter(F.col("total_rev_cents") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_rev_cents")
        .orderBy("s_suppkey")
    )


@register(
    "composite_small_quantity_revenue",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         CAST(COUNT(*) AS BIGINT) AS n_qty
  FROM lineitem
  GROUP BY l_partkey
) a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND CAST(l.l_quantity AS BIGINT) * 5 * a.n_qty < a.sum_qty
""",
    category="composite",
    description="TPC-H Q17 shape (small-quantity-order revenue): the "
    "correlated per-part scalar (l_quantity < 0.2 * avg over the same "
    "part) decorrelated into one per-part aggregate joined back to the "
    "fact — one extra shuffle instead of a rescan per row. The 20%-of-"
    "average threshold is algebraically cleared of division "
    "(5*q*count < sum, all BIGINT on the integral fixture quantities) so "
    "the boundary can never flip on float rounding cross-engine. Single "
    "global aggregate output.",
)
def composite_small_quantity_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sum_qty"),
        F.count(F.lit(1)).cast("long").alias("n_qty"),
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part, F.col("a_partkey") == F.col("l_partkey"))
        .filter(
            F.col("l_quantity").cast("long") * 5 * F.col("n_qty")
            < F.col("sum_qty")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
    )


@register(
    "multimodal_tiff_stats",
    oracle="""
SELECT n.n_nationkey AS doc_id,
       CAST(14 AS INT) AS width, CAST(10 AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CAST(SUM((n.n_nationkey*19 + r.i*11 + c.i*3) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((n.n_nationkey*19 + r.i*11 + c.i*3
                 + CASE WHEN n.n_nationkey % 4 = 0 THEN 0 ELSE 5 END) % 256)
            AS BIGINT) AS sum_g,
       CAST(SUM((n.n_nationkey*19 + r.i*11 + c.i*3
                 + CASE WHEN n.n_nationkey % 4 = 0 THEN 0 ELSE 10 END) % 256)
            AS BIGINT) AS sum_b
FROM nation n,
     (SELECT UNNEST(range(10)) AS i) r,
     (SELECT UNNEST(range(14)) AS i) c
GROUP BY n.n_nationkey
ORDER BY doc_id
""",
    category="multimodal",
    description="REAL TIFF decode on executors (codec implemented from the "
    "public TIFF 6.0 spec: IFD parsing with inline-vs-offset values, "
    "strip assembly, PackBits RLE, photometric handling): 14x10 TIFFs are "
    "synthesized per nation key with the LAYOUT varying by key — "
    "grayscale (replicated channels, key%4=0) vs RGB, compression "
    "cycling none/PackBits/LZW-with-horizontal-predictor (key%3; the "
    "spec's early-width-change LZW variant), 3-row multi-strip layout on "
    "even LZW keys — then parsed back through functions/tiff.decode_tiff "
    "distributed and reduced to per-channel pixel sums. The oracle "
    "recomputes from the generating formula with a CASE on the gray "
    "keys, pinning IFD layout, strip offsets/counts, RLE runs, LZW "
    "code-width changes, predictor undifferencing and channel order "
    "exactly. Map-only lineage.",
)
def multimodal_tiff_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from go_pq_cdc_kafka_spark.functions.tiff import encode_tiff

    def synth(batches):
        for pdf in batches:
            ids, payloads = [], []
            for nk in pdf["n_nationkey"]:
                nk = int(nk)
                r = np.arange(10).reshape(10, 1, 1)
                c = np.arange(14).reshape(1, 14, 1)
                k = np.arange(3).reshape(1, 1, 3)
                arr = ((nk * 19 + r * 11 + c * 3 + k * 5) % 256).astype(np.uint8)
                kw = dict(grayscale=(nk % 4 == 0))
                if nk % 3 == 1:
                    kw["packbits"] = True
                elif nk % 3 == 2:
                    kw["lzw"] = True
                    kw["predictor"] = bool(nk % 2)
                    if nk % 2 == 0:
                        kw["rows_per_strip"] = 3
                payload = encode_tiff(arr, **kw)
                ids.append(nk)
                payloads.append(payload)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    n = load_table(spark, sf_dir, "nation").select("n_nationkey")
    media = n.mapInPandas(synth, "doc_id long, payload binary")
    return MM.image_stats(media).orderBy("doc_id")


@register(
    "multimodal_g711_stats",
    oracle="""
WITH decoded AS (
  SELECT n.n_nationkey AS doc_id,
         (CASE WHEN (255 - ((n.n_nationkey*7 + i.i*3) % 256)) >= 128
               THEN -1 ELSE 1 END)
         * ((((255 - ((n.n_nationkey*7 + i.i*3) % 256)) % 16) * 8 + 132)
            * CAST(POWER(2, ((255 - ((n.n_nationkey*7 + i.i*3) % 256)) // 16) % 8)
                   AS BIGINT)
            - 132) AS sample
  FROM nation n, (SELECT UNNEST(range(600)) AS i) i
)
SELECT doc_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(600 AS BIGINT) AS n_samples,
       CAST(1 AS INT) AS channels,
       CAST(75 AS BIGINT) AS duration_ms,
       CAST(SUM(ABS(sample)) AS BIGINT) AS sum_abs,
       CAST(SUM(sample * sample) AS BIGINT) AS sum_sq
FROM decoded
GROUP BY doc_id
ORDER BY doc_id
""",
    category="multimodal",
    description="REAL G.711 mu-law decode on executors: per nation key a "
    "600-code 8 kHz mu-law WAV (RIFF fmt tag 7, code_i = (key*7+i*3) mod "
    "256) is synthesized and expanded through the ITU-T segment table "
    "(functions/multimodal.decode_audio walks the RIFF chunks itself — "
    "the stdlib wave module rejects non-PCM). The oracle re-derives the "
    "expansion IN SQL from the spec's closed form — sign from the "
    "complemented code's top bit, magnitude ((mant*8+132)*2^exp)-132 — "
    "so every one of the 256 code mappings that appears is value-checked "
    "against an independent derivation, not against the same table. "
    "Map-only lineage.",
)
def multimodal_g711_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import struct

    import pandas as pd

    def synth(batches):
        for pdf in batches:
            ids, payloads = [], []
            for nk in pdf["n_nationkey"]:
                nk = int(nk)
                codes = bytes((nk * 7 + i * 3) % 256 for i in range(600))
                fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
                body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
                        + b"data" + struct.pack("<I", len(codes)) + codes)
                ids.append(nk)
                payloads.append(
                    b"RIFF" + struct.pack("<I", 4 + len(body)) + body
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    n = load_table(spark, sf_dir, "nation").select("n_nationkey")
    media = n.mapInPandas(synth, "doc_id long, payload binary")
    return MM.audio_stats(media).orderBy("doc_id")


@register(
    "multimodal_resize_stats",
    oracle="""
SELECT n.n_nationkey AS doc_id,
       CAST(7 AS INT) AS width, CAST(5 AS INT) AS height,
       CAST(SUM((n.n_nationkey*13 + ((r.i*12)//5)*7 + ((c.i*20)//7)*5) % 256)
            AS BIGINT) AS sum_r,
       CAST(SUM((n.n_nationkey*13 + ((r.i*12)//5)*7 + ((c.i*20)//7)*5 + 3) % 256)
            AS BIGINT) AS sum_g,
       CAST(SUM((n.n_nationkey*13 + ((r.i*12)//5)*7 + ((c.i*20)//7)*5 + 6) % 256)
            AS BIGINT) AS sum_b
FROM nation n,
     (SELECT UNNEST(range(5)) AS i) r,
     (SELECT UNNEST(range(7)) AS i) c
GROUP BY n.n_nationkey
ORDER BY doc_id
""",
    category="multimodal",
    description="Thumbnailing with a value-checked resample: per nation "
    "key a 20x12 BMP (pixel (r,c,k) = (key*13+r*7+c*5+k*3) mod 256) is "
    "decoded and resized to 7x5 by functions/multimodal.resize_nearest — "
    "deterministic FLOOR index mapping src=(dst*in)//out, pure integer "
    "arithmetic — inside one mapInPandas stage, then reduced to "
    "per-channel sums. The oracle reproduces the exact index math with "
    "SQL integer division, so any off-by-one or rounding-mode drift in "
    "the resampler (the classic source of silent train/serve skew in "
    "image pipelines) breaks the hash. Map-only lineage.",
)
def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    def synth_resize(batches):
        for pdf in batches:
            rows = []
            for nk in pdf["n_nationkey"]:
                nk = int(nk)
                r = np.arange(12).reshape(12, 1, 1)
                c = np.arange(20).reshape(1, 20, 1)
                k = np.arange(3).reshape(1, 1, 3)
                arr = ((nk * 13 + r * 7 + c * 5 + k * 3) % 256).astype(np.uint8)
                small = MM.resize_nearest(
                    MM.decode_image(MM.encode_bmp(arr)), out_w=7, out_h=5
                )
                sums = small.astype("int64").sum(axis=(0, 1))
                rows.append(
                    {"doc_id": nk, "width": small.shape[1],
                     "height": small.shape[0], "sum_r": int(sums[0]),
                     "sum_g": int(sums[1]), "sum_b": int(sums[2])}
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height",
                               "sum_r", "sum_g", "sum_b"]
            )

    n = load_table(spark, sf_dir, "nation").select("n_nationkey")
    return n.mapInPandas(
        synth_resize,
        "doc_id long, width int, height int, "
        "sum_r long, sum_g long, sum_b long",
    ).orderBy("doc_id")


@register(
    "text_perplexity_score",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {T.TOKENS_SQL.format(c="text")} AS t FROM documents
),
pairs AS (
  SELECT doc_id, u.w1 AS w1, u.w2 AS w2
  FROM (
    SELECT doc_id,
           unnest([{{'w1': t[i], 'w2': t[i + 1]}}
                   for i in generate_series(1, len(t) - 1)]) AS u
    FROM toks WHERE len(t) >= 2
  )
),
train AS (SELECT * FROM pairs WHERE doc_id % 7 = 0),
ctx AS (SELECT w1, COUNT(*) AS ctx_n FROM train GROUP BY w1),
big AS (SELECT w1, w2, COUNT(*) AS big_n FROM train GROUP BY w1, w2),
voc AS (
  SELECT COUNT(*) AS v
  FROM (SELECT w1 FROM train UNION SELECT w2 FROM train)
)
SELECT p.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(COALESCE(c.ctx_n, 0) + (SELECT v FROM voc)) AS BIGINT)
         AS surprise,
       CAST(SUM(COALESCE(b.big_n, 0) + 1) AS BIGINT) AS evidence,
       CAST(SUM(COALESCE(c.ctx_n, 0) + (SELECT v FROM voc)) AS DOUBLE)
         / CAST(SUM(COALESCE(b.big_n, 0) + 1) AS DOUBLE) AS ppx_score
FROM pairs p
LEFT JOIN big b ON p.w1 = b.w1 AND p.w2 = b.w2
LEFT JOIN ctx c ON p.w1 = c.w1
GROUP BY p.doc_id
ORDER BY p.doc_id
""",
    category="text-analysis",
    description="CCNet-style n-gram LM scoring: add-one-smoothed bigram "
    "model trained on a deterministic corpus slice, every document scored "
    "against it. Model tables (bigram/context counts + vocab size) "
    "broadcast; scoring is one map-side join pass over the corpus — "
    "O(corpus bigrams), no shuffle of the corpus itself.",
)
def text_perplexity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM surprise scoring (what CCNet uses KenLM perplexity for:
    rank documents by how unlike a reference corpus they read).

    Cross-engine determinism: probabilities stay RATIONAL — per-bigram
    inverse probability (ctx+V)/(big+1) is aggregated as ratio-of-SUMS
    (integer sums, one final correctly-rounded double division) instead of
    float log-space, which no two engines round identically. The train
    slice is doc_id % 7 == 0 (deterministic, ~14%).

    Scale: the trained model is the SMALL side by construction (vocab-
    bounded, like CCNet's fixed LM) — broadcast to every executor; the
    corpus-side pass is explode + two broadcast left joins + one
    groupBy(doc_id), so the only corpus shuffle is the final per-doc
    aggregation. A model too big to broadcast degrades gracefully: drop
    the broadcast hints and Catalyst plans shuffle joins instead."""
    # NO spread here (round-12 A/B: 1.9 s spread vs 1.3 s unspread):
    # aggregation-shaped — the groupBy(doc_id) exchange already
    # parallelizes the model join + scoring, and the added full-payload
    # exchange costs more than the 500-doc tokenize it parallelizes
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # tokens bound in their own projection first (Catalyst does not CSE
    # lambda arguments — see text.shingles_from_tokens)
    toks = d.select("doc_id", T.tokens(F.col("text")).alias("t"))
    pairs = (
        toks.where(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("t"), i).alias("w1"),
                        F.element_at(F.col("t"), i + 1).alias("w2"),
                    ),
                )
            ).alias("u"),
        )
        .select("doc_id", "u.w1", "u.w2")
    )
    train = pairs.where(F.col("doc_id") % 7 == 0)
    # Context counts and vocabulary derive from the bigram-count table
    # (ctx(w1) = Σ big(w1, ·); vocab = distinct tokens of big) instead of
    # re-aggregating the training slice per model table; AQE's exchange
    # reuse then shares big's shuffle across consumers at runtime
    # (verified: ReusedExchange in the executed plan). Production would
    # persist the model once and only ever run the scoring pass.
    big = train.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("big_n")
    )
    ctx = big.groupBy("w1").agg(F.sum("big_n").cast("long").alias("ctx_n"))
    voc = (
        big.select("w1")
        .union(big.select(F.col("w2").alias("w1")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
        .withColumn("_k", F.lit(1))
    )
    scored = (
        pairs.join(F.broadcast(big), ["w1", "w2"], "left")
        .join(F.broadcast(ctx), ["w1"], "left")
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(voc), "_k")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(F.coalesce(F.col("ctx_n"), F.lit(0)) + F.col("v"))
            .cast("long")
            .alias("surprise"),
            F.sum(F.coalesce(F.col("big_n"), F.lit(0)) + 1)
            .cast("long")
            .alias("evidence"),
        )
        .withColumn(
            "ppx_score",
            F.col("surprise").cast("double") / F.col("evidence").cast("double"),
        )
        .orderBy("doc_id")
    )


@register(
    "sampling_dsir_importance",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang, {T.TOKENS_SQL.format(c="text")} AS t FROM documents
),
pairs AS (
  SELECT doc_id, lang, u AS bgr
  FROM (
    SELECT doc_id, lang,
           unnest([t[i] || ' ' || t[i + 1]
                   for i in generate_series(1, len(t) - 1)]) AS u
    FROM toks WHERE len(t) >= 2
  )
),
feats AS (
  SELECT doc_id, lang, {T.hash64_sql("bgr")} % 256 AS bucket FROM pairs
),
docfeat AS (
  SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM feats GROUP BY doc_id, bucket
),
raw AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS r_n FROM feats GROUP BY bucket),
tgt AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS t_n
  FROM feats WHERE lang = 'en' GROUP BY bucket
),
model AS (
  SELECT r.bucket, r.r_n, COALESCE(g.t_n, 0) AS t_n
  FROM raw r LEFT JOIN tgt g ON r.bucket = g.bucket
),
tot AS (
  SELECT CAST(SUM(r_n) AS BIGINT) AS r_tot, CAST(SUM(t_n) AS BIGINT) AS t_tot
  FROM model
),
agg AS (
  SELECT d.doc_id,
         CAST(SUM(d.c) AS BIGINT) AS n_feats,
         CAST(SUM(d.c * (m.t_n + 1)) AS BIGINT) AS num,
         CAST(SUM(d.c * (m.r_n + 1)) AS BIGINT) AS den
  FROM docfeat d JOIN model m ON d.bucket = m.bucket
  GROUP BY d.doc_id
)
SELECT doc_id, n_feats, num, den,
       (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
         * (CAST((SELECT r_tot FROM tot) + 256 AS DOUBLE)
            / CAST((SELECT t_tot FROM tot) + 256 AS DOUBLE)) AS dsir_score
FROM agg
ORDER BY doc_id
""",
    category="sampling",
    description="DSIR-style importance score: hashed-bigram features (256 "
    "buckets), add-one-smoothed target (lang='en') vs raw unigram-of-"
    "feature models; score >1 means the doc reads more target-like than "
    "the corpus average. The model is EXACTLY 256 rows at any corpus size "
    "(feature hashing), so it broadcasts; scoring is one map-side join "
    "over per-doc feature counts.",
)
def sampling_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (hashed n-gram variant):
    rank raw documents by how much their hashed-bigram distribution looks
    like a target slice. Weights stay RATIONAL for cross-engine oracle
    exactness — per-feature smoothed likelihoods are aggregated as
    ratio-of-integer-sums, with the two exact-integer divisions and one
    multiply done in double at the very end (correctly-rounded IEEE ops
    in the same order in both engines; same discipline as
    text_perplexity_score).

    Scale: feature hashing bounds BOTH model tables at exactly 256 rows
    regardless of corpus size — the broadcast can never outgrow an
    executor, unlike vocabulary-keyed models. The corpus-side work is one
    explode + one (doc_id, bucket) aggregation + a broadcast join + one
    final per-doc aggregation; the only corpus shuffles are the two
    doc-keyed groupBys."""
    # NO spread here (round-12 A/B: 1.7-2.0 s spread vs 1.3-1.9 s
    # unspread): the pipeline is aggregation-shaped — the 500-doc
    # tokenize mass is cheaper than the extra full-payload exchange, and
    # the (doc_id, bucket) groupBy already parallelizes the heavy part
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = d.select("doc_id", "lang", T.tokens(F.col("text")).alias("t"))
    pairs = (
        toks.where(F.size("t") >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("t"), i),
                        F.element_at(F.col("t"), i + 1),
                    ),
                )
            ).alias("bgr"),
        )
    )
    feats = pairs.select(
        "doc_id", "lang", (T.hash64(F.col("bgr")) % 256).alias("bucket")
    )
    docfeat = feats.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    raw = feats.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("r_n")
    )
    tgt = (
        feats.where(F.col("lang") == "en")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("t_n"))
    )
    model = raw.join(tgt, "bucket", "left").select(
        "bucket", "r_n", F.coalesce(F.col("t_n"), F.lit(0)).alias("t_n")
    )
    tot = (
        model.agg(
            F.sum("r_n").cast("long").alias("r_tot"),
            F.sum("t_n").cast("long").alias("t_tot"),
        )
        .withColumn("_k", F.lit(1))
    )
    return (
        docfeat.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.sum(F.col("c") * (F.col("t_n") + 1)).cast("long").alias("num"),
            F.sum(F.col("c") * (F.col("r_n") + 1)).cast("long").alias("den"),
        )
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(tot), "_k")
        .withColumn(
            "dsir_score",
            (F.col("num").cast("double") / F.col("den").cast("double"))
            * (
                (F.col("r_tot") + 256).cast("double")
                / (F.col("t_tot") + 256).cast("double")
            ),
        )
        .select("doc_id", "n_feats", "num", "den", "dsir_score")
        .orderBy("doc_id")
    )


@register(
    "sketch_kmv_bottomk",
    oracle=SKCH.kmv_sql("event_type", "user_id", "events", k=64),
    category="sketch",
    description="KMV/theta bottom-k sketch (64 minimum md5 hashes of the "
    "distinct user_ids per event_type): one sketch answers BOTH the "
    "distinct-count estimate ((k-1)·H/h_k) and value quantiles (the "
    "survivors are a uniform sample of the distinct items); the ALL row is "
    "computed by MERGING the per-type sketches (union, re-take k smallest) "
    "— materialize once, roll up anywhere, never rescan rows.",
)
def sketch_kmv_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unlike the HLL tier (engine-opaque bytes, rows-only check), the KMV
    sketch is md5-derived and integer-exact end to end, so the full
    materialize→merge→estimate pipeline is DuckDB-oracle-checked
    bit-for-bit."""
    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    cells = SKCH.kmv_cell_sketches(e, ["event_type"], "user_id", k=64)
    merged = SKCH.kmv_rollup(
        cells.withColumn("event_type", F.lit("ALL")), ["event_type"], k=64
    )
    return (
        SKCH.kmv_estimate(cells.unionByName(merged), k=64)
        .withColumnRenamed("event_type", "cell")
        .orderBy("cell")
    )


@register(
    "emb_label_centroids",
    oracle=f"""
WITH cents AS ({SIM.label_centroids_sql("label", "embedding", "embeddings")})
SELECT label, CAST(u.d AS INT) AS dim, u.m
FROM (
  SELECT label,
         unnest([{{'m': centroid[i], 'd': i - 1}}
                 for i in generate_series(1, len(centroid))]) AS u
  FROM cents
)
ORDER BY label, dim
""",
    category="similarity",
    description="Per-label prototype vectors: element-wise mean embedding "
    "via posexplode + one (label, dim) aggregation, assembled into a "
    "dim-ordered centroid array — the shuffle moves labels x dim sum "
    "cells (map-side combined), never whole vectors; decimal-exact sums "
    "make the means oracle-identical. (Flattened back to scalar rows for "
    "the value-hash gate: the driver compare keys on scalar columns.)",
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return (
        SIM.label_centroids(e, "label", "embedding")
        .select("label", F.posexplode("centroid").alias("dim", "m"))
        .orderBy("label", "dim")
    )


@register(
    "sample_prototype_pruning",
    oracle=SIM.prototype_pruning_sql(keep_per_label=10),
    category="sampling",
    description="Prototype-distance data pruning (Sorscher et al. 2022, "
    "'Beyond neural scaling laws'): keep the 10 HARDEST examples per label "
    "— lowest cosine to the label's own centroid. Centroids are labels x "
    "dim (broadcast); scoring is map-side; the only corpus shuffle is the "
    "per-label hardness-ranking window.",
)
def sample_prototype_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return SIM.prototype_pruning(e, keep_per_label=10).orderBy(
        "label", "hardness_rank"
    )


_EWMA_INNER = TS.ewma_sql(
    "event_type", "day", "daily_mean", "day_id", "daily",
    alpha_num=1, alpha_den=4,
).replace(
    "WITH RECURSIVE ordered AS (",
    """WITH RECURSIVE cents AS (
  SELECT event_type, DATE_TRUNC('day', ts) AS day,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
),
daily AS (
  SELECT event_type, day,
         CAST(epoch(day) AS BIGINT) AS day_id,
         CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0
           AS daily_mean
  FROM cents GROUP BY event_type, day
),
ordered AS (""",
)


@register(
    "ts_ewma_smooth",
    oracle=f"""
SELECT k AS event_type, ts AS day, rid AS day_id, x AS daily_mean, ewma
FROM ({_EWMA_INNER}) t
ORDER BY event_type, day
""",
    category="timeseries",
    description="Per-series EWMA smoothing (s_t = s_t-1 + (x_t - s_t-1)/4) "
    "over per-type DAILY mean series: an order-sensitive fold no window "
    "frame expresses, run as one ts-sorted array fold per series — state "
    "bounded by days-per-series (the bucketed-series contract shared with "
    "gapfill/packing), one per-key shuffle. The oracle replays the same "
    "IEEE fold as a recursive CTE; alpha = 1/4 is exact in binary, so "
    "values match bit-for-bit.",
)
def ts_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = ev.select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    daily = (
        cents.groupBy("event_type", "day")
        .agg(
            (
                F.sum("c").cast("double") / F.count(F.lit(1)).cast("double")
                / F.lit(100.0)
            ).alias("daily_mean")
        )
        .withColumn("day_id", F.unix_timestamp("day").cast("long"))
    )
    return TS.ewma(
        daily, "event_type", "day", "daily_mean", "day_id",
        alpha_num=1, alpha_den=4,
    ).orderBy("event_type", "day")


@register(
    "sample_split_leakage_safe",
    oracle=f"""
WITH RECURSIVE pairs AS (
{DD.ngram_jaccard_pairs_sql(threshold=0.5, max_df=64)}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(id, comp) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id
),
comps AS (
  SELECT CAST(id AS BIGINT) AS doc_id, CAST(MIN(comp) AS BIGINT) AS cluster_id
  FROM reach GROUP BY id
),
assigned AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comps c ON d.doc_id = c.doc_id
)
SELECT doc_id, cluster_id,
       CASE WHEN b <= 7 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END
         AS split
FROM (
  SELECT doc_id, cluster_id,
         {{h}} % 10 AS b
  FROM assigned
)
ORDER BY doc_id
""".format(
        h=T.hash64_sql("concat('split:', CAST(cluster_id AS VARCHAR))")
    ),
    category="sampling",
    description="Leakage-safe train/val/test split: near-duplicate docs "
    "must land in the SAME split (a near-dup of a training doc inside the "
    "eval split inflates every benchmark it touches), so the split is a "
    "hash of the doc's near-dup CLUSTER (df-valved Jaccard pairs -> "
    "connected components; singletons are their own cluster), not of the "
    "doc. 80/10/10 by md5 bucket — deterministic under appends and "
    "retries.",
)
def sample_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition of three first-class tiers: valved pair generation
    (dedup.ngram_jaccard_pairs max_df=64), iterative min-label connected
    components (cluster.connected_components), and a map-side hash split
    keyed by the CLUSTER id. The final assignment join is doc-keyed
    (uniform, shuffle-hash-friendly); everything after the component
    fixpoint is a single projection."""
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    pairs = _valved_pairs(spark, sf_dir)
    comp = CL.connected_components(pairs)
    assigned = (
        d.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    b = (
        T.hash64(
            F.concat(F.lit("split:"), F.col("cluster_id").cast("string"))
        )
        % 10
    )
    return (
        assigned.withColumn(
            "split",
            F.when(b <= 7, "train").when(b == 8, "val").otherwise("test"),
        )
        .orderBy("doc_id")
    )


_TOKEN_BUDGETS = {"src0": 4000, "src1": 2500, "src2": 1000}


@register(
    "sample_token_mixture",
    oracle=SA.token_budget_mixture_sql(
        "source", _TOKEN_BUDGETS, "doc_id", "text"
    ),
    category="sampling",
    description="Mixture selection by TOKEN budget (DoReMi-style source "
    "weights are token shares, and doc-rate mixtures over-sample short "
    "docs): each source contributes documents in deterministic "
    "hash-priority order until its token budget fills. One window "
    "shuffle keyed by source; unbudgeted sources drop map-side.",
)
def sample_token_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        SA.token_budget_mixture(d, "source", _TOKEN_BUDGETS, "doc_id")
        .select("doc_id", "source", "n_tokens", "cum_tokens")
        .orderBy("source", "cum_tokens")
    )


@register(
    "dedup_incremental_minhash",
    oracle=DD.minhash_incremental_pairs_sql(
        corpus_pred="doc_id % 4 <> 0",
        batch_pred="doc_id % 4 = 0",
        num_perms=16,
        bands=4,
        threshold=0.5,
    ),
    category="dedup",
    description="Incremental corpus dedup: MinHash(16)+LSH(4 bands) "
    "candidates of a NEW batch (doc_id % 4 = 0) probed against the "
    "EXISTING corpus's band index, exact-Jaccard verified — the "
    "batch-vs-corpus shape a continuously-ingesting pipeline runs, where "
    "the corpus band index is persisted once and each increment costs "
    "O(batch) + bounded probes, independent of corpus size.",
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load_table(spark, sf_dir, "documents")
    n = raw.count()  # footer-only metadata job (before the spread)
    d = spread_small_scan(raw)
    return DD.minhash_incremental_pairs(
        d.filter(F.col("doc_id") % 4 != 0),
        d.filter(F.col("doc_id") % 4 == 0),
        num_perms=16,
        bands=4,
        threshold=0.5,
        # same ~100k-doc boundary as dedup_minhash_lsh: below it the
        # band-local verify (map-side array_intersect) replaces the
        # candidate distinct and both verify joins; above it the
        # band-exchange payload loses (round-13 500k-doc A/B)
        persist=n > 100_000,
        band_local=n <= 100_000,
    ).orderBy("new_doc", "dup_of")


@register(
    "sim_rp_topk",
    oracle=SIM.rp_cosine_topk_sql(
        dim=64, out_dim=16, k=5, rerank=3, query_pred="vec_id < 5"
    ),
    category="similarity",
    description="Random-projection ANN (Johnson–Lindenstrauss): 64-dim "
    "embeddings sketched to 16 dims by a deterministic ±1 Rademacher "
    "matrix; candidates ranked on the 4x-cheaper sketches, top-15 per "
    "query exactly re-ranked in full dimension for the final top-5 — the "
    "dimensionality scale path beside LSH (bucketing), IVF "
    "(partitioning), and int8/PQ (compression).",
)
def sim_rp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # keyed corpus spread (round 12): the 16-plane decimal sketch + two
    # norms per corpus vector ran inside the serial scan task (measured
    # 2.7 → 1.2-1.6 s warm, exceptAll 0/0); no-op at real splits
    return SIM.rp_cosine_topk(
        e.filter(F.col("vec_id") < 5).limit(5),  # limit == no-op bound on the unique-key filter (plan-gate proof)
        spread_small_scan(e, key_cols=("vec_id",)),
        dim=64, out_dim=16, k=5, rerank=3
    ).orderBy("query_id", "rk")


_QC_BUCKETS = 512


@register(
    "quality_classifier_score",
    oracle=f"""
WITH weights AS (
  SELECT b AS bucket,
         {T.hash64_sql("concat('qw:', b)")} % 2001 - 1000 AS w
  FROM (SELECT UNNEST(range({_QC_BUCKETS})) AS b)
),
toks AS (
  SELECT doc_id, unnest({T.TOKENS_SQL.format(c="text")}) AS tok FROM documents
),
docfeat AS (
  SELECT doc_id, {T.hash64_sql("tok")} % {_QC_BUCKETS} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY doc_id, bucket
)
SELECT d.doc_id,
       CAST(SUM(d.c) AS BIGINT) AS n_tokens,
       CAST(SUM(d.c * w.w) AS BIGINT) AS score,
       CAST(SUM(d.c * w.w) AS DOUBLE) / CAST(SUM(d.c) AS DOUBLE)
           AS score_per_token,
       (SUM(d.c * w.w) > 0) AS keep
FROM docfeat d JOIN weights w ON d.bucket = w.bucket
GROUP BY d.doc_id
ORDER BY d.doc_id
""",
    category="quality",
    description="Pretrained linear quality classifier (fastText-style "
    "filter): hashed-unigram features scored against a 512-bucket weight "
    "table — the stand-in for externally-trained model parameters, "
    "deterministic md5-derived integer weights here for oracle exactness. "
    "The model is EXACTLY 512 rows at any corpus size, so it broadcasts; "
    "scoring is one map-side join + one per-doc aggregation, the shape "
    "every learned quality/toxicity/domain filter runs at 100 TB.",
)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Applying a PRETRAINED classifier (vs sampling_dsir_importance, which
    TRAINS its importance model from the corpus itself): weights arrive as
    a table keyed by feature bucket, exactly how a fastText/logistic quality
    model's parameters ship to a Spark scoring job. Integer weights in
    [-1000, 1000] keep every aggregate exact across engines; the keep/drop
    decision and the per-token margin are derived columns."""
    weights = spark.range(_QC_BUCKETS).select(
        F.col("id").alias("bucket"),
        (
            T.hash64(F.concat(F.lit("qw:"), F.col("id").cast("string")))
            % 2001
            - 1000
        ).alias("w"),
    )
    # keyed spread (round 12): tokenize + feature explode fused into the
    # serial single-row-group scan task; no-op at real splits
    d = spread_small_scan(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        key_cols=("doc_id",),
    )
    toks = d.select("doc_id", T.tokens(F.col("text")).alias("t"))
    docfeat = (
        toks.select(
            "doc_id", F.explode(F.col("t")).alias("tok")
        )
        .select("doc_id", (T.hash64(F.col("tok")) % _QC_BUCKETS).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return (
        docfeat.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.col("c") * F.col("w")).cast("long").alias("score"),
        )
        .withColumn(
            "score_per_token",
            F.col("score").cast("double") / F.col("n_tokens").cast("double"),
        )
        .withColumn("keep", F.col("score") > 0)
        .select("doc_id", "n_tokens", "score", "score_per_token", "keep")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Composite batch 3 (round 6): the remaining TPC-H query shapes (Q2, Q4, Q6,
# Q8, Q9, Q16, Q20), adapted where the fixture schema lacks partsupp /
# l_commitdate / l_receiptdate — each adaptation is documented on the query.
# ---------------------------------------------------------------------------


@register(
    "composite_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(27,6))) AS DOUBLE)
           AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    category="composite",
    description="TPC-H Q6 shape (forecasting revenue change): a pure "
    "scan-filter-aggregate with three pushable predicates and no join — "
    "the query whose whole cost is the parquet scan, so the plan MUST "
    "show all three filters pushed and a two-column read. Revenue "
    "accumulates in decimal (extendedprice and discount have two "
    "fractional digits each, so the per-row product has at most four — "
    "the scale-6 cast is exact in both engines).",
)
def composite_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@register(
    "composite_priority_order_check",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    category="composite",
    description="TPC-H Q4 shape (order-priority checking): EXISTS over a "
    "correlated lineitem subquery with a NON-equi correlated predicate "
    "(shipped more than 30 days after the order date stands in for "
    "l_commitdate < l_receiptdate, absent from the fixture). Catalyst "
    "decorrelates to a LeftSemi hash join on l_orderkey with the "
    "date-arithmetic predicate as a join filter — one shuffle, no "
    "per-row subquery, which is the only shape that survives a 100 TB "
    "orders table.",
)
def composite_priority_order_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "composite_market_share",
    oracle="""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       CAST(CAST(SUM(CASE WHEN sn.n_name = 'NATION_2'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))
                 ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE)
            / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
                   AS DOUBLE) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN part     ON p_partkey = l_partkey
JOIN customer ON c_custkey = o_custkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
JOIN region cr ON cr.r_regionkey = cn.n_regionkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
WHERE cr.r_name = 'ASIA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_year
ORDER BY o_year
""",
    category="composite",
    description="TPC-H Q8 shape (national market share): seven joins where "
    "the bounded dimensions (nation twice, region) broadcast by hint, "
    "part/customer/supplier join adaptively (auto-broadcast while they "
    "fit, shuffle at scale) and only orders–lineitem must shuffle; the "
    "supplier-nation "
    "share is a conditional-sum ratio per order year. Both sums "
    "accumulate in decimal so the final double division is bit-identical "
    "cross-engine. Nation is joined TWICE under different roles — the "
    "aliasing exercise that breaks naive self-join handling.",
)
def composite_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation")
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    asia = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(27,6)")
    zero = F.lit(0).cast("decimal(27,6)")
    num = F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(zero)).cast(
        "double"
    )
    den = F.sum(vol).cast("double")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(asia), F.col("r_regionkey") == F.col("cn_region"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg((num / den).cast("double").alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "composite_product_profit",
    oracle="""
SELECT sn.n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     - 0.125 * p_retailprice * l_quantity
                AS DECIMAL(27,6))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
    category="composite",
    description="TPC-H Q9 shape (product-type profit): profit per supplier "
    "nation and order year over parts matched by a name infix. The fixture "
    "has no partsupp, so supply cost is modeled as 0.125 * p_retailprice "
    "* l_quantity — 0.125 is DYADIC (2^-3, exact in binary), keeping the "
    "per-row profit's decimal expansion at <= 5 fractional digits so the "
    "scale-6 decimal accumulation stays exact in both engines (0.1 would "
    "not: its binary rounding error lands exactly where the cast cuts). "
    "Plan: nation broadcast (bounded), part/supplier adaptive, one "
    "orders-lineitem shuffle, "
    "partial aggregation before the group-by exchange.",
)
def composite_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.125) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .groupBy(
            F.col("nation"), F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(_dsum(profit).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@register(
    "composite_min_cost_supplier",
    oracle="""
WITH links AS (
  SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
         MIN(l.l_extendedprice / l.l_quantity) AS unit_cost
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
  GROUP BY 1, 2
),
best AS (SELECT partkey, MIN(unit_cost) AS min_cost FROM links GROUP BY 1)
SELECT CAST(s.s_acctbal AS DOUBLE) AS s_acctbal, s.s_name,
       n.n_name AS nation, p.p_partkey,
       CAST(l.unit_cost AS DOUBLE) AS supply_cost
FROM part p
JOIN best b ON b.partkey = p.p_partkey
JOIN links l ON l.partkey = p.p_partkey AND l.unit_cost = b.min_cost
JOIN supplier s ON s.s_suppkey = l.suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_size = 15 AND p.p_type = 'SMALL'
ORDER BY s_acctbal DESC, nation, s_name, p_partkey
LIMIT 100
""",
    category="composite",
    description="TPC-H Q2 shape (minimum-cost supplier): the correlated "
    "'cost = min cost for this part among the region's suppliers' "
    "subquery, decorrelated into a per-(part,supplier) aggregate joined "
    "back against its own per-part minimum. The fixture has no partsupp, "
    "so the observed unit price MIN(l_extendedprice / l_quantity) over "
    "the lineitem link plays supply cost — a per-row double division "
    "(bit-identical cross-engine) whose MIN and equality re-join are "
    "exact. Ties on the minimum return every achieving supplier in both "
    "engines; the ORDER BY chain (acctbal DESC, nation, name, partkey) "
    "is a unique key of the output so LIMIT 100 is deterministic.",
)
def composite_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    eur = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "EUROPE")
        .select("r_regionkey")
    )
    eur_supp = (
        supp.join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(eur), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey")
    )
    links = (
        li.join(F.broadcast(eur_supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(
            F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
        )
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
        )
    )
    best = links.groupBy(F.col("partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    sn = supp.join(
        F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("nation"))),
        F.col("n_nationkey") == F.col("s_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "nation")
    return (
        links.join(p, F.col("p_partkey") == F.col("partkey"))
        .join(
            best,
            (F.col("b_partkey") == F.col("partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .join(F.broadcast(sn), F.col("s_suppkey") == F.col("suppkey"))
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            "nation",
            "p_partkey",
            F.col("unit_cost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "nation", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "composite_supplier_part_counts",
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) link
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    category="composite",
    description="TPC-H Q16 shape (parts/supplier relationship): distinct "
    "supplier counts per (brand, type, size) with three NOT-style part "
    "predicates and a NOT IN supplier exclusion. The lineitem DISTINCT "
    "pair projection stands in for partsupp; the exclusion list "
    "(negative account balance stands in for the customer-complaints "
    "LIKE) is an anti-join against a tiny broadcast side — NOT IN is "
    "safe to plan as LeftAnti because s_suppkey is non-nullable. "
    "COUNT(DISTINCT) goes through Spark's two-phase distinct-aggregate "
    "expansion, partials before the exchange.",
)
def composite_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    link = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    return (
        link.join(bad, F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "composite_promotable_suppliers",
    oracle="""
SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal, n_name AS nation
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > 450
)
ORDER BY s_name
""",
    category="composite",
    description="TPC-H Q20 shape (potential part promotion): suppliers who "
    "moved a significant volume of 'red' parts in a year — the doubly "
    "nested IN (parts by name prefix, then a grouped-HAVING volume "
    "threshold standing in for the partsupp availqty comparison) becomes "
    "one selective part filter into lineitem, one integer-quantity "
    "aggregate per supplier, and a LeftSemi against the 100-row supplier "
    "dim. Integral fixture quantities summed as BIGINT make the HAVING "
    "boundary exact.",
)
def composite_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    movers = (
        li.join(F.broadcast(red), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"))
        .filter(F.col("qty") > 450)
        .select("l_suppkey")
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(movers, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").select(
                    "n_nationkey", F.col("n_name").alias("nation")
                )
            ),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select(
            "s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"), "nation"
        )
        .orderBy("s_name")
    )


# ===========================================================================
# Round 7 additions: Holt trend smoothing, deterministic reservoir sampling,
# vocabulary coverage curve
# ===========================================================================

_HOLT_INNER = TS.holt_linear_sql(
    "event_type", "day", "daily_mean", "day_id", "daily",
    alpha_num=1, alpha_den=4, beta_num=1, beta_den=2,
).replace(
    "WITH RECURSIVE ordered AS (",
    """WITH RECURSIVE cents AS (
  SELECT event_type, DATE_TRUNC('day', ts) AS day,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
),
daily AS (
  SELECT event_type, day,
         CAST(epoch(day) AS BIGINT) AS day_id,
         CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0
           AS daily_mean
  FROM cents GROUP BY event_type, day
),
ordered AS (""",
)


@register(
    "ts_holt_trend",
    oracle=f"""
SELECT k AS event_type, ts AS day, rid AS day_id, x AS daily_mean,
       level, trend
FROM ({_HOLT_INNER}) t
ORDER BY event_type, day
""",
    category="timeseries",
    description="Per-series Holt double-exponential smoothing (level + "
    "linear trend; l_t = pred + (x_t - pred)/4, b_t = b + ((l_t - l_prev) "
    "- b)/2) over per-type daily mean series — the forecasting rung above "
    "ts_ewma_smooth, same order-sensitive-fold architecture: one ts-sorted "
    "array fold per bucketed series, one per-key shuffle, bit-parity with "
    "the oracle's recursive CTE (power-of-two alpha/beta are exact in "
    "binary).",
)
def ts_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = ev.select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    daily = (
        cents.groupBy("event_type", "day")
        .agg(
            (
                F.sum("c").cast("double") / F.count(F.lit(1)).cast("double")
                / F.lit(100.0)
            ).alias("daily_mean")
        )
        .withColumn("day_id", F.unix_timestamp("day").cast("long"))
    )
    return TS.holt_linear(
        daily, "event_type", "day", "daily_mean", "day_id",
        alpha_num=1, alpha_den=4, beta_num=1, beta_den=2,
    ).orderBy("event_type", "day")


@register(
    "sample_reservoir_per_source",
    oracle="""
SELECT doc_id, source, rk
FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {h}, doc_id
         ) AS rk
  FROM documents
)
WHERE rk <= 20
ORDER BY source, rk
""".format(
        h=T.hash64_sql("concat('rsv:', CAST(doc_id AS VARCHAR))")
    ),
    category="sampling",
    description="Deterministic k-per-group reservoir equivalent: rank "
    "docs inside each source by a salted 64-bit hash of the doc id and "
    "keep the k smallest — the distributed, replay-stable form of "
    "reservoir sampling (same sample under any arrival order, appends "
    "only displace when a smaller hash arrives, task retries are "
    "idempotent). One per-group window shuffle; no RNG state.",
)
def sample_reservoir_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = T.hash64(F.concat(F.lit("rsv:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h, F.col("doc_id"))
    return (
        d.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .orderBy("source", "rk")
    )


@register(
    "text_vocab_coverage",
    oracle=f"""
WITH toks AS (
  SELECT unnest({T.TOKENS_SQL.format(c="text")}) AS token FROM documents
),
counts AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY token
),
total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens FROM counts),
top AS (
  SELECT token, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rank
  FROM counts
  QUALIFY rank <= 100
)
SELECT rank, token, cnt,
       CAST(SUM(cnt) OVER (ORDER BY rank) AS BIGINT) AS cum_cnt,
       CAST(SUM(cnt) OVER (ORDER BY rank) AS DOUBLE)
         / CAST(total_tokens AS DOUBLE) AS cum_share
FROM top, total
ORDER BY rank
""",
    category="text",
    description="Vocabulary coverage curve: how much of the corpus the "
    "top-100 tokens cover (the Zipf head every tokenizer/vocab decision "
    "studies first). Distributed top-k on the vocabulary (TakeOrdered, "
    "no global sort of the full vocab), 1-row total attached via a "
    "broadcast literal-key join, cumulative share over only the kept "
    "100 rows.",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(T.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    total = counts.agg(
        F.sum("cnt").cast("long").alias("total_tokens")
    ).withColumn("_k", F.lit(1))
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(100)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("cnt").desc(), F.col("token"))
            ),
        )
        .withColumn("_k", F.lit(1))
    )
    w = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.join(F.broadcast(total), "_k")
        .withColumn("cum_cnt", F.sum("cnt").over(w).cast("long"))
        .withColumn(
            "cum_share",
            F.col("cum_cnt").cast("double")
            / F.col("total_tokens").cast("double"),
        )
        .select("rank", "token", "cnt", "cum_cnt", "cum_share")
        .orderBy("rank")
    )


@register(
    "ts_sessionize_gaps",
    oracle="""
WITH stamped AS (
  SELECT user_id, event_id, epoch_ms(ts) AS t
  FROM events
),
flagged AS (
  SELECT user_id, event_id, t,
         CASE WHEN t - LAG(t) OVER (PARTITION BY user_id
                                    ORDER BY t, event_id) > 1800000
              OR LAG(t) OVER (PARTITION BY user_id
                              ORDER BY t, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM stamped
),
numbered AS (
  SELECT user_id, event_id, t,
         SUM(is_new) OVER (PARTITION BY user_id
                           ORDER BY t, event_id) AS sess_n
  FROM flagged
)
SELECT user_id, CAST(MIN(event_id) AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(t) AS BIGINT) AS start_ms,
       CAST(MAX(t) AS BIGINT) AS end_ms,
       CAST(MAX(t) - MIN(t) AS BIGINT) AS duration_ms
FROM numbered GROUP BY user_id, sess_n
ORDER BY user_id, session_id
""",
    category="timeseries",
    description="Gap sessionization (the batch twin of the streaming "
    "session window): per user, a >30-minute silence starts a new "
    "session; sessions report first-event id, event count, and span. "
    "Lag-flag + running-sum session numbering — two passes over ONE "
    "per-user window shuffle, no self-join, state bounded per user.",
)
def ts_sessionize_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        # ts is TIMESTAMP_NTZ; the session is pinned UTC in both engines,
        # so the naive→instant cast is the same epoch DuckDB's epoch_ms
        # computes on the naive value
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    flagged = ev.withColumn(
        "is_new",
        F.when(
            (F.col("t") - F.lag("t").over(w) > 1_800_000)
            | F.lag("t").over(w).isNull(),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    numbered = flagged.withColumn("sess_n", F.sum("is_new").over(w))
    return (
        numbered.groupBy("user_id", "sess_n")
        .agg(
            F.min("event_id").cast("long").alias("session_id"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("t").cast("long").alias("start_ms"),
            F.max("t").cast("long").alias("end_ms"),
            (F.max("t") - F.min("t")).cast("long").alias("duration_ms"),
        )
        .drop("sess_n")
        .orderBy("user_id", "session_id")
    )


@register(
    "ts_anomaly_mad",
    oracle="""
WITH cents AS (
  SELECT event_type, DATE_TRUNC('day', ts) AS day,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
),
daily AS (
  SELECT event_type, day,
         CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS x
  FROM cents GROUP BY event_type, day
),
ranked AS (
  SELECT event_type, day, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x, day) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
med AS (
  SELECT event_type, x AS median_x
  FROM ranked WHERE rn = (n + 1) // 2
),
devs AS (
  SELECT r.event_type, r.day, r.x, m.median_x,
         ABS(r.x - m.median_x) AS dev
  FROM ranked r JOIN med m ON r.event_type = m.event_type
),
dev_ranked AS (
  SELECT event_type, day, x, median_x, dev,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev, day)
           AS drn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM devs
),
mad AS (
  SELECT event_type, dev AS mad_x
  FROM dev_ranked WHERE drn = (n + 1) // 2
)
SELECT d.event_type, d.day, d.x AS daily_mean, d.median_x, m.mad_x,
       CAST(d.dev > 3.0 * m.mad_x AS BOOLEAN) AS is_anomaly
FROM devs d JOIN mad m ON d.event_type = m.event_type
ORDER BY d.event_type, d.day
""",
    category="timeseries",
    description="Robust anomaly flags: a day is anomalous when its mean "
    "deviates from the per-series MEDIAN by more than 3x the median "
    "absolute deviation — the outlier-immune alternative to z-scores "
    "(one wild day inflates a stddev but not a median). Medians are "
    "RANK-based (lower median at (n+1)/2), not interpolated, so both "
    "engines pick the identical element and the parity is exact; two "
    "window passes over the per-series shuffle, medians joined back as "
    "tiny per-series tables.",
)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(
            (
                F.sum("c").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("x")
        )
    )
    wv = Window.partitionBy("event_type").orderBy("x", "day")
    wc = Window.partitionBy("event_type")
    ranked = daily.withColumn("rn", F.row_number().over(wv)).withColumn(
        "n", F.count(F.lit(1)).over(wc)
    )
    med = ranked.filter(
        F.col("rn") == F.floor((F.col("n") + 1) / 2).cast("long")
    ).select("event_type", F.col("x").alias("median_x"))
    devs = ranked.select("event_type", "day", "x").join(
        F.broadcast(med), "event_type"
    ).withColumn("dev", F.abs(F.col("x") - F.col("median_x")))
    wd = Window.partitionBy("event_type").orderBy("dev", "day")
    dev_ranked = devs.withColumn("drn", F.row_number().over(wd)).withColumn(
        "n", F.count(F.lit(1)).over(wc)
    )
    mad = dev_ranked.filter(
        F.col("drn") == F.floor((F.col("n") + 1) / 2).cast("long")
    ).select("event_type", F.col("dev").alias("mad_x"))
    return (
        devs.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "day",
            F.col("x").alias("daily_mean"),
            "median_x",
            "mad_x",
            (F.col("dev") > 3.0 * F.col("mad_x")).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "text_keyword_tfidf_topk",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest({t}) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, token
),
df AS (
  SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks GROUP BY token
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         CAST(tf.tf * n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE) AS score
  FROM tf JOIN df ON tf.token = df.token, n
)
SELECT doc_id, rank, token, tf, df
FROM (
  SELECT doc_id, token, tf, df,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, token) AS rank
  FROM scored
)
WHERE rank <= 3
ORDER BY doc_id, rank
""".format(t=T.TOKENS_SQL.format(c="text")),
    category="text",
    description="Per-document keyword extraction: top-3 tokens by tf-idf "
    "(idf as the exact rational N/df — no log, so the ranking is "
    "bit-deterministic across engines; ties broken lexically). One "
    "token-explode, tf and df as two groupBys, score map-side, "
    "distributed per-doc top-k window — the keyword/tag stage of a "
    "corpus-enrichment pipeline.",
)
def text_keyword_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NO spread here (round-12 A/B: 1.3 s spread vs 1.0 s unspread):
    # aggregation-shaped — the tf/df groupBys parallelize the heavy part
    # and the added exchange costs more than the serial tokenize
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df_ = toks.groupBy("token").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    n_docs = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs")).withColumn(
        "_k", F.lit(1)
    )
    scored = (
        tf.join(df_, "token")
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(n_docs), "_k")
        .withColumn(
            "score",
            (F.col("tf") * F.col("n_docs")).cast("double")
            / F.col("df").cast("double"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "token", "tf", "df")
        .orderBy("doc_id", "rank")
    )


@register(
    "sample_curriculum_order",
    oracle="""
WITH q AS (
  SELECT doc_id, quality_score FROM (
    SELECT doc_id, {q}
    FROM documents
  )
),
phased AS (
  SELECT doc_id,
         NTILE(4) OVER (ORDER BY quality_score DESC, doc_id) AS phase
  FROM q
)
SELECT doc_id, CAST(phase AS INTEGER) AS phase,
       CAST(ROW_NUMBER() OVER (PARTITION BY phase ORDER BY {h}, doc_id)
            AS BIGINT) AS ord
FROM phased
ORDER BY phase, ord
""".format(
        q=T.QUALITY_SQL.format(c="text").split("AS n_chars,")[-1]
        .rsplit("AS quality_score", 1)[0]
        + "AS quality_score",
        h=T.hash64_sql("concat('cur:', CAST(doc_id AS VARCHAR))"),
    ),
    category="sampling",
    description="Curriculum ordering: documents split into 4 quality "
    "phases (highest first — exact NTILE semantics), shuffled WITHIN "
    "each phase by salted hash so every epoch of a phase is internally "
    "unordered but reproducible. The easy-to-hard schedule curriculum "
    "training consumes. Scale shape: NO unpartitioned window — the "
    "global quality rank is bucketed_row_number over approx-percentile "
    "score buckets (one parallel shuffle + a 1-row broadcast), the "
    "NTILE bucket is closed-form from (rank, n), and the within-phase "
    "ordinal is bucketed_row_number over equal-width hash buckets.",
)
def sample_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    q = d.select(
        "doc_id", T.quality_features(F.col("text"))["quality_score"].alias(
            "quality_score"
        )
    ).withColumn("_neg", -F.col("quality_score"))
    # one 1-row broadcast carries n AND the 31 approx score cutpoints;
    # cutpoint accuracy only affects bucket BALANCE, never the ordinal
    stats = q.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.percentile_approx(
            "_neg", [i / 32.0 for i in range(1, 32)], 1000
        ).alias("_cuts"),
    ).withColumn("_k", F.lit(1))
    qs = q.withColumn("_k", F.lit(1)).join(F.broadcast(stats), "_k")
    # evaluate the bucket once and project the 31-double cutpoint array
    # away BEFORE the rank exchange (guide §2.3, the rfm_segments cut)
    qs = qs.select(
        "doc_id",
        "_neg",
        "_n",
        F.size(F.filter(F.col("_cuts"), lambda c: c < F.col("_neg"))).alias(
            "_sb"
        ),
    )
    ranked = SA.bucketed_row_number(
        qs,
        [],
        F.col("_sb"),
        [F.col("_neg").asc(), F.col("doc_id").asc()],
        "_grank",
    )
    # exact NTILE(4): the first n%4 tiles hold n//4+1 rows, the rest n//4
    n, r = F.col("_n"), F.col("_grank")
    tile_q = F.floor(n / 4).cast("long")
    rem = (n % 4).cast("long")
    head = rem * (tile_q + 1)
    phase = F.when(
        r <= head, F.floor((r - 1) / (tile_q + 1)) + 1
    ).otherwise(
        rem + F.floor((r - head - 1) / F.greatest(tile_q, F.lit(1))) + 1
    )
    h = T.hash64(F.concat(F.lit("cur:"), F.col("doc_id").cast("string")))
    phased = ranked.select(
        "doc_id", phase.cast("int").alias("phase")
    ).withColumn("_h", h)
    # hash64 is uniform over [0, 2^60): 32 equal-width buckets need no
    # sampling pass — floor(h / 2^55) is monotone in the order key
    out = SA.bucketed_row_number(
        phased,
        ["phase"],
        F.floor(F.col("_h") / F.lit(2 ** 55)).cast("int"),
        [F.col("_h").asc(), F.col("doc_id").asc()],
        "ord",
    )
    return out.select("doc_id", "phase", "ord").orderBy("phase", "ord")


@register(
    "cdc_outbox_route",
    oracle="""
SELECT 'outbox.' || event_type AS topic,
       CAST(user_id AS VARCHAR) AS key,
       CAST(event_id AS BIGINT) AS event_id,
       props AS payload
FROM events
WHERE event_type IN ('click', 'purchase')
ORDER BY topic, event_id
""",
    category="cdc",
    description="Transactional-outbox relay (the Debezium outbox SMT "
    "pattern the reference's users pair with CDC): outbox rows route to "
    "'outbox.<aggregate_type>' keyed by aggregate id, payload passed "
    "through opaque, unrouted aggregate types filtered map-side. Pure "
    "projection + pushed filter — the CDC envelope's routing tier "
    "applied to the outbox shape.",
)
def cdc_outbox_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .select(
            F.concat(F.lit("outbox."), F.col("event_type")).alias("topic"),
            F.col("user_id").cast("string").alias("key"),
            F.col("event_id").cast("long").alias("event_id"),
            F.col("props").alias("payload"),
        )
        .orderBy("topic", "event_id")
    )


@register(
    "dedup_containment_pairs",
    oracle=DD.ngram_containment_pairs_sql(threshold=0.5, max_df=64),
    category="dedup",
    description="Asymmetric near-dup by n-gram CONTAINMENT (shared / "
    "min(|A|,|B|)) — catches the quote/snippet shape Jaccard structurally "
    "misses: a small doc fully embedded in a large one scores J≈|A|/|B| "
    "but containment 1.0 (Broder's resemblance-vs-containment). Same "
    "inverted-index candidates, max_df valve, and merge/shuffle_hash "
    "contract as the Jaccard form; only the denominator changes.",
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load_table(spark, sf_dir, "documents")
    n = raw.count()  # footer-only metadata job
    d = spread_small_scan(raw)
    # same persist valve as dedup_ngram_jaccard (round-12 A/B at 5k docs:
    # 1.69 → 1.09 s, bit-identical)
    return DD.ngram_containment_pairs(
        d, threshold=0.5, max_df=64, persist=n > 100_000
    ).orderBy("doc_a", "doc_b")


@register(
    "ts_ohlc_bars",
    oracle="""
WITH ranked AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) AS bucket,
         value, event_id,
         ROW_NUMBER() OVER (PARTITION BY event_type, time_bucket(INTERVAL '1 hour', ts)
                            ORDER BY ts, event_id) AS rn_first,
         ROW_NUMBER() OVER (PARTITION BY event_type, time_bucket(INTERVAL '1 hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_last
  FROM events
)
SELECT event_type, bucket,
       MAX(CASE WHEN rn_first = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_last = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS volume
FROM ranked
GROUP BY event_type, bucket
ORDER BY event_type, bucket
""",
    category="timeseries",
    description="OHLC bars (open-high-low-close candlesticks) per "
    "(series, 1-hour bucket) — the order-sensitive rollup TimescaleDB "
    "users build with first()/last(). Open/close are exact (rank within "
    "the bucket, event_id tie-break — no struct-arg_min dependence); one "
    "window shuffle keyed by (series, bucket), aggregation reuses the "
    "same clustering so nothing re-shuffles; bars are mergeable partials "
    "for any coarser resolution.",
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = TS.bucket(F.col("ts"), 3600)
    w = Window.partitionBy("event_type", "bucket")
    d = (
        ev.withColumn("bucket", bucket)
        .withColumn(
            "rn_first",
            F.row_number().over(w.orderBy(F.col("ts"), F.col("event_id"))),
        )
        .withColumn(
            "rn_last",
            F.row_number().over(
                w.orderBy(F.col("ts").desc(), F.col("event_id").desc())
            ),
        )
    )
    return (
        d.groupBy("event_type", "bucket")
        .agg(
            F.max(F.when(F.col("rn_first") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_last") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).cast("long").alias("n"),
            _dsum(F.col("value")).alias("volume"),
        )
        .orderBy("event_type", "bucket")
    )


@register(
    "cdc_replay_point_in_time",
    oracle=f"""
WITH changelog AS ({_ORDERS_CHANGELOG_SQL}),
ranked AS (
  SELECT pk, op, price,
         ROW_NUMBER() OVER (PARTITION BY pk ORDER BY lsn DESC) AS rn
  FROM changelog
  WHERE lsn <= 1
)
SELECT pk, op AS last_op, price
FROM ranked
WHERE rn = 1 AND op <> 'DELETE'
ORDER BY pk
""",
    category="cdc",
    description="Point-in-time replay (time travel): re-materialize the "
    "table AS OF an LSN cutoff by replaying only changelog events with "
    "lsn <= L through the same LWW fold — the recovery/debug operation a "
    "CDC changelog exists to make possible (and the batch twin of "
    "restarting a stream from an old checkpoint). Cutoff 1 = after the "
    "update wave, before the deletes: deleted keys are still live with "
    "their updated prices. Same single pk-window shuffle as "
    "cdc_lww_materialize; the cutoff filter prunes before the shuffle.",
)
def cdc_replay_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = _orders_changelog_spark(spark, sf_dir).filter(F.col("lsn") <= 1)
    w = Window.partitionBy("pk").orderBy(F.col("lsn").desc())
    return (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "DELETE"))
        .select("pk", F.col("op").alias("last_op"), "price")
        .orderBy("pk")
    )


@register(
    "sample_temperature_mixture",
    oracle="""
WITH banded AS (
  SELECT doc_id,
         CASE WHEN n_chars < 350 THEN 'short'
              WHEN n_chars < 450 THEN 'mid'
              WHEN n_chars < 550 THEN 'long'
              ELSE 'xl' END AS band
  FROM documents
),
counts AS (
  SELECT band, CAST(COUNT(*) AS BIGINT) AS n_d FROM banded GROUP BY band
),
flat AS (
  SELECT band, n_d,
         SQRT(CAST((SELECT MIN(n_d) FROM counts) AS DOUBLE)
              / CAST(n_d AS DOUBLE)) AS keep_frac
  FROM counts
)
SELECT b.doc_id, b.band, f.n_d,
       CAST(FLOOR(f.keep_frac * 1000000) AS BIGINT) AS keep_ppm
FROM banded b JOIN flat f USING (band)
WHERE CAST(concat('0x', substr(md5(concat('temp:', CAST(b.doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
      % 1000000 < CAST(FLOOR(f.keep_frac * 1000000) AS BIGINT)
ORDER BY b.doc_id
""",
    category="sampling",
    description="Temperature-flattened source mixture (the multilingual/"
    "multi-source rebalance of mT5/XLM-R style recipes, tau=0.5): each "
    "source keeps a sqrt(n_min/n_d) fraction, shrinking dominant sources "
    "toward the smallest one; selection is the deterministic keyed-hash "
    "Bernoulli draw, so the sample is reproducible and append-stable. "
    "Exactness: keep_frac = sqrt of an integer ratio — one IEEE "
    "division + sqrt, bit-identical in both engines; the threshold "
    "floors to ppm. One tiny per-source count aggregate broadcasts; "
    "selection itself is map-side.",
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("n_chars") < 350, "short")
        .when(F.col("n_chars") < 450, "mid")
        .when(F.col("n_chars") < 550, "long")
        .otherwise("xl")
        .alias("band"),
    )
    counts = d.groupBy("band").agg(F.count(F.lit(1)).cast("long").alias("n_d"))
    n_min = counts.agg(F.min("n_d").alias("n_min")).withColumn("_k", F.lit(1))
    flat = (
        counts.withColumn("_k", F.lit(1))
        .join(F.broadcast(n_min), "_k")
        .withColumn(
            "keep_ppm",
            F.floor(
                F.sqrt(
                    F.col("n_min").cast("double") / F.col("n_d").cast("double")
                )
                * 1_000_000
            ).cast("long"),
        )
        .select("band", "n_d", "keep_ppm")
    )
    h = T.hash64(F.concat(F.lit("temp:"), F.col("doc_id").cast("string")))
    return (
        d.join(F.broadcast(flat), "band")
        .filter(h % 1_000_000 < F.col("keep_ppm"))
        .select("doc_id", "band", "n_d", "keep_ppm")
        .orderBy("doc_id")
    )


@register(
    "join_pit_scd2",
    oracle=f"""
WITH changelog AS ({_ORDERS_CHANGELOG_SQL}),
scd2 AS (
  SELECT pk, op, price,
         lsn AS valid_from,
         LEAD(lsn) OVER (PARTITION BY pk ORDER BY lsn) AS valid_to
  FROM changelog
),
fact AS (
  SELECT l_orderkey, l_linenumber, l_linenumber % 3 AS as_of_lsn
  FROM lineitem WHERE l_orderkey % 100 = 0
)
SELECT f.l_orderkey, f.l_linenumber, CAST(f.as_of_lsn AS BIGINT) AS as_of_lsn,
       s.price AS version_price, s.op AS version_op
FROM fact f JOIN scd2 s
  ON f.l_orderkey = s.pk
 AND s.valid_from <= f.as_of_lsn
 AND (s.valid_to IS NULL OR f.as_of_lsn < s.valid_to)
WHERE s.op <> 'DELETE'
ORDER BY l_orderkey, l_linenumber
""",
    category="join",
    description="Point-in-time (PIT) join against an SCD2 dimension: each "
    "fact row looks up the dimension version VALID AT its own as-of "
    "position (valid_from <= as_of < valid_to, open-ended current "
    "versions included, deleted-at-that-point keys dropped) — the "
    "training-data join that prevents feature leakage (a fact must never "
    "see a future dimension state). Plan shape: pk EQUALITY drives the "
    "join (hash/SMJ family), the validity range is a residual filter — "
    "never a range-only cross product; the SCD2 side is one pk-window "
    "pass over the changelog.",
)
def join_pit_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = _orders_changelog_spark(spark, sf_dir)
    w = Window.partitionBy("pk").orderBy("lsn")
    scd2 = log.select(
        "pk", "op", "price",
        F.col("lsn").alias("valid_from"),
        F.lead("lsn").over(w).alias("valid_to"),
    )
    fact = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select(
            "l_orderkey", "l_linenumber",
            (F.col("l_linenumber") % 3).cast("long").alias("as_of_lsn"),
        )
    )
    joined = fact.join(
        scd2,
        (fact.l_orderkey == scd2.pk)
        & (scd2.valid_from <= fact.as_of_lsn)
        & (scd2.valid_to.isNull() | (fact.as_of_lsn < scd2.valid_to)),
    ).filter(F.col("op") != "DELETE")
    return joined.select(
        "l_orderkey", "l_linenumber", "as_of_lsn",
        F.col("price").alias("version_price"),
        F.col("op").alias("version_op"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "window_gaps_islands_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
  FROM events WHERE user_id % 20 = 0
),
anchored AS (
  SELECT user_id, d,
         d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                  AS INTEGER) AS island
  FROM days
)
SELECT user_id, CAST(MIN(d) AS VARCHAR) AS streak_start,
       CAST(MAX(d) AS VARCHAR) AS streak_end,
       CAST(COUNT(*) AS BIGINT) AS streak_days
FROM anchored
GROUP BY user_id, island
ORDER BY user_id, streak_start
""",
    category="window",
    description="Gaps-and-islands consecutive-day streaks (the classic "
    "Tabibitosan date - row_number anchor): distinct active days per "
    "user collapse into maximal consecutive runs. One per-user window "
    "shuffle; the island grouping reuses the same clustering. The "
    "id-free twin of ts_sessionize_gaps (calendar adjacency instead of "
    "a time gap).",
)
def window_gaps_islands_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 0)
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    anchored = days.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    return (
        anchored.groupBy("user_id", "island")
        .agg(
            F.min("d").cast("string").alias("streak_start"),
            F.max("d").cast("string").alias("streak_end"),
            F.count(F.lit(1)).cast("long").alias("streak_days"),
        )
        .drop("island")
        .orderBy("user_id", "streak_start")
    )


@register(
    "agg_weighted_median",
    oracle="""
WITH ordered AS (
  SELECT l_returnflag,
         l_extendedprice,
         CAST(l_quantity AS BIGINT) AS wt,
         CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_wt,
         CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_returnflag) AS BIGINT) AS total_wt
  FROM lineitem
)
SELECT l_returnflag,
       MIN(l_extendedprice) AS weighted_median,
       MIN(total_wt) AS total_weight
FROM ordered
WHERE 2 * cum_wt >= total_wt
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    category="aggregation",
    description="Weighted median (quantity-weighted price per return "
    "flag): inclusive cumulative weight over a TOTAL order (price, "
    "orderkey, linenumber tie-break — engine-independent), first row "
    "crossing half the group's weight wins. Integer weights keep the "
    "threshold comparison exact in both engines. Scale shape: the flag "
    "has only 3 values, so a plain per-flag window would drag the corpus "
    "through 3 tasks — the running weight is bucketed_running_sum over "
    "approx price cuts instead (parallel window + broadcast per-bucket "
    "offsets; cut accuracy affects balance only, never the sum). The "
    "weighted form none of the built-in percentile aggregates cover.",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    # three consumers (percentile cuts, the staged window, totals) each
    # re-scanned the single-row-group fixture serially; one keyed spread
    # of the 5-column projection canonicalizes identically under all
    # three, so ReuseExchange decodes the corpus ONCE and every branch —
    # including the percentile_approx partials — reads it 32-wide.
    # Cut values may shift with partial-merge order; bucket ids stay
    # monotone in price for ANY cuts, so the decomposed running sum (and
    # the result) is unchanged — only balance moves.
    li = spread_small_scan(
        load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag",
            "l_extendedprice",
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("long").alias("wt"),
        ),
        key_cols=("l_orderkey", "l_linenumber"),
    )
    # accuracy 1000 (round 12, applied to every bucketed-decomposition
    # site): cuts only set bucket BALANCE — the decomposed running sum is
    # exact for ANY monotone bucketing — and the 10000-accuracy sketch
    # cost 2.2 vs 1.9 s warm (11 vs 2.5 s cold) for ±0.1% balance nobody
    # can observe in the result
    stats = li.agg(
        F.percentile_approx(
            "l_extendedprice", [i / 32.0 for i in range(1, 32)], 1000
        ).alias("_cuts")
    ).withColumn("_k", F.lit(1))
    staged = li.withColumn("_k", F.lit(1)).join(F.broadcast(stats), "_k")
    # bucket evaluated once, cutpoint array projected off the running-sum
    # exchange (guide §2.3, the rfm_segments cut)
    staged = staged.withColumn(
        "_b",
        F.size(F.filter(F.col("_cuts"), lambda c: c < F.col("l_extendedprice"))),
    ).drop("_cuts", "_k")
    # total_wt rides the running sum's own bounded bucket panel (sum of
    # the per-bucket sums per flag) — the third corpus pass the separate
    # groupBy totals paid is gone (round 12, guide §2.4)
    cum = SA.bucketed_running_sum(
        staged,
        ["l_returnflag"],
        F.col("_b"),
        [
            F.col("l_extendedprice").asc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        ],
        F.col("wt"),
        "cum_wt",
        total_name="_twt",
    )
    return (
        cum.withColumn("total_wt", F.col("_twt").cast("long"))
        .filter(2 * F.col("cum_wt") >= F.col("total_wt"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("weighted_median"),
            F.min("total_wt").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "quality_length_outliers_iqr",
    oracle="""
WITH ranked AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM documents
),
quartiles AS (
  SELECT source,
         MIN(n) AS n,
         MIN(CASE WHEN rn = CAST(CEIL(0.25 * n) AS BIGINT) THEN n_chars END) AS q1,
         MIN(CASE WHEN rn = CAST(CEIL(0.75 * n) AS BIGINT) THEN n_chars END) AS q3
  FROM ranked
  GROUP BY source
)
SELECT r.source,
       MIN(q.q1) AS q1, MIN(q.q3) AS q3,
       CAST(SUM(CASE WHEN 2 * r.n_chars < 5 * q.q1 - 3 * q.q3 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_low,
       CAST(SUM(CASE WHEN 2 * r.n_chars > 5 * q.q3 - 3 * q.q1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_high
FROM ranked r JOIN quartiles q USING (source)
GROUP BY r.source
ORDER BY r.source
""",
    category="quality",
    description="IQR outlier fences per source (Tukey 1.5*IQR on doc "
    "length): quartiles are EXACT order statistics (rank = ceil(q*n) — "
    "no interpolation, engine-identical), and the fence comparisons are "
    "rearranged to INTEGER arithmetic (2x < 5*q1 - 3*q3 is x < q1 - "
    "1.5*(q3-q1) cleared of fractions) so no float ever enters. Per-"
    "source rank window + a broadcastable per-source quartile table.",
)
def quality_length_outliers_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "source", "n_chars", "doc_id"
    )
    stats = d.agg(
        F.percentile_approx(
            "n_chars", [i / 32.0 for i in range(1, 32)], 1000
        ).alias("_cuts")
    ).withColumn("_k", F.lit(1))
    staged = d.withColumn("_k", F.lit(1)).join(F.broadcast(stats), "_k")
    bucket = F.size(F.filter(F.col("_cuts"), lambda c: c < F.col("n_chars")))
    ranked = SA.bucketed_row_number(
        staged,
        ["source"],
        bucket,
        [F.col("n_chars").asc(), F.col("doc_id").asc()],
        "rn",
    ).drop("_cuts", "_k")
    ns = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranked = ranked.join(F.broadcast(ns), "source")
    quartiles = ranked.groupBy("source").agg(
        F.min("n").alias("n"),
        F.min(
            F.when(
                F.col("rn") == F.ceil(0.25 * F.col("n")).cast("long"),
                F.col("n_chars"),
            )
        ).alias("q1"),
        F.min(
            F.when(
                F.col("rn") == F.ceil(0.75 * F.col("n")).cast("long"),
                F.col("n_chars"),
            )
        ).alias("q3"),
    )
    joined = ranked.join(F.broadcast(quartiles.drop("n")), "source")
    return (
        joined.groupBy("source")
        .agg(
            F.min("q1").alias("q1"),
            F.min("q3").alias("q3"),
            F.sum(
                F.when(
                    2 * F.col("n_chars") < 5 * F.col("q1") - 3 * F.col("q3"), 1
                ).otherwise(0)
            ).cast("long").alias("n_low"),
            F.sum(
                F.when(
                    2 * F.col("n_chars") > 5 * F.col("q3") - 3 * F.col("q1"), 1
                ).otherwise(0)
            ).cast("long").alias("n_high"),
        )
        .orderBy("source")
    )


@register(
    "sim_lsh_recall_eval",
    oracle=f"""
WITH exact AS ({SIM.cosine_topk_sql(k=5, query_pred="vec_id < 8")}),
approx AS ({SIM.lsh_cosine_topk_sql(dim=64, k=5, planes=4, query_pred="vec_id < 8")})
SELECT e.query_id,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       CAST(COUNT(*) AS BIGINT) AS k,
       CAST(FLOOR(1000000.0 * SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                  / COUNT(*)) AS BIGINT) AS recall_ppm
FROM exact e LEFT JOIN approx a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id
ORDER BY e.query_id
""",
    category="similarity",
    description="ANN quality evaluation: recall@5 of the sign-LSH tier "
    "against the exact cosine ground truth, per query — the measurement "
    "that decides whether an approximate index is usable BEFORE swapping "
    "it into a pipeline (and the oracle proves the whole evaluation "
    "composes from the same two operators it grades). Left join on "
    "(query, neighbor) + one tiny per-query aggregate; both inputs are "
    "the existing scale-safe top-k plans.",
)
def sim_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8).limit(8)  # limit == no-op bound on the unique-key filter (plan-gate proof)
    # ONE keyed corpus spread feeds both tiers (round 12): the exact and
    # LSH scorers each fused their per-vector decimal work into the
    # serial scan task; the shared exchange also dedups the corpus decode
    # across the two branches. No-op at real splits.
    c = spread_small_scan(e, key_cols=("vec_id",))
    exact = SIM.cosine_topk(q, c, k=5).select("query_id", "neighbor_id")
    approx = (
        SIM.lsh_cosine_topk(q, c, dim=64, k=5, planes=4)
        .select("query_id", "neighbor_id")
        .withColumnRenamed("neighbor_id", "a_neighbor")
        .withColumnRenamed("query_id", "a_query")
    )
    joined = exact.join(
        approx,
        (exact.query_id == approx.a_query)
        & (exact.neighbor_id == approx.a_neighbor),
        "left",
    )
    hits = F.sum(
        F.when(F.col("a_neighbor").isNotNull(), 1).otherwise(0)
    ).cast("long")
    return (
        joined.groupBy("query_id")
        .agg(
            hits.alias("hits"),
            F.count(F.lit(1)).cast("long").alias("k"),
            F.floor(
                1_000_000.0
                * F.sum(
                    F.when(F.col("a_neighbor").isNotNull(), 1).otherwise(0)
                )
                / F.count(F.lit(1))
            ).cast("long").alias("recall_ppm"),
        )
        .orderBy("query_id")
    )


@register(
    "text_token_diversity",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, UNNEST({T.TOKENS_SQL.format(c="text")}) AS tok
  FROM documents
),
counts AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY doc_id, tok
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(CASE WHEN SUM(c) > 1
            THEN (1000000 * SUM(c * (c - 1))) // (SUM(c) * (SUM(c) - 1))
            ELSE 0 END AS BIGINT) AS simpson_ppm
FROM counts
GROUP BY doc_id
ORDER BY doc_id
""",
    category="text",
    description="Lexical diversity per document: type count and the "
    "Simpson repeat-concentration index sum c(c-1)/(n(n-1)) — the "
    "probability two random token draws coincide; high values flag "
    "degenerate/template text the way repetition filters do, but in one "
    "closed-form statistic. ALL-INTEGER arithmetic (ppm via integer "
    "division) — bit-identical across engines, no entropy logs needed. "
    "One explode + two partial+final aggregates, map-side combinable.",
)
def text_token_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    counts = (
        d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    agg = counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("_num"),
    )
    # integer `div` on both engines: float ppm would round differently
    # at the boundary (caught by the oracle on first run)
    return (
        agg.withColumn(
            "simpson_ppm",
            F.expr(
                "CASE WHEN n_tokens > 1 THEN (1000000 * _num) div "
                "(n_tokens * (n_tokens - 1)) ELSE 0 END"
            ).cast("long"),
        )
        .drop("_num")
        .orderBy("doc_id")
    )


@register(
    "join_interval_overlap",
    oracle="""
WITH a AS (
  SELECT o_orderkey AS a_id,
         CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS a_lo,
         CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) + 7 AS a_hi
  FROM orders WHERE o_orderkey % 199 = 0
),
b AS (
  SELECT l_orderkey AS b_id, CAST(l_linenumber AS BIGINT) AS b_line,
         CAST(date_diff('day', DATE '1970-01-01', l_shipdate) AS BIGINT) AS b_lo,
         CAST(date_diff('day', DATE '1970-01-01', l_shipdate) AS BIGINT)
           + (CAST(l_linenumber AS BIGINT) % 10) + 1 AS b_hi
  FROM lineitem WHERE l_orderkey % 499 = 0
)
SELECT a.a_id, b.b_id, b.b_line, a.a_lo, a.a_hi, b.b_lo, b.b_hi
FROM a JOIN b ON a.a_lo <= b.b_hi AND b.b_lo <= a.a_hi
ORDER BY a_id, b_id, b_line
""",
    category="join",
    description="Interval-OVERLAP join (A.lo <= B.hi AND B.lo <= A.hi) "
    "between two interval sets with NO equi key — order fulfilment "
    "windows x lineitem shipping spans (shipdate + 1..10 days). Binned "
    "to 7-day buckets: "
    "both sides replicate over their covered buckets and each pair "
    "counts exactly once in the bucket holding the overlap's left edge "
    "(dedup-free guard, no DISTINCT). The oracle is the naive theta "
    "join; the engine plan is a bucket equi-join — never a cartesian.",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    epoch = F.lit("1970-01-01")
    a = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 199 == 0)
        .select(
            F.col("o_orderkey").alias("a_id"),
            F.datediff(F.col("o_orderdate"), epoch).cast("long").alias("a_lo"),
            (F.datediff(F.col("o_orderdate"), epoch) + 7)
            .cast("long").alias("a_hi"),
        )
    )
    b = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 499 == 0)
        .select(
            F.col("l_orderkey").alias("b_id"),
            F.col("l_linenumber").cast("long").alias("b_line"),
            F.datediff(F.col("l_shipdate"), epoch).cast("long").alias("b_lo"),
            (
                F.datediff(F.col("l_shipdate"), epoch).cast("long")
                + (F.col("l_linenumber").cast("long") % 10)
                + 1
            ).alias("b_hi"),
        )
    )
    joined = RJ.interval_overlap_join(
        a, b, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=7
    )
    return joined.select(
        "a_id", "b_id", "b_line", "a_lo", "a_hi", "b_lo", "b_hi"
    ).orderBy("a_id", "b_id", "b_line")


@register(
    "agg_mode_deterministic",
    oracle="""
WITH counts AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem
  GROUP BY l_returnflag, l_linestatus, qty
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
                               ORDER BY cnt DESC, qty) AS rn
  FROM counts
)
SELECT l_returnflag, l_linestatus, qty AS mode_qty, cnt AS mode_count
FROM ranked WHERE rn = 1
ORDER BY l_returnflag, l_linestatus
""",
    category="aggregation",
    description="Statistical MODE per group with a deterministic "
    "tie-break (smallest value wins among equal counts — built-in "
    "mode() is engine/shuffle-order-dependent on ties, so it can never "
    "be oracle-checked). Two partial+final aggregates; the rank window "
    "runs over the (group, value) COUNT table, whose size is bounded by "
    "the value domain (50 quantities x 6 flag/status groups), never by "
    "corpus rows.",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    counts = (
        li.groupBy(
            "l_returnflag", "l_linestatus",
            F.col("l_quantity").cast("long").alias("qty"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("l_returnflag", "l_linestatus").orderBy(
        F.col("cnt").desc(), F.col("qty")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag", "l_linestatus",
            F.col("qty").alias("mode_qty"),
            F.col("cnt").alias("mode_count"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_CUSUM_INNER = TS.cusum_sql(
    key_expr="event_type",
    ts_expr="day",
    value_expr="n",
    id_expr="day_id",
    ref_expr="ref",
    table="""(
  WITH daily AS (
    SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(epoch(time_bucket(INTERVAL '1 day', ts)) AS BIGINT) AS day_id
    FROM events GROUP BY 1, 2
  )
  SELECT d.*, (SUM(n) OVER (PARTITION BY event_type)
               // COUNT(*) OVER (PARTITION BY event_type)) + 1 AS ref
  FROM daily d
)""",
)


@register(
    "ts_cusum_drift",
    oracle=f"""
SELECT k AS event_type, ts AS day, x AS n, ref, cusum,
       (cusum > 5 * ref) AS drifted
FROM ({_CUSUM_INNER}) t
ORDER BY event_type, day
""",
    category="timeseries",
    description="CUSUM drift detection (Page's one-sided test) over "
    "per-type daily counts: S_t = max(0, S_t-1 + x_t - ref) with "
    "ref = floor(mean) + 1 per series — sustained rate excursions "
    "accumulate while noise resets to zero; drifted flags S > 5*ref. "
    "ALL-INTEGER order-sensitive fold (exact in both engines by "
    "construction, no float fractions needed) run as one ts-sorted "
    "array fold per bucketed series — the same state contract as "
    "EWMA/Holt; the oracle replays the identical fold as a recursive "
    "CTE.",
)
def ts_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("day_id", F.unix_timestamp("day").cast("long"))
    )
    # the ref window runs over the bounded per-type DAILY table
    # (days-per-series rows), not raw events
    daily = daily.withColumn(
        "ref",
        F.expr("sum(n) over (partition by event_type) div "
               "count(*) over (partition by event_type)") + 1,
    )
    out = TS.cusum(daily, "event_type", "day", "n", "day_id", "ref")
    return (
        out.select(
            "event_type",
            "day",
            F.col("n"),
            "ref",
            "cusum",
            (F.col("cusum") > 5 * F.col("ref")).alias("drifted"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "agg_hhi_concentration",
    oracle="""
WITH rev AS (
  SELECT n.n_name AS nation, s.s_suppkey,
         CAST(SUM(CAST(l.l_extendedprice * 100 AS DECIMAL(27,0))) AS BIGINT)
           AS cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY nation, s.s_suppkey
),
tot AS (
  SELECT nation, CAST(SUM(cents) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers
  FROM rev GROUP BY nation
)
SELECT r.nation, MIN(t.n_suppliers) AS n_suppliers,
       CAST(SUM(((10000 * r.cents) // t.total)
                * ((10000 * r.cents) // t.total)) AS BIGINT) AS hhi
FROM rev r JOIN tot t USING (nation)
GROUP BY r.nation
ORDER BY r.nation
""",
    category="aggregation",
    description="Herfindahl-Hirschman market concentration per nation "
    "(sum of squared supplier revenue shares, the antitrust statistic): "
    "shares quantized to integer BASIS POINTS ((10000*cents) div total) "
    "before squaring, so the whole computation is int64 arithmetic — "
    "bit-identical across engines, no decimal-division divergence. Two "
    "partial+final aggregates over the supplier-revenue rollup; the "
    "per-nation totals table is bounded (25 nations) and broadcasts.",
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    rev = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("nation", "s_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * 100).cast("decimal(27,0)")
            ).cast("long").alias("cents")
        )
    )
    tot = rev.groupBy("nation").agg(
        F.sum("cents").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
    )
    joined = rev.join(F.broadcast(tot), "nation")
    share_bp = F.expr("(10000 * cents) div total")
    return (
        joined.groupBy("nation")
        .agg(
            F.min("n_suppliers").alias("n_suppliers"),
            F.sum(share_bp * share_bp).cast("long").alias("hhi"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# round 9 — analytics & curation additions
# ---------------------------------------------------------------------------


@register(
    "events_retention_cohorts",
    oracle="""
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week
  FROM events
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, activity_week) // 7 AS BIGINT) AS weeks_since,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM activity JOIN firsts USING (user_id)
GROUP BY cohort_week, weeks_since
ORDER BY cohort_week, weeks_since
""",
    category="analytics",
    description="Weekly cohort retention matrix over the events stream: "
    "users bucketed by first-seen week, distinct-user counts per "
    "(cohort, weeks-since). Two uniform user-keyed shuffles (first-seen "
    "agg + distinct activity weeks) then a small (cohorts x weeks) "
    "aggregate — the product-analytics staple, Monday-truncated weeks "
    "and integer week arithmetic identical in both engines.",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("activity_week")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            F.expr("datediff(activity_week, cohort_week) div 7")
            .cast("long")
            .alias("weeks_since"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("cohort_week", "weeks_since")
    )


@register(
    "join_market_basket_lift",
    oracle="""
WITH topk AS (
  SELECT l_partkey, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS cnt
  FROM lineitem GROUP BY l_partkey
  ORDER BY cnt DESC, l_partkey LIMIT 20
),
baskets AS (
  SELECT DISTINCT l.l_orderkey, l.l_partkey
  FROM lineitem l JOIN topk t ON l.l_partkey = t.l_partkey
),
n_orders AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(COUNT(*) AS BIGINT) AS co
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
)
SELECT part_a, part_b, co,
       ta.cnt AS cnt_a, tb.cnt AS cnt_b,
       CAST((1000000 * n_orders.n * co) // (ta.cnt * tb.cnt) AS BIGINT) AS lift_ppm
FROM pairs
JOIN topk ta ON ta.l_partkey = part_a
JOIN topk tb ON tb.l_partkey = part_b
CROSS JOIN n_orders
ORDER BY part_a, part_b
""",
    category="analytics",
    description="Market-basket pair lift restricted to the top-20 "
    "most-ordered parts: candidate pairs are bounded by K^2 and the "
    "per-order fanout by TPC-H's <=7 lines, never all-parts^2. The "
    "top-K table is TakeOrdered(20) and broadcasts; lift is exact "
    "integer ppm ((1e6*N*co) div (cnt_a*cnt_b) — headroom: N*co*1e6 "
    "< 2^63 through ~1B orders at co<=1e4).",
)
def join_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    topk = (
        li.groupBy("l_partkey")
        .agg(F.countDistinct("l_orderkey").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("l_partkey"))
        .limit(20)
    )
    baskets = li.join(
        F.broadcast(topk.select("l_partkey")), "l_partkey"
    ).distinct()
    n_orders = li.agg(
        F.countDistinct("l_orderkey").cast("long").alias("n")
    ).withColumn("_k", F.lit(1))
    pairs = (
        baskets.select(
            F.col("l_orderkey"), F.col("l_partkey").alias("part_a")
        )
        .join(
            baskets.select(
                F.col("l_orderkey"), F.col("l_partkey").alias("part_b")
            ),
            "l_orderkey",
        )
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("co"))
    )
    return (
        pairs.join(
            F.broadcast(
                topk.select(
                    F.col("l_partkey").alias("part_a"),
                    F.col("cnt").alias("cnt_a"),
                )
            ),
            "part_a",
        )
        .join(
            F.broadcast(
                topk.select(
                    F.col("l_partkey").alias("part_b"),
                    F.col("cnt").alias("cnt_b"),
                )
            ),
            "part_b",
        )
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(n_orders), "_k")
        .select(
            "part_a",
            "part_b",
            "co",
            "cnt_a",
            "cnt_b",
            F.expr("(1000000 * n * co) div (cnt_a * cnt_b)")
            .cast("long")
            .alias("lift_ppm"),
        )
        .orderBy("part_a", "part_b")
    )


@register(
    "text_ngram_novelty",
    oracle="""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct([COALESCE(array_to_string(list_filter(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ 	

]+'), t -> t != '')[i:i+2], ' '), '') for i in generate_series(1, greatest(len(list_filter(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ 	

]+'), t -> t != '')) - 2, 1))])) AS shingle FROM documents
),
firsts AS (
  SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
),
per_doc AS (
  SELECT sh.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_sh,
         CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS novel
  FROM sh JOIN firsts f ON sh.shingle = f.shingle
  GROUP BY sh.doc_id
),
docs AS (SELECT doc_id, source FROM documents)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(novel) AS BIGINT) AS novel_shingles,
       CAST(SUM(n_sh) AS BIGINT) AS total_shingles,
       CAST((1000000 * SUM(novel)) // SUM(n_sh) AS BIGINT) AS novelty_ppm
FROM per_doc JOIN docs USING (doc_id)
GROUP BY source
ORDER BY source
""",
    category="text",
    description="Corpus n-gram novelty per source: the fraction of each "
    "doc's shingles first introduced by that doc (min-doc_id "
    "first-occurrence over the inverted shingle index — the dedup "
    "index reused as a freshness signal; a crawl snowballing on "
    "boilerplate shows collapsing novelty). Two shingle/doc-keyed "
    "shuffles, integer ppm.",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    sh = DD.shingle_index(d, "text", "doc_id", 3)
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sh"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("novel"),
        )
    )
    return (
        per_doc.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("novel").cast("long").alias("novel_shingles"),
            F.sum("n_sh").cast("long").alias("total_shingles"),
        )
        .withColumn(
            "novelty_ppm",
            F.expr("(1000000 * novel_shingles) div total_shingles").cast(
                "long"
            ),
        )
        .orderBy("source")
    )


def _hourly_cents(ev: DataFrame) -> DataFrame:
    """Per (event_type, hour) integer-cent value sums — the bounded
    (types x hours) series the round-9 timeseries queries fold over.
    Aggregating FIRST is the scale posture: every window below runs on
    this aggregate, never on corpus rows."""
    return ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )


_HOURLY_CENTS_SQL = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY event_type, hour
"""


@register(
    "ts_autocorr_lag1",
    oracle=f"""
WITH hourly AS ({_HOURLY_CENTS_SQL}),
lagged AS (
  SELECT event_type, cents AS x,
         LAG(cents) OVER (PARTITION BY event_type ORDER BY hour) AS y
  FROM hourly
),
pairs AS (SELECT * FROM lagged WHERE y IS NOT NULL),
sums AS (
  SELECT event_type,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM pairs GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS autocorr
FROM sums
ORDER BY event_type
""",
    category="timeseries",
    description="Lag-1 autocorrelation of each event type's hourly value "
    "series: Pearson r over (x_t, x_t-1) pairs with every sum carried in "
    "exact integer arithmetic (decimal(38,0) / HUGEINT) so both engines "
    "divide the SAME integers — only the final r is a round-6 double. "
    "The window runs on the (types x hours) aggregate, never corpus rows.",
)
def ts_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _hourly_cents(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("event_type").orderBy("hour")
    pairs = (
        hourly.select(
            "event_type",
            F.col("cents").alias("x"),
            F.lag("cents").over(w).alias("y"),
        )
        .filter(F.col("y").isNotNull())
        .select(
            "event_type",
            F.col("x").cast("decimal(38,0)").alias("x"),
            F.col("y").cast("decimal(38,0)").alias("y"),
        )
    )
    sums = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.expr("x * y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.expr("x * x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.expr("y * y")).cast("decimal(38,0)").alias("syy"),
    )
    return sums.select(
        "event_type",
        F.col("n").cast("long").alias("n_pairs"),
        F.round(
            F.expr("cast(n * sxy - sx * sy as double)")
            / F.sqrt(
                F.expr("cast(n * sxx - sx * sx as double)")
                * F.expr("cast(n * syy - sy * sy as double)")
            ),
            6,
        ).alias("autocorr"),
    ).orderBy("event_type")


@register(
    "ts_drawdown_max",
    oracle=f"""
WITH hourly AS ({_HOURLY_CENTS_SQL}),
cum AS (
  SELECT event_type, hour,
         SUM(cents) OVER (PARTITION BY event_type ORDER BY hour
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS equity
  FROM hourly
),
dd AS (
  SELECT event_type, hour, equity,
         MAX(equity) OVER (PARTITION BY event_type ORDER BY hour
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM cum
)
SELECT event_type,
       CAST(MAX(peak - equity) AS BIGINT) AS max_drawdown_cents,
       CAST(MAX(peak) AS BIGINT) AS peak_cents
FROM dd GROUP BY event_type
ORDER BY event_type
""",
    category="timeseries",
    description="Maximum drawdown per event type over the cumulative "
    "hourly value curve (running peak minus current equity, maximized) — "
    "the risk statistic every monitoring stack wants. Pure integer-cent "
    "window folds over the bounded hourly aggregate.",
)
def ts_drawdown_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _hourly_cents(load_table(spark, sf_dir, "events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hourly.withColumn("equity", F.sum("cents").over(w))
    dd = cum.withColumn("peak", F.max("equity").over(w))
    return (
        dd.groupBy("event_type")
        .agg(
            F.max(F.col("peak") - F.col("equity"))
            .cast("long")
            .alias("max_drawdown_cents"),
            F.max("peak").cast("long").alias("peak_cents"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_bollinger_breakouts",
    oracle=f"""
WITH hourly AS ({_HOURLY_CENTS_SQL}),
roll AS (
  SELECT event_type, hour, cents,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(cents) OVER w AS BIGINT) AS s,
         CAST(SUM(CAST(cents AS HUGEINT) * cents) OVER w AS HUGEINT) AS s2
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
),
full_windows AS (SELECT * FROM roll WHERE n = 24)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN CAST(n * cents - s AS HUGEINT)
                          * CAST(n * cents - s AS HUGEINT)
                     > 4 * (n * s2 - CAST(s AS HUGEINT) * s)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_breakouts
FROM full_windows GROUP BY event_type
ORDER BY event_type
""",
    category="timeseries",
    description="Bollinger-band breakout detection WITHOUT a single "
    "floating-point operation: over a 24-hour rolling window, |x - mean| "
    "> 2*stddev is algebraically rearranged to (n*x - S)^2 > 4*(n*S2 - "
    "S^2) so the test is exact integer arithmetic (decimal(38,0) / "
    "HUGEINT) — no sqrt, no division, bit-identical across engines. "
    "ROWS-frame windows over the bounded hourly aggregate.",
)
def ts_bollinger_breakouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _hourly_cents(load_table(spark, sf_dir, "events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-23, Window.currentRow)
    )
    roll = hourly.select(
        "event_type",
        F.col("cents"),
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("cents").over(w).cast("long").alias("s"),
        F.sum(F.expr("cast(cents as decimal(38,0)) * cents"))
        .over(w)
        .cast("decimal(38,0)")
        .alias("s2"),
    ).filter(F.col("n") == 24)
    breakout = F.expr(
        "cast(n * cents - s as decimal(38,0)) * cast(n * cents - s as decimal(38,0))"
        " > 4 * (n * s2 - cast(s as decimal(38,0)) * s)"
    )
    return (
        roll.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum(F.when(breakout, 1).otherwise(0))
            .cast("long")
            .alias("n_breakouts"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_gini_customer_revenue",
    oracle="""
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(27,0))) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT n.n_name AS nation, cents,
         ROW_NUMBER() OVER (PARTITION BY n.n_name
                            ORDER BY cents, c.c_custkey) AS rk
  FROM cust
  JOIN customer c ON c.c_custkey = o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
),
sums AS (
  SELECT nation,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(cents AS HUGEINT)) AS HUGEINT) AS s,
         CAST(SUM(CAST(rk AS HUGEINT) * cents) AS HUGEINT) AS s1
  FROM ranked GROUP BY nation
)
SELECT nation, CAST(n AS BIGINT) AS n_customers,
       CAST((1000000 * (2 * s1 - (n + 1) * s)) // (n * s) AS BIGINT) AS gini_ppm
FROM sums
ORDER BY nation
""",
    category="aggregation",
    description="Gini coefficient of customer revenue per nation (the "
    "inequality statistic, exact integer ppm via the rank formula "
    "G = (2*SUM(i*x_i) - (n+1)*SUM(x)) / (n*SUM(x)) over ascending-"
    "revenue ranks). The rank is bucketed_row_number — broadcast "
    "percentile cutpoints + per-bucket local windows + cumulative "
    "offsets — so NO per-nation window ever drags the customer rollup "
    "through 25 tasks; all sums ride decimal(38,0)/HUGEINT.",
)
def agg_gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_pq_cdc_kafka_spark.operators import sampling as SA2

    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.sum((F.col("o_totalprice") * 100).cast("decimal(27,0)"))
        .cast("long")
        .alias("cents")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    rev = cust.join(c, cust.o_custkey == c.c_custkey).join(
        F.broadcast(nat), c.c_nationkey == nat.n_nationkey
    ).select("nation", "c_custkey", "cents")
    # global revenue cutpoints — bucket depends only on cents, so it is
    # monotone in the (cents, custkey) order within every nation
    stats = rev.agg(
        F.percentile_approx("cents", [i / 32.0 for i in range(1, 32)], 1000)
        .alias("_cuts")
    ).withColumn("_k", F.lit(1))
    staged = rev.withColumn("_k", F.lit(1)).join(F.broadcast(stats), "_k")
    bucket = F.size(F.filter(F.col("_cuts"), lambda ct: ct < F.col("cents")))
    ranked = SA2.bucketed_row_number(
        staged.withColumn("_b", bucket).drop("_k", "_cuts"),
        ["nation"],
        F.col("_b"),
        [F.col("cents").asc(), F.col("c_custkey").asc()],
        "rk",
    )
    sums = ranked.groupBy("nation").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).cast("decimal(38,0)").alias("s"),
        F.sum(F.expr("cast(rk as decimal(38,0)) * cents"))
        .cast("decimal(38,0)")
        .alias("s1"),
    )
    return sums.select(
        "nation",
        F.col("n").cast("long").alias("n_customers"),
        F.expr("(1000000 * (2 * s1 - (n + 1) * s)) div (n * s)")
        .cast("long")
        .alias("gini_ppm"),
    ).orderBy("nation")


@register(
    "emb_centroid_drift",
    oracle="""
WITH dims AS (
  SELECT label, CAST(vec_id % 2 AS BIGINT) AS parity, g.g AS dim,
         CAST(ROUND(embedding[g.g] * 1000000) AS BIGINT) AS q
  FROM embeddings, generate_series(1, 64) AS g(g)
),
sums AS (
  SELECT label, parity, dim,
         CAST(SUM(CAST(q AS HUGEINT)) AS HUGEINT) AS s,
         CAST(COUNT(*) AS HUGEINT) AS n
  FROM dims GROUP BY label, parity, dim
),
paired AS (
  SELECT e.label, e.dim,
         e.s AS se, e.n AS ne, o.s AS so, o.n AS no
  FROM sums e JOIN sums o
    ON e.label = o.label AND e.dim = o.dim
   AND e.parity = 0 AND o.parity = 1
),
terms AS (
  SELECT label, ne, no,
         (se * no - so * ne) * (se * no - so * ne) AS t2
  FROM paired
)
SELECT label, CAST(MIN(ne) AS BIGINT) AS n_even, CAST(MIN(no) AS BIGINT) AS n_odd,
       ROUND(SQRT(CAST(SUM(t2) AS DOUBLE)) / CAST(MIN(ne) * MIN(no) AS DOUBLE) / 1000000, 6)
         AS centroid_drift
FROM terms GROUP BY label
ORDER BY label
""",
    category="similarity",
    description="Per-label embedding centroid drift between the two "
    "deterministic vec_id-parity halves of the corpus — the batch-drift "
    "check a training pipeline runs before trusting new embeddings. "
    "Per-dim micro-unit integer sums (one explode + one aggregate); the "
    "L2 distance between centroids is assembled from exact integer "
    "cross-products ((Se*No - So*Ne)^2, decimal(38,0)/HUGEINT) so both "
    "engines sqrt the SAME integer — only the final value is a round-6 "
    "double. Map-side partials; output is labels-bounded.",
)
def emb_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "label",
        (F.col("vec_id") % 2).cast("long").alias("parity"),
        F.posexplode("embedding").alias("dim0", "x"),
    ).select(
        "label",
        "parity",
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("x").cast("double") * 1e6).cast("long").alias("q"),
    )
    sums = dims.groupBy("label", "parity", "dim").agg(
        F.sum(F.col("q").cast("decimal(38,0)")).cast("decimal(38,0)").alias("s"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
    )
    even = sums.filter(F.col("parity") == 0).select(
        "label", "dim", F.col("s").alias("se"), F.col("n").alias("ne")
    )
    odd = sums.filter(F.col("parity") == 1).select(
        "label", "dim", F.col("s").alias("so"), F.col("n").alias("no")
    )
    terms = even.join(odd, ["label", "dim"]).select(
        "label",
        "ne",
        "no",
        F.expr("(se * no - so * ne) * (se * no - so * ne)").alias("t2"),
    )
    return (
        terms.groupBy("label")
        .agg(
            F.min("ne").cast("long").alias("n_even"),
            F.min("no").cast("long").alias("n_odd"),
            F.round(
                F.sqrt(F.sum("t2").cast("double"))
                / F.expr("cast(min(ne) * min(no) as double)")
                / 1e6,
                6,
            ).alias("centroid_drift"),
        )
        .orderBy("label")
    )


@register(
    "window_moving_median",
    oracle=f"""
WITH hourly AS ({_HOURLY_CENTS_SQL})
SELECT event_type, hour,
       CAST(MEDIAN(cents) OVER (PARTITION BY event_type ORDER BY hour
                                ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS med12
FROM hourly
ORDER BY event_type, hour
""",
    category="window",
    description="Rolling 12-hour MEDIAN per event type — a HOLISTIC "
    "window aggregate Spark has no native frame function for: the frame "
    "is materialized with collect_list over a ROWS window (bounded at 12 "
    "elements by construction), sorted, and the midpoint interpolated "
    "exactly like SQL MEDIAN (mean of the two central values on even "
    "counts — exact in doubles since cents are integers). Runs on the "
    "bounded hourly aggregate, never corpus rows.",
)
def window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = _hourly_cents(load_table(spark, sf_dir, "events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-11, Window.currentRow)
    )
    frame = F.sort_array(F.collect_list("cents").over(w))
    n = F.size(frame)
    lo = F.element_at(frame, ((n + 1) / 2).cast("int"))
    hi = F.element_at(frame, (n / 2 + 1).cast("int"))
    return (
        hourly.select(
            "event_type",
            "hour",
            ((lo + hi) / 2.0).alias("med12"),
        )
        .orderBy("event_type", "hour")
    )


@register(
    "sample_balanced_downsample",
    oracle="""
WITH ranked AS (
  SELECT label, vec_id,
         ROW_NUMBER() OVER (PARTITION BY label
                            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
  FROM embeddings
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(vec_id) AS BIGINT) AS sum_ids
FROM ranked WHERE rk <= 40
GROUP BY label
ORDER BY label
""",
    category="sampling",
    description="Class-balanced downsample: keep EXACTLY min(40, n) "
    "vectors per label, chosen by deterministic md5 order so both "
    "engines keep the same rows. The per-label rank is "
    "bucketed_row_number over md5-prefix buckets (equal-width cuts on a "
    "uniform hash), so a 2-label corpus never drags through 2 tasks — "
    "the cap-exact twin of hash-fraction sampling (which cannot hit an "
    "exact per-class count).",
)
def sample_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_pq_cdc_kafka_spark.operators import sampling as SA2

    e = load_table(spark, sf_dir, "embeddings").select("label", "vec_id")
    h = F.md5(F.col("vec_id").cast("string"))
    staged = e.withColumn("_h", h).withColumn(
        "_b", F.conv(F.substring("_h", 1, 2), 16, 10).cast("int")
    )
    ranked = SA2.bucketed_row_number(
        staged,
        ["label"],
        F.col("_b"),
        [F.col("_h").asc(), F.col("vec_id").asc()],
        "rk",
    )
    return (
        ranked.filter(F.col("rk") <= 40)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("vec_id").cast("long").alias("sum_ids"),
        )
        .orderBy("label")
    )


@register(
    "ts_percent_change_wow",
    oracle="""
WITH weekly AS (
  SELECT event_type, date_trunc('week', ts) AS week,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, week
),
lagged AS (
  SELECT event_type, week, cents,
         LAG(cents) OVER (PARTITION BY event_type ORDER BY week) AS prev
  FROM weekly
)
SELECT event_type, week, cents, prev,
       CAST((10000 * (cents - prev)) // prev AS BIGINT) AS change_bp
FROM lagged WHERE prev IS NOT NULL AND prev > 0
ORDER BY event_type, week
""",
    category="timeseries",
    description="Week-over-week change per event type in integer BASIS "
    "POINTS ((10000*delta) div prev) — the KPI-dashboard staple with no "
    "float division anywhere. LAG over the bounded weekly aggregate.",
)
def ts_percent_change_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type", F.date_trunc("week", F.col("ts")).alias("week")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("week")
    lagged = weekly.withColumn("prev", F.lag("cents").over(w))
    return (
        lagged.filter(F.col("prev").isNotNull() & (F.col("prev") > 0))
        .select(
            "event_type",
            "week",
            "cents",
            "prev",
            F.expr("(10000 * (cents - prev)) div prev")
            .cast("long")
            .alias("change_bp"),
        )
        .orderBy("event_type", "week")
    )


@register(
    "events_power_users_pareto",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY user_id
),
ranked AS (
  SELECT user_id, cents,
         ROW_NUMBER() OVER (ORDER BY cents DESC, user_id) AS rk,
         SUM(cents) OVER (ORDER BY cents DESC, user_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM per_user
),
tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_users FROM per_user)
SELECT CAST(MIN(rk) AS BIGINT) AS users_to_80pct,
       CAST(MIN(n_users) AS BIGINT) AS n_users,
       CAST((1000000 * MIN(rk)) // MIN(n_users) AS BIGINT) AS user_share_ppm
FROM ranked, tot
WHERE 5 * cum >= 4 * total
""",
    category="analytics",
    description="Pareto concentration of the events stream: the minimal "
    "number of top users covering 80% of total value (5*cum >= 4*total "
    "— pure integer test). The GLOBAL descending cumulative sum is "
    "bucketed_running_sum over approx-percentile cutpoints, so no "
    "single-task global window touches the per-user rollup; the global "
    "rank is its weight-1 twin. Output is one row.",
)
def events_power_users_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_pq_cdc_kafka_spark.operators import sampling as SA2

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    stats = per_user.agg(
        F.percentile_approx("cents", [i / 32.0 for i in range(1, 32)], 1000)
        .alias("_cuts")
    ).withColumn("_k", F.lit(1))
    staged = per_user.withColumn("_k", F.lit(1)).join(F.broadcast(stats), "_k")
    # descending order: bucket by count of cuts ABOVE the value so the
    # bucket id is monotone nondecreasing in (cents DESC, user_id)
    bucket = F.size(F.filter(F.col("_cuts"), lambda ct: ct > F.col("cents")))
    staged = staged.withColumn("_b", bucket).drop("_k", "_cuts")
    # ONE fused bucketed pass (round 12): rank, running sum, grand total
    # and user count all ride the same local window + bounded bucket
    # panel — previously two full passes over staged re-joined on
    # user_id (a corpus-scale join) plus a third totals aggregate
    combined = SA2.bucketed_running_sum(
        staged, [], F.col("_b"),
        [F.col("cents").desc(), F.col("user_id").asc()],
        F.col("cents"), "cum",
        rank_name="rk", total_name="total", count_name="n_users",
    )
    return (
        combined
        .filter(5 * F.col("cum") >= 4 * F.col("total"))
        .agg(
            F.min("rk").cast("long").alias("users_to_80pct"),
            F.min("n_users").cast("long").alias("n_users"),
        )
        .withColumn(
            "user_share_ppm",
            F.expr("(1000000 * users_to_80pct) div n_users").cast("long"),
        )
    )


@register(
    "join_order_gaps",
    oracle="""
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day',
                   LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap_days
  FROM orders
),
cust AS (
  SELECT c_custkey, c_mktsegment FROM customer
)
SELECT c_mktsegment,
       CAST(COUNT(gap_days) AS BIGINT) AS n_gaps,
       CAST(SUM(gap_days) AS BIGINT) AS total_gap_days,
       CAST(SUM(gap_days) // COUNT(gap_days) AS BIGINT) AS mean_gap_days
FROM gaps JOIN cust ON c_custkey = o_custkey
WHERE gap_days IS NOT NULL
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    category="analytics",
    description="Inter-order gap analysis: days between successive "
    "orders per customer (LAG over uniform customer-keyed windows — "
    "millions of small partitions, the shape per-entity windows are "
    "FOR), rolled up to mean gap per market segment in integer days.",
)
def join_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return (
        gaps.join(cust, gaps.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("gap_days").cast("long").alias("n_gaps"),
            F.sum("gap_days").cast("long").alias("total_gap_days"),
        )
        .withColumn(
            "mean_gap_days",
            F.expr("total_gap_days div n_gaps").cast("long"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "text_entropy_by_source",
    oracle="""
WITH toks AS (
  SELECT source, UNNEST(list_filter(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ 	

]+'), t -> t != '')) AS tok
  FROM documents
),
counts AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY source, tok
),
terms AS (
  SELECT source, c,
         CAST(ROUND(1000000 * c * ln(c)) AS BIGINT) AS xlogx_micro
  FROM counts
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       ROUND(ln(SUM(c)) - CAST(SUM(xlogx_micro) AS DOUBLE) / 1000000.0
             / SUM(c), 6) AS entropy_nats
FROM terms GROUP BY source
ORDER BY source
""",
    category="text",
    description="Shannon entropy of the token distribution per source "
    "(H = ln(N) - sum(c*ln(c))/N) — the vocabulary-concentration signal "
    "next to Simpson diversity. Float sums are shuffle-order-dependent, "
    "so each c*ln(c) term is QUANTIZED to an integer micro-nat first "
    "(identical per-term doubles in both engines since c is an exact "
    "integer) and the sum rides int64 — the _dsum determinism trick "
    "extended to transcendental terms. One explode + two aggregates.",
)
def text_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "source", F.explode(T.tokens(F.col("text"))).alias("tok")
    )
    counts = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    terms = counts.select(
        "source",
        "c",
        F.round(1000000 * F.col("c") * F.log(F.col("c").cast("double")))
        .cast("long")
        .alias("xlogx_micro"),
    )
    return (
        terms.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum("xlogx_micro").cast("long").alias("_sx"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            F.round(
                F.log(F.col("n_tokens").cast("double"))
                - F.col("_sx").cast("double") / 1e6 / F.col("n_tokens"),
                6,
            ).alias("entropy_nats"),
        )
        .orderBy("source")
    )


@register(
    "text_hapax_ratio",
    oracle="""
WITH toks AS (
  SELECT source, UNNEST(list_filter(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[ 	

]+'), t -> t != '')) AS tok
  FROM documents
),
global_counts AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS gc FROM toks GROUP BY tok
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN gc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST((1000000 * SUM(CASE WHEN gc = 1 THEN 1 ELSE 0 END)) // COUNT(*)
            AS BIGINT) AS hapax_ppm
FROM toks JOIN global_counts USING (tok)
GROUP BY source
ORDER BY source
""",
    category="text",
    description="Hapax legomenon rate per source: the share of token "
    "occurrences whose token appears exactly ONCE in the whole corpus — "
    "high hapax = fresh/long-tail vocabulary, near-zero = template spam "
    "(the token-level twin of n-gram novelty). One token-keyed census "
    "joined back to the exploded stream; integer ppm.",
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "source", F.explode(T.tokens(F.col("text"))).alias("tok")
    )
    gc = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("gc"))
    return (
        toks.join(gc, "tok")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("gc") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_hapax"),
        )
        .withColumn(
            "hapax_ppm",
            F.expr("(1000000 * n_hapax) div n_tokens").cast("long"),
        )
        .orderBy("source")
    )


@register(
    "ts_weekday_hour_profile",
    oracle="""
WITH cells AS (
  SELECT event_type,
         CAST(isodow(ts) - 1 AS BIGINT) AS dow,
         CAST(hour(ts) AS BIGINT) AS hod,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, dow, hod
)
SELECT event_type, dow, hod, n,
       CAST(cents // n AS BIGINT) AS mean_cents
FROM cells
ORDER BY event_type, dow, hod
""",
    category="timeseries",
    description="Weekly seasonality profile: mean event value per "
    "(event_type, ISO weekday, hour-of-day) cell — the heatmap behind "
    "every ops dashboard. One partial+final aggregate into a bounded "
    "(types x 7 x 24) grid; integer-cent means.",
)
def ts_weekday_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.expr("weekday(ts)").cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .select(
            "event_type", "dow", "hod", "n",
            F.expr("cents div n").cast("long").alias("mean_cents"),
        )
        .orderBy("event_type", "dow", "hod")
    )


# ===========================================================================
# Round-9 batch: exact-arithmetic statistical tests (fraud audit, A/B
# independence, monotonic-trend detection) — every statistic lands in
# integer ppm so the DuckDB oracle matches bit-for-bit.
# ===========================================================================

_BENFORD_PPM = [
    (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
    (6, 66947), (7, 57992), (8, 51153), (9, 45757),
]  # round(1e6*log10(1+1/d)) — sums to exactly 1_000_000

_BENFORD_VALUES_SQL = ", ".join(f"({d}, {p})" for d, p in _BENFORD_PPM)


@register(
    "agg_benford_first_digit",
    oracle=f"""
WITH d AS (
  SELECT CAST(LEFT(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1)
              AS BIGINT) AS digit
  FROM orders WHERE o_totalprice > 0
),
c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
ct AS (SELECT digit, n, CAST(SUM(n) OVER () AS BIGINT) AS total FROM c),
b(digit, benford_ppm) AS (VALUES {_BENFORD_VALUES_SQL})
SELECT ct.digit, ct.n,
       CAST((1000000 * ct.n) // ct.total AS BIGINT) AS observed_ppm,
       CAST(b.benford_ppm AS BIGINT) AS benford_ppm,
       CAST(((1000000 * ct.n) // ct.total - b.benford_ppm)
            * ((1000000 * ct.n) // ct.total - b.benford_ppm)
            // b.benford_ppm AS BIGINT) AS chi2_contrib_ppm
FROM ct JOIN b USING (digit)
ORDER BY digit
""",
    category="aggregation",
    description="Benford's-law first-digit audit of order totals (the "
    "fraud-detection screen): observed first-significant-digit frequency "
    "in integer ppm vs the Benford expectation (round(1e6*log10(1+1/d)), "
    "a 9-row literal table that sums to exactly 1e6), with a per-digit "
    "chi-square contribution ((obs-exp)^2 div exp) — all-integer, "
    "bit-identical cross-engine. One map-side digit extraction + a 9-row "
    "aggregate; the global total attaches as a window over the bounded "
    "9-row digit table, never over corpus rows.",
)
def agg_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    counts = (
        o.filter(F.col("o_totalprice") > 0)
        .select(F.substring(cents.cast("string"), 1, 1).cast("long").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    # bounded: the window input is the 9-row digit aggregate, not orders
    counts = counts.withColumn(
        "total", F.sum("n").over(Window.partitionBy()).cast("long")
    )
    benford = spark.createDataFrame(_BENFORD_PPM, "digit long, benford_ppm long")
    obs = F.expr("(1000000 * n) div total")
    return (
        counts.join(F.broadcast(benford), "digit")
        .select(
            "digit",
            "n",
            obs.cast("long").alias("observed_ppm"),
            F.col("benford_ppm").cast("long").alias("benford_ppm"),
            F.expr(
                "((1000000 * n) div total - benford_ppm)"
                " * ((1000000 * n) div total - benford_ppm)"
                " div benford_ppm"
            ).cast("long").alias("chi2_contrib_ppm"),
        )
        .orderBy("digit")
    )


@register(
    "agg_chi_square_independence",
    oracle="""
WITH cells AS (
  SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
         CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY segment, priority
),
m AS (
  SELECT segment, priority, n_obs,
         CAST(SUM(n_obs) OVER (PARTITION BY segment) AS HUGEINT) AS row_total,
         CAST(SUM(n_obs) OVER (PARTITION BY priority) AS HUGEINT) AS col_total,
         CAST(SUM(n_obs) OVER () AS HUGEINT) AS grand_total
  FROM cells
)
SELECT segment, priority, n_obs,
       CAST((1000000 * row_total * col_total) // grand_total AS BIGINT)
         AS expected_ppm,
       CAST((1000000 * (grand_total * n_obs - row_total * col_total)
                     * (grand_total * n_obs - row_total * col_total))
            // (grand_total * row_total * col_total) AS BIGINT)
         AS chi2_contrib_ppm
FROM m
ORDER BY segment, priority
""",
    category="aggregation",
    description="Chi-square independence test between customer market "
    "segment and order priority (the A/B-test contingency workhorse): "
    "the 5x5 observed-count table, expected counts in integer ppm "
    "(1e6*R*C div N), and per-cell chi-square contributions computed as "
    "(1e6*(N*O - R*C)^2) div (N*R*C) — HUGEINT/decimal(38,0) keeps every "
    "product exact through 100 TB counts, and the squared numerator is "
    "nonnegative so truncating division agrees cross-engine. One "
    "orders-customer shuffle join + one aggregate; every window below "
    "runs over the bounded 25-cell table.",
)
def agg_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    # bounded: all three windows run over the 25-cell contingency table
    dec = lambda c_: c_.cast("decimal(38,0)")  # noqa: E731
    m = (
        cells.withColumn("row_total", dec(F.sum("n_obs").over(Window.partitionBy("segment"))))
        .withColumn("col_total", dec(F.sum("n_obs").over(Window.partitionBy("priority"))))
        .withColumn("grand_total", dec(F.sum("n_obs").over(Window.partitionBy())))
    )
    return m.select(
        "segment",
        "priority",
        "n_obs",
        F.expr("(1000000 * row_total * col_total) div grand_total")
        .cast("long")
        .alias("expected_ppm"),
        F.expr(
            "(1000000 * (grand_total * n_obs - row_total * col_total)"
            " * (grand_total * n_obs - row_total * col_total))"
            " div (grand_total * row_total * col_total)"
        ).cast("long").alias("chi2_contrib_ppm"),
    ).orderBy("segment", "priority")


_DAILY_COUNTS_SQL = """
SELECT event_type, date_trunc('day', ts) AS day,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type, day
"""


def _daily_counts(ev: DataFrame) -> DataFrame:
    """Per (event_type, day) counts — the bounded (types x days) series
    the trend tests fold over. Aggregating FIRST is the scale posture:
    the pairwise self-join below is over days-per-series rows (calendar-
    bounded), never corpus rows."""
    return ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


@register(
    "ts_mann_kendall_trend",
    oracle=f"""
WITH daily AS ({_DAILY_COUNTS_SQL}),
pairs AS (
  SELECT a.event_type,
         CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1 ELSE 0 END AS sgn
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(sgn) AS BIGINT) AS s_stat,
       CASE WHEN SUM(sgn) > 0 THEN 'up'
            WHEN SUM(sgn) < 0 THEN 'down'
            ELSE 'flat' END AS trend
FROM pairs GROUP BY event_type
ORDER BY event_type
""",
    category="timeseries",
    description="Mann-Kendall monotonic-trend test per event type: "
    "S = sum over all day pairs i<j of sign(n_j - n_i) on the daily "
    "count series — the nonparametric trend detector (no distribution "
    "assumption, ties handled exactly). Pure integer arithmetic, "
    "bit-identical cross-engine. The pairwise self-join runs over the "
    "bounded (types x days) DAILY aggregate (days grow with calendar "
    "span, not data volume), never corpus rows.",
)
def ts_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_counts(load_table(spark, sf_dir, "events"))
    a = daily.select(
        F.col("event_type"), F.col("day").alias("day_i"), F.col("n").alias("n_i")
    )
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("day").alias("day_j"),
        F.col("n").alias("n_j"),
    )
    pairs = a.join(
        b, (a.event_type == b.et_b) & (a.day_i < b.day_j)
    ).select(
        "event_type",
        F.when(F.col("n_j") > F.col("n_i"), 1)
        .when(F.col("n_j") < F.col("n_i"), -1)
        .otherwise(0)
        .alias("sgn"),
    )
    s = F.sum("sgn")
    return (
        pairs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            s.cast("long").alias("s_stat"),
            F.when(s > 0, "up").when(s < 0, "down").otherwise("flat").alias("trend"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_theil_sen_slope",
    oracle=f"""
WITH daily AS ({_DAILY_COUNTS_SQL}),
slopes AS (
  SELECT a.event_type,
         CAST(CASE WHEN b.n >= a.n THEN 1 ELSE -1 END
              * ((1000000 * ABS(b.n - a.n))
                 // date_diff('day', a.day, b.day)) AS BIGINT) AS slope_ppm
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
),
ranked AS (
  SELECT event_type, slope_ppm,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope_ppm) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS m
  FROM slopes
)
SELECT event_type, CAST(m AS BIGINT) AS n_pairs,
       slope_ppm AS theil_sen_slope_ppm
FROM ranked WHERE rn = (m + 1) // 2
ORDER BY event_type
""",
    category="timeseries",
    description="Theil-Sen robust slope per event type: the LOWER MEDIAN "
    "of all pairwise slopes of the daily count series, each slope "
    "quantized to integer ppm/day as sign * ((1e6*|dn|) div ddays) — "
    "explicit toward-zero quantization so both engines rank the SAME "
    "integers, and the median is an exact order statistic (the value at "
    "rank (m+1) div 2 is unique regardless of tie order). The pair join "
    "and the rank window both run over the bounded (types x days^2/2) "
    "slope table, never corpus rows.",
)
def ts_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_counts(load_table(spark, sf_dir, "events"))
    a = daily.select(
        F.col("event_type"), F.col("day").alias("day_i"), F.col("n").alias("n_i")
    )
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("day").alias("day_j"),
        F.col("n").alias("n_j"),
    )
    slopes = a.join(
        b, (a.event_type == b.et_b) & (a.day_i < b.day_j)
    ).select(
        "event_type",
        (
            F.when(F.col("n_j") >= F.col("n_i"), 1).otherwise(-1)
            * F.expr(
                "(1000000 * abs(n_j - n_i)) div datediff(day_j, day_i)"
            )
        ).cast("long").alias("slope_ppm"),
    )
    # bounded: rank window over the (types x day-pairs) slope table
    wp = Window.partitionBy("event_type")
    ranked = slopes.withColumn(
        "rn", F.row_number().over(wp.orderBy("slope_ppm"))
    ).withColumn("m", F.count(F.lit(1)).over(wp))
    return (
        ranked.filter(F.col("rn") == F.expr("(m + 1) div 2"))
        .select(
            "event_type",
            F.col("m").cast("long").alias("n_pairs"),
            F.col("slope_ppm").alias("theil_sen_slope_ppm"),
        )
        .orderBy("event_type")
    )


_DUCK_TOKS_FROM_DOCS = (
    "SELECT UNNEST(list_filter(regexp_split_to_array(translate(text, "
    "'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), "
    "'[ \t\n\r\f\x0B]+'), t -> t != '')) AS tok FROM documents"
)


@register(
    "window_pareto_frontier",
    oracle="""
WITH rev AS (
  SELECT s.s_suppkey, s.s_name,
         CAST(ROUND(s.s_acctbal * 100) AS BIGINT) AS bal_cents,
         CAST(SUM(CAST(l.l_extendedprice * 100 AS DECIMAL(27,0))) AS BIGINT)
           AS rev_cents
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_suppkey, s.s_name, bal_cents
),
g AS (SELECT rev_cents, MAX(bal_cents) AS grp_max FROM rev GROUP BY rev_cents),
p AS (
  SELECT rev_cents, grp_max,
         MAX(grp_max) OVER (ORDER BY rev_cents DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pre_max
  FROM g
)
SELECT r.s_suppkey, r.s_name, r.rev_cents, r.bal_cents
FROM rev r JOIN p USING (rev_cents)
WHERE r.bal_cents = p.grp_max
  AND (p.pre_max IS NULL OR r.bal_cents > p.pre_max)
ORDER BY r.rev_cents DESC, r.s_suppkey
""",
    category="window",
    description="2-D Pareto frontier (skyline) of suppliers maximizing "
    "(revenue, account balance): a supplier survives iff no other has >= "
    "on both axes with one strict. Decomposed as: per-revenue-value max "
    "balance (one aggregate), then the EXCLUSIVE prefix max over "
    "strictly-higher revenue via bucketed_running_max — broadcast "
    "approx-percentile cutpoints + per-bucket local windows + cross-"
    "bucket prefix, so the global revenue-DESC running max never drags "
    "the per-revenue table through one task. A row is on the frontier "
    "iff its balance equals its revenue-group max AND beats the prefix "
    "max. All integer cents; suppliers with no lineitems are out of "
    "scope (inner join).",
)
def window_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        F.round(F.col("s_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    rev = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("s_suppkey", "s_name", "bal_cents")
        .agg(
            F.sum((F.col("l_extendedprice") * 100).cast("decimal(27,0)"))
            .cast("long")
            .alias("rev_cents")
        )
        # four branches consume this rollup (group max, cutpoint stats,
        # bucketed prefix, final join) and Catalyst's ReuseExchange does
        # not canonicalize them together — without the checkpoint the
        # corpus scan+rollup executes once PER BRANCH (measured 49s →
        # 18s at 60M rows). The materialized table is supplier-bounded
        # (one row per supplier), never corpus-sized.
        .localCheckpoint(eager=False)
    )
    g = rev.groupBy("rev_cents").agg(F.max("bal_cents").alias("grp_max"))
    g = g.withColumn("_neg", -F.col("rev_cents"))
    # one 1-row broadcast carries the 31 approx cutpoints; cutpoint
    # accuracy only affects bucket BALANCE, never the prefix max
    stats = g.agg(
        F.percentile_approx("_neg", [i / 32.0 for i in range(1, 32)], 1000).alias(
            "_cuts"
        )
    ).withColumn("_k", F.lit(1))
    gs = g.withColumn("_k", F.lit(1)).join(F.broadcast(stats), "_k")
    # bucket evaluated once, cutpoint array projected off the prefix-max
    # exchange (guide §2.3, the rfm_segments cut)
    gs = gs.withColumn(
        "_b", F.size(F.filter(F.col("_cuts"), lambda c: c < F.col("_neg")))
    ).drop("_cuts", "_k")
    pre = SA.bucketed_running_max(
        gs, [], F.col("_b"), [F.col("_neg").asc()], F.col("grp_max"), "pre_max",
        inclusive=False,
    ).select("rev_cents", "grp_max", "pre_max")
    return (
        rev.join(pre, "rev_cents")
        .filter(
            (F.col("bal_cents") == F.col("grp_max"))
            & (F.col("pre_max").isNull() | (F.col("bal_cents") > F.col("pre_max")))
        )
        .select("s_suppkey", "s_name", "rev_cents", "bal_cents")
        .orderBy(F.col("rev_cents").desc(), "s_suppkey")
    )


@register(
    "analytics_rfm_segments",
    oracle="""
WITH cust AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(27,0))) AS BIGINT)
           AS mon_cents
  FROM orders GROUP BY o_custkey
),
g AS (SELECT MAX(last_order) AS gmax FROM cust),
q AS (
  SELECT o_custkey, mon_cents,
         CAST(NTILE(4) OVER (ORDER BY date_diff('day', last_order, gmax),
                             o_custkey) AS BIGINT) AS r_quartile,
         CAST(NTILE(4) OVER (ORDER BY freq DESC, o_custkey) AS BIGINT)
           AS f_quartile,
         CAST(NTILE(4) OVER (ORDER BY mon_cents DESC, o_custkey) AS BIGINT)
           AS m_quartile
  FROM cust, g
)
SELECT r_quartile, f_quartile, m_quartile,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(mon_cents) AS BIGINT) AS total_monetary_cents
FROM q GROUP BY r_quartile, f_quartile, m_quartile
ORDER BY r_quartile, f_quartile, m_quartile
""",
    category="analytics",
    description="RFM customer segmentation (recency/frequency/monetary "
    "quartiles — the classic CRM cube): three EXACT global NTILE(4)s over "
    "the per-customer rollup, each computed scale-safe as "
    "bucketed_row_number + the closed-form NTILE from (rank, n) — recency "
    "buckets by the day value itself (calendar-bounded), frequency by the "
    "negated count (bounded value domain), monetary by 31 broadcast "
    "approx-percentile cutpoints — so NO unpartitioned window ever sees "
    "the customer table. Tie-breaks on custkey make every quartile "
    "engine-independent; output is the 64-cell (R,F,M) cube with counts "
    "and integer-cent totals.",
)
def analytics_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum((F.col("o_totalprice") * 100).cast("decimal(27,0)"))
        .cast("long")
        .alias("mon_cents"),
    ).withColumn("_negm", -F.col("mon_cents"))
    # the stats branch and three bucketed ranks all re-derive from this
    # customer-bounded rollup; checkpoint so the orders scan runs once
    cust = cust.localCheckpoint(eager=False)
    stats = cust.agg(
        F.max("last_order").alias("_gmax"),
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.percentile_approx("_negm", [i / 32.0 for i in range(1, 32)], 1000).alias(
            "_mcuts"
        ),
    ).withColumn("_k", F.lit(1))
    c = cust.withColumn("_k", F.lit(1)).join(F.broadcast(stats), "_k")
    # evaluate the broadcast-derived columns ONCE and project the wide
    # stats payload away BEFORE the three rank passes: the 31-double
    # cutpoint array (and _gmax/_k) otherwise rides all three corpus
    # exchanges below (guide §2.3 — project before the exchange)
    c = c.select(
        "o_custkey",
        "freq",
        "mon_cents",
        "_negm",
        "_n",
        F.datediff(F.col("_gmax"), F.col("last_order"))
        .cast("long")
        .alias("recency_days"),
        F.size(F.filter(F.col("_mcuts"), lambda x: x < F.col("_negm")))
        .alias("_mb"),
    )
    c = SA.bucketed_row_number(
        c, [], F.col("recency_days"),
        [F.col("recency_days").asc(), F.col("o_custkey").asc()], "_rrank",
    )
    c = SA.bucketed_row_number(
        c, [], (-F.col("freq")),
        [F.col("freq").desc(), F.col("o_custkey").asc()], "_frank",
    )
    c = SA.bucketed_row_number(
        c, [], F.col("_mb"),
        [F.col("_negm").asc(), F.col("o_custkey").asc()], "_mrank",
    )

    def _ntile4(r: F.Column) -> F.Column:
        # exact NTILE(4): the first n%4 tiles hold n//4+1 rows, the rest n//4
        n = F.col("_n")
        q = F.floor(n / 4).cast("long")
        rem = (n % 4).cast("long")
        head = rem * (q + 1)
        return (
            F.when(r <= head, F.floor((r - 1) / (q + 1)) + 1)
            .otherwise(rem + F.floor((r - head - 1) / F.greatest(q, F.lit(1))) + 1)
        ).cast("long")

    return (
        c.select(
            _ntile4(F.col("_rrank")).alias("r_quartile"),
            _ntile4(F.col("_frank")).alias("f_quartile"),
            _ntile4(F.col("_mrank")).alias("m_quartile"),
            "mon_cents",
        )
        .groupBy("r_quartile", "f_quartile", "m_quartile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("mon_cents").cast("long").alias("total_monetary_cents"),
        )
        .orderBy("r_quartile", "f_quartile", "m_quartile")
    )


@register(
    "ts_revenue_recognition",
    oracle="""
WITH ex AS (
  SELECT o_orderkey,
         date_trunc('month', o_orderdate) + to_months(m.m) AS month,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         m.m AS m
  FROM orders CROSS JOIN (VALUES (0), (1), (2)) AS m(m)
)
SELECT month,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM(cents // 3 + CASE WHEN m < cents % 3 THEN 1 ELSE 0 END)
            AS BIGINT) AS recognized_cents
FROM ex GROUP BY month ORDER BY month
""",
    category="timeseries",
    description="Straight-line revenue recognition: each order's total "
    "spreads over 3 months from the order month by the LARGEST-REMAINDER "
    "method (cents div 3 per month, the first cents%3 months get the "
    "extra cent) — so the monthly schedule sums back to the order total "
    "EXACTLY, in pure integer arithmetic. A 3-row map-side explode "
    "(sequence 0..2) + one month aggregate; no join, no window. The "
    "deferred-revenue schedule every finance pipeline materializes.",
)
def ts_revenue_recognition(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    ex = o.select(
        "o_orderkey",
        "o_orderdate",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("m"),
    )
    amount = F.expr("cents div 3") + F.when(
        F.col("m") < F.expr("cents % 3"), 1
    ).otherwise(0)
    return (
        ex.select(
            F.add_months(F.date_trunc("month", F.col("o_orderdate")), F.col("m"))
            .cast("timestamp_ntz")
            .alias("month"),
            "o_orderkey",
            amount.alias("amount"),
        )
        .groupBy("month")
        .agg(
            F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
            F.sum("amount").cast("long").alias("recognized_cents"),
        )
        .orderBy("month")
    )


@register(
    "text_freq_spectrum",
    oracle=f"""
WITH toks AS ({_DUCK_TOKS_FROM_DOCS}),
tc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY tok)
SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS freq_log2,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(n) AS BIGINT) AS n_tokens
FROM tc GROUP BY freq_log2 ORDER BY freq_log2
""",
    category="text",
    description="Word-frequency spectrum of the corpus vocabulary "
    "(Zipf diagnostics): distinct terms and total token mass per "
    "floor(log2(frequency)) doubling bucket, the curve that separates "
    "hapax-heavy noisy corpora from template-heavy duplicated ones. The "
    "log2 floor is computed EXACTLY as length(bin(n))-1 — integer bit "
    "arithmetic, no floating log — so both engines bucket identically. "
    "One token explode + a vocabulary-sized aggregate + a ~30-row "
    "spectrum; scales with corpus tokens, never pairs.",
)
def text_freq_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    toks = d.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
    tc = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        tc.groupBy(
            (F.length(F.bin(F.col("n"))) - 1).cast("long").alias("freq_log2")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("n").cast("long").alias("n_tokens"),
        )
        .orderBy("freq_log2")
    )


@register(
    "join_fuzzy_levenshtein",
    oracle="""
WITH names AS (
  SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(LENGTH(p_name) AS BIGINT) AS len
  FROM part GROUP BY p_name
)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_distance,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM names a JOIN names b
  ON a.name < b.name
 AND b.len BETWEEN a.len - 2 AND a.len + 2
 AND levenshtein(a.name, b.name) <= 2
ORDER BY name_a, name_b
""",
    category="join",
    description="Fuzzy self-join on part names: pairs of DISTINCT names "
    "within Levenshtein edit distance 2 (the catalog-reconciliation / "
    "entity-matching primitive). Scale shape: the join runs over the "
    "DISTINCT-name table (vocabulary-bounded — distinct product names "
    "grow with the catalog's vocabulary, not with corpus rows), and "
    "candidates ride a COMPOSITE equi key: length band AND a PassJoin "
    "segment signature. Each indexed name of length la>=3 is cut into 3 "
    "contiguous segments; with <=2 edits, pigeonhole leaves one segment "
    "untouched, and the net insert/delete count before it shifts its "
    "start by at most 2 — so the probe side emits, per admissible "
    "partner length la and segment index k, every substring of the "
    "matching segment length starting within +/-2 of the segment's "
    "home position, and the equi join on (la, k, segment) is COMPLETE "
    "for d<=2 (PassJoin argument; Li, Deng, Feng, VLDB 2011). Within a "
    "length bucket candidates now need a shared 1/3-length substring, "
    "not just equal length, keeping buckets subquadratic as the name "
    "vocabulary grows 100x. Names shorter than 3 chars (where 3 "
    "segments cannot all be nonempty) fall back to the plain length "
    "band — a constant-size tail. The expensive levenshtein() only "
    "ever runs on signature-matched candidates, never all pairs.",
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    names = p.groupBy(F.col("p_name").alias("name")).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts")
    ).withColumn("len", F.length("name").cast("long"))

    # segment geometry for a length-la string cut into 3 parts: the first
    # (la mod 3) segments get an extra char; seg_len/start are pure
    # integer functions of (la, k) so both sides derive identical keys.
    def _seg_len(la, k):
        return (la / 3).cast("long") + F.when(k < la % 3, F.lit(1)).otherwise(
            F.lit(0)
        ).cast("long")

    def _seg_start(la, k):
        # sum of the lengths of segments 0..k-1
        base = (la / 3).cast("long")
        return k * base + F.least(k, la % 3)

    ks = F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("k")

    # indexed side: one row per (name, segment) with the segment content
    a_seg = (
        names.filter(F.col("len") >= 3)
        .select(
            F.col("name").alias("name_a"),
            F.col("n_parts").alias("n_parts_a"),
            F.col("len").alias("len_a"),
            ks,
        )
        .withColumn(
            "seg",
            F.expr(
                "substring(name_a, cast(cast(len_a/3 as bigint)*k +"
                " least(k, len_a % 3) as int) + 1,"
                " cast(cast(len_a/3 as bigint) +"
                " if(k < len_a % 3, 1, 0) as int))"
            ),
        )
    )
    # probe side: for each admissible partner length la (>=3) and segment
    # index k, emit every substring of seg_len(la,k) chars whose start
    # lies within +/-2 of the segment's home position (clamped to b).
    b_probe = (
        names.select(
            F.col("name").alias("name_b"),
            F.col("n_parts").alias("n_parts_b"),
            F.col("len").alias("len_b"),
        )
        .withColumn(
            "la", F.explode(F.sequence(F.col("len_b") - 2, F.col("len_b") + 2))
        )
        .filter(F.col("la") >= 3)
        .withColumn("k", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))))
        .withColumn("seg_len", _seg_len(F.col("la"), F.col("k")))
        .withColumn("start_a", _seg_start(F.col("la"), F.col("k")))
        .withColumn("p_lo", F.greatest(F.col("start_a") - 2, F.lit(0)))
        .withColumn(
            "p_hi", F.least(F.col("start_a") + 2, F.col("len_b") - F.col("seg_len"))
        )
        .filter(F.col("p_lo") <= F.col("p_hi"))
        .withColumn("p", F.explode(F.sequence(F.col("p_lo"), F.col("p_hi"))))
        .withColumn(
            "seg",
            F.expr("substring(name_b, cast(p as int) + 1, cast(seg_len as int))"),
        )
        .select("name_b", "n_parts_b", "la", "k", "seg")
    )
    seg_pairs = (
        a_seg.join(
            b_probe,
            (a_seg.len_a == b_probe.la)
            & (a_seg.k == b_probe.k)
            & (a_seg.seg == b_probe.seg)
            & (a_seg.name_a < b_probe.name_b),
        )
        .select("name_a", "name_b", "n_parts_a", "n_parts_b")
        .dropDuplicates(["name_a", "name_b"])
    )
    # tail branch: len_a < 3 cannot carry 3 nonempty segments — plain
    # length band (constant-size: at most the <3-char vocabulary)
    tiny_a = names.filter(F.col("len") < 3).select(
        F.col("name").alias("name_a"),
        F.col("n_parts").alias("n_parts_a"),
        F.col("len").alias("len_a"),
    )
    band_b = names.select(
        F.col("name").alias("name_b"),
        F.col("n_parts").alias("n_parts_b"),
        F.explode(F.sequence(F.col("len") - 2, F.col("len") + 2)).alias("blk"),
    )
    tiny_pairs = tiny_a.join(
        band_b, (tiny_a.len_a == band_b.blk) & (tiny_a.name_a < band_b.name_b)
    ).select("name_a", "name_b", "n_parts_a", "n_parts_b")
    return (
        seg_pairs.unionByName(tiny_pairs)
        .withColumn(
            "edit_distance",
            F.levenshtein(F.col("name_a"), F.col("name_b")).cast("long"),
        )
        .filter(F.col("edit_distance") <= 2)
        .select("name_a", "name_b", "edit_distance", "n_parts_a", "n_parts_b")
        .orderBy("name_a", "name_b")
    )


@register(
    "agg_skew_kurtosis",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(l_quantity AS HUGEINT)) AS HUGEINT) AS s1,
         CAST(SUM(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT))
              AS HUGEINT) AS s2,
         CAST(SUM(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT)
                  * CAST(l_quantity AS HUGEINT)) AS HUGEINT) AS s3,
         CAST(SUM(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT)
                  * CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT))
              AS HUGEINT) AS s4
  FROM lineitem GROUP BY l_returnflag
),
m AS (
  SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
         CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
         CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
  FROM s
),
c AS (
  SELECT l_returnflag, n_rows, mean,
         r2 - mean * mean AS m2,
         r3 - 3 * mean * r2 + 2 * mean * mean * mean AS m3,
         r4 - 4 * mean * r3 + 6 * mean * mean * r2
            - 3 * mean * mean * mean * mean AS m4
  FROM m
)
SELECT l_returnflag, n_rows,
       ROUND(mean, 6) AS mean_qty,
       ROUND(m3 / (m2 * SQRT(m2)), 6) AS skewness,
       ROUND(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis
FROM c ORDER BY l_returnflag
""",
    category="aggregation",
    description="Skewness and excess kurtosis of quantity per return "
    "flag via EXACT integer power sums S1..S4 (quantity is integral and "
    "<= 50, so S4 fits decimal(38,0)/HUGEINT through ~1e30 rows): both "
    "engines aggregate the same integers, then run the IDENTICAL "
    "double-expression tree (central moments from raw moments; A^1.5 "
    "written as m2*sqrt(m2) because IEEE sqrt is exact where pow() is "
    "not) — the third/fourth-order extension of the corr-moments trick. "
    "One partial+final aggregate; round-6 doubles out.",
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # per-row powers in LONG (quantity <= 50 so q^4 <= 6.25e6 — far
    # inside int64); only the SUM accumulates in decimal(38,0). Decimal
    # multiply per row costs ~2x the whole aggregate at 60M rows.
    q = F.col("l_quantity").cast("long")
    dec = lambda c_: c_.cast("decimal(38,0)")  # noqa: E731
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec(q)).cast("decimal(38,0)").alias("s1"),
        F.sum(dec(q * q)).cast("decimal(38,0)").alias("s2"),
        F.sum(dec(q * q * q)).cast("decimal(38,0)").alias("s3"),
        F.sum(dec(q * q * q * q)).cast("decimal(38,0)").alias("s4"),
    )
    m = s.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        (F.col("s1").cast("double") / F.col("n").cast("double")).alias("mean"),
        (F.col("s2").cast("double") / F.col("n").cast("double")).alias("r2"),
        (F.col("s3").cast("double") / F.col("n").cast("double")).alias("r3"),
        (F.col("s4").cast("double") / F.col("n").cast("double")).alias("r4"),
    )
    mean = F.col("mean")
    c = m.select(
        "l_returnflag",
        "n_rows",
        "mean",
        (F.col("r2") - mean * mean).alias("m2"),
        (F.col("r3") - 3 * mean * F.col("r2") + 2 * mean * mean * mean).alias("m3"),
        (
            F.col("r4")
            - 4 * mean * F.col("r3")
            + 6 * mean * mean * F.col("r2")
            - 3 * mean * mean * mean * mean
        ).alias("m4"),
    )
    return c.select(
        "l_returnflag",
        "n_rows",
        F.round(mean, 6).alias("mean_qty"),
        F.round(F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2"))), 6).alias(
            "skewness"
        ),
        F.round(F.col("m4") / (F.col("m2") * F.col("m2")) - 3.0, 6).alias(
            "excess_kurtosis"
        ),
    ).orderBy("l_returnflag")


@register(
    "events_bounce_rate",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              OR date_diff('second',
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id,
         MIN(ts) AS session_start,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM sessions GROUP BY user_id, session_id
)
SELECT date_trunc('day', session_start) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       CAST((1000000 * SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END))
            // COUNT(*) AS BIGINT) AS bounce_ppm
FROM per_session GROUP BY day ORDER BY day
""",
    category="analytics",
    description="Daily bounce rate over 30-minute-gap sessionization: "
    "sessions with exactly one event as integer ppm of the day's "
    "sessions (the engagement metric behind every web dashboard). The "
    "LAG/running-sum windows partition by user_id — millions of small "
    "uniform partitions, the shape per-entity windows are FOR — then "
    "one (user, session) aggregate and a days-bounded rollup. Event-id "
    "tie-break makes same-timestamp ordering engine-independent.",
)
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w))
                > 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(ws))
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    bounces = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return (
        per_session.groupBy(
            F.date_trunc("day", F.col("session_start")).alias("day")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            bounces.cast("long").alias("n_bounces"),
            F.expr(
                "(1000000 * sum(case when n_events = 1 then 1 else 0 end))"
                " div count(*)"
            ).cast("long").alias("bounce_ppm"),
        )
        .orderBy("day")
    )


@register(
    "graph_degree_spectrum",
    oracle="""
WITH edges AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
pdeg AS (SELECT l_partkey AS node, CAST(COUNT(*) AS BIGINT) AS degree
         FROM edges GROUP BY node),
sdeg AS (SELECT l_suppkey AS node, CAST(COUNT(*) AS BIGINT) AS degree
         FROM edges GROUP BY node),
both_sides AS (
  SELECT 'part' AS side, degree FROM pdeg
  UNION ALL
  SELECT 'supplier' AS side, degree FROM sdeg
)
SELECT side, degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM both_sides GROUP BY side, degree
ORDER BY side, degree
""",
    category="graph",
    description="Degree spectrum of the bipartite part-supplier graph "
    "(the first diagnostic before any graph algorithm — spots hubs and "
    "skew that would break joins downstream): distinct edges, per-node "
    "degrees on both sides, then the (side, degree) histogram. Three "
    "partial+final aggregates, all map-side combinable; the spectrum is "
    "degree-domain bounded. Pure integers.",
)
def graph_degree_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select("l_partkey", "l_suppkey").distinct()
    pdeg = edges.groupBy(F.col("l_partkey").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    sdeg = edges.groupBy(F.col("l_suppkey").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    both_sides = pdeg.select(F.lit("part").alias("side"), "degree").unionAll(
        sdeg.select(F.lit("supplier").alias("side"), "degree")
    )
    return (
        both_sides.groupBy("side", "degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .orderBy("side", "degree")
    )


_DUCK_TOKLIST = (
    "list_filter(regexp_split_to_array(translate(text, "
    "'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), "
    "'[ \t\n\r\f\x0B]+'), t -> t != '')"
)


@register(
    "text_collocation_lift",
    oracle=f"""
WITH toks AS ({_DUCK_TOKS_FROM_DOCS}),
uni AS (SELECT tok, CAST(COUNT(*) AS HUGEINT) AS c FROM toks GROUP BY tok),
tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS total FROM toks),
tl AS (SELECT {_DUCK_TOKLIST} AS t FROM documents),
bg AS (
  SELECT unnest([array_to_string(t[i:i+1], ' ')
                 for i in generate_series(1, greatest(len(t) - 1, 1))])
         AS bigram
  FROM tl
),
bc AS (
  SELECT bigram, CAST(COUNT(*) AS HUGEINT) AS c_xy
  FROM bg WHERE contains(bigram, ' ') GROUP BY bigram
),
lifted AS (
  SELECT bc.bigram, bc.c_xy,
         CAST((1000000 * tot.total * bc.c_xy) // (u1.c * u2.c) AS BIGINT)
           AS lift_ppm
  FROM bc
  CROSS JOIN tot
  JOIN uni u1 ON u1.tok = string_split(bc.bigram, ' ')[1]
  JOIN uni u2 ON u2.tok = string_split(bc.bigram, ' ')[2]
  WHERE bc.c_xy >= 5
)
SELECT bigram, CAST(c_xy AS BIGINT) AS n_pair, lift_ppm
FROM lifted ORDER BY lift_ppm DESC, bigram LIMIT 20
""",
    category="text",
    description="Collocation extraction by integer LIFT: top-20 bigrams "
    "by (1e6 * N * count(xy)) div (count(x) * count(y)) with a min-count "
    "valve — the log-free PMI surrogate (monotone in PMI), so the whole "
    "ranking is exact integer arithmetic, never a cross-engine log(). "
    "One bigram explode + one unigram explode, vocabulary-keyed joins, "
    "TakeOrdered(20) on a unique (lift, bigram) order. The 1-row token "
    "total rides a broadcast.",
)
def text_collocation_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    toked = d.select(T.tokens(F.col("text")).alias("_toks"))
    toks = toked.select(F.explode("_toks").alias("tok"))
    # vocabulary-bounded; checkpointed because THREE branches (both join
    # probes and the token total) would otherwise each re-run the corpus
    # token explode
    uni = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("c")
    ).localCheckpoint(eager=False)
    tot = uni.agg(
        F.sum("c").cast("decimal(38,0)").alias("total")
    ).withColumn("_k", F.lit(1))
    bg = toked.select(
        F.explode(T.ngrams_all_from_tokens(F.col("_toks"), 2)).alias("bigram")
    )
    bc = (
        bg.filter(F.col("bigram").contains(" "))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("c_xy"))
        .filter(F.col("c_xy") >= 5)
        .withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))
        .withColumn("w2", F.split(F.col("bigram"), " ").getItem(1))
        .withColumn("_k", F.lit(1))
    )
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    return (
        bc.join(F.broadcast(tot), "_k")
        .join(u1, "w1")
        .join(u2, "w2")
        .select(
            "bigram",
            F.col("c_xy").cast("long").alias("n_pair"),
            F.expr("(1000000 * total * c_xy) div (c1 * c2)")
            .cast("long")
            .alias("lift_ppm"),
        )
        .orderBy(F.col("lift_ppm").desc(), "bigram")
        .limit(20)
    )


@register(
    "events_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events
),
c AS (
  SELECT prev AS from_type, event_type AS to_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev IS NOT NULL GROUP BY from_type, to_type
),
m AS (
  SELECT from_type, to_type, n,
         CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS row_total
  FROM c
)
SELECT from_type, to_type, n,
       CAST((1000000 * n) // row_total AS BIGINT) AS prob_ppm
FROM m ORDER BY from_type, to_type
""",
    category="analytics",
    description="First-order Markov transition matrix over each user's "
    "event sequence: LAG per user (millions of small uniform partitions "
    "— the shape per-entity windows are FOR, with event-id tie-break), "
    "one (from, to) aggregate into the bounded types^2 matrix, then "
    "row-normalized transition probabilities in integer ppm via a "
    "window over the 25-cell table. The sequence-model / "
    "next-event-prediction feed, exact cross-engine.",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    c = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # bounded: the normalizing window runs over the types^2 matrix
    m = c.withColumn(
        "row_total",
        F.sum("n").over(Window.partitionBy("from_type")).cast("long"),
    )
    return m.select(
        "from_type",
        "to_type",
        "n",
        F.expr("(1000000 * n) div row_total").cast("long").alias("prob_ppm"),
    ).orderBy("from_type", "to_type")


@register(
    "events_cumulative_unique_users",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(date_trunc('day', ts)) AS first_day
  FROM events GROUP BY user_id
),
daily AS (
  SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users
  FROM firsts GROUP BY day
)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_users
FROM daily ORDER BY day
""",
    category="analytics",
    description="User-acquisition growth curve: first-seen day per user "
    "(one user-keyed aggregate — the only corpus-sized shuffle), daily "
    "new-user counts, and the cumulative unique-user total as a running "
    "sum over the DAYS-bounded daily table (calendar-bounded input, so "
    "the unpartitioned window is scale-safe by construction — the "
    "registry plan gate sees the aggregate beneath it). The exact "
    "distinct-growth twin of the HLL rollup sketch path.",
)
def events_cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts"))).alias("first_day")
    )
    daily = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    # bounded: running sum over the days-bounded daily aggregate
    wc = (
        Window.partitionBy()
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.withColumn(
        "cum_users", F.sum("new_users").over(wc).cast("long")
    ).orderBy("day")


@register(
    "events_dau_wau",
    oracle="""
WITH active AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
-- each active (user, day) contributes to the trailing-7d window of
-- days day .. day+6 (map-side x7 explode, then distinct per target day)
contrib AS (
  SELECT user_id, day + to_days(CAST(o.o AS INTEGER)) AS wday
  FROM active CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6)) AS o(o)
),
wau_t AS (
  SELECT wday AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM contrib GROUP BY wday
),
dau_t AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM active GROUP BY day
)
SELECT d.day, d.dau, w.wau,
       CAST((1000000 * d.dau) // w.wau AS BIGINT) AS stickiness_ppm
FROM dau_t d JOIN wau_t w USING (day)
ORDER BY day
""",
    category="analytics",
    description="DAU / trailing-7-day WAU / stickiness (the "
    "DAU-over-WAU engagement ratio in integer ppm): the distinct "
    "(user, day) active table explodes map-side into the <=7 future "
    "window days each activity serves, then ONE distinct aggregate per "
    "target day — the exact rolling-distinct shape (distinct counts "
    "don't merge across days, so the explode IS the scale-correct "
    "exact path; the HLL rollup in sketch_hll_rollup is the sketch "
    "twin for wider windows). Days with no 7-day history still report "
    "their partial window, exactly as the SQL does. Output rows are "
    "calendar-bounded.",
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    contrib = active.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + F.expr("INTERVAL 6 DAYS"),
                       F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    wau_t = contrib.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    dau_t = active.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    return (
        dau_t.join(wau_t, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.expr("(1000000 * dau) div wau").cast("long").alias(
                "stickiness_ppm"
            ),
        )
        .orderBy("day")
    )


@register(
    "ts_sma_crossover",
    oracle=f"""
WITH daily AS ({_DAILY_COUNTS_SQL}),
sums AS (
  SELECT event_type, day,
         CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
              AS BIGINT) AS sum5,
         CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
              AS BIGINT) AS sum20,
         CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY day
                             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
              AS BIGINT) AS hist
  FROM daily
),
ind AS (
  SELECT event_type, day,
         CASE WHEN 4 * sum5 > sum20 THEN 1
              WHEN 4 * sum5 < sum20 THEN -1 ELSE 0 END AS side
  FROM sums WHERE hist >= 20
),
flips AS (
  SELECT event_type, day, side,
         LAG(side) OVER (PARTITION BY event_type ORDER BY day) AS prev_side
  FROM ind
)
SELECT event_type, day,
       CASE WHEN side > prev_side THEN 'golden' ELSE 'death' END AS crossover
FROM flips
WHERE prev_side IS NOT NULL AND side <> prev_side AND side <> 0
ORDER BY event_type, day
""",
    category="timeseries",
    description="SMA(5)/SMA(20) crossover detection (golden/death cross) "
    "on each event type's daily count series — the moving-average "
    "signal, made EXACT by comparing 4*sum5 vs sum20 (the LCM-cleared "
    "inequality; no float division anywhere). Warm-up days (<20 days "
    "history) are excluded via a window COUNT, so partial-window SMAs "
    "never emit a false cross. All windows run over the bounded "
    "(types x days) daily aggregate.",
)
def ts_sma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_counts(load_table(spark, sf_dir, "events"))
    w5 = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-4, 0)
    )
    w20 = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-19, 0)
    )
    sums = daily.select(
        "event_type",
        "day",
        F.sum("n").over(w5).cast("long").alias("sum5"),
        F.sum("n").over(w20).cast("long").alias("sum20"),
        F.count(F.lit(1)).over(w20).cast("long").alias("hist"),
    )
    ind = sums.filter(F.col("hist") >= 20).select(
        "event_type",
        "day",
        F.when(4 * F.col("sum5") > F.col("sum20"), 1)
        .when(4 * F.col("sum5") < F.col("sum20"), -1)
        .otherwise(0)
        .alias("side"),
    )
    wlag = Window.partitionBy("event_type").orderBy("day")
    flips = ind.withColumn("prev_side", F.lag("side").over(wlag))
    return (
        flips.filter(
            F.col("prev_side").isNotNull()
            & (F.col("side") != F.col("prev_side"))
            & (F.col("side") != 0)
        )
        .select(
            "event_type",
            "day",
            F.when(F.col("side") > F.col("prev_side"), "golden")
            .otherwise("death")
            .alias("crossover"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "agg_ols_regression",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(l_quantity AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS HUGEINT)
           AS sy,
         CAST(SUM(CAST(l_quantity AS HUGEINT)
                  * CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS HUGEINT)
           AS sxy,
         CAST(SUM(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT))
              AS HUGEINT) AS sxx,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
                  * CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS HUGEINT)
           AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_cents_per_unit,
       ROUND((CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
              / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS intercept_cents,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             * CAST(n * sxy - sx * sy AS DOUBLE)
             / (CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r_squared
FROM s ORDER BY l_returnflag
""",
    category="aggregation",
    description="OLS regression of price (integer cents) on quantity per "
    "return flag: slope, intercept, and R^2 from EXACT integer moment "
    "sums (n, Sx, Sy, Sxy, Sxx, Syy in decimal(38,0)/HUGEINT — the "
    "agg_corr_moments trick extended to the full regression triple), "
    "with both engines evaluating the IDENTICAL double expression tree "
    "over the same integers — round-6 doubles out. One partial+final "
    "aggregate, map-side combinable.",
)
def agg_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # per-row products in LONG (x <= 50, y <= ~1e9 cents → y*y <= 1e18
    # inside int64); only the SUMs accumulate in decimal(38,0)
    x = F.col("l_quantity").cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    dec = lambda c_: c_.cast("decimal(38,0)")  # noqa: E731
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec(x)).cast("decimal(38,0)").alias("sx"),
        F.sum(dec(y)).cast("decimal(38,0)").alias("sy"),
        F.sum(dec(x * y)).cast("decimal(38,0)").alias("sxy"),
        F.sum(dec(x * x)).cast("decimal(38,0)").alias("sxx"),
        F.sum(dec(y * y)).cast("decimal(38,0)").alias("syy"),
    )
    cov = F.expr("cast(n * sxy - sx * sy as double)")
    varx = F.expr("cast(n * sxx - sx * sx as double)")
    vary = F.expr("cast(n * syy - sy * sy as double)")
    return s.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        F.round(cov / varx, 6).alias("slope_cents_per_unit"),
        F.round(
            (F.expr("cast(sy as double)") - cov / varx * F.expr("cast(sx as double)"))
            / F.expr("cast(n as double)"),
            6,
        ).alias("intercept_cents"),
        F.round(cov * cov / (varx * vary), 6).alias("r_squared"),
    ).orderBy("l_returnflag")


@register(
    "events_conversion_lag",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
),
conv AS (
  SELECT CAST(date_diff('second', first_view, first_purchase) AS BIGINT)
           AS lag_secs,
         user_id
  FROM firsts
  WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
    AND first_purchase >= first_view
),
ranked AS (
  SELECT lag_secs,
         ROW_NUMBER() OVER (ORDER BY lag_secs, user_id) AS rn,
         COUNT(*) OVER () AS n
  FROM conv
)
SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN lag_secs END) AS BIGINT)
         AS p50_secs,
       CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN lag_secs END)
            AS BIGINT) AS p90_secs,
       CAST(MIN(lag_secs) AS BIGINT) AS min_secs,
       CAST(MAX(lag_secs) AS BIGINT) AS max_secs
FROM ranked
""",
    category="analytics",
    description="View-to-purchase conversion lag: per converted user the "
    "seconds from first 'view' to first 'purchase', summarized as EXACT "
    "lower-median and ceil-p90 order statistics — the rank convention "
    "((n+1) div 2, (9n+9) div 10) is written out explicitly in BOTH "
    "engines instead of trusting each engine's quantile_disc indexing. "
    "Spark side computes the global ranks scale-safe via "
    "bucketed_row_number over broadcast approx cutpoints (no single-task "
    "window over the converted-user table); the 1-row result folds from "
    "a bounded rank-filtered set.",
)
def events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    conv = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        (
            F.unix_timestamp("first_purchase") - F.unix_timestamp("first_view")
        ).cast("long").alias("lag_secs"),
        "user_id",
    )
    stats = conv.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.percentile_approx(
            "lag_secs", [i / 32.0 for i in range(1, 32)], 1000
        ).alias("_cuts"),
        F.min("lag_secs").alias("_mn"),
        F.max("lag_secs").alias("_mx"),
    ).withColumn("_k", F.lit(1))
    cs = conv.withColumn("_k", F.lit(1)).join(F.broadcast(stats), "_k")
    # bucket evaluated once, cutpoint array projected off the rank
    # exchange (guide §2.3, the rfm_segments cut); the scalar stats
    # (_n/_mn/_mx) stay — the final aggregate consumes them
    cs = cs.withColumn(
        "_b", F.size(F.filter(F.col("_cuts"), lambda c: c < F.col("lag_secs")))
    ).drop("_cuts", "_k")
    ranked = SA.bucketed_row_number(
        cs, [], F.col("_b"),
        [F.col("lag_secs").asc(), F.col("user_id").asc()], "rn",
    )
    hit = ranked.filter(
        (F.col("rn") == F.expr("(_n + 1) div 2"))
        | (F.col("rn") == F.expr("(9 * _n + 9) div 10"))
    )
    return hit.agg(
        F.max("_n").cast("long").alias("n_converted"),
        F.max(
            F.when(F.col("rn") == F.expr("(_n + 1) div 2"), F.col("lag_secs"))
        ).cast("long").alias("p50_secs"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(9 * _n + 9) div 10"), F.col("lag_secs")
            )
        ).cast("long").alias("p90_secs"),
        F.max("_mn").cast("long").alias("min_secs"),
        F.max("_mx").cast("long").alias("max_secs"),
    )


@register(
    "analytics_monthly_churn",
    oracle="""
WITH active AS (
  SELECT DISTINCT o_custkey, date_trunc('month', o_orderdate) AS month
  FROM orders
),
mx AS (SELECT MAX(month) AS last_month FROM active),
flags AS (
  SELECT a.o_custkey, a.month,
         CASE WHEN n.o_custkey IS NULL THEN 1 ELSE 0 END AS churned
  FROM active a
  LEFT JOIN active n
    ON n.o_custkey = a.o_custkey AND n.month = a.month + to_months(1)
)
SELECT f.month, CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(f.churned) AS BIGINT) AS n_churned,
       CAST((1000000 * SUM(f.churned)) // COUNT(*) AS BIGINT) AS churn_ppm
FROM flags f CROSS JOIN mx
WHERE f.month < mx.last_month
GROUP BY f.month ORDER BY f.month
""",
    category="analytics",
    description="Monthly customer churn: a customer active in month m "
    "churns if they place no order in m+1 (the shifted self LEFT JOIN on "
    "(custkey, month+1) — one uniform custkey-keyed shuffle, no window). "
    "The final data month is excluded (everyone would 'churn' after the "
    "horizon) via a broadcast 1-row max-month. Integer ppm rates over "
    "the calendar-bounded month table.",
)
def analytics_monthly_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    active = o.select(
        "o_custkey", F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).distinct()
    mx = active.agg(F.max("month").alias("last_month")).withColumn(
        "_k", F.lit(1)
    )
    nxt = active.select(
        F.col("o_custkey").alias("n_custkey"),
        F.col("month").alias("n_month"),
    )
    flags = active.join(
        nxt,
        (F.col("o_custkey") == F.col("n_custkey"))
        & (
            F.add_months(F.col("month"), 1).cast("timestamp_ntz")
            == F.col("n_month")
        ),
        "left",
    ).select(
        "o_custkey",
        "month",
        F.when(F.col("n_custkey").isNull(), 1).otherwise(0).alias("churned"),
    )
    return (
        flags.withColumn("_k", F.lit(1))
        .join(F.broadcast(mx), "_k")
        .filter(F.col("month") < F.col("last_month"))
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.sum("churned").cast("long").alias("n_churned"),
            F.expr("(1000000 * sum(churned)) div count(*)")
            .cast("long")
            .alias("churn_ppm"),
        )
        .orderBy("month")
    )


@register(
    "analytics_aging_buckets",
    oracle="""
WITH mx AS (SELECT MAX(o_orderdate) AS asof FROM orders),
aged AS (
  SELECT o_orderpriority,
         date_diff('day', o_orderdate, mx.asof) AS age_days,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders CROSS JOIN mx
  WHERE o_orderstatus = 'O'
)
SELECT o_orderpriority,
       CASE WHEN age_days <= 30 THEN '0-30'
            WHEN age_days <= 60 THEN '31-60'
            WHEN age_days <= 90 THEN '61-90'
            ELSE '90+' END AS age_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS open_cents
FROM aged
GROUP BY o_orderpriority, age_bucket
ORDER BY o_orderpriority, age_bucket
""",
    category="analytics",
    description="Open-order aging report (the AR aging staple): open "
    "('O') orders bucketed 0-30/31-60/61-90/90+ days old relative to "
    "the data horizon, with counts and integer-cent exposure per "
    "priority. The as-of date rides a broadcast 1-row aggregate; the "
    "rest is one pushed-filter scan + a bounded (priority x 4) "
    "aggregate.",
)
def analytics_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("asof")).withColumn("_k", F.lit(1))
    aged = (
        o.filter(F.col("o_orderstatus") == "O")
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(mx), "_k")
        .select(
            "o_orderpriority",
            F.datediff(F.col("asof"), F.col("o_orderdate")).alias("age_days"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    return (
        aged.groupBy(
            "o_orderpriority",
            F.when(F.col("age_days") <= 30, "0-30")
            .when(F.col("age_days") <= 60, "31-60")
            .when(F.col("age_days") <= 90, "61-90")
            .otherwise("90+")
            .alias("age_bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("open_cents"),
        )
        .orderBy("o_orderpriority", "age_bucket")
    )


@register(
    "events_path_trigrams",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e2,
         LEAD(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e3
  FROM events
),
paths AS (
  SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
  GROUP BY path
)
SELECT path, n FROM paths ORDER BY n DESC, path LIMIT 20
""",
    category="analytics",
    description="User-journey trigram mining: the top-20 length-3 "
    "event-type paths across all user sequences (the order-2 extension "
    "of events_transition_matrix — funnel discovery rather than funnel "
    "measurement). Two LEADs over per-user windows (uniform small "
    "partitions, event-id tie-break), one aggregate into the <= types^3 "
    "path table, TakeOrdered(20) on the unique (count, path) order.",
)
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        seq.select(
            F.concat_ws(" > ", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


@register(
    "events_type_cooccurrence",
    oracle="""
WITH tu AS (
  SELECT DISTINCT event_type, user_id FROM events
),
sizes AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM tu GROUP BY event_type
),
total AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM events),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM tu a JOIN tu b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY type_a, type_b
)
SELECT p.type_a, p.type_b, p.n_both,
       CAST((1000000 * p.n_both) //
            (sa.n_users + sb.n_users - p.n_both) AS BIGINT) AS jaccard_ppm,
       CAST((1000000 * CAST(t.n AS HUGEINT) * p.n_both)
            // (CAST(sa.n_users AS HUGEINT) * sb.n_users)
            AS BIGINT) AS lift_ppm
FROM pairs p
JOIN sizes sa ON sa.event_type = p.type_a
JOIN sizes sb ON sb.event_type = p.type_b
CROSS JOIN total t
ORDER BY p.type_a, p.type_b
""",
    category="analytics",
    description="Behavioral co-occurrence between event types at USER "
    "level: for each type pair, the users doing both, set Jaccard, and "
    "lift vs independence — all integer ppm. The self-join runs on the "
    "distinct (type, user) table keyed by user (<= types rows per user, "
    "so fanout is bounded by types^2 per user, never corpus^2); sizes "
    "and the user total are bounded broadcasts. The audience-overlap "
    "matrix every ads/analytics stack computes.",
)
def events_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    total = ev.agg(
        F.countDistinct("user_id").cast("long").alias("n")
    ).withColumn("_k", F.lit(1))
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), F.col("user_id").alias("uid_b"))
    pairs = (
        a.join(b, (a.user_id == b.uid_b) & (a.type_a < b.type_b))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("na"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(total), "_k")
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.expr("(1000000 * n_both) div (na + nb - n_both)")
            .cast("long")
            .alias("jaccard_ppm"),
            # decimal(38,0): 1e6 * users * users overflows int64 past
            # ~1e9 distinct users — the ppm numerator must widen
            F.expr(
                "(1000000 * cast(n as decimal(38,0)) * n_both)"
                " div (cast(na as decimal(38,0)) * nb)"
            )
            .cast("long")
            .alias("lift_ppm"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "analytics_new_vs_returning",
    oracle="""
WITH firsts AS (
  SELECT o_custkey, MIN(o_orderdate) AS first_order
  FROM orders GROUP BY o_custkey
),
tagged AS (
  SELECT date_trunc('month', o.o_orderdate) AS month,
         CASE WHEN o.o_orderdate = f.first_order THEN 'new'
              ELSE 'returning' END AS cohort,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
)
SELECT month, cohort,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM tagged GROUP BY month, cohort
ORDER BY month, cohort
""",
    category="analytics",
    description="New-vs-returning revenue split per month (the BI "
    "acquisition/retention revenue decomposition): each order tags as "
    "'new' iff it lands on its customer's first order DATE (ties on the "
    "same day all count as new — deterministic, needs no within-day "
    "ordering), via one custkey-keyed first-order aggregate joined back "
    "uniform. Integer cents; calendar-bounded output.",
)
def analytics_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_order")
    )
    tagged = o.join(firsts, "o_custkey").select(
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        F.when(F.col("o_orderdate") == F.col("first_order"), "new")
        .otherwise("returning")
        .alias("cohort"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return (
        tagged.groupBy("month", "cohort")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("month", "cohort")
    )


@register(
    "analytics_repeat_purchase_rate",
    oracle="""
WITH cp AS (
  SELECT p.p_brand, o.o_custkey, l.l_partkey,
         CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS n_orders
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand, o.o_custkey, l.l_partkey
)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_cust_part_pairs,
       CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat_pairs,
       CAST((1000000 * SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END))
            // COUNT(*) AS BIGINT) AS repeat_ppm
FROM cp GROUP BY p_brand ORDER BY p_brand
""",
    category="analytics",
    description="Repeat-purchase rate per brand: the share of "
    "(customer, part) pairs ordered in >= 2 DISTINCT orders — the "
    "loyalty/consumable-detection metric. One orders join to attach the "
    "customer, one (brand, cust, part)-keyed count-distinct aggregate, "
    "then a brand-bounded rollup in integer ppm. Shuffles stay on "
    "uniform composite keys; no windows.",
)
def analytics_repeat_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # keyed spread of the 2-column fact projection (round 12): both key
    # columns are consumed by the joins/aggregate, so pruning is intact,
    # and the broadcast-join probes + partial distinct-aggregate leave the
    # single-row-group scan task. No-op at real splits.
    li = spread_small_scan(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
        key_cols=("l_orderkey", "l_partkey"),
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "o_custkey", "l_partkey")
        .agg(F.countDistinct("l_orderkey").cast("long").alias("n_orders"))
    )
    rep = F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0))
    return (
        cp.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cust_part_pairs"),
            rep.cast("long").alias("n_repeat_pairs"),
            F.expr(
                "(1000000 * sum(case when n_orders >= 2 then 1 else 0 end))"
                " div count(*)"
            ).cast("long").alias("repeat_ppm"),
        )
        .orderBy("p_brand")
    )


@register(
    "quality_embedding_screen",
    oracle="""
WITH q AS (
  SELECT label,
         CAST(len(embedding) AS BIGINT) AS dims,
         list_sum(list_transform(embedding,
           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                * CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS norm2q
  FROM embeddings
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(MIN(dims) AS BIGINT) AS dims_min,
       CAST(MAX(dims) AS BIGINT) AS dims_max,
       CAST(SUM(CASE WHEN norm2q = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero_vecs,
       CAST(SUM(norm2q) // COUNT(*) AS BIGINT) AS mean_norm2q
FROM q GROUP BY label ORDER BY label
""",
    category="quality",
    description="Embedding-table data-quality screen (the pre-flight "
    "check before any ANN/semantic stage): per label the vector count, "
    "min/max dimensionality (ragged arrays surface immediately), "
    "zero-vector count, and mean squared norm — with every norm "
    "quantized per-component to round(1e6*x) and summed as INTEGERS, so "
    "the check is bit-identical cross-engine and order-independent "
    "(float list_sum would be neither). Map-side array fold + one "
    "label-bounded aggregate.",
)
def quality_embedding_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    norm2q = F.aggregate(
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1000000).cast("long")
            * F.round(x.cast("double") * 1000000).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    q = e.select(
        "label",
        F.size("embedding").cast("long").alias("dims"),
        norm2q.alias("norm2q"),
    )
    return (
        q.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.min("dims").cast("long").alias("dims_min"),
            F.max("dims").cast("long").alias("dims_max"),
            F.sum(F.when(F.col("norm2q") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_zero_vecs"),
            F.expr("sum(norm2q) div count(*)").cast("long").alias(
                "mean_norm2q"
            ),
        )
        .orderBy("label")
    )


@register(
    "sim_centroid_separation",
    oracle="""
WITH comp AS (
  SELECT e.label, d.d,
         CAST(SUM(CAST(ROUND(CAST(e.embedding[d.d] AS DOUBLE) * 1000000) AS BIGINT))
              AS HUGEINT) AS s
  FROM embeddings e
  JOIN LATERAL (SELECT UNNEST(generate_series(1, len(e.embedding))) AS d)
    AS d ON TRUE
  GROUP BY e.label, d.d
),
sizes AS (
  SELECT label, CAST(COUNT(*) AS HUGEINT) AS n
  FROM embeddings GROUP BY label
),
selfdot AS (
  SELECT label, CAST(SUM(s * s) AS HUGEINT) AS dd
  FROM comp GROUP BY label
),
pairs AS (
  SELECT a.label AS label_a, b.label AS label_b,
         CAST(SUM(a.s * b.s) AS HUGEINT) AS dot
  FROM comp a JOIN comp b ON a.d = b.d AND a.label < b.label
  GROUP BY label_a, label_b
)
SELECT p.label_a, p.label_b,
       ROUND(CAST(p.dot AS DOUBLE)
             / SQRT(CAST(da.dd AS DOUBLE) * CAST(db.dd AS DOUBLE)), 6)
         AS centroid_cosine
FROM pairs p
JOIN selfdot da ON da.label = p.label_a
JOIN selfdot db ON db.label = p.label_b
ORDER BY p.label_a, p.label_b
""",
    category="similarity",
    description="Inter-label centroid separation: cosine between every "
    "pair of label centroids (the clustering-quality margin that says "
    "whether labels are even separable before training on them). "
    "Component sums are EXACT integers (round(1e6*x) per element, "
    "decimal(38,0)/HUGEINT sums), centroids never materialize as floats "
    "— the scale-normalizing counts cancel inside the cosine, so the "
    "ratio is computed from exact integer dot products in an identical "
    "double expression tree. One posexplode + a (labels x dims)-bounded "
    "pipeline; the pair join is labels^2-bounded.",
)
def sim_centroid_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    comp = (
        e.select(
            "label", F.posexplode("embedding").alias("pos", "x")
        )
        .groupBy("label", (F.col("pos") + 1).alias("d"))
        .agg(
            F.sum(F.round(F.col("x").cast("double") * 1000000).cast("long"))
            .cast("decimal(38,0)")
            .alias("s")
        )
    )
    selfdot = comp.groupBy("label").agg(
        F.sum(F.expr("s * s")).cast("decimal(38,0)").alias("dd")
    )
    a = comp.select(
        F.col("label").alias("label_a"), "d", F.col("s").alias("sa")
    )
    b = comp.select(
        F.col("label").alias("label_b"),
        F.col("d").alias("d_b"),
        F.col("s").alias("sb"),
    )
    pairs = (
        a.join(b, (a.d == b.d_b) & (a.label_a < b.label_b))
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.expr("sa * sb")).cast("decimal(38,0)").alias("dot"))
    )
    da = selfdot.select(
        F.col("label").alias("label_a"), F.col("dd").alias("dda")
    )
    db = selfdot.select(
        F.col("label").alias("label_b"), F.col("dd").alias("ddb")
    )
    return (
        pairs.join(F.broadcast(da), "label_a")
        .join(F.broadcast(db), "label_b")
        .select(
            "label_a",
            "label_b",
            F.round(
                F.col("dot").cast("double")
                / F.sqrt(
                    F.col("dda").cast("double") * F.col("ddb").cast("double")
                ),
                6,
            ).alias("centroid_cosine"),
        )
        .orderBy("label_a", "label_b")
    )


@register(
    "ts_categorical_drift",
    oracle="""
WITH mc AS (
  SELECT date_trunc('month', o_orderdate) AS month, o_orderpriority AS cat,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY month, cat
),
shares AS (
  SELECT month, cat, n,
         CAST((1000000 * n) // SUM(n) OVER (PARTITION BY month) AS BIGINT)
           AS share_ppm
  FROM mc
),
lagged AS (
  SELECT month, cat, share_ppm,
         LAG(share_ppm) OVER (PARTITION BY cat ORDER BY month) AS prev_ppm
  FROM shares
)
SELECT month,
       CAST(SUM(ABS(share_ppm - prev_ppm)) // 2 AS BIGINT) AS tvd_ppm,
       CAST(MAX(ABS(share_ppm - prev_ppm)) AS BIGINT) AS max_cat_shift_ppm
FROM lagged
WHERE prev_ppm IS NOT NULL
GROUP BY month
HAVING COUNT(*) = 5
ORDER BY month
""",
    category="timeseries",
    description="Categorical distribution drift month over month (the "
    "data-drift monitor every ML ingest pipeline needs): each month's "
    "order-priority mix as integer ppm shares, then the total variation "
    "distance (half the L1 between consecutive months' shares) and the "
    "largest single-category shift — all integer arithmetic. Months "
    "with an incomplete category panel are excluded (HAVING = 5) so a "
    "missing category never fakes a drift spike. One bounded "
    "(months x 5) aggregate; every window runs on it.",
)
def ts_categorical_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    mc = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        F.col("o_orderpriority").alias("cat"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    # bounded: shares + lag windows run on the (months x 5) mix table
    shares = mc.withColumn(
        "share_ppm",
        F.expr("(1000000 * n) div sum(n) over (partition by month)")
        .cast("long"),
    )
    lagged = shares.withColumn(
        "prev_ppm",
        F.lag("share_ppm").over(Window.partitionBy("cat").orderBy("month")),
    ).filter(F.col("prev_ppm").isNotNull())
    return (
        lagged.groupBy("month")
        .agg(
            F.expr("sum(abs(share_ppm - prev_ppm)) div 2")
            .cast("long")
            .alias("tvd_ppm"),
            F.max(F.abs(F.col("share_ppm") - F.col("prev_ppm")))
            .cast("long")
            .alias("max_cat_shift_ppm"),
            F.count(F.lit(1)).alias("_ncat"),
        )
        .filter(F.col("_ncat") == 5)
        .drop("_ncat")
        .orderBy("month")
    )


@register(
    "scan_table_profile",
    oracle="""
SELECT 'o_custkey' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct
FROM orders
UNION ALL
SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT)
FROM orders
UNION ALL
SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT)
FROM orders
ORDER BY column_name
""",
    category="scan",
    description="Table profiling (the data-catalog staple): per column "
    "the row count, null count, and EXACT distinct cardinality for a "
    "named column set of orders. Spark computes all three columns' "
    "profiles in ONE multi-countDistinct aggregate over one scan "
    "(Catalyst expands it to an Expand + two-level aggregate — one "
    "pass, no per-column rescans), then unpivots to the catalog shape; "
    "the oracle spells the same numbers as three scans because DuckDB "
    "is the referee, not the plan under test.",
)
def scan_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderpriority", "o_orderstatus"]
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"nulls_{c}")
        )
        aggs.append(F.countDistinct(c).cast("long").alias(f"dist_{c}"))
    one = o.agg(*aggs)
    stack = ", ".join(
        f"'{c}', nulls_{c}, dist_{c}" for c in cols
    )
    return (
        one.selectExpr(
            "n_rows",
            f"stack({len(cols)}, {stack}) AS (column_name, n_nulls, n_distinct)",
        )
        .select("column_name", "n_rows", "n_nulls", "n_distinct")
        .orderBy("column_name")
    )


# ===========================================================================
# Round 10: distribution tests, information theory, inequality, cohort LTV
# (statistical comparisons a 100 TB curation pipeline runs between corpus
# slices — all exact-integer or micro-quantized so the DuckDB oracle
# matches bit-for-bit; every window sits on a bounded aggregate panel)
# ===========================================================================

@register(
    "agg_ks_two_sample",
    oracle="""
WITH panel AS (
  SELECT n_chars,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c_en,
         CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS c_ot
  FROM documents GROUP BY n_chars
),
cum AS (
  SELECT n_chars,
         SUM(c_en) OVER (ORDER BY n_chars
                         ROWS UNBOUNDED PRECEDING) AS cum_en,
         SUM(c_ot) OVER (ORDER BY n_chars
                         ROWS UNBOUNDED PRECEDING) AS cum_ot,
         SUM(c_en) OVER () AS n_en,
         SUM(c_ot) OVER () AS n_ot
  FROM panel
),
d AS (
  SELECT n_chars, n_en, n_ot,
         ABS(cum_en * n_ot - cum_ot * n_en) AS d_scaled
  FROM cum
),
m AS (SELECT *, MAX(d_scaled) OVER () AS max_d FROM d)
SELECT CAST(MAX(n_en) AS BIGINT) AS n_en,
       CAST(MAX(n_ot) AS BIGINT) AS n_other,
       ROUND(CAST(MAX(max_d) AS DOUBLE)
             / (CAST(MAX(n_en) AS DOUBLE) * CAST(MAX(n_ot) AS DOUBLE)),
             6) AS ks_stat,
       CAST(MIN(n_chars) AS BIGINT) AS ks_at_nchars
FROM m WHERE d_scaled = max_d
""",
    category="aggregation",
    description="Two-sample Kolmogorov-Smirnov statistic between the "
    "document-length (n_chars) distributions of English vs non-English "
    "docs — the drift test a curation pipeline runs between corpus "
    "slices before mixing them. The KS supremum is computed EXACTLY in "
    "integers: per length value the cross-multiplied CDF gap "
    "|cum_en*n_ot - cum_ot*n_en| (int64), max over the panel, divided "
    "out as a double only at the end. Scale posture: one groupBy on "
    "n_chars (distinct values bounded by max document length, not "
    "corpus size); every window runs on that bounded panel.",
)
def agg_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    panel = d.groupBy("n_chars").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("c_en"),
        F.sum(F.when(F.col("lang") == "en", 0).otherwise(1))
        .cast("long")
        .alias("c_ot"),
    )
    w_cum = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = panel.select(
        "n_chars",
        F.sum("c_en").over(w_cum).alias("cum_en"),
        F.sum("c_ot").over(w_cum).alias("cum_ot"),
        F.sum("c_en").over(w_all).alias("n_en"),
        F.sum("c_ot").over(w_all).alias("n_ot"),
    )
    dd = cum.select(
        "n_chars",
        "n_en",
        "n_ot",
        F.abs(
            F.col("cum_en") * F.col("n_ot") - F.col("cum_ot") * F.col("n_en")
        ).alias("d_scaled"),
    )
    m = dd.withColumn("max_d", F.max("d_scaled").over(w_all))
    return m.filter(F.col("d_scaled") == F.col("max_d")).agg(
        F.max("n_en").cast("long").alias("n_en"),
        F.max("n_ot").cast("long").alias("n_other"),
        F.round(
            F.max("max_d").cast("double")
            / (F.max("n_en").cast("double") * F.max("n_ot").cast("double")),
            6,
        ).alias("ks_stat"),
        F.min("n_chars").cast("long").alias("ks_at_nchars"),
    )


@register(
    "agg_mutual_information",
    oracle="""
WITH joint AS (
  SELECT event_type, dayofweek(ts) + 1 AS dow,
         CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM events GROUP BY event_type, dayofweek(ts) + 1
),
marg AS (
  SELECT event_type, dow, c_xy,
         SUM(c_xy) OVER (PARTITION BY event_type) AS c_x,
         SUM(c_xy) OVER (PARTITION BY dow) AS c_y,
         SUM(c_xy) OVER () AS n
  FROM joint
),
terms AS (
  SELECT c_xy, c_x, c_y, n,
         CAST(ROUND(1000000 * c_xy
                    * ln(CAST(c_xy AS DOUBLE) * CAST(n AS DOUBLE)
                         / (CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE))))
              AS BIGINT) AS mi_micro,
         CAST(ROUND(1000000 * c_xy * ln(CAST(c_xy AS DOUBLE))) AS BIGINT)
           AS xy_xlogx
  FROM marg
),
hx AS (
  SELECT SUM(CAST(ROUND(1000000 * c_x * ln(CAST(c_x AS DOUBLE))) AS BIGINT))
           AS sx
  FROM (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c_x
        FROM events GROUP BY event_type)
),
hy AS (
  SELECT SUM(CAST(ROUND(1000000 * c_y * ln(CAST(c_y AS DOUBLE))) AS BIGINT))
           AS sy
  FROM (SELECT dayofweek(ts) + 1 AS dow, CAST(COUNT(*) AS BIGINT) AS c_y
        FROM events GROUP BY dayofweek(ts) + 1)
)
SELECT CAST(MAX(n) AS BIGINT) AS n_events,
       ROUND(SUM(mi_micro) / 1000000.0 / MAX(n), 6) AS mi_nats,
       ROUND(ln(MAX(n)) - (SELECT sx FROM hx) / 1000000.0 / MAX(n), 6)
         AS h_event_type,
       ROUND(ln(MAX(n)) - (SELECT sy FROM hy) / 1000000.0 / MAX(n), 6)
         AS h_dow
FROM terms
""",
    category="aggregation",
    description="Mutual information (nats) between event type and "
    "day-of-week, plus both marginal entropies — the dependence screen "
    "run before treating features as independent. Each c*ln(.) term is "
    "micro-quantized to int64 from EXACT integer counts (the "
    "text_entropy_by_source trick), so the shuffle-order-dependent "
    "float sum never exists; the joint panel is |types| x 7 cells, "
    "marginals ride window sums over it. Day-of-week numbering pinned "
    "to Sunday=1 on both engines.",
)
def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    joint = e.groupBy(
        "event_type", F.dayofweek("ts").cast("long").alias("dow")
    ).agg(F.count(F.lit(1)).cast("long").alias("c_xy"))
    w_x = Window.partitionBy("event_type")
    w_y = Window.partitionBy("dow")
    w_all = Window.partitionBy()
    marg = joint.select(
        "c_xy",
        F.sum("c_xy").over(w_x).alias("c_x"),
        F.sum("c_xy").over(w_y).alias("c_y"),
        F.sum("c_xy").over(w_all).alias("n"),
    )
    micro = lambda col: F.round(1000000 * col).cast("long")  # noqa: E731
    terms = marg.select(
        "c_xy",
        "c_x",
        "c_y",
        "n",
        micro(
            F.col("c_xy")
            * F.log(
                F.col("c_xy").cast("double")
                * F.col("n").cast("double")
                / (F.col("c_x").cast("double") * F.col("c_y").cast("double"))
            )
        ).alias("mi_micro"),
    )
    # marginal xlogx sums from their own (bounded) one-column aggregates
    sx = (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("c_x"))
        .agg(
            F.sum(micro(F.col("c_x") * F.log(F.col("c_x").cast("double"))))
            .cast("long")
            .alias("sx")
        )
    )
    sy = (
        e.groupBy(F.dayofweek("ts").cast("long").alias("dow"))
        .agg(F.count(F.lit(1)).cast("long").alias("c_y"))
        .agg(
            F.sum(micro(F.col("c_y") * F.log(F.col("c_y").cast("double"))))
            .cast("long")
            .alias("sy")
        )
    )
    agg = terms.agg(
        F.max("n").cast("long").alias("n_events"),
        F.round(F.sum("mi_micro") / 1e6 / F.max("n"), 6).alias("mi_nats"),
        F.max("n").alias("_n"),
    )
    # 1-row broadcast attaches (the allowlisted pattern) for the marginals
    out = agg.join(F.broadcast(sx)).join(F.broadcast(sy))
    return out.select(
        "n_events",
        "mi_nats",
        F.round(
            F.log(F.col("_n").cast("double"))
            - F.col("sx").cast("double") / 1e6 / F.col("_n"),
            6,
        ).alias("h_event_type"),
        F.round(
            F.log(F.col("_n").cast("double"))
            - F.col("sy").cast("double") / 1e6 / F.col("_n"),
            6,
        ).alias("h_dow"),
    )


@register(
    "text_simpson_diversity",
    oracle=f"""
WITH toks AS (
  SELECT source, UNNEST({T.TOKENS_SQL.format(c="text")}) AS tok
  FROM documents
),
counts AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY source, tok
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(c * (c - 1)) AS BIGINT) AS sum_pairs,
       ROUND(CAST(SUM(c * (c - 1)) AS DOUBLE)
             / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) - 1 AS DOUBLE)),
             9) AS simpson
FROM counts GROUP BY source
ORDER BY source
""",
    category="text",
    description="Simpson diversity index of the token distribution per "
    "source (probability two tokens drawn without replacement are the "
    "same type) — the repetitiveness screen next to entropy and hapax "
    "rate. Exact: the numerator Sum(c*(c-1)) and denominator N(N-1) are "
    "pure int64 from token counts; the only double is the final ratio. "
    "One explode + two map-side-combinable aggregates, vocabulary-"
    "bounded.",
)
def text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    counts = (
        d.select("source", F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return (
        counts.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("sum_pairs"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            "sum_pairs",
            F.round(
                F.col("sum_pairs").cast("double")
                / (
                    F.col("n_tokens").cast("double")
                    * (F.col("n_tokens") - 1).cast("double")
                ),
                9,
            ).alias("simpson"),
        )
        .orderBy("source")
    )


@register(
    "agg_theil_index",
    oracle="""
WITH rev AS (
  SELECT o.o_custkey,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders o GROUP BY o.o_custkey
),
tagged AS (
  SELECT n.n_name AS nation, r.cents
  FROM rev r
  JOIN customer c ON c.c_custkey = r.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
),
tot AS (
  SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS total
  FROM tagged GROUP BY nation
),
terms AS (
  SELECT t.nation, tt.n, tt.total,
         CAST(ROUND(1000000
                    * (CAST(t.cents AS DOUBLE) * CAST(tt.n AS DOUBLE)
                       / CAST(tt.total AS DOUBLE))
                    * ln(CAST(t.cents AS DOUBLE) * CAST(tt.n AS DOUBLE)
                         / CAST(tt.total AS DOUBLE))) AS BIGINT) AS th_micro
  FROM tagged t JOIN tot tt ON tt.nation = t.nation
)
SELECT nation,
       CAST(MAX(n) AS BIGINT) AS n_customers,
       CAST(MAX(total) AS BIGINT) AS total_cents,
       ROUND(SUM(th_micro) / 1000000.0 / MAX(n), 6) AS theil_t
FROM terms GROUP BY nation
ORDER BY nation
""",
    category="aggregation",
    description="Theil T inequality index of customer revenue per nation "
    "(the decomposable complement to agg_gini_customer_revenue: T = "
    "mean((x/mu) * ln(x/mu))). Revenue rides exact integer cents; each "
    "customer's transcendental term is computed from the SAME int64 "
    "triple (cents, n, total) in both engines and micro-quantized to "
    "int64 before the sum, so shuffle order cannot perturb the result. "
    "Two aggregates + a broadcast-size nation-panel join back to "
    "customer rows — entity-grain, never corpus-grain.",
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    tagged = (
        rev.join(c, rev["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(F.col("n_name").alias("nation"), "cents")
    )
    tot = tagged.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("total"),
    )
    ratio = (
        F.col("cents").cast("double")
        * F.col("n").cast("double")
        / F.col("total").cast("double")
    )
    terms = tagged.join(F.broadcast(tot), "nation").select(
        "nation",
        "n",
        "total",
        F.round(1000000 * ratio * F.log(ratio)).cast("long").alias("th_micro"),
    )
    return (
        terms.groupBy("nation")
        .agg(
            F.max("n").cast("long").alias("n_customers"),
            F.max("total").cast("long").alias("total_cents"),
            F.round(F.sum("th_micro") / 1e6 / F.max("n"), 6).alias("theil_t"),
        )
        .orderBy("nation")
    )


@register(
    "analytics_cohort_ltv",
    oracle="""
WITH om AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
           AS ym,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
coh AS (
  SELECT o_custkey, MIN(ym) AS m0 FROM om GROUP BY o_custkey
),
sizes AS (
  SELECT m0, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM coh GROUP BY m0
),
panel AS (
  SELECT c.m0, om.ym - c.m0 AS age_months,
         CAST(SUM(om.cents) AS BIGINT) AS rev_cents
  FROM om JOIN coh c ON c.o_custkey = om.o_custkey
  GROUP BY c.m0, om.ym - c.m0
),
cum AS (
  SELECT p.m0, p.age_months, s.cohort_size,
         SUM(p.rev_cents) OVER (PARTITION BY p.m0 ORDER BY p.age_months
                                ROWS UNBOUNDED PRECEDING) AS cum_rev_cents
  FROM panel p JOIN sizes s ON s.m0 = p.m0
)
SELECT printf('%04d-%02d', m0 // 12, m0 % 12 + 1) AS cohort_month,
       CAST(age_months AS BIGINT) AS age_months,
       cohort_size,
       CAST(cum_rev_cents AS BIGINT) AS cum_rev_cents,
       CAST(cum_rev_cents // cohort_size AS BIGINT) AS ltv_cents_per_cust
FROM cum
WHERE age_months <= 11
ORDER BY cohort_month, age_months
""",
    category="analytics",
    description="Cohort LTV curve: customers cohorted by first-order "
    "month, cumulative revenue per cohort by month age (first 12 "
    "months), and LTV-per-customer — the unit-economics table next to "
    "events_retention_cohorts. Month arithmetic is integer (y*12+m-1) "
    "on both engines, money is integer cents, LTV is integer division. "
    "Scale posture: two entity-grain aggregates + a (cohorts x ages) "
    "panel; the running sum windows over the bounded panel.",
)
def analytics_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    om = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("ym"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    coh = om.groupBy("o_custkey").agg(F.min("ym").alias("m0"))
    sizes = coh.groupBy("m0").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    panel = (
        om.join(coh, "o_custkey")
        .groupBy("m0", (F.col("ym") - F.col("m0")).alias("age_months"))
        .agg(F.sum("cents").cast("long").alias("rev_cents"))
    )
    w = (
        Window.partitionBy("m0")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = panel.join(F.broadcast(sizes), "m0").select(
        "m0",
        "age_months",
        "cohort_size",
        F.sum("rev_cents").over(w).alias("cum_rev_cents"),
    )
    return (
        cum.filter(F.col("age_months") <= 11)
        .select(
            F.format_string(
                "%04d-%02d",
                F.expr("m0 div 12").cast("int"),
                (F.col("m0") % 12 + 1).cast("int"),
            ).alias("cohort_month"),
            F.col("age_months").cast("long").alias("age_months"),
            "cohort_size",
            F.col("cum_rev_cents").cast("long").alias("cum_rev_cents"),
            F.expr("cum_rev_cents div cohort_size")
            .cast("long")
            .alias("ltv_cents_per_cust"),
        )
        .orderBy("cohort_month", "age_months")
    )


@register(
    "agg_spearman_daily",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS clicks,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS purchases
  FROM events GROUP BY date_trunc('day', ts)
),
ranked AS (
  SELECT
    2 * RANK() OVER (ORDER BY clicks)
      + COUNT(*) OVER (PARTITION BY clicks) - 1 AS rx2,
    2 * RANK() OVER (ORDER BY purchases)
      + COUNT(*) OVER (PARTITION BY purchases) - 1 AS ry2
  FROM daily
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rx2) AS BIGINT) AS sx, CAST(SUM(ry2) AS BIGINT) AS sy,
         CAST(SUM(rx2 * ry2) AS BIGINT) AS sxy,
         CAST(SUM(rx2 * rx2) AS BIGINT) AS sxx,
         CAST(SUM(ry2 * ry2) AS BIGINT) AS syy
  FROM ranked
)
SELECT n AS n_days,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6)
         AS rho_spearman
FROM s
""",
    category="aggregation",
    description="Spearman rank correlation (average-rank tie convention) "
    "between daily click and purchase counts. Ties are handled exactly: "
    "2*avg_rank = 2*RANK() + tie_count - 1 stays integer, and Pearson "
    "over the doubled ranks equals Pearson over average ranks (affine "
    "invariance), so every moment is an int64 sum over the bounded "
    "daily panel — the OLS/corr determinism trick applied to rank "
    "statistics. One corpus aggregate to the day panel; all windows "
    "ride the panel.",
)
def agg_spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("clicks"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("purchases"),
    )
    # bounded: both rank windows run on the day-level panel (rows = days
    # in the calendar span, never corpus rows) produced by the aggregate
    rx2 = (
        2 * F.rank().over(Window.orderBy("clicks"))
        + F.count(F.lit(1)).over(Window.partitionBy("clicks"))
        - 1
    ).cast("long")
    ry2 = (
        2 * F.rank().over(Window.orderBy("purchases"))
        + F.count(F.lit(1)).over(Window.partitionBy("purchases"))
        - 1
    ).cast("long")
    ranked = daily.select(rx2.alias("rx2"), ry2.alias("ry2"))
    s = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx2").cast("long").alias("sx"),
        F.sum("ry2").cast("long").alias("sy"),
        F.sum(F.col("rx2") * F.col("ry2")).cast("long").alias("sxy"),
        F.sum(F.col("rx2") * F.col("rx2")).cast("long").alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).cast("long").alias("syy"),
    )
    return s.select(
        F.col("n").alias("n_days"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                    "double"
                )
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                    "double"
                )
            ),
            6,
        ).alias("rho_spearman"),
    )


@register(
    "ts_dow_seasonality",
    oracle="""
WITH rows_q AS (
  SELECT event_type, dayofweek(ts) + 1 AS dow,
         CAST(ROUND(value * 1000000) AS BIGINT) AS v_micro
  FROM events
),
dowp AS (
  SELECT event_type, dow,
         CAST(COUNT(*) AS BIGINT) AS n_d,
         CAST(SUM(v_micro) AS BIGINT) AS s_d
  FROM rows_q GROUP BY event_type, dow
),
means AS (
  SELECT event_type, dow, s_d // n_d AS dow_mean_micro,
         SUM(s_d) OVER (PARTITION BY event_type)
           // SUM(n_d) OVER (PARTITION BY event_type) AS overall_mean_micro,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY s_d // n_d DESC, dow) AS rn_peak,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY s_d // n_d ASC, dow) AS rn_trough
  FROM dowp
)
SELECT event_type,
       CAST(MAX(overall_mean_micro) AS BIGINT) AS overall_mean_micro,
       CAST(MAX(CASE WHEN rn_peak = 1 THEN dow END) AS BIGINT) AS peak_dow,
       CAST(MAX(CASE WHEN rn_peak = 1 THEN dow_mean_micro END) AS BIGINT)
         AS peak_mean_micro,
       CAST(MAX(CASE WHEN rn_trough = 1 THEN dow END) AS BIGINT)
         AS trough_dow,
       CAST(MAX(CASE WHEN rn_trough = 1 THEN dow_mean_micro END) AS BIGINT)
         AS trough_mean_micro,
       CAST((1000000 * (MAX(CASE WHEN rn_peak = 1 THEN dow_mean_micro END)
                        - MAX(CASE WHEN rn_trough = 1 THEN dow_mean_micro END)))
            // MAX(overall_mean_micro) AS BIGINT) AS amplitude_ppm
FROM means GROUP BY event_type
ORDER BY event_type
""",
    category="timeseries",
    description="Day-of-week seasonality profile per event type: the "
    "peak and trough weekday by mean event value and the peak-to-trough "
    "amplitude as ppm of the overall mean — the weekly-cycle screen a "
    "metrics pipeline runs before alerting on a Monday dip. Values are "
    "micro-quantized to int64 at the row, means are integer division, "
    "argmax/argmin are deterministic (mean, then weekday) row_numbers — "
    "zero float anywhere. One corpus aggregate to the (types x 7) "
    "panel; every window rides the panel.",
)
def ts_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    dowp = e.groupBy(
        "event_type", F.dayofweek("ts").cast("long").alias("dow")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_d"),
        F.sum(F.round(F.col("value") * 1000000).cast("long"))
        .cast("long")
        .alias("s_d"),
    )
    mean_c = F.expr("s_d div n_d")
    w_t = Window.partitionBy("event_type")
    means = dowp.select(
        "event_type",
        "dow",
        mean_c.alias("dow_mean_micro"),
        F.row_number()
        .over(w_t.orderBy(mean_c.desc(), F.col("dow")))
        .alias("rn_peak"),
        F.row_number()
        .over(w_t.orderBy(mean_c.asc(), F.col("dow")))
        .alias("rn_trough"),
        F.expr(
            "sum(s_d) over (partition by event_type) "
            "div sum(n_d) over (partition by event_type)"
        ).alias("overall_mean_micro"),
    )
    peak = lambda col: F.max(F.when(F.col("rn_peak") == 1, col))  # noqa: E731
    trough = lambda col: F.max(  # noqa: E731
        F.when(F.col("rn_trough") == 1, col)
    )
    return (
        means.groupBy("event_type")
        .agg(
            F.max("overall_mean_micro").cast("long").alias("overall_mean_micro"),
            peak(F.col("dow")).cast("long").alias("peak_dow"),
            peak(F.col("dow_mean_micro")).cast("long").alias("peak_mean_micro"),
            trough(F.col("dow")).cast("long").alias("trough_dow"),
            trough(F.col("dow_mean_micro"))
            .cast("long")
            .alias("trough_mean_micro"),
        )
        .select(
            "event_type",
            "overall_mean_micro",
            "peak_dow",
            "peak_mean_micro",
            "trough_dow",
            "trough_mean_micro",
            F.expr(
                "(1000000 * (peak_mean_micro - trough_mean_micro)) "
                "div overall_mean_micro"
            )
            .cast("long")
            .alias("amplitude_ppm"),
        )
        .orderBy("event_type")
    )


@register(
    "events_gap_profile",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS t_us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_us
  FROM events
),
gaps AS (
  SELECT event_type, (t_us - prev_us) // 1000000 AS gap_s
  FROM seq WHERE prev_us IS NOT NULL
),
hist AS (
  SELECT event_type, gap_s, CAST(COUNT(*) AS BIGINT) AS c
  FROM gaps GROUP BY event_type, gap_s
),
cum AS (
  SELECT event_type, gap_s, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY gap_s
                      ROWS UNBOUNDED PRECEDING) AS cum_c,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM hist
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_gaps,
       CAST(MIN(CASE WHEN cum_c >= (n + 1) // 2 THEN gap_s END) AS BIGINT)
         AS p50_gap_s,
       CAST(MIN(CASE WHEN cum_c >= (9 * n + 9) // 10 THEN gap_s END)
            AS BIGINT) AS p90_gap_s,
       CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
       CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
FROM cum GROUP BY event_type
ORDER BY event_type
""",
    category="analytics",
    description="Inter-event gap profile: per event type the exact "
    "lower-median and ceil-p90 of seconds since the user's previous "
    "event (any type) — the pacing signal behind session-timeout "
    "choices (ts_sessionize_gaps' 30-min cut) and bot detection. Gaps "
    "are integer microseconds floored to seconds; percentiles come "
    "from cumulative counts over the (type x distinct-gap) histogram "
    "with the explicit (n+1)/2, (9n+9)/10 rank convention, never an "
    "engine quantile. Scale posture: the lag window partitions by "
    "user (millions of small partitions); the percentile windows ride "
    "the histogram panel, bounded by the time span in seconds, not "
    "corpus size.",
)
def events_gap_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP. The cast pins the
    # session timezone to UTC-equivalent instants on both rows, so the
    # DIFFERENCE is timezone-invariant and matches DuckDB's epoch_us.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = e.select(
        "event_type",
        us.alias("t_us"),
        F.lag(us).over(w_u).alias("prev_us"),
    )
    gaps = seq.filter(F.col("prev_us").isNotNull()).select(
        "event_type",
        F.expr("(t_us - prev_us) div 1000000").alias("gap_s"),
    )
    hist = gaps.groupBy("event_type", "gap_s").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("gap_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_t = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "gap_s",
        F.sum("c").over(w_cum).alias("cum_c"),
        F.sum("c").over(w_t).alias("n"),
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_gaps"),
            F.min(
                F.when(F.col("cum_c") >= F.expr("(n + 1) div 2"), F.col("gap_s"))
            )
            .cast("long")
            .alias("p50_gap_s"),
            F.min(
                F.when(
                    F.col("cum_c") >= F.expr("(9 * n + 9) div 10"),
                    F.col("gap_s"),
                )
            )
            .cast("long")
            .alias("p90_gap_s"),
            F.min("gap_s").cast("long").alias("min_gap_s"),
            F.max("gap_s").cast("long").alias("max_gap_s"),
        )
        .orderBy("event_type")
    )


@register(
    "text_zipf_fit",
    oracle=f"""
WITH toks AS (
  SELECT source, UNNEST({T.TOKENS_SQL.format(c="text")}) AS tok
  FROM documents
),
counts AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY source, tok
),
ranked AS (
  SELECT source, c,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY c DESC, tok) AS rn
  FROM counts
),
pts AS (
  SELECT source,
         CAST(ROUND(1000000 * ln(CAST(rn AS DOUBLE))) AS BIGINT) AS x,
         CAST(ROUND(1000000 * ln(CAST(c AS DOUBLE))) AS BIGINT) AS y
  FROM ranked WHERE rn <= 128
),
s AS (
  SELECT source, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS syy
  FROM pts GROUP BY source
)
SELECT source, CAST(n AS BIGINT) AS n_ranks,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             * CAST(n * sxy - sx * sy AS DOUBLE)
             / (CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r_squared
FROM s ORDER BY source
""",
    category="text",
    description="Zipf's-law fit per source: OLS slope of ln(frequency) "
    "on ln(rank) over the top-128 token ranks, with R^2 — natural text "
    "slopes near -1, so a source whose slope collapses toward 0 is "
    "boilerplate/spam (the corpus-health screen next to entropy). "
    "ln terms are micro-quantized int64 from exact integer ranks and "
    "counts, the regression rides decimal(38,0) moment sums (the "
    "agg_ols_regression pattern), rank ties break on token text. The "
    "rank window partitions by source over the vocabulary-bounded "
    "count table.",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    counts = (
        d.select("source", F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.partitionBy("source").orderBy(F.col("c").desc(), F.col("tok"))
    pts = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 128)
        .select(
            "source",
            F.round(1000000 * F.log(F.col("rn").cast("double")))
            .cast("long")
            .alias("x"),
            F.round(1000000 * F.log(F.col("c").cast("double")))
            .cast("long")
            .alias("y"),
        )
    )
    dec = lambda c_: c_.cast("decimal(38,0)")  # noqa: E731
    s = pts.groupBy("source").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec(F.col("x"))).cast("decimal(38,0)").alias("sx"),
        F.sum(dec(F.col("y"))).cast("decimal(38,0)").alias("sy"),
        F.sum(dec(F.col("x") * F.col("y"))).cast("decimal(38,0)").alias("sxy"),
        F.sum(dec(F.col("x") * F.col("x"))).cast("decimal(38,0)").alias("sxx"),
        F.sum(dec(F.col("y") * F.col("y"))).cast("decimal(38,0)").alias("syy"),
    )
    cov = F.expr("cast(n * sxy - sx * sy as double)")
    varx = F.expr("cast(n * sxx - sx * sx as double)")
    vary = F.expr("cast(n * syy - sy * sy as double)")
    return s.select(
        "source",
        F.col("n").cast("long").alias("n_ranks"),
        F.round(cov / varx, 6).alias("zipf_slope"),
        F.round(cov * cov / (varx * vary), 6).alias("r_squared"),
    ).orderBy("source")


@register(
    "sim_knn_label_eval",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS true_label, embedding,
         {SIM.norm_sql("embedding")} AS nrm
  FROM embeddings WHERE vec_id < 600 AND vec_id % 17 = 3
),
c AS (
  SELECT vec_id AS neighbor_id, label, embedding,
         {SIM.norm_sql("embedding")} AS nrm
  FROM embeddings
),
scored AS (
  SELECT q.query_id, q.true_label, c.neighbor_id, c.label,
         {SIM.cosine_from_norms_sql("q.embedding", "c.embedding", "q.nrm", "c.nrm")}
           AS cos_sim
  FROM c, q
  WHERE c.neighbor_id != q.query_id
),
knn AS (
  SELECT query_id, true_label, label,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rk
  FROM scored
),
votes AS (
  SELECT query_id, true_label, label,
         CAST(COUNT(*) AS BIGINT) AS n_votes
  FROM knn WHERE rk <= 5
  GROUP BY query_id, true_label, label
),
winner AS (
  SELECT query_id, true_label, label AS pred_label,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY n_votes DESC, label) AS vr
  FROM votes
)
SELECT CAST(true_label AS BIGINT) AS true_label,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct
FROM winner WHERE vr = 1
GROUP BY true_label
ORDER BY true_label
""",
    category="similarity",
    description="Leave-one-out 5-NN label evaluation over the embedding "
    "table: for a deterministic bounded probe set (vec_id < 600, "
    "hash-strided — always replica-0 rows, so the probe count is "
    "constant at every SF), the majority label of the 5 nearest "
    "non-self neighbors by exact cosine, scored against the probe's "
    "own label per class — the standard embedding-quality eval before "
    "trusting vectors for dedup or retrieval. Votes tie-break "
    "(count desc, label) and ranks tie-break (cos desc, neighbor_id), "
    "so the verdict is engine-identical. Probe side is broadcast; "
    "scoring is one map-only pass over corpus partitions.",
)
def sim_knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # limit(64) is a no-op on the <=36-row probe filter; it puts a
    # GlobalLimit under the broadcast so the product-join plan gate can
    # PROVE the build side bounded (the sim_cosine_topk convention)
    q = (
        e.filter((F.col("vec_id") < 600) & (F.col("vec_id") % 17 == 3))
        .limit(64)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("true_label"),
            F.col("embedding").alias("_qv"),
            SIM.norm(F.col("embedding")).alias("_qn"),
        )
    )
    # the corpus side of the broadcast join fuses scoring into the scan
    # stage; single-row-group fixtures plan that as ONE task running every
    # |C|×|Q| decimal-HOF cosine serially (4.7 s of the 7.8 s sweep wall at
    # sf0.1). Spread the projected corpus first (no-op at real splits) and
    # compute the norm after the exchange so it parallelizes too.
    c = spread_small_scan(
        e.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("_clabel"),
            F.col("embedding").alias("_cv"),
        ),
        key_cols=("neighbor_id",),
    ).withColumn("_cn", SIM.norm(F.col("_cv")))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "true_label",
            "neighbor_id",
            "_clabel",
            SIM.cosine_from_norms(
                F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")
            ).alias("cos_sim"),
        )
    )
    w_rk = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    knn = scored.withColumn("rk", F.row_number().over(w_rk)).filter(
        F.col("rk") <= 5
    )
    votes = knn.groupBy("query_id", "true_label", "_clabel").agg(
        F.count(F.lit(1)).cast("long").alias("n_votes")
    )
    w_v = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("_clabel")
    )
    winner = votes.withColumn("vr", F.row_number().over(w_v)).filter(
        F.col("vr") == 1
    )
    return (
        winner.groupBy(F.col("true_label").cast("long").alias("true_label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            F.sum(
                F.when(F.col("_clabel") == F.col("true_label"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_correct"),
        )
        .orderBy("true_label")
    )


@register(
    "text_js_divergence",
    oracle=f"""
WITH toks AS (
  SELECT lang, UNNEST({T.TOKENS_SQL.format(c="text")}) AS tok
  FROM documents WHERE lang = 'en'
),
toks2 AS (
  SELECT d.lang, UNNEST({T.TOKENS_SQL.format(c="text")}) AS tok
  FROM documents d WHERE lang != 'en'
),
cp AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c1 FROM toks GROUP BY tok),
rest AS (
  SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c2
  FROM toks2 GROUP BY lang, tok
),
pair AS (
  SELECT r.lang,
         COALESCE(p.c1, 0) AS c1, r.c2
  FROM rest r LEFT JOIN cp p ON p.tok = r.tok
  UNION ALL
  SELECT l.lang, p.c1, 0 AS c2
  FROM cp p CROSS JOIN (SELECT DISTINCT lang FROM toks2) l
  WHERE NOT EXISTS (
    SELECT 1 FROM rest r WHERE r.lang = l.lang AND r.tok = p.tok
  )
),
tot AS (
  SELECT lang, CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
  FROM pair GROUP BY lang
),
terms AS (
  SELECT p.lang, t.n1, t.n2,
         CASE WHEN p.c1 > 0 THEN
           CAST(ROUND(1000000 * p.c1
                      * ln(2.0 * p.c1 * t.n2
                           / (CAST(p.c1 AS DOUBLE) * t.n2
                              + CAST(p.c2 AS DOUBLE) * t.n1)))
                AS BIGINT) ELSE 0 END AS s1_micro,
         CASE WHEN p.c2 > 0 THEN
           CAST(ROUND(1000000 * p.c2
                      * ln(2.0 * p.c2 * t.n1
                           / (CAST(p.c1 AS DOUBLE) * t.n2
                              + CAST(p.c2 AS DOUBLE) * t.n1)))
                AS BIGINT) ELSE 0 END AS s2_micro
  FROM pair p JOIN tot t ON t.lang = p.lang
)
SELECT lang,
       CAST(MAX(n1) AS BIGINT) AS n_tokens_en,
       CAST(MAX(n2) AS BIGINT) AS n_tokens_lang,
       ROUND((SUM(s1_micro) / 1000000.0 / MAX(n1)
              + SUM(s2_micro) / 1000000.0 / MAX(n2)) / 2, 6) AS js_nats
FROM terms GROUP BY lang
ORDER BY lang
""",
    category="text",
    description="Jensen-Shannon divergence (nats) between the English "
    "token distribution and each other language's — the symmetric, "
    "bounded (<= ln 2) corpus-mixing distance a data pipeline checks "
    "before blending sources. The mixture ratios p/m and q/m reduce to "
    "pure integer ratios 2*c1*n2/(c1*n2+c2*n1), so each transcendental "
    "term is a function of an exact int64 4-tuple, micro-quantized "
    "before the sum (the entropy-trick generalized to two "
    "distributions); one-sided tokens fall out naturally (ratio = 2). "
    "Vocabulary-bounded: two token aggregates + one vocab-grain "
    "full-alignment join, never corpus-pair work.",
)
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    toks = d.select("lang", F.explode(T.tokens(F.col("text"))).alias("tok"))
    cp = (
        toks.filter(F.col("lang") == "en")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
    )
    rest = (
        toks.filter(F.col("lang") != "en")
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c2"))
    )
    # full vocab alignment per language: outer-join EN counts onto each
    # language's vocab, then add EN-only tokens missing from that language
    langs = rest.select("lang").distinct()
    joined = rest.join(cp, "tok", "left").select(
        "lang", F.coalesce(F.col("c1"), F.lit(0)).alias("c1"), "c2"
    )
    en_only = (
        cp.join(F.broadcast(langs))
        .join(rest.select("lang", "tok"), ["lang", "tok"], "left_anti")
        .select("lang", "c1", F.lit(0).cast("long").alias("c2"))
    )
    pair = joined.unionByName(en_only)
    tot = pair.groupBy("lang").agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    den = (
        F.col("c1").cast("double") * F.col("n2").cast("double")
        + F.col("c2").cast("double") * F.col("n1").cast("double")
    )
    micro = lambda c_: F.round(1000000 * c_).cast("long")  # noqa: E731
    terms = pair.join(F.broadcast(tot), "lang").select(
        "lang",
        "n1",
        "n2",
        F.when(
            F.col("c1") > 0,
            micro(
                F.col("c1")
                * F.log(2.0 * F.col("c1") * F.col("n2") / den)
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("s1_micro"),
        F.when(
            F.col("c2") > 0,
            micro(
                F.col("c2")
                * F.log(2.0 * F.col("c2") * F.col("n1") / den)
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("s2_micro"),
    )
    return (
        terms.groupBy("lang")
        .agg(
            F.max("n1").cast("long").alias("n_tokens_en"),
            F.max("n2").cast("long").alias("n_tokens_lang"),
            F.round(
                (
                    F.sum("s1_micro") / 1e6 / F.max("n1")
                    + F.sum("s2_micro") / 1e6 / F.max("n2")
                )
                / 2,
                6,
            ).alias("js_nats"),
        )
        .orderBy("lang")
    )


@register(
    "text_burstiness_fano",
    oracle=f"""
WITH per_doc AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM (
    SELECT doc_id, UNNEST({T.TOKENS_SQL.format(c="text")}) AS tok
    FROM documents
  ) GROUP BY doc_id, tok
),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
stats AS (
  SELECT tok,
         CAST(SUM(c) AS BIGINT) AS total,
         CAST(SUM(c * c) AS BIGINT) AS total_sq,
         CAST(COUNT(*) AS BIGINT) AS doc_freq
  FROM per_doc GROUP BY tok
),
top AS (
  SELECT tok, total, total_sq, doc_freq,
         ROW_NUMBER() OVER (ORDER BY total DESC, tok) AS rn
  FROM stats
)
SELECT tok, CAST(rn AS BIGINT) AS rn, total, doc_freq,
       CAST((1000000 * (CAST((SELECT n_docs FROM nd) AS HUGEINT)
                          * CAST(total_sq AS HUGEINT)
                        - CAST(total AS HUGEINT) * CAST(total AS HUGEINT)))
            // (CAST((SELECT n_docs FROM nd) AS HUGEINT)
                * CAST(total AS HUGEINT)) AS BIGINT)
         AS fano_micro
FROM top WHERE rn <= 25
ORDER BY rn
""",
    category="text",
    description="Burstiness (Fano factor: variance/mean of the per-"
    "document count, zeros included) for the 25 highest-frequency "
    "tokens — function words sit near the Poisson baseline (~1) while "
    "topical/boilerplate tokens burst far above it, so the panel "
    "separates glue vocabulary from content and template artifacts. "
    "Fano = (N*Sum(c^2) - Sum(c)^2) / (N*Sum(c)) over all N docs "
    "reduces to the non-zero counts' moments, kept exact in int64 and "
    "emitted as truncating-division micro units (numerator >= 0, so "
    "floor division agrees cross-engine). Per-doc counts + one "
    "vocabulary aggregate + a top-25 rank over it.",
)
def text_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    per_doc = (
        d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n_docs = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    stats = per_doc.groupBy("tok").agg(
        F.sum("c").cast("long").alias("total"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("total_sq"),
        F.count(F.lit(1)).cast("long").alias("doc_freq"),
    )
    # bounded: the rank window runs on the vocabulary-grain stats table
    w = Window.orderBy(F.col("total").desc(), F.col("tok"))
    top = (
        stats.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 25)
        .join(F.broadcast(n_docs))
    )
    # decimal(38,0) through the numerator: 1e6 * n_docs * total_sq
    # overflows int64 past ~1e9 corpus tokens (the sf100 sweep caught the
    # ANSI ArithmeticException); the RESULT still fits a BIGINT
    return top.select(
        "tok",
        "rn",
        "total",
        "doc_freq",
        F.expr(
            "cast((1000000 * (cast(n_docs as decimal(38,0))"
            "                 * cast(total_sq as decimal(38,0))"
            "               - cast(total as decimal(38,0))"
            "                 * cast(total as decimal(38,0))))"
            "     div (cast(n_docs as decimal(38,0))"
            "          * cast(total as decimal(38,0))) as long)"
        ).alias("fano_micro"),
    ).orderBy("rn")


@register(
    "agg_cramers_v",
    oracle="""
WITH cells AS (
  SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
         CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY segment, priority
),
m AS (
  SELECT segment, priority, n_obs,
         CAST(SUM(n_obs) OVER (PARTITION BY segment) AS HUGEINT) AS rt,
         CAST(SUM(n_obs) OVER (PARTITION BY priority) AS HUGEINT) AS ct,
         CAST(SUM(n_obs) OVER () AS HUGEINT) AS n
  FROM cells
),
chi AS (
  SELECT MAX(n) AS n,
         CAST(COUNT(DISTINCT segment) AS HUGEINT) AS r,
         CAST(COUNT(DISTINCT priority) AS HUGEINT) AS k,
         SUM(CAST(ROUND(1000000.0
                        * CAST(n * n_obs - rt * ct AS DOUBLE)
                        * CAST(n * n_obs - rt * ct AS DOUBLE)
                        / CAST(n * rt * ct AS DOUBLE))
                  AS HUGEINT)) AS chi2_micro_n
  FROM m
)
SELECT CAST(n AS BIGINT) AS n_rows,
       CAST(r AS BIGINT) AS n_segments,
       CAST(k AS BIGINT) AS n_priorities,
       ROUND(CAST(chi2_micro_n AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE),
             6) AS chi2,
       ROUND(sqrt(CAST(chi2_micro_n AS DOUBLE) / 1000000.0
                  / CAST(n AS DOUBLE) / CAST(n AS DOUBLE)
                  / CAST(LEAST(r - 1, k - 1) AS DOUBLE)), 6) AS cramers_v
FROM chi
""",
    category="aggregation",
    description="Cramer's V effect size for the segment x priority "
    "contingency table — the normalized [0,1] companion to "
    "agg_chi_square_independence's raw per-cell contributions, the "
    "number an experimenter actually compares across tables. Each "
    "cell's chi-square term (N*O - R*C)^2 / (N*R*C) is computed from "
    "exact HUGEINT/decimal(38,0) products and micro-quantized before "
    "the 25-term sum; V = sqrt(chi2 / (N * min(r-1, k-1))). The "
    "contingency cells come from a customer-grain pivot pre-aggregate "
    "(round 11): map-side combine absorbs the ~10 orders/customer "
    "fan-in BEFORE the shuffle and the dimension join probes "
    "|customers| rows, not |orders|; windows ride the 25-cell panel.",
)
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    # Pre-aggregate the fact side to the CUSTOMER grain before touching the
    # dimension (round-10 verdict task: the raw 150M-orders x 15M-customers
    # shuffle join dominated 267 s at sf100 for a 25-cell answer). Pivoting
    # on priority makes the pre-aggregate custkey-keyed, so map-side
    # partial aggregation absorbs the ~10 orders/customer fan-in BEFORE the
    # shuffle: the join input drops from |orders| rows to |customers| rows
    # x one small count vector (priority cardinality is schema-bounded at
    # 5, so the five literals are passed explicitly — pivot() without
    # values would run an extra distinct-values job over orders on every
    # invocation; round-11 advice). Unpivoting after the segment-level sum
    # and dropping empty cells (n_obs > 0) reproduces the exact
    # join-then-group contingency table (a cell absent from the join
    # output == a zero count == filtered here), so the oracle is unchanged
    # even if a priority value were absent from the data.
    pc = o.groupBy("o_custkey").pivot(
        "o_orderpriority",
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
    ).agg(F.count(F.lit(1)))
    pris = [p for p in pc.columns if p != "o_custkey"]
    seg = (
        pc.join(c, pc["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            *[
                F.sum(F.coalesce(F.col(f"`{p}`"), F.lit(0)))
                .cast("long")
                .alias(f"_n_{i}")
                for i, p in enumerate(pris)
            ]
        )
    )
    cells = (
        seg.select(
            "segment",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(p).alias("priority"),
                            F.col(f"_n_{i}").alias("n_obs"),
                        )
                        for i, p in enumerate(pris)
                    ]
                )
            ).alias("_pn"),
        )
        .select("segment", F.col("_pn.priority"), F.col("_pn.n_obs"))
        .filter(F.col("n_obs") > 0)
    )
    dec = lambda c_: c_.cast("decimal(38,0)")  # noqa: E731
    m = cells.select(
        "segment",
        "priority",
        "n_obs",
        dec(F.sum("n_obs").over(Window.partitionBy("segment"))).alias("rt"),
        dec(F.sum("n_obs").over(Window.partitionBy("priority"))).alias("ct"),
        dec(F.sum("n_obs").over(Window.partitionBy())).alias("n"),
    )
    dev = F.expr("cast(n * n_obs - rt * ct as double)")
    chi = m.agg(
        F.max("n").alias("n"),
        F.countDistinct("segment").cast("decimal(38,0)").alias("r"),
        F.countDistinct("priority").cast("decimal(38,0)").alias("k"),
        F.sum(
            F.round(
                1000000.0
                * dev
                * dev
                / F.expr("cast(n * rt * ct as double)")
            ).cast("decimal(38,0)")
        ).alias("chi2_micro_n"),
    )
    return chi.select(
        F.col("n").cast("long").alias("n_rows"),
        F.col("r").cast("long").alias("n_segments"),
        F.col("k").cast("long").alias("n_priorities"),
        F.round(
            F.col("chi2_micro_n").cast("double") / 1e6 / F.col("n").cast("double"),
            6,
        ).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2_micro_n").cast("double")
                / 1e6
                / F.col("n").cast("double")
                / F.col("n").cast("double")
                / F.least(F.col("r") - 1, F.col("k") - 1).cast("double")
            ),
            6,
        ).alias("cramers_v"),
    )


@register(
    "events_attribution_last_touch",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts, value,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
conv AS (
  SELECT COALESCE(prev_type, 'direct') AS touch,
         CAST(ROUND(value * 1000000) AS BIGINT) AS v_micro
  FROM seq WHERE event_type = 'purchase'
)
SELECT touch,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(v_micro) AS BIGINT) AS revenue_micro
FROM conv GROUP BY touch
ORDER BY touch
""",
    category="analytics",
    description="Last-touch attribution: each purchase's value credited "
    "to the event type the user did immediately before it ('direct' "
    "when the purchase opens the stream) — the simplest attribution "
    "model every growth team starts from. One per-user lag window "
    "(millions of small partitions) + one bounded per-touch aggregate; "
    "values micro-quantized to int64.",
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.round(F.col("value") * 1000000).cast("long").alias("v_micro"),
        F.lag("event_type").over(w_u).alias("prev_type"),
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("prev_type"), F.lit("direct")).alias("touch"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum("v_micro").cast("long").alias("revenue_micro"),
        )
        .orderBy("touch")
    )


@register(
    "ts_changepoint_meanshift",
    oracle="""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT)
           AS v_micro
  FROM events GROUP BY event_type, date_trunc('day', ts)
),
cum AS (
  SELECT event_type, day, v_micro,
         CAST(SUM(v_micro) OVER (PARTITION BY event_type ORDER BY day
                                 ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS st,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
              AS HUGEINT) AS t,
         CAST(SUM(v_micro) OVER (PARTITION BY event_type) AS HUGEINT) AS s,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS HUGEINT) AS n
  FROM daily
),
scored AS (
  SELECT event_type, day, st, t, s, n,
         CAST(ROUND(ABS(CAST(st * (n - t) - (s - st) * t AS DOUBLE))
                    / CAST(t * (n - t) AS DOUBLE)) AS BIGINT)
           AS shift_micro,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY ABS(CAST(st * (n - t) - (s - st) * t AS DOUBLE))
                    / CAST(t * (n - t) AS DOUBLE) DESC, day
         ) AS rn
  FROM cum WHERE t < n
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_days,
       MAX(CASE WHEN rn = 1 THEN day END) AS change_day,
       CAST(MAX(CASE WHEN rn = 1 THEN st // t END) AS BIGINT)
         AS mean_pre_micro,
       CAST(MAX(CASE WHEN rn = 1 THEN (s - st) // (n - t) END) AS BIGINT)
         AS mean_post_micro,
       CAST(MAX(CASE WHEN rn = 1 THEN shift_micro END) AS BIGINT)
         AS shift_micro
FROM scored GROUP BY event_type
ORDER BY event_type
""",
    category="timeseries",
    description="Binary change-point detection per event type: the day "
    "split that maximizes |mean(before) - mean(after)| of the daily "
    "value series, with the pre/post means — the first cut of any "
    "regime-shift monitor (binary segmentation's root step). The shift "
    "score's numerator st*(n-t) - (s-st)*t stays exact in "
    "decimal(38,0)/HUGEINT; the argmax compares the IDENTICAL double "
    "expression in both engines and tie-breaks on day. Everything "
    "below the one corpus aggregate rides the bounded (types x days) "
    "panel.",
)
def ts_changepoint_meanshift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 1000000).cast("long"))
        .cast("long")
        .alias("v_micro")
    )
    w_t = Window.partitionBy("event_type")
    w_cum = w_t.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dec = lambda c_: c_.cast("decimal(38,0)")  # noqa: E731
    cum = daily.select(
        "event_type",
        "day",
        dec(F.sum("v_micro").over(w_cum)).alias("st"),
        dec(F.row_number().over(w_t.orderBy("day"))).alias("t"),
        dec(F.sum("v_micro").over(w_t)).alias("s"),
        dec(F.count(F.lit(1)).over(w_t)).alias("n"),
    )
    score = F.abs(
        F.expr("cast(st * (n - t) - (s - st) * t as double)")
    ) / F.expr("cast(t * (n - t) as double)")
    scored = (
        cum.filter(F.col("t") < F.col("n"))
        .select(
            "event_type",
            "day",
            "st",
            "t",
            "s",
            "n",
            F.round(score).cast("long").alias("shift_micro"),
            F.row_number()
            .over(w_t.orderBy(score.desc(), F.col("day")))
            .alias("rn"),
        )
    )
    pick = lambda col: F.max(F.when(F.col("rn") == 1, col))  # noqa: E731
    return (
        scored.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_days"),
            pick(F.col("day")).alias("change_day"),
            pick(F.expr("st div t")).cast("long").alias("mean_pre_micro"),
            pick(F.expr("(s - st) div (n - t)")).cast("long").alias(
                "mean_post_micro"
            ),
            pick(F.col("shift_micro")).cast("long").alias("shift_micro"),
        )
        .orderBy("event_type")
    )


@register(
    "quality_near_dup_rate_by_source",
    oracle=f"""
WITH pairs AS ({DD.ngram_jaccard_pairs_sql(threshold=0.5, max_df=64)}),
dup_docs AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_a AS doc_id FROM pairs
    UNION ALL SELECT doc_b FROM pairs
  )
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN dd.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_near_dup,
       CAST((1000000 * SUM(CASE WHEN dd.doc_id IS NOT NULL THEN 1 ELSE 0 END))
            // COUNT(*) AS BIGINT) AS dup_rate_ppm
FROM documents d LEFT JOIN dup_docs dd ON dd.doc_id = d.doc_id
GROUP BY d.source
ORDER BY d.source
""",
    category="quality",
    description="Near-duplicate contamination rate per source: the share "
    "of each source's documents participating in at least one valved "
    "n-gram-Jaccard near-dup pair (threshold 0.5, max_df 64) in integer "
    "ppm — the per-feed health metric that tells a crawl operator WHICH "
    "feed is flooding the corpus, where the pair inventory alone only "
    "says THAT duplicates exist. Reuses the session-cached valved pair "
    "index (shared with the dedup/split/containment queries, built "
    "once), distincts it to doc grain, and left-joins back to the "
    "corpus — one extra semi-structure pass, no new pair work.",
)
def quality_near_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    pairs = _valved_pairs(spark, sf_dir)
    dup_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return (
        d.join(dup_docs, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
            .cast("long")
            .alias("n_near_dup"),
        )
        .select(
            "source",
            "n_docs",
            "n_near_dup",
            F.expr("(1000000 * n_near_dup) div n_docs")
            .cast("long")
            .alias("dup_rate_ppm"),
        )
        .orderBy("source")
    )


@register(
    "analytics_basket_size_distribution",
    oracle="""
WITH baskets AS (
  SELECT l_orderkey,
         CAST(COUNT(*) AS BIGINT) AS basket_size,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem GROUP BY l_orderkey
)
SELECT basket_size,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(rev_cents) AS BIGINT) AS revenue_cents,
       CAST((1000000 * COUNT(*)) // SUM(COUNT(*)) OVER () AS BIGINT)
         AS share_ppm
FROM baskets GROUP BY basket_size
ORDER BY basket_size
""",
    category="analytics",
    description="Basket-size distribution: orders histogrammed by line "
    "count with revenue and integer-ppm share — the order-composition "
    "panel behind pricing and bundling decisions (the Q13-style "
    "customer-order distribution's order-grain sibling). Two "
    "map-side-combinable aggregates; the share window rides the "
    "bounded distinct-size panel; money in exact cents.",
)
def analytics_basket_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("basket_size"),
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long")
        )
        .cast("long")
        .alias("rev_cents"),
    )
    hist = baskets.groupBy("basket_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("rev_cents").cast("long").alias("revenue_cents"),
    )
    # bounded: the share window rides the distinct-basket-size panel
    return hist.select(
        "basket_size",
        "n_orders",
        "revenue_cents",
        F.expr(
            "(1000000 * n_orders) div sum(n_orders) over ()"
        )
        .cast("long")
        .alias("share_ppm"),
    ).orderBy("basket_size")


# ===========================================================================
# Round 12: Bloom runtime filter, RAKE keywords, apportioned stratified
# sampling, exact covariance spectrum, ACF correlogram
# ===========================================================================

from go_pq_cdc_kafka_spark.operators import bloom as BF  # noqa: E402


@register(
    "join_bloom_prefilter",
    oracle="""
SELECT p.p_brand,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_type = 'SMALL' AND p.p_size <= 15
GROUP BY p.p_brand
ORDER BY p.p_brand
""",
    category="join",
    description="Bloom-filter runtime join pruning: the semi-join reduction "
    "play for the case where even the dimension's FILTERED key set is too "
    "large to broadcast exactly — a constant-size bitmap (corpus-adaptive "
    "~16 bits/key, k=3, ~0.15% false positives) built distributed "
    "(map-side probe explode, word-index OR-aggregate, one sparse-map "
    "row), broadcast, and probed with pure codegen expressions, so the "
    "fact side is reduced BEFORE the shuffle join pays for it. False "
    "positives are eliminated by the exact merge join that follows, so "
    "the result equals the plain join's — the oracle IS the plain join. "
    "Spark's own runtime bloomFilter rewrite does this implicitly below "
    "fixed thresholds; this operator guarantees it at any dimension size "
    "(operators/bloom.py).",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "SMALL") & (F.col("p_size") <= 15)
    )
    keys = p.select("p_partkey")
    # bounded scalar action (key-count for the bitmap geometry) — same
    # class as the dedup family's corpus .count()
    m_bits = BF.bloom_geometry(keys.count())
    flt = BF.bloom_build(keys, "p_partkey", m_bits)
    reduced = BF.bloom_probe(li, "l_partkey", flt, m_bits)
    # the exact join is hinted merge to model the dim-too-big-to-broadcast
    # case (same modeling as join_semi_reduced_fact); it removes the
    # bitmap's false positives, so correctness never depends on geometry
    joined = reduced.join(p.hint("merge"), reduced["l_partkey"] == p["p_partkey"])
    return (
        joined.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy("p_brand")
    )


_RAKE_STOP = (
    "a", "an", "and", "as", "at", "be", "by", "for", "in", "is",
    "of", "on", "or", "the", "to", "with",
)
_RAKE_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in _RAKE_STOP) + ")"


@register(
    "text_keyword_rake",
    oracle=f"""
WITH tl AS (SELECT doc_id, {_DUCK_TOKLIST} AS t FROM documents),
tok0 AS (
  SELECT doc_id,
         unnest([{{'pos': i, 'tok': t[i]}} for i in generate_series(1, len(t))]) AS u
  FROM tl
),
tok AS (
  SELECT doc_id, u.pos AS pos,
         regexp_replace(u.tok, '[^a-z0-9]', '', 'g') AS core,
         (regexp_replace(u.tok, '[^a-z0-9]', '', 'g') IN {_RAKE_STOP_SQL}
          OR regexp_matches(u.tok, '[.,;:!?]')
          OR regexp_replace(u.tok, '[^a-z0-9]', '', 'g') = '') AS brk
  FROM tok0
),
seg AS (
  SELECT doc_id, pos, core, brk,
         SUM(CASE WHEN brk THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM tok
),
ph AS (
  SELECT doc_id, grp,
         string_agg(core, ' ' ORDER BY pos) AS phrase,
         CAST(COUNT(*) AS BIGINT) AS plen
  FROM seg WHERE NOT brk GROUP BY doc_id, grp
),
ph4 AS (SELECT phrase, plen FROM ph WHERE plen <= 4),
member AS (
  SELECT plen, unnest(string_split(phrase, ' ')) AS word FROM ph4
),
ws AS (
  SELECT word,
         CAST((1000000 * SUM(plen)) // COUNT(*) AS BIGINT) AS score_ppm
  FROM member GROUP BY word
),
pd AS (
  SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occ FROM ph4 GROUP BY phrase
),
scored AS (
  SELECT m.phrase, m.n_occ, CAST(SUM(ws.score_ppm) AS BIGINT) AS rake_ppm
  FROM (SELECT phrase, n_occ, unnest(string_split(phrase, ' ')) AS word
        FROM pd) m
  JOIN ws USING (word)
  GROUP BY m.phrase, m.n_occ
)
SELECT phrase, n_occ, rake_ppm
FROM scored ORDER BY rake_ppm DESC, phrase LIMIT 20
""",
    category="text",
    description="RAKE keyword extraction (Rose et al. 2010): candidate "
    "phrases are maximal runs of non-delimiter tokens (delimiters = "
    "stopword cores, punctuation-bearing tokens, empty cores), capped at "
    "4 words; word score = deg/freq over phrase occurrences in integer "
    "ppm ((1e6*Σplen) div count — deg counts the whole phrase length, "
    "RAKE's co-occurrence degree); phrase score = Σ member-word scores "
    "(multiplicity kept); global top-20 on the unique (score, phrase) "
    "order. Spark side segments each document INSIDE one aggregate HOF "
    "over the token array (struct accumulator carrying closed phrases + "
    "the open run) — phrase extraction is map-only, the only shuffles "
    "are the two vocabulary-bounded aggregates and the word-score join. "
    "The SQL twin derives the same runs via a per-doc break-count "
    "cumulative window.",
)
def text_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    empty = F.expr("cast(array() as array<string>)")

    def step(acc, w):
        core = F.regexp_replace(w, "[^a-z0-9]", "")
        brk = (
            core.isin(*_RAKE_STOP)
            | w.rlike("[.,;:!?]")
            | (core == F.lit(""))
        )
        closed = F.when(
            brk & (F.size(acc["cur"]) > 0),
            F.concat(acc["done"], F.array(F.array_join(acc["cur"], " "))),
        ).otherwise(acc["done"])
        cur = F.when(brk, empty).otherwise(F.concat(acc["cur"], F.array(core)))
        return F.struct(closed.alias("done"), cur.alias("cur"))

    phrases = F.aggregate(
        T.tokens(F.col("text")),
        F.struct(empty.alias("done"), empty.alias("cur")),
        step,
        lambda acc: F.when(
            F.size(acc["cur"]) > 0,
            F.concat(acc["done"], F.array(F.array_join(acc["cur"], " "))),
        ).otherwise(acc["done"]),
    )
    ph4 = (
        d.select(F.explode(phrases).alias("phrase"))
        .select("phrase", F.size(F.split(F.col("phrase"), " ")).cast("long").alias("plen"))
        .filter(F.col("plen") <= 4)
        # two consumers (word stats + phrase counts) — checkpoint so the
        # corpus segmentation runs once (same discipline as
        # text_collocation_lift's unigram table)
        .localCheckpoint(eager=False)
    )
    ws = (
        ph4.select("plen", F.explode(F.split(F.col("phrase"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.expr("(1000000 * sum(plen)) div count(*)").cast("long").alias("score_ppm"))
    )
    pd_ = ph4.groupBy("phrase").agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
    return (
        pd_.select("phrase", "n_occ", F.explode(F.split(F.col("phrase"), " ")).alias("word"))
        .join(ws, "word")
        .groupBy("phrase", "n_occ")
        .agg(F.sum("score_ppm").cast("long").alias("rake_ppm"))
        .orderBy(F.col("rake_ppm").desc(), "phrase")
        .limit(20)
    )


@register(
    "sample_neyman_allocation",
    oracle=f"""
WITH s AS (
  SELECT source, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS s1,
         CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS s2
  FROM documents GROUP BY source
),
wts AS (SELECT source, n, n * s2 - s1 * s1 AS w FROM s),
alloc0 AS (
  SELECT source, w,
         (500 * w) // SUM(w) OVER () AS base,
         500 * w - ((500 * w) // SUM(w) OVER ()) * SUM(w) OVER () AS rem
  FROM wts
),
ranked AS (
  SELECT source, base, rem,
         ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk,
         500 - SUM(base) OVER () AS leftover
  FROM alloc0
),
alloc AS (
  SELECT source,
         CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
           AS alloc
  FROM ranked
),
rd AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {{h}}, doc_id
         ) AS rn
  FROM documents
)
SELECT a.source, a.alloc,
       CAST(COUNT(r.n_chars) AS BIGINT) AS n_sampled,
       CAST(COALESCE(SUM(r.n_chars), 0) AS BIGINT) AS sum_chars
FROM alloc a
LEFT JOIN rd r ON r.source = a.source AND r.rn <= a.alloc
GROUP BY a.source, a.alloc
ORDER BY a.source
""".format(h="CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"),
    category="sampling",
    description="Variance-optimal stratified sampling with exact Hamilton "
    "(largest-remainder) apportionment: a 500-doc budget is allocated "
    "across sources proportional to the integer variance mass "
    "N_h*Σ(x-x̄)² = N_h*S2_h - S1_h² (the square-free surrogate for "
    "Neyman's N_h*σ_h — exact Neyman needs a cross-engine sqrt; the "
    "surrogate keeps every division an integer floor-div), remainders "
    "settled by the classic largest-remainder rank so Σalloc = 500 "
    "exactly. Each stratum then contributes its alloc_h lowest-hash "
    "documents (the shared 60-bit md5 hash, stable under appends). "
    "Windows ride the sources-bounded panel; the per-stratum top-k is "
    "rank-filtered, which Spark executes with WindowGroupLimit pushdown "
    "(per-partition local limit before the full sort).",
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col("n_chars").cast("decimal(38,0)")).cast("decimal(38,0)").alias("s1"),
        F.sum((F.col("n_chars").cast("decimal(38,0)") * F.col("n_chars"))).cast("decimal(38,0)").alias("s2"),
    )
    wts = s.select("source", (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).alias("w"))
    wall = Window.partitionBy()
    alloc0 = wts.select(
        "source",
        "w",
        F.expr("(500 * w) div (sum(w) over ())").alias("base"),
        (
            F.lit(500) * F.col("w")
            - F.expr("(500 * w) div (sum(w) over ())") * F.sum("w").over(wall)
        ).alias("rem"),
    )
    ranked = alloc0.select(
        "source",
        "base",
        F.row_number().over(Window.partitionBy().orderBy(F.col("rem").desc(), "source")).alias("rk"),
        (F.lit(500) - F.sum("base").over(wall)).alias("leftover"),
    )
    alloc = ranked.select(
        "source",
        (F.col("base") + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0))
        .cast("long")
        .alias("alloc"),
    )
    # literal rank cap first (no stratum can be allocated more than the
    # whole 500 budget): the rn <= 500 filter is a rank-vs-literal
    # predicate, so Spark's WindowGroupLimit pushes a per-partition local
    # top-500 below the window sort — the full per-source sort never
    # happens; the data-dependent rn <= alloc cut then runs on the
    # bounded (sources x 500) survivor set
    rd = d.select(
        "source",
        "n_chars",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                T.hash64(F.col("doc_id").cast("string")), "doc_id"
            )
        )
        .alias("rn"),
    ).filter(F.col("rn") <= 500)
    return (
        alloc
        .join(F.broadcast(rd), (alloc["source"] == rd["source"]) & (rd["rn"] <= alloc["alloc"]), "left")
        .groupBy(alloc["source"].alias("source"), "alloc")
        .agg(
            F.count("n_chars").cast("long").alias("n_sampled"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("sum_chars"),
        )
        .orderBy("source")
    )


@register(
    "emb_covariance_spectrum",
    oracle="""
WITH pairs AS (
  SELECT a.i AS di, b.j AS dj,
         CAST(ROUND(embedding[a.i] * 1000000) AS BIGINT) AS qi,
         CAST(ROUND(embedding[b.j] * 1000000) AS BIGINT) AS qj
  FROM embeddings, generate_series(1, 64) a(i), generate_series(1, 64) b(j)
  WHERE b.j > a.i
),
s AS (
  SELECT di, dj, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(qi AS HUGEINT) * qj) AS HUGEINT) AS sqq,
         CAST(SUM(CAST(qi AS HUGEINT)) AS HUGEINT) AS sqi,
         CAST(SUM(CAST(qj AS HUGEINT)) AS HUGEINT) AS sqj
  FROM pairs GROUP BY di, dj
),
c AS (SELECT di, dj, n, n * sqq - sqi * sqj AS cnum FROM s)
SELECT CAST(di AS BIGINT) AS dim_i, CAST(dj AS BIGINT) AS dim_j,
       CAST(n AS BIGINT) AS n_vectors,
       ROUND(CAST(cnum AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1e12), 6) AS cov
FROM c ORDER BY abs(cnum) DESC, di, dj LIMIT 15
""",
    category="similarity",
    description="Exact embedding covariance spectrum — the PCA-prep / "
    "whitening diagnostic: top-15 off-diagonal covariances by magnitude "
    "over all 2016 dim pairs, every sum carried in micro-unit integers "
    "(decimal(38,0)/HUGEINT, cnum = N·Σqiqj − Σqi·Σqj) so both engines "
    "rank and divide the SAME integers — only the displayed cov is a "
    "round-6 double. The 2016-pair expansion happens map-side inside one "
    "nested-transform explode and is absorbed by partial aggregation: "
    "the shuffle carries 2016 groups × 4 sums regardless of corpus size "
    "(the O(N·d²) multiply work is inherent to exact covariance; the "
    "64×64 eigensolve downstream is a driver-side constant).",
)
def emb_covariance_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-row-group fixture files plan ONE scan task, which would run
    # all N·2016 pair products serially; spread on the pk first (no-op at
    # real splits). vec_id is consumed by the exchange itself, so pruning
    # loses nothing.
    e = spread_small_scan(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        key_cols=("vec_id",),
    )
    q = e.select(
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1e6).cast("long")
        ).alias("qv")
    )
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(62)),
            lambda i: F.transform(
                F.sequence(i + 1, F.lit(63)),
                lambda j: F.struct(
                    (i + 1).alias("di"),
                    (j + 1).alias("dj"),
                    F.col("qv")[i].alias("qi"),
                    F.col("qv")[j].alias("qj"),
                ),
            ),
        )
    )
    pairs = q.select(F.explode(pair_structs).alias("p")).select(
        F.col("p.di").alias("di"),
        F.col("p.dj").alias("dj"),
        F.col("p.qi").alias("qi"),
        F.col("p.qj").alias("qj"),
    )
    # per-row product in LONG (Decimal.* always routes through
    # java.math.BigDecimal — it was the hot loop: N·2016 BigDecimal
    # multiplies), summed in decimal(38,0): exact as long as
    # |q| = |round(e*1e6)| < 3.03e9, i.e. |e| < ~3e3 — unit-norm
    # embedding components are |e| <= 1, six orders inside the bound.
    # The SUMS stay decimal: Σqi·qj grows with corpus size and leaves
    # long range past ~9.2e6 rows per dim pair.
    s = pairs.groupBy("di", "dj").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum((F.col("qi") * F.col("qj")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sqq"),
        F.sum(F.col("qi").cast("decimal(38,0)")).cast("decimal(38,0)").alias("sqi"),
        F.sum(F.col("qj").cast("decimal(38,0)")).cast("decimal(38,0)").alias("sqj"),
    )
    c = s.select(
        "di", "dj", "n", F.expr("n * sqq - sqi * sqj").alias("cnum")
    )
    return (
        c.select(
            F.col("di").cast("long").alias("dim_i"),
            F.col("dj").cast("long").alias("dim_j"),
            F.col("n").cast("long").alias("n_vectors"),
            F.round(
                F.expr("cast(cnum as double)")
                / (F.expr("cast(n as double)") * F.expr("cast(n as double)") * F.lit(1e12)),
                6,
            ).alias("cov"),
            F.abs(F.col("cnum")).alias("_a"),
        )
        .orderBy(F.col("_a").desc(), "dim_i", "dim_j")
        .limit(15)
        .drop("_a")
    )


@register(
    "ts_acf_panel",
    oracle=f"""
WITH daily AS ({_DAILY_COUNTS_SQL}),
px AS (
  SELECT a.event_type, CAST(k.k AS BIGINT) AS lag, a.n AS x, b.n AS y
  FROM daily a
  CROSS JOIN generate_series(1, 7) AS k(k)
  JOIN daily b ON b.event_type = a.event_type
              AND b.day = a.day + to_days(CAST(k.k AS INTEGER))
),
sums AS (
  SELECT event_type, lag,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM px GROUP BY event_type, lag
)
SELECT event_type, lag, CAST(n AS BIGINT) AS n_pairs,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS acf
FROM sums
ORDER BY event_type, lag
""",
    category="timeseries",
    description="ACF correlogram panel: lagged Pearson r at calendar lags "
    "1..7 days of each event type's daily count series — the "
    "seasonality-detection sweep (a weekly cycle shows as the lag-7 "
    "peak). Generalizes ts_autocorr_lag1 to a panel: pairs come from a "
    "lag-join on the bounded (types × days) aggregate (never corpus "
    "rows), one integer-sum aggregate per (type, lag), final r the only "
    "double. Missing days simply contribute no pair at that lag, "
    "identically in both engines.",
)
def ts_acf_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_counts(load_table(spark, sf_dir, "events"))
    a = daily.select(
        "event_type",
        "day",
        F.col("n").alias("x"),
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("lag"),
    ).withColumn("tday", F.expr("day + make_interval(0, 0, 0, lag)"))
    b = daily.select(
        F.col("event_type").alias("btype"),
        F.col("day").alias("bday"),
        F.col("n").alias("y"),
    )
    px = a.join(
        b, (F.col("event_type") == F.col("btype")) & (F.col("tday") == F.col("bday"))
    ).select(
        "event_type",
        F.col("lag").cast("long").alias("lag"),
        F.col("x").cast("decimal(38,0)").alias("x"),
        F.col("y").cast("decimal(38,0)").alias("y"),
    )
    sums = px.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.expr("x * y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.expr("x * x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.expr("y * y")).cast("decimal(38,0)").alias("syy"),
    )
    return sums.select(
        "event_type",
        "lag",
        F.col("n").cast("long").alias("n_pairs"),
        F.round(
            F.expr("cast(n * sxy - sx * sy as double)")
            / F.sqrt(
                F.expr("cast(n * sxx - sx * sx as double)")
                * F.expr("cast(n * syy - sy * sy as double)")
            ),
            6,
        ).alias("acf"),
    ).orderBy("event_type", "lag")
