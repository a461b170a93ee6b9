"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — brute-force exact top-k: broadcast the query set,
  score corpus partitions in place (no shuffle until the final per-query
  top-k window). The dot product accumulates in DECIMAL so Spark and the
  DuckDB oracle agree bit-for-bit (float fold order differs otherwise —
  measured ~1e-9 divergence with list_dot_product).
- :func:`rademacher_lsh_buckets` / :func:`lsh_cosine_topk` — the scale path:
  sign-LSH with deterministic ±1 hyperplanes derived from md5, so bucketing
  is reproducible in SQL too. Search cost drops from |Q|×|C| to per-bucket;
  recall is tunable with ``planes`` (fewer planes → bigger buckets).
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

# ---------------------------------------------------------------------------
# exact (decimal-deterministic) vector algebra
# ---------------------------------------------------------------------------

_DEC = "decimal(38,18)"


def exact_dot(a: Column, b: Column) -> Column:
    """Order-independent dot product: per-element double multiply (IEEE,
    engine-identical), DECIMAL accumulate (exact), double out."""
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(_DEC)
    )
    # Spark widens DECIMAL(38,18)+DECIMAL(38,18) to DECIMAL(38,17); cast the
    # merge result back so aggregate()'s accumulator type stays fixed.
    return F.aggregate(
        prods, F.lit(0).cast(_DEC), lambda acc, x: (acc + x).cast(_DEC)
    ).cast("double")


def exact_dot_sql(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(list_zip({a}, {b}), "
        f"t -> CAST(t[1]::DOUBLE * t[2]::DOUBLE AS DECIMAL(38,18)))) AS DOUBLE)"
    )


def cosine(a: Column, b: Column) -> Column:
    # Dots are decimal-exact, but sqrt/divide reintroduce ~1-ulp engine
    # divergence; round to 12 decimals BEFORE ranking so top-k order is
    # engine-identical.
    return F.round(
        exact_dot(a, b) / (F.sqrt(exact_dot(a, a)) * F.sqrt(exact_dot(b, b))),
        12,
    )


def cosine_sql(a: str, b: str) -> str:
    return (
        f"ROUND({exact_dot_sql(a, b)} / "
        f"(sqrt({exact_dot_sql(a, a)}) * sqrt({exact_dot_sql(b, b)})), 12)"
    )


# ---------------------------------------------------------------------------
# brute-force exact top-k
# ---------------------------------------------------------------------------

def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. The query side is
    broadcast (queries ≪ corpus in every retrieval workload), scoring is a
    map-only pass over corpus partitions; the only shuffle is the final
    per-query top-k window on |Q|×|C| scored rows filtered to k."""
    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("_qv"))
    c = corpus.select(F.col(c_id).alias("neighbor_id"), F.col(c_vec).alias("_cv"))
    scored = c.join(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", "neighbor_id", "cos_sim")
    )


def cosine_topk_sql(
    k: int = 5, query_pred: str = "vec_id < 5", table: str = "embeddings"
) -> str:
    cos = cosine_sql("q.embedding", "c.embedding")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM {table} WHERE {query_pred}),
c AS (SELECT vec_id AS neighbor_id, embedding FROM {table}),
scored AS (
  SELECT q.query_id, c.neighbor_id, {cos} AS cos_sim
  FROM c, q
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rk
  FROM scored
)
SELECT query_id, rk, neighbor_id, cos_sim
FROM ranked WHERE rk <= {k}
ORDER BY query_id, rk
"""


# ---------------------------------------------------------------------------
# sign-LSH (Rademacher hyperplanes) — the ANN scale path
# ---------------------------------------------------------------------------

def _plane_signs(plane: int, dim: int) -> list[int]:
    """Deterministic ±1 hyperplane: sign d of plane p = parity of the first
    md5 nibble of "p:d" — reproducible in any engine with md5."""
    return [
        1 if int(hashlib.md5(f"{plane}:{d}".encode()).hexdigest()[0], 16) % 2 == 0 else -1
        for d in range(dim)
    ]


def _plane_dot(vec: Column, signs: list[int]) -> Column:
    plane = F.array(*[F.lit(float(s)) for s in signs])
    return exact_dot(vec, plane)


def rademacher_lsh_buckets(
    df: DataFrame, vec_col: str, dim: int, planes: int = 8
) -> Column:
    """Bucket id = packed sign bits of ``planes`` deterministic hyperplane
    projections (cosine-LSH). Exact decimal dots ⇒ sign decisions are
    engine-identical even at near-zero projections."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        bit = F.when(_plane_dot(F.col(vec_col), _plane_signs(p, dim)) > 0, 1).otherwise(0)
        bucket = bucket + bit.cast("long") * F.lit(1 << p).cast("long")
    return bucket


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    planes: int = 4,
    q_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """ANN top-k: only corpus vectors in the query's LSH bucket are scored.
    The bucket equi-join replaces the cross product — this is the plan shape
    that survives a 100× corpus: hash-partition by bucket, score locally."""
    q = queries.select(
        F.col(q_id).alias("query_id"),
        F.col(vec).alias("_qv"),
        rademacher_lsh_buckets(queries, vec, dim, planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(q_id).alias("neighbor_id"),
        F.col(vec).alias("_cv"),
        rademacher_lsh_buckets(corpus, vec, dim, planes).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id", "neighbor_id", cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", "neighbor_id", "cos_sim")
    )


def lsh_cosine_topk_sql(
    dim: int, k: int = 5, planes: int = 4, query_pred: str = "vec_id < 5",
    table: str = "embeddings",
) -> str:
    def bucket_sql(v: str) -> str:
        terms = []
        for p in range(planes):
            signs = _plane_signs(p, dim)
            plane_lit = "[" + ", ".join(f"{float(s)}" for s in signs) + "]::DOUBLE[]"
            dot = exact_dot_sql(v, plane_lit)
            terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
        return "CAST(" + " + ".join(terms) + " AS BIGINT)"

    cos = cosine_sql("q.embedding", "c.embedding")
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding, {bucket_sql("embedding")} AS bucket
  FROM {table} WHERE {query_pred}
),
c AS (
  SELECT vec_id AS neighbor_id, embedding, {bucket_sql("embedding")} AS bucket
  FROM {table}
),
scored AS (
  SELECT q.query_id, c.neighbor_id, {cos} AS cos_sim
  FROM c JOIN q ON c.bucket = q.bucket
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rk
  FROM scored
)
SELECT query_id, rk, neighbor_id, cos_sim
FROM ranked WHERE rk <= {k}
ORDER BY query_id, rk
"""
