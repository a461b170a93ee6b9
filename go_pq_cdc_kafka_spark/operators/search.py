"""Lexical search: BM25 top-k over a document corpus.

The reference has no search tier (its handler callbacks are the closest
thing to text processing — SURVEY §2.A T1); a training-data pipeline
needs one for corpus exploration and eval-set mining. This is the
classic Okapi BM25 (k1=1.2, b=0.75) expressed as pure DataFrame ops:

    score(d, q) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
    idf(t)      = (N − df + 0.5) / (df + 0.5)        [rational variant]

Two deliberate deviations, both for cross-engine exactness:

- idf drops the usual log(): the rational ratio preserves BM25's ranking
  monotonicity in df (log is monotone) while keeping every intermediate a
  ratio of integers. Transcendentals (java.lang.Math.log vs libm) differ
  in the last ulp between engines and would poison hash-equality oracles.
- scores are fixed-point BIGINTs, not doubles: with k1 = 6/5, b = 3/4,
  avgdl = T/N (T = total corpus tokens) the per-term score reduces to

      score_fp = 10^6 · (2N−2df+1) · 22·T·tf
                 ───────────────────────────────────────  (integer div)
                 (2df+1) · (10·T·tf + 3·T + 9·dl·N)

  a single integer division of two products. Products are computed in
  DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so they never overflow; the
  quotient is ≤ ~10^9 (idf ≤ (2N−1)/3, tf-norm ≤ k1+1), far inside
  int64, where Spark's `div` and DuckDB's `//` agree exactly (all
  operands positive ⇒ truncation == floor).

Scale posture: one explode over the corpus (map-only), one groupBy
(doc_id, term) for tf — the only corpus-sized shuffle; df and the
(N, T) scalars are tiny aggregates broadcast back; the query-term
filter is an `isin` over a literal list pushed into the tf scan. Cost
is O(corpus tokens), never corpus × query.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from go_pq_cdc_kafka_spark.functions import text as T

FP_SCALE = 1_000_000


def term_frequencies(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term, tf) from whitespace tokens — the inverted-index
    base table. One explode + one groupBy."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(T.tokens(F.col(text_col))).alias("term"),
    )
    return toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k docs for a bag-of-terms query under fixed-point BM25.

    Returns (doc_id, n_matched, score_fp, rk); ties broken by doc_id so
    the ranking is total and replay-deterministic.
    """
    tf = term_frequencies(docs, text_col, id_col)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    totals = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
    )
    qtf = tf.filter(F.col("term").isin(list(query_terms)))
    dfreq = qtf.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    scored = (
        qtf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = (
        dec(2 * F.col("n_docs") - 2 * F.col("df") + 1)
        * F.lit(22 * FP_SCALE)
        * dec(F.col("total_tokens"))
        * dec(F.col("tf"))
    )
    den = dec(2 * F.col("df") + 1) * dec(
        10 * F.col("total_tokens") * F.col("tf")
        + 3 * F.col("total_tokens")
        + 9 * F.col("dl") * F.col("n_docs")
    )
    per_term = scored.select(
        "doc_id", num.alias("_num"), den.alias("_den")
    ).select("doc_id", F.expr("_num div _den").alias("fp"))
    per_doc = per_term.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.sum("fp").alias("score_fp"),
    )
    # orderBy+limit plans TakeOrderedAndProject (per-partition partial
    # top-k, then a k-row merge on one reducer) — unlike a global
    # row_number window, which would single-partition the whole corpus.
    # The rank window then runs over k rows only.
    top = per_doc.orderBy(F.col("score_fp").desc(), F.col("doc_id")).limit(k)
    w = Window.orderBy(F.col("score_fp").desc(), F.col("doc_id"))
    return top.withColumn("rk", F.row_number().over(w))


def bm25_topk_sql(query_terms: Sequence[str], k: int = 10) -> str:
    """DuckDB twin of ``bm25_topk`` on the ``documents`` view."""
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    toks = T.TOKENS_SQL.format(c="text")
    return f"""
WITH tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST({toks}) AS term FROM documents)
  GROUP BY doc_id, term
),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
tot AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tokens FROM dl),
qtf AS (SELECT * FROM tf WHERE term IN ({terms})),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM qtf GROUP BY term),
per_term AS (
  SELECT qtf.doc_id,
         (CAST(2*tot.n_docs - 2*dfreq.df + 1 AS HUGEINT)
          * {22 * FP_SCALE} * CAST(tot.total_tokens AS HUGEINT)
          * CAST(qtf.tf AS HUGEINT))
         //
         (CAST(2*dfreq.df + 1 AS HUGEINT)
          * CAST(10*tot.total_tokens*qtf.tf + 3*tot.total_tokens
                 + 9*dl.dl*tot.n_docs AS HUGEINT)) AS fp
  FROM qtf JOIN dfreq USING (term) JOIN dl USING (doc_id), tot
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_matched,
         CAST(SUM(fp) AS BIGINT) AS score_fp
  FROM per_term GROUP BY doc_id
)
SELECT doc_id, n_matched, score_fp,
       CAST(ROW_NUMBER() OVER (ORDER BY score_fp DESC, doc_id) AS INT) AS rk
FROM per_doc
QUALIFY rk <= {k}
ORDER BY rk
"""


def rarity_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc word-rarity signals for corpus filtering: mean document
    frequency of the doc's tokens (low = exotic vocabulary) and the count
    of corpus-hapax tokens (df == 1, the classic OCR-garbage/boilerplate
    tell). All integer ratios — exact in both engines.

    Two corpus-keyed shuffles (tf, then df) and one doc-keyed aggregate;
    the df side joins back on ``term``, whose skew is capped by
    vocabulary, not row count."""
    tf = term_frequencies(docs, text_col, id_col)
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    per_doc = (
        tf.join(dfreq, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("df")).cast("bigint").alias("_df_mass"),
            F.sum(F.when(F.col("df") == 1, F.col("tf")).otherwise(0))
            .cast("bigint")
            .alias("n_hapax_tokens"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        (F.col("_df_mass").cast("double") / F.col("n_tokens").cast("double")).alias(
            "mean_token_df"
        ),
        "n_hapax_tokens",
    )


def rarity_scores_sql() -> str:
    """DuckDB twin of ``rarity_scores`` on the ``documents`` view."""
    toks = T.TOKENS_SQL.format(c="text")
    return f"""
WITH tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST({toks}) AS term FROM documents)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term)
SELECT tf.doc_id,
       CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
       CAST(SUM(tf.tf * dfreq.df) AS DOUBLE)
         / CAST(SUM(tf.tf) AS DOUBLE) AS mean_token_df,
       CAST(SUM(CASE WHEN dfreq.df = 1 THEN tf.tf ELSE 0 END) AS BIGINT)
         AS n_hapax_tokens
FROM tf JOIN dfreq USING (term)
GROUP BY tf.doc_id
ORDER BY tf.doc_id
"""


def positional_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pos, term) positional inverted index — the structure
    behind phrase and proximity queries. One posexplode over the shared
    deterministic tokenizer (functions.text.tokens); 0-based positions."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(T.tokens(F.col(text_col))).alias("pos", "term"),
    )


def phrase_match(
    docs: DataFrame,
    phrase_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase search: docs whose token stream contains
    ``phrase_terms`` consecutively; returns (doc_id, n_matches,
    first_pos). The index is FILTERED to the phrase's terms before any
    join — the join input is O(postings of those terms), not O(corpus
    positions) — then each subsequent term joins on (doc_id, pos-i),
    the textbook positional-intersection plan. At 100 TB the index would
    be precomputed and bucketed by term; the per-query work here is the
    same either way."""
    terms = [t.lower() for t in phrase_terms]
    if not terms:
        raise ValueError("phrase_terms must be non-empty")
    idx = positional_index(docs, text_col, id_col).filter(
        F.col("term").isin(terms)
    )
    base = idx.filter(F.col("term") == terms[0]).select("doc_id", "pos")
    for i, t in enumerate(terms[1:], start=1):
        nxt = idx.filter(F.col("term") == t).select(
            "doc_id", (F.col("pos") - i).alias("pos")
        )
        base = base.join(nxt, ["doc_id", "pos"])
    return base.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("pos").cast("int").alias("first_pos"),
    )


def tfidf_topk_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k most DISTINCTIVE terms per document — the tf·idf keyword
    extraction every corpus-exploration / topic-labeling pass needs.

    Cross-engine exactness (same discipline as BM25 above): idf drops the
    log and uses the reciprocal document frequency directly — tf/df ranks
    identically to tf·log(N/df) for fixed tf whenever df varies (both are
    strictly decreasing in df), and the fixed-point score

        score_fp = (tf * 10^9) div df        (integer division)

    is exact in both engines (tf ≤ doc length ≤ ~10^4 ⇒ products stay far
    inside int64). Ties break (score DESC, term ASC) so row_number is
    deterministic.

    Scale: one corpus-sized shuffle for tf, a vocabulary-sized df
    aggregate joined back on ``term``, one doc-keyed window for the
    top-k — O(corpus tokens), the plan you'd run at 100 TB."""
    tf = term_frequencies(docs, text_col, id_col)
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        F.expr("CAST(tf * 1000000000 AS BIGINT) DIV df").alias("score_fp"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_fp").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", F.col("rank").cast("int").alias("rank"), "term", "score_fp")
    )


def tfidf_topk_terms_sql(k: int = 3) -> str:
    """DuckDB twin of ``tfidf_topk_terms`` on the ``documents`` view."""
    toks = T.TOKENS_SQL.format(c="text")
    return f"""
WITH tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST({toks}) AS term FROM documents)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf * 1000000000 AS BIGINT) // dfreq.df AS score_fp
  FROM tf JOIN dfreq USING (term)
),
ranked AS (
  SELECT doc_id, term, score_fp,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score_fp DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS INT) AS rank, term, score_fp
FROM ranked WHERE rank <= {k}
ORDER BY doc_id, rank
"""
