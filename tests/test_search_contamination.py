"""BM25 search, n-gram decontamination, and repetition scoring semantics.

The reference has no search/curation tier (handler callbacks are its only
text processing, SURVEY §2.A T1); these operators are the training-data
extensions BASELINE.json asks for.
"""

import pyspark.sql.functions as F
import pytest

from go_pq_cdc_kafka_spark.functions import text as T
from go_pq_cdc_kafka_spark.operators import dedup as DD
from go_pq_cdc_kafka_spark.operators import search as S


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark spark spark joins data"),          # tf(spark)=3, short
        (2, "spark data and other data here today"),  # tf(spark)=1
        (3, "nothing relevant in this document row"),  # no hit
        (4, "rare unicorn word appears here once"),    # rare-term doc
        (5, "common filler common filler common text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_tf_and_idf_ordering(spark, corpus):
    out = S.bm25_topk(corpus, ["spark", "unicorn"], k=10).collect()
    by_id = {r.doc_id: r for r in out}
    # doc 3 and 5 match nothing -> absent
    assert set(by_id) == {1, 2, 4}
    # idf: 'unicorn' (df=1) outweighs 'spark' (df=2) -> doc 4 ranks first
    assert out[0].doc_id == 4 and out[0].rk == 1
    # tf: doc 1 (3x spark) beats doc 2 (1x spark)
    assert by_id[1].score_fp > by_id[2].score_fp
    assert by_id[1].n_matched == 1 and by_id[4].n_matched == 1


def test_bm25_rank_is_total_and_deterministic(spark, corpus):
    a = S.bm25_topk(corpus, ["data"], k=10).collect()
    b = S.bm25_topk(corpus, ["data"], k=10).collect()
    assert [(r.doc_id, r.rk) for r in a] == [(r.doc_id, r.rk) for r in b]
    assert [r.rk for r in a] == list(range(1, len(a) + 1))


def test_ngram_contamination_flags_copied_span(spark):
    eval_docs = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # copies a 5-token span from the eval doc -> contaminated
            (1, "intro text the quick brown fox jumps and more"),
            # shares words but no 5-gram -> clean
            (2, "fox dog quick brown lazy the over jumps"),
        ],
        "doc_id long, text string",
    )
    out = DD.ngram_contamination(corpus, eval_docs, n=5).collect()
    assert [(r.doc_id, r.n_eval_docs) for r in out] == [(1, 1)]


def test_repetition_metrics_exact(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "w x y z")], "doc_id long, text string"
    )
    grams = df.select(
        "doc_id", F.explode(T.ngrams_all(F.col("text"), 2)).alias("g")
    )
    counts = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    rows = {
        r.doc_id: r
        for r in counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("total"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top"),
        )
        .collect()
    }
    # "a b a b a b": bigrams [ab, ba, ab, ba, ab] -> 5 total, 2 distinct
    assert rows[1].total == 5 and rows[1].n_distinct == 2 and rows[1].top == 3
    # "w x y z": all 3 bigrams unique
    assert rows[2].total == 3 and rows[2].n_distinct == 3 and rows[2].top == 1


def test_recursive_bfs_min_hops_on_cycle(spark):
    """WITH RECURSIVE + UNION ALL + depth guard: terminates on a cycle and
    the final aggregate yields true min-hop distances."""
    spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3)], "doc_a long, doc_b long"
    ).createOrReplaceTempView("_graph_bfs_pairs")
    out = spark.sql(
        """
WITH RECURSIVE edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM _graph_bfs_pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM _graph_bfs_pairs
),
bfs(doc_id, hops) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION ALL
  SELECT e.dst, b.hops + 1
  FROM bfs b JOIN edges e ON e.src = b.doc_id
  WHERE b.hops < 3
)
SELECT doc_id, MIN(hops) AS min_hops FROM bfs GROUP BY doc_id
"""
    ).collect()
    got = {r.doc_id: r.min_hops for r in out}
    # 0 -(1)- 1, 0 -(1)- 2 (via the 2->0 edge reversed), 3 is 2 hops away
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_phrase_match_counts_and_positions(spark):
    from go_pq_cdc_kafka_spark.operators import search as S

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c"),      # phrase 'a b c' twice, first at 0
            (2, "x a b c y"),        # once at 1
            (3, "a b a b"),          # never completes
            (4, "A B C"),            # case folds -> once at 0
            (5, "c b a"),            # wrong order
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.n_matches, r.first_pos)
        for r in S.phrase_match(docs, ("a", "b", "c")).collect()
    }
    assert got == {(1, 2, 0), (2, 1, 1), (4, 1, 0)}


def test_phrase_match_overlapping_occurrences(spark):
    from go_pq_cdc_kafka_spark.operators import search as S

    docs = spark.createDataFrame([(1, "a a a a")], "doc_id long, text string")
    got = S.phrase_match(docs, ("a", "a")).collect()
    assert [(r.doc_id, r.n_matches, r.first_pos) for r in got] == [(1, 3, 0)]


def test_tfidf_topk_ranks_distinctive_terms_first(spark):
    from go_pq_cdc_kafka_spark.operators.search import tfidf_topk_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple common"),
            (2, "banana common"),
            (3, "common common cherry"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.rank): (r.term, r.score_fp)
        for r in tfidf_topk_terms(docs, k=2).collect()
    }
    # df: apple=1, banana=1, cherry=1, common=3
    assert out[(1, 1)] == ("apple", 2 * 10**9)       # tf=2, df=1
    assert out[(1, 2)] == ("common", 10**9 // 3)     # tf=1, df=3
    assert out[(2, 1)] == ("banana", 10**9)
    # rarity beats frequency: score(cherry)=1e9 > score(common)=2e9//3
    assert out[(3, 1)] == ("cherry", 10**9)
    assert out[(3, 2)] == ("common", 2 * 10**9 // 3)


def test_gopher_rules_gate_semantics(spark):
    import pyspark.sql.functions as F

    from go_pq_cdc_kafka_spark.functions.text import gopher_rules

    passing = "the quick brown fox jumps over a lazy dog and " * 6  # 60 words
    too_short = "the tiny a doc"
    long_words = ("supercalifragilistic " * 60) + "the a of"  # mean len > 10
    docs = spark.createDataFrame(
        [(1, passing), (2, too_short), (3, long_words)],
        "doc_id long, text string",
    )
    g = gopher_rules(F.col("text"))
    rows = {
        r.doc_id: r
        for r in docs.select(
            "doc_id",
            g["word_count"].alias("wc"),
            g["mean_word_len_x100"].alias("mwl"),
            g["stop_hits"].alias("sh"),
            g["passes_gopher"].alias("ok"),
        ).collect()
    }
    assert rows[1].ok and rows[1].wc == 60 and 300 <= rows[1].mwl <= 1000
    assert not rows[2].ok  # word count < 50
    assert not rows[3].ok and rows[3].mwl > 1000  # mean word length gate
