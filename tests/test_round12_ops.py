"""Semantics of the round-12 operators beyond the DuckDB oracle gate:
RAKE phrase segmentation edge cases and the Hamilton apportionment
invariant (Σalloc == budget exactly, the property that makes
largest-remainder the right rounding)."""

import pyspark.sql.functions as F
import pytest

from go_pq_cdc_kafka_spark.queries import REGISTRY


def _rake_phrases(spark, texts):
    """Run only the phrase-segmentation HOF from text_keyword_rake on a
    tiny in-memory corpus by re-deriving it through the registered query's
    own building blocks — asserted via the full query where possible."""
    from go_pq_cdc_kafka_spark.functions import text as T

    empty = F.expr("cast(array() as array<string>)")
    STOP = (
        "a", "an", "and", "as", "at", "be", "by", "for", "in", "is",
        "of", "on", "or", "the", "to", "with",
    )

    def step(acc, w):
        core = F.regexp_replace(w, "[^a-z0-9]", "")
        brk = core.isin(*STOP) | w.rlike("[.,;:!?]") | (core == F.lit(""))
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
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r[0] for r in df.select(phrases).collect()]


def test_rake_segmentation_edges(spark):
    out = _rake_phrases(
        spark,
        [
            "the quick brown fox and the lazy dog",  # two runs split by stopwords
            "the of and",                             # all stopwords -> no phrases
            "",                                       # empty doc -> no phrases
            "alpha beta. gamma",                      # punctuation closes a run
            "solo",                                   # single-token phrase
        ],
    )
    assert out[0] == ["quick brown fox", "lazy dog"]
    assert out[1] == []
    assert out[2] == []
    # 'beta.' carries sentence punctuation: it is a delimiter, its core is
    # NOT kept (RAKE drops the delimiter token itself)
    assert out[3] == ["alpha", "gamma"]
    assert out[4] == ["solo"]


def test_rake_topk_is_deterministic(spark, sf_dir):
    a = REGISTRY["text_keyword_rake"].fn(spark, sf_dir).collect()
    b = REGISTRY["text_keyword_rake"].fn(spark, sf_dir).collect()
    assert a == b
    assert len(a) == 20


def test_hamilton_allocation_sums_to_budget_exactly(spark, sf_dir):
    rows = REGISTRY["sample_neyman_allocation"].fn(spark, sf_dir).collect()
    total = sum(r.alloc for r in rows)
    assert total == 500, f"largest-remainder apportionment must hit 500, got {total}"
    # every stratum's sample is bounded by its allocation
    for r in rows:
        assert r.n_sampled <= r.alloc


def test_acf_lag7_peaks_for_weekly_series(spark):
    # synthetic weekly-periodic daily counts: acf at lag 7 must dominate
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("t", base + dt.timedelta(days=i), 100 + (50 if i % 7 == 0 else 0))
        for i in range(70)
    ]
    daily = spark.createDataFrame(rows, "event_type string, day timestamp, n long")
    # reuse the registered query's math by monkey-free recomputation: join
    # the panel at lags 1..7 and compute integer-sum Pearson
    a = daily.select(
        "event_type", "day", F.col("n").alias("x"),
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("lag"),
    ).withColumn("tday", F.expr("day + make_interval(0, 0, 0, lag)"))
    b = daily.select(
        F.col("event_type").alias("btype"), F.col("day").alias("bday"),
        F.col("n").alias("y"),
    )
    px = a.join(b, (F.col("event_type") == F.col("btype")) & (F.col("tday") == F.col("bday")))
    s = px.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.expr("x*y")).alias("sxy"),
        F.sum(F.expr("x*x")).alias("sxx"), F.sum(F.expr("y*y")).alias("syy"),
    ).select(
        "lag",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
            )
        ).alias("r"),
    )
    acf = {r.lag: r.r for r in s.collect()}
    assert acf[7] > 0.9
    assert all(acf[7] > acf[k] for k in range(1, 7))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
