#!/usr/bin/env python
"""A product-analytics tour over the CDC-fed tables on this engine.

The reference delivers row changes to Kafka; the serving side the README
describes materializes them into tables and asks BUSINESS questions.
This example is that consumer: one job walks the round-9 analytics pack
— retention cohorts, RFM segmentation, funnel discovery, churn, DAU/WAU
stickiness, revenue decomposition — each a registry query (so every
number shown here is DuckDB-oracle-verified at sf0.01 by
``tools/oracle_check.py``), each scale-shaped for 100 TB (bucketed
ordinals instead of global windows, bounded aggregates, integer ppm).

Run: python examples/analytics_tour.py [sf_dir]  (default /root/testdata/sf0.001)
"""

import sys

from go_pq_cdc_kafka_spark.queries import REGISTRY
from go_pq_cdc_kafka_spark.session import get_spark

TOUR = [
    ("events_retention_cohorts", "weekly cohort retention"),
    ("analytics_rfm_segments", "RFM quartile cube"),
    ("events_path_trigrams", "top user-journey paths"),
    ("analytics_monthly_churn", "monthly churn"),
    ("events_dau_wau", "DAU/WAU stickiness"),
    ("analytics_new_vs_returning", "revenue decomposition"),
    ("events_transition_matrix", "event transition matrix"),
    ("agg_benford_first_digit", "Benford audit of order totals"),
]


def main(spark=None, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = spark or get_spark(app_name="example-analytics-tour")
    out: dict[str, int] = {}
    for name, label in TOUR:
        df = REGISTRY[name].fn(spark, sf_dir)
        n = df.count()
        out[name] = n
        print(f"{label:<35} {name:<30} {n:>6} rows")
    return out


if __name__ == "__main__":
    main(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
