"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Thin adapter over :mod:`go_pq_cdc_kafka_spark.queries`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from go_pq_cdc_kafka_spark.queries import REGISTRY, driver_window_order


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return REGISTRY["agg_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Rotated HERE (the driver invocation path), not at library import
    # time: never-driver-checked oracle queries first so the driver's
    # 50-entry window grows independent coverage each round, rows-only
    # queries last so no window slot reports ``no_oracle``.
    return {name: REGISTRY[name].fn for name in driver_window_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in driver_window_order()
        if REGISTRY[name].oracle is not None
    }
