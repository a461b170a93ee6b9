#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() on DuckDB over the same parquet fixtures,
compare row count, column names, and exact values (columns sorted by name,
rows sorted by all columns) — stricter than the driver's hash, so passing
here implies passing there.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        # duckdb returns Decimal objects for DECIMAL; floats stay floats
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: float(v) if hasattr(v, "as_tuple") else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name: str, s: pd.DataFrame, d: pd.DataFrame) -> list[str]:
    problems = []
    if len(s) != len(d):
        problems.append(f"row count: spark={len(s)} duckdb={len(d)}")
    if sorted(s.columns) != sorted(d.columns):
        problems.append(f"columns: spark={sorted(s.columns)} duckdb={sorted(d.columns)}")
        return problems
    if problems:
        return problems
    sn, dn = normalize(s), normalize(d)
    for c in sn.columns:
        sv, dv = sn[c].tolist(), dn[c].tolist()
        bad = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(sv, dv))
            if not values_equal(a, b)
        ]
        if bad:
            i, a, b = bad[0]
            problems.append(
                f"col {c}: {len(bad)}/{len(sv)} mismatches; first @row{i}: "
                f"spark={a!r} duckdb={b!r}"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from go_pq_cdc_kafka_spark.queries import REGISTRY
    from go_pq_cdc_kafka_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duck_con(sf_dir)

    failures = 0
    for name, qd in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qd.fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if qd.oracle is None:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(qd.oracle).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")
    spark.stop()
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
