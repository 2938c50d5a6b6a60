#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every CATALOG
query on Spark AND its DuckDB oracle, compare row-count, schema width,
and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["TZ"] = "UTC"
time.tzset()

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical value forms: float64 for numerics-with-decimals, str else
    for col in df.columns:
        if df[col].dtype == object:
            df[col] = df[col].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> str:
    if len(spark_pdf) != len(oracle_pdf):
        return f"ROWCOUNT spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return f"SCHEMA spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
    # dtype alignment: a dtype-sensitive value hash would flag int32 vs
    # int64 or a HUGEINT-degraded float column even when values agree
    for col in sorted(spark_pdf.columns):
        a, b = spark_pdf[col].dtype, oracle_pdf[col].dtype
        if a != b:
            return f"DTYPE col={col} spark={a} oracle={b}"
    a = normalize_frame(spark_pdf)
    b = normalize_frame(oracle_pdf)
    for col in a.columns:
        av, bv = a[col], b[col]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float)
            bv = bv.astype(float)
            bad = ~((av == bv) | (av.isna() & bv.isna()))
        else:
            if av.dtype != bv.dtype:
                av = av.astype(str)
                bv = bv.astype(str)
            bad = ~((av == bv) | (av.isna() & bv.isna()))
        if bad.any():
            i = bad.idxmax()
            return f"VALUES col={col} row={i} spark={a[col][i]!r} oracle={b[col][i]!r} ({int(bad.sum())} diffs)"
    return "OK"


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    only = [a for a in args if not os.path.isdir(a)]

    from defenda_data_lake_spark.plans.catalog import CATALOG
    from defenda_data_lake_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, (fn, oracle) in CATALOG.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name}: SPARK-ERROR {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if oracle is None:
            print(f"{name}: rows-only ({len(spark_pdf)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            oracle_pdf = con.execute(oracle).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE-ERROR {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        verdict = compare(name, spark_pdf, oracle_pdf)
        status_rows = len(spark_pdf)
        print(f"{name}: {verdict} ({status_rows} rows) [{time.time()-t0:.1f}s]")
        if verdict != "OK":
            failures += 1
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
