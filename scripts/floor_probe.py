#!/usr/bin/env python
"""Decompose headline-query wall-clock into driver-side plan
construction (Python expression building + py4j + analysis) vs JVM
execution, and q32 into kernel vs pair-join.  Mirrors bench.py's
session setup (warm cache, warm workers, static planning)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TZ", "UTC")
time.tzset()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from defenda_data_lake_spark.plans.catalog import (
        CATALOG,
        headline_queries,
        warm_table_cache,
    )
    from defenda_data_lake_spark.session import get_spark, tune_for_input_scale

    spark = get_spark(app_name="floor-probe")
    tune_for_input_scale(spark, sf_dir)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    warm_table_cache(spark, sf_dir)
    import pandas as _pd

    spark.range(1000).repartition(32).mapInPandas(
        lambda it: (_pd.DataFrame({"id": b["id"]}) for b in it), schema="id long"
    ).count()
    for name in headline_queries():
        fn, _ = CATALOG[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    print(f"{'query':28s} {'build':>7s} {'exec':>7s} {'total':>7s}")
    for name in headline_queries():
        fn, _ = CATALOG[name]
        bb, be, bt = float("inf"), float("inf"), float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            bb = min(bb, t1 - t0)
            be = min(be, t2 - t1)
            bt = min(bt, t2 - t0)
        print(f"{name:28s} {bb:7.3f} {be:7.3f} {bt:7.3f}")

    # q32 decomposition: postings kernel alone vs full pair join
    from defenda_data_lake_spark.operators.dedup import word_shingle_postings

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for label, mk in [
        ("q32_postings_only", lambda: word_shingle_postings(docs, "text", "doc_id", 3)),
    ]:
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{label:28s} {'':7s} {best:7.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
