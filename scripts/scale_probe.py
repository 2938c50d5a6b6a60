#!/usr/bin/env python
"""Empirical scaling probe: replicate the sf0.1 tables Nx on disk and
measure how headline query wall-clock grows.  A plan that's healthy at
scale shows ~linear growth for scans/aggs and no blow-up for joins —
this is the evidence behind the catalog's '100 TB-minded' annotations.

Usage: python scripts/scale_probe.py [replication_factor] [query ...]
Writes one JSON line: per-query seconds at 1x vs Nx and the ratio.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TZ", "UTC")
time.tzset()

REPLICATED = ["lineitem", "orders", "events", "documents", "embeddings"]
SMALL = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    names = sys.argv[2:] or [
        "q01_pricing_summary",
        "q05_regional_revenue",
        "q10_window_rank",
        "q16_event_pairs",
        "q30_dedup_exact",
        "q31_dedup_minhash",
    ]
    base = "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from defenda_data_lake_spark.plans.catalog import CATALOG
    from defenda_data_lake_spark.session import get_spark

    spark = get_spark(app_name="scale-probe")
    tmp = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        # build the Nx copies; keys are offset per replica so join
        # fan-out and group cardinalities scale the way real data would
        for t in REPLICATED:
            df = spark.read.parquet(f"{base}/{t}.parquet")
            key_cols = {
                "lineitem": ["l_orderkey"],
                "orders": ["o_orderkey", "o_custkey"],
                "events": ["event_id", "user_id"],
                "documents": ["doc_id"],
                "embeddings": ["vec_id"],
            }[t]
            copies = []
            for r in range(factor):
                c = df
                for k in key_cols:
                    c = c.withColumn(k, F.col(k) + F.lit(r * 100_000_000))
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionAll(c)
            out.write.mode("overwrite").parquet(f"{tmp}/{t}.parquet")
        for t in SMALL:
            src = f"{base}/{t}.parquet"
            dst = f"{tmp}/{t}.parquet"
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copyfile(src, dst)

        # warm workers
        spark.read.parquet(f"{tmp}/lineitem.parquet").count()

        result = {}
        for name in names:
            fn, _ = CATALOG[name]
            times = {}
            for label, sf_dir in (("x1", base), (f"x{factor}", tmp)):
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                times[label] = round(best, 3)
            times["ratio"] = round(times[f"x{factor}"] / max(times["x1"], 1e-9), 2)
            result[name] = times
        print(json.dumps({"factor": factor, "queries": result}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
