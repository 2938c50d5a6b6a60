#!/usr/bin/env python
"""VERDICT r12 item 5 closing evidence: q73_semdedup at 32x with the
byte-budgeted sub-bucket cap (max_group_bytes=64 MiB at the catalog
call site) — the number must be unchanged-or-better vs the r12 rows
cap (17.0 s at 32x), and the byte- and row-cap forms must agree
value-for-value at scale.

Usage: python scripts/q73_32x_probe_r13.py [factor] [replica_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/repo")
os.environ.setdefault("TZ", "UTC")
time.tzset()

from scale_pairing_r10 import build  # noqa: E402


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    tmp = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/scale{factor}_r13"

    from pyspark.sql import functions as F

    from defenda_data_lake_spark.operators.clustering import semdedup
    from defenda_data_lake_spark.plans.catalog import CATALOG
    from defenda_data_lake_spark.session import get_spark, tune_for_input_scale

    spark = get_spark(app_name="q73-32x-probe")
    if not os.path.isdir(f"{tmp}/lineitem.parquet"):
        t0 = time.time()
        build(spark, "/root/testdata/sf0.1", tmp, factor)
        print(json.dumps({"built": tmp, "factor": factor,
                          "build_sec": round(time.time() - t0, 1)}), flush=True)
    tune_for_input_scale(spark, tmp)
    spark.read.parquet(f"{tmp}/embeddings.parquet").count()  # warm footers

    fn, _ = CATALOG["q73_semdedup"]

    walls = []
    for rep in range(2):
        spark.sparkContext.setJobDescription(f"q73 32x byte-cap rep{rep}")
        t0 = time.perf_counter()
        fn(spark, tmp).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 2))

    # value parity at scale: byte-budgeted cap vs the r12 explicit rows
    # cap (4096) — same embedding table, same knobs otherwise
    emb = spark.read.parquet(f"{tmp}/embeddings.parquet")
    by_bytes = semdedup(
        emb, k=8, iterations=3, threshold=0.4, max_group_bytes=64 << 20
    ).select("id", "cluster", "is_duplicate")
    by_rows = semdedup(
        emb, k=8, iterations=3, threshold=0.4, max_group_rows=4096
    ).select("id", "cluster", "is_duplicate")
    mism = (
        by_bytes.alias("a")
        .join(by_rows.alias("b"), "id", "full")
        .where(
            (F.col("a.cluster") != F.col("b.cluster"))
            | (F.col("a.is_duplicate") != F.col("b.is_duplicate"))
            | F.col("a.cluster").isNull()
            | F.col("b.cluster").isNull()
        )
        .count()
    )
    print(
        json.dumps(
            {
                "factor": factor,
                "q73_noop_walls_sec": walls,
                "byte_vs_row_cap_mismatches": mism,
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
