#!/usr/bin/env python
"""Round-13 q96_knn_pq decomposition: the heavy-group addition put PQ
on the driver-measured surface (2.3-3.2 s at sf0.1), so split one q96
execution into its stages under the bench's own session state —
pq_train (cache + init collect + per-iteration fused means jobs),
the 5-query collect, pq_encode+pq_topk noop — to name what binds:
data-proportional work, job floor, or codegen.

Usage: python scripts/q96_decomp_r13.py [sf_dir] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TZ", "UTC")
time.tzset()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from defenda_data_lake_spark.operators.pq import pq_encode, pq_topk, pq_train
    from defenda_data_lake_spark.plans.catalog import (
        CATALOG,
        warm_table_cache,
    )
    from defenda_data_lake_spark.plans.catalog_shared import _t
    from defenda_data_lake_spark.session import get_spark, tune_for_input_scale

    spark = get_spark(app_name="q96-decomp-r13")
    tune_for_input_scale(spark, sf_dir)
    warm_table_cache(spark, sf_dir)
    # untimed warm pass (HotSpot + Python workers), bench protocol
    CATALOG["q96_knn_pq"][0](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    stages: dict[str, list[float]] = {}
    for _ in range(reps):
        emb = _t(spark, sf_dir, "embeddings")

        spark.sparkContext.setJobDescription("q96 decomp: pq_train")
        t0 = time.perf_counter()
        books = pq_train(emb, m=4, k=16, iterations=2, dim=64)
        stages.setdefault("train", []).append(time.perf_counter() - t0)

        spark.sparkContext.setJobDescription("q96 decomp: query collect")
        t0 = time.perf_counter()
        queries = [
            (r["vec_id"], list(r["embedding"]))
            for r in emb.select("vec_id", "embedding")
            .orderBy("vec_id")
            .limit(5)
            .collect()
        ]
        stages.setdefault("query_collect", []).append(time.perf_counter() - t0)

        spark.sparkContext.setJobDescription("q96 decomp: encode+topk noop")
        t0 = time.perf_counter()
        codes = pq_encode(emb, books)
        pq_topk(codes, queries, books, k_top=10).write.format("noop").mode(
            "overwrite"
        ).save()
        stages.setdefault("encode_topk", []).append(time.perf_counter() - t0)

        spark.sparkContext.setJobDescription("q96 decomp: full entry")
        t0 = time.perf_counter()
        CATALOG["q96_knn_pq"][0](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        stages.setdefault("full_entry", []).append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "stages": {k: [round(x, 3) for x in v] for k, v in stages.items()},
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
