#!/usr/bin/env python
"""Round-9 floor-weak probe (VERDICT r8 item 2): one structurally
different plan attempt each for q40 and q20, measured under the bench
protocol (warm cache, untimed compile pass, consecutive best-of-4 x 2
sweeps) on a quiet box.

q40 alternative: cosine_topk_codegen — query block folded into literal
whole-stage-codegen multiply-adds, no Python stage.
q20 alternative: derived_view("events_k") — from_json projected once
per session into a pinned columnar view, so reps scan parsed ints.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TZ", "UTC")
time.tzset()

from pyspark.sql import functions as F


def best_of(fn, reps=4, sweeps=2, pause=0.0):
    best = float("inf")
    for _ in range(sweeps):
        for _ in range(reps):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        if pause:
            time.sleep(pause)
    return round(best, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_start = tuple(round(x, 2) for x in os.getloadavg())

    from defenda_data_lake_spark.plans.catalog import (
        CATALOG,
        warm_table_cache,
    )
    from defenda_data_lake_spark.plans.catalog_shared import (
        R,
        _sql_over,
        _t,
        derived_view,
    )
    from defenda_data_lake_spark.operators import similarity as S
    from defenda_data_lake_spark.session import get_spark, tune_for_input_scale

    spark = get_spark(app_name="floor-probe-r9")
    tune_for_input_scale(spark, sf_dir)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    warm_table_cache(spark, sf_dir)
    import pandas as _pd

    spark.range(1000).repartition(32).mapInPandas(
        lambda it: (_pd.DataFrame({"id": b["id"]}) for b in it), schema="id long"
    ).count()

    # ---- q40 variants
    def q40_current():
        return CATALOG["q40_knn_brute"][0](spark, sf_dir)

    def q40_codegen():
        emb = _t(spark, sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") < 5)
        return S.cosine_topk_codegen(emb, queries, k=10).select(
            "query_id",
            "neighbor_id",
            R("cosine", 6).alias("cosine"),
            F.col("rank").cast("long").alias("rank"),
        )

    # ---- q20 variants
    def q20_current():
        return CATALOG["q20_events_json"][0](spark, sf_dir)

    def _build_events_k(s, d):
        return _t(s, d, "events").select(
            "event_type",
            "value",
            F.from_json("props", "k INT").getField("k").alias("k"),
        )

    def q20_derived():
        ev_k = derived_view(
            spark, sf_dir, "events_k", _build_events_k, source_table="events"
        )
        return _sql_over(
            spark,
            sf_dir,
            """
SELECT event_type, count(*) AS n, sum(k) AS sum_k,
       round(avg(value) * 10000, 0) / 10000 AS avg_value
FROM events_k WHERE k < 50 GROUP BY event_type
""",
            [],
            extra_views={"events_k": ev_k},
        )

    # value parity first (the variant is only admissible if identical)
    for name, a, b in (("q40", q40_current, q40_codegen),
                       ("q20", q20_current, q20_derived)):
        rows_a = sorted(map(tuple, a().collect()))
        rows_b = sorted(map(tuple, b().collect()))
        assert rows_a == rows_b, f"{name} variant diverges: {rows_a[:3]} vs {rows_b[:3]}"

    # untimed compile pass
    for fn in (q40_current, q40_codegen, q20_current, q20_derived):
        fn().write.format("noop").mode("overwrite").save()

    out = {
        "q40_current": best_of(q40_current),
        "q40_codegen": best_of(q40_codegen),
        "q20_current": best_of(q20_current),
        "q20_derived": best_of(q20_derived),
        "loadavg_start": load_start,
        "loadavg_end": tuple(round(x, 2) for x in os.getloadavg()),
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
