#!/usr/bin/env python
"""Spark-side wall for EVERY catalog query at $SPARK_GRAFT_SF_DIR
(default sf0.1): noop sink, warm table cache, best-of-N (default 2)
after one untimed warmup run per query.  The optimization round's
measure-everything sweep (guide §1).

Usage: python scripts/catalog_sweep_r13.py [reps] [query ...]
Prints one line per query and a JSON summary at the end.
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from defenda_data_lake_spark.plans.catalog import CATALOG, warm_table_cache
    from defenda_data_lake_spark.session import get_spark, tune_for_input_scale

    spark = get_spark(app_name="catalog-sweep")
    tune_for_input_scale(spark, sf_dir)
    warm_table_cache(spark, sf_dir)
    import pandas as _pd

    spark.range(1000).repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    ).mapInPandas(
        lambda it: (_pd.DataFrame({"id": b["id"]}) for b in it), schema="id long"
    ).count()

    if not names:
        names = list(CATALOG)
    walls: dict[str, float] = {}
    for name in names:
        fn, _ = CATALOG[name]
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            walls[name] = round(best, 3)
            print(f"{name}: {best:.3f}s", flush=True)
        except Exception as exc:  # keep sweeping; report at the end
            walls[name] = -1.0
            print(f"{name}: ERROR {exc}", flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sweep": walls, "sf_dir": sf_dir,
                      "loadavg": tuple(round(x, 2) for x in os.getloadavg())}))
    spark.stop()


if __name__ == "__main__":
    main()
