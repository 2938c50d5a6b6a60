#!/usr/bin/env python
"""Capture ``explain("formatted")`` for catalog queries into
``plans/r13/<query>_<tag>.txt`` (the optimization round's plan
evidence; the judge checks plan claims against these files).

Usage: python scripts/capture_plans_r13.py <tag> [query ...]

Plans are captured under the SAME session state the bench measures
(warm_table_cache + tune_for_input_scale at sf0.1), so Exchange
counts and join strategies in the files are the bench's plans.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TZ", "UTC")
time.tzset()


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from defenda_data_lake_spark.plans.catalog import (
        CATALOG,
        headline_queries,
        warm_table_cache,
    )
    from defenda_data_lake_spark.session import get_spark, tune_for_input_scale

    if not names:
        names = headline_queries()

    spark = get_spark(app_name="plan-capture")
    tune_for_input_scale(spark, sf_dir)
    warm_table_cache(spark, sf_dir)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn, _ = CATALOG[name]
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_exchange = plan.count("Exchange")
        n_python = plan.count("EvalPython") + plan.count("MapInPandas") + plan.count("ArrowEval")
        print(f"{name}: {len(plan.splitlines())} lines, Exchange x{n_exchange}, python-nodes x{n_python} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
