#!/usr/bin/env python
"""Round-12 probe (VERDICT r11 item 4): the bucketize_facts
lake-maintenance op at 32x — write the bucketed+sorted layout from
32x-replicated sf0.1 parquet, then verify a COLD-read orderkey join is
exchange-free and time it against the same join over plain parquet.

Usage: python scripts/bucketize_probe_r12.py [factor] [replica_dir]
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
    tmp = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/scale{factor}_r12"
    base = "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from defenda_data_lake_spark.lake_maintenance import bucketize_facts
    from defenda_data_lake_spark.session import get_spark

    spark = get_spark(app_name="bucketize-probe-r12")
    out: dict = {"factor": factor,
                 "loadavg": [round(x, 2) for x in os.getloadavg()]}
    try:
        if not os.path.isdir(f"{tmp}/orders.parquet"):
            build(spark, base, tmp, factor)

        t0 = time.perf_counter()
        stats = bucketize_facts(spark, tmp, database="bucketed_r12")
        out["layout_write_s"] = round(time.perf_counter() - t0, 2)
        out["stats"] = stats

        def join_of(orders, li):
            return (
                li.join(orders, li.l_orderkey == orders.o_orderkey)
                .groupBy("o_orderpriority")
                .agg(
                    F.round(
                        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                        2,
                    ).alias("revenue"),
                    F.count("*").alias("n_items"),
                )
            )

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def best_of(df, k=3):
            best = float("inf")
            for _ in range(k):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            return round(best, 3)

        # cold-read bucketed join: fresh table objects, nothing cached
        bdf = join_of(
            spark.table("bucketed_r12.orders"),
            spark.table("bucketed_r12.lineitem"),
        )
        bdf.collect()
        plan = (
            bdf._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0]
        )
        join_part = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else ""
        out["bucketed_join_exchange_free"] = (
            "SortMergeJoin" in plan and "Exchange" not in join_part
        )
        out["bucketed_join_s"] = best_of(bdf)

        pdf = join_of(
            spark.read.parquet(f"{tmp}/orders.parquet"),
            spark.read.parquet(f"{tmp}/lineitem.parquet"),
        )
        out["plain_parquet_join_s"] = best_of(pdf)

        # n_items must match exactly; revenue is a giant double sum
        # whose ADDITION ORDER differs between layouts, so compare it
        # at relative 1e-12 (the 2dp round can flip a last digit on an
        # exact .005 edge — FP determinism across layouts is not a
        # claim any engine makes)
        got = {r["o_orderpriority"]: r for r in bdf.collect()}
        want = {r["o_orderpriority"]: r for r in pdf.collect()}
        out["values_equal"] = set(got) == set(want) and all(
            got[k]["n_items"] == want[k]["n_items"]
            and abs(got[k]["revenue"] - want[k]["revenue"])
            <= 1e-12 * abs(want[k]["revenue"])
            for k in want
        )
        out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
        print(json.dumps(out), flush=True)
    finally:
        for t in ("orders", "lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS bucketed_r12.{t}")
        spark.stop()


if __name__ == "__main__":
    main()
