#!/usr/bin/env python
"""Round-7 floor decomposition for q03 and q16 — the two headline
queries whose >2x-of-DuckDB ratios had only the by-analogy
"exchange-round floor" argument (VERDICT r6 item 3).  Splits each
query's wall into plan phases, each measured as its own consecutive
best-of-N jobs over the SAME warm cached tables bench.py uses, plus
the vanilla-JVM floors those phases bottom out at.

Run on a quiet box: PYTHONPATH=/root/repo python scripts/floor_probe_r7.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TZ", "UTC")
time.tzset()


def best_of(fn, n=6):
    b = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        b = min(b, time.perf_counter() - t0)
    return b


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from defenda_data_lake_spark.plans.catalog import (
        CATALOG,
        _sql_over,
        warm_table_cache,
    )
    from defenda_data_lake_spark.session import get_spark, tune_for_input_scale

    spark = get_spark(app_name="floor-probe-r7")
    tune_for_input_scale(spark, sf_dir)
    warm_table_cache(spark, sf_dir)
    import pandas as _pd

    spark.range(1000).repartition(32).mapInPandas(
        lambda it: (_pd.DataFrame({"id": b["id"]}) for b in it), schema="id long"
    ).count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def sql(q, tables):
        return _sql_over(spark, sf_dir, q, tables)

    phases = {}

    # ---- shared JVM floors over the same cached tables
    phases["floor_count_lineitem"] = best_of(
        lambda: noop(sql("SELECT count(*) AS n FROM lineitem", ["lineitem"]))
    )
    phases["floor_2exchange_agg"] = best_of(
        lambda: noop(
            sql(
                "SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY 1",
                ["lineitem"],
            )
        )
    )

    # ---- q03 phases
    for name, q, tabs in [
        (
            "q03_full",
            None,
            None,
        ),
        (
            "q03_scan_filter",  # filtered fact scan only
            """SELECT count(*) AS n FROM lineitem
               WHERE l_shipdate > TIMESTAMP '1998-01-01'""",
            ["lineitem"],
        ),
        (
            "q03_joins_only",  # both joins, no agg
            """SELECT /*+ BROADCAST(customer) */ count(*) AS n
               FROM lineitem
               JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               WHERE c_mktsegment = 'BUILDING'
                 AND o_orderdate < TIMESTAMP '1999-01-01'
                 AND l_shipdate > TIMESTAMP '1998-01-01'""",
            ["lineitem", "orders", "customer"],
        ),
        (
            "q03_joins_agg_no_topk",  # + the grouped agg, no ORDER/LIMIT
            """SELECT /*+ BROADCAST(customer) */ l_orderkey, o_orderpriority,
                      sum(l_extendedprice * (1 - l_discount)) AS revenue
               FROM lineitem
               JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               WHERE c_mktsegment = 'BUILDING'
                 AND o_orderdate < TIMESTAMP '1999-01-01'
                 AND l_shipdate > TIMESTAMP '1998-01-01'
               GROUP BY l_orderkey, o_orderpriority""",
            ["lineitem", "orders", "customer"],
        ),
    ]:
        if q is None:
            fn, _ = CATALOG["q03_shipping_priority"]
            phases[name] = best_of(lambda: noop(fn(spark, sf_dir)))
        else:
            phases[name] = best_of(lambda q=q, t=tabs: noop(sql(q, t)))

    # ---- q16 phases
    ev_bk = """SELECT user_id, ts, event_type,
               floor(unix_micros(ts) / 300000000) AS bk FROM events"""
    for name, q in [
        ("q16_full", None),
        ("q16_scan_bucket", f"SELECT count(*) AS n FROM ({ev_bk})"),
        (
            "q16_explode_side",
            f"""SELECT count(*) AS n FROM (
                 SELECT user_id, ts, event_type, explode(array(bk, bk + 1)) AS bk
                 FROM ({ev_bk}))""",
        ),
        (
            "q16_join_only",
            f"""SELECT count(*) AS n
                FROM (SELECT user_id, ts, event_type,
                             explode(array(bk, bk + 1)) AS bk FROM ({ev_bk})) a
                JOIN ({ev_bk}) b
                  ON a.user_id = b.user_id AND a.bk = b.bk
                 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 300 SECONDS""",
        ),
    ]:
        if q is None:
            fn, _ = CATALOG["q16_event_pairs"]
            phases[name] = best_of(lambda: noop(fn(spark, sf_dir)))
        else:
            phases[name] = best_of(lambda q=q: noop(sql(q, ["events"])))

    print(json.dumps({k: round(v, 4) for k, v in phases.items()}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
