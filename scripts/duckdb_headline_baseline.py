#!/usr/bin/env python
"""DuckDB side of the headline comparison, same protocol as bench.py
(consecutive best-of-4 x 2 sweeps per query, parquet views at
$SPARK_GRAFT_SF_DIR) — run back-to-back with bench.py on the same box
in the same hour so the RATIO is load-invariant even when the box
runs absolute-slow (it measured 12-40% day-to-day swing on identical
code; SCALING.md 'Round 9')."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_start = tuple(round(x, 2) for x in os.getloadavg())
    from defenda_data_lake_spark.plans.catalog import CATALOG, headline_queries

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    # warm the OS page cache the way the Spark side warms its own
    con.execute("SELECT count(*) FROM lineitem").fetchall()

    best: dict[str, float] = {}
    names = headline_queries()
    for name in names:
        sql = CATALOG[name][1]
        con.execute(sql).fetchall()  # untimed warm pass
        best[name] = float("inf")
    for _ in range(2):
        for name in names:
            sql = CATALOG[name][1]
            for _ in range(4):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                best[name] = min(best[name], time.perf_counter() - t0)
    timings = {n: round(v, 3) for n, v in best.items()}
    print(
        json.dumps(
            {
                "metric": "duckdb_headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf_dir": sf_dir,
                "loadavg_start": load_start,
                "loadavg_end": tuple(round(x, 2) for x in os.getloadavg()),
            }
        )
    )


if __name__ == "__main__":
    main()
