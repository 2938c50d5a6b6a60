#!/usr/bin/env python
"""Round-12 probe (VERDICT r11 item 3): the NB-scoring family
(q103/q106/q123) after the shared `_nb_scored_view` — value equality
vs DuckDB at Nx-replicated sf0.1, the one-time view build cost, and
warm per-query walls for BOTH engines (DuckDB replays the full CTE
pipeline per query; Spark pays the scoring subtree once per session —
the q87 derived-view move applied to the family).

Usage: python scripts/nb_family_probe_r12.py [factor] [replica_dir]
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

from scale_pairing_r10 import REPLICATED, SMALL, build  # noqa: E402

NAMES = [
    "q103_nb_quality_classifier",
    "q106_classifier_eval",
    "q123_classifier_calibration",
]


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    tmp = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/scale{factor}_r12"
    base = "/root/testdata/sf0.1"

    import duckdb

    from defenda_data_lake_spark.plans.catalog import (
        CATALOG,
        clear_table_cache,
        warm_table_cache,
    )
    from defenda_data_lake_spark.session import get_spark

    spark = get_spark(app_name="nb-family-probe-r12")
    try:
        if not os.path.isdir(f"{tmp}/documents.parquet"):
            build(spark, base, tmp, factor)
        clear_table_cache()
        warm_table_cache(spark, tmp)

        con = duckdb.connect()
        for t in REPLICATED:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{tmp}/{t}.parquet/*.parquet')")
        for t in SMALL:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{tmp}/{t}.parquet')")

        out = {"factor": factor,
               "loadavg_start": [round(x, 2) for x in os.getloadavg()]}
        # one-time view build: the first family member's first call
        t0 = time.perf_counter()
        fn0, _ = CATALOG[NAMES[0]]
        fn0(spark, tmp).write.format("noop").mode("overwrite").save()
        out["view_build_plus_q103_s"] = round(time.perf_counter() - t0, 3)

        def canon(v) -> str:
            # DuckDB rounds a tiny negative score to -0.0 where Spark
            # says 0.0 — numerically equal (the driver's compare is
            # float-based and agrees); don't let str() flag it
            s = str(v)
            return "0.0" if s == "-0.0" else s

        for name in NAMES:
            fn, sql = CATALOG[name]
            srows = sorted(tuple(map(canon, r)) for r in fn(spark, tmp).collect())
            orows = sorted(tuple(map(canon, r)) for r in con.execute(sql).fetchall())
            sbest = dbest = float("inf")
            for _ in range(2):
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn(spark, tmp).write.format("noop").mode("overwrite").save()
                    sbest = min(sbest, time.perf_counter() - t0)
                for _ in range(2):
                    t0 = time.perf_counter()
                    con.execute(sql).fetchall()
                    dbest = min(dbest, time.perf_counter() - t0)
            out[name] = {
                "rows": len(srows),
                "values_equal": srows == orows,
                "spark_warm": round(sbest, 3),
                "duckdb": round(dbest, 3),
                "ratio_warm": round(sbest / dbest, 2),
            }
        out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
        print(json.dumps(out), flush=True)
    finally:
        clear_table_cache()
        spark.stop()


if __name__ == "__main__":
    main()
