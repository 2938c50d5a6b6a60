#!/usr/bin/env python
"""Round-12 scale probe for the two NEW catalog entries
(q125_source_divergence, q126_embedding_drift): run BOTH engines on
Nx-replicated sf0.1 parquet (scale_pairing_r10's replication) and check
VALUE EQUALITY at scale as well as walls — a new entry earns its scale
claim on arrival (the r11 probe's contract).

Usage: python scripts/scale_probe_r12.py [factor] [replica_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/repo")
os.environ.setdefault("TZ", "UTC")
time.tzset()

from scale_pairing_r10 import REPLICATED, SMALL, build  # noqa: E402

# q127_preference_pairs is deliberately NOT paired here: its oracle
# rides q49's recursive reach CTE, and at 32x DuckDB's replay
# materializes the transitive-closure pair set — measured DNF (temp
# spill IOException after exhausting the disk's free space; separately
# a >9 min timeout) while Spark's pointer-jumping components finish in
# 9.6-38.7 s.  Value equality for q127 is pinned at the three
# standard SFs by check_oracle instead (SCALING.md round 12).
NAMES = ["q125_source_divergence", "q126_embedding_drift"]


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

    spark = get_spark(app_name="scale-probe-r12")
    if tmp == "-":
        tmp = tempfile.mkdtemp(prefix=f"scale_probe_r12_{factor}x_")
    try:
        if not os.path.isdir(f"{tmp}/documents.parquet"):
            t0 = time.time()
            build(spark, base, tmp, factor)
            print(json.dumps({"built": tmp, "factor": factor,
                              "build_sec": round(time.time() - t0, 1)}),
                  flush=True)
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
        for name in NAMES:
            fn, sql = CATALOG[name]
            srows = sorted(tuple(map(str, r)) for r in fn(spark, tmp).collect())
            orows = sorted(tuple(map(str, r)) for r in con.execute(sql).fetchall())
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
                "spark": round(sbest, 3),
                "duckdb": round(dbest, 3),
                "ratio": round(sbest / dbest, 2),
            }
        out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
        print(json.dumps(out), flush=True)
    finally:
        clear_table_cache()
        spark.stop()


if __name__ == "__main__":
    main()
