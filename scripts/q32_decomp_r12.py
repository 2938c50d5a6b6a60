#!/usr/bin/env python
"""Round-12 probe (VERDICT r11 item 5): decompose q32_dedup_jaccard —
the at-scale wall-clock whale (24.2 s at 128x in the r10 pairing) —
into its pipeline stages at Nx-replicated sf0.1, so the binding stage
and its scaling exponent are named.

Stages (operators/dedup.py):
  A  shingle kernel            word_shingle_postings (Arrow kernel,
                               distinct-text memo) — also reports the
                               memo hit rate via distinct-text count
  B  + repartition + DF guard  _sharded_postings (one keyed exchange,
                               document-frequency window)
  C  full q32                  + postings self-join + pair agg +
                               jaccard filter

Measurement isolation: the shingle kernel memoizes per DISTINCT TEXT
for the Python worker's lifetime, so any stage run after another in
the same session gets the kernel nearly free (the first 32x attempt
measured stage B — a SUPERSET of A — at 3.1 s vs A's 7.9 s for
exactly this reason).  Each stage therefore runs in its own
subprocess/session; pass STAGE=A|B|C to run one stage, no STAGE to
orchestrate all three sequentially.

Usage: python scripts/q32_decomp_r12.py [factor] [replica_dir]
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


def t_noop(df, k=3):
    best = float("inf")
    for _ in range(k):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def run_stage(stage: str, factor: int, tmp: str) -> None:
    from defenda_data_lake_spark.operators.dedup import (
        _sharded_postings,
        word_shingle_postings,
    )
    from defenda_data_lake_spark.plans.catalog import (
        CATALOG,
        _Q32_MAX_SHINGLE_DOCS,
        clear_table_cache,
        warm_table_cache,
    )
    from defenda_data_lake_spark.plans.catalog_shared import _t
    from defenda_data_lake_spark.session import get_spark

    spark = get_spark(app_name=f"q32-decomp-r12-{stage}")
    try:
        if not os.path.isdir(f"{tmp}/documents.parquet"):
            t0 = time.time()
            build(spark, "/root/testdata/sf0.1", tmp, factor)
            print(json.dumps({"built": tmp, "build_sec": round(time.time() - t0, 1)}),
                  flush=True)
        clear_table_cache()
        warm_table_cache(spark, tmp)
        docs = _t(spark, tmp, "documents")
        out = {"stage": stage, "factor": factor,
               "loadavg": [round(x, 2) for x in os.getloadavg()]}
        if stage == "A":
            kernel = word_shingle_postings(docs, "text", "doc_id", 3)
            out["noop_s"] = t_noop(kernel)
            out["posting_rows"] = kernel.count()
            n_docs = docs.count()
            n_distinct = docs.select("text").distinct().count()
            out["n_docs"] = n_docs
            # the kernel memoizes per distinct text for the WORKER's
            # lifetime: within one cold pass the hit rate is
            # 1 - distinct/total (word-salted replicas are distinct by
            # design, so cold-run memo relief ~vanishes at scale;
            # repeat runs in one session hit ~100%)
            out["cold_memo_hit_rate"] = round(1 - n_distinct / n_docs, 4)
        elif stage == "B":
            sharded = _sharded_postings(
                docs, "text", "doc_id", 3, _Q32_MAX_SHINGLE_DOCS
            )
            out["noop_s"] = t_noop(sharded)
        else:
            fn, _ = CATALOG["q32_dedup_jaccard"]
            out["noop_s"] = t_noop(fn(spark, tmp))
        out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
        print(json.dumps(out), flush=True)
    finally:
        clear_table_cache()
        spark.stop()


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    tmp = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/scale{factor}_r12"
    stage = os.environ.get("STAGE")
    if stage:
        run_stage(stage, factor, tmp)
        return
    import subprocess

    for st in ("A", "B", "C"):
        env = dict(os.environ, STAGE=st)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(factor), tmp],
            env=env,
            check=True,
        )


if __name__ == "__main__":
    main()
