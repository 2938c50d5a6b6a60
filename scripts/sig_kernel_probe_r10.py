#!/usr/bin/env python
"""Round-10 (VERDICT r9 item 5): measure the JVM ("sql") minhash
signature kernel against the incumbent Arrow/pandas kernel — the named
remaining lever for the streaming-dedup ratio.

Stage-isolated measurement: signatures over the documents table
replicated N times (ids offset), noop-written, best-of-3 after an
untimed warm pass, both kernels interleaved.  Also runs the q31
end-to-end minhash dedup both ways at sf0.1 for the integrated view.

Usage: python scripts/sig_kernel_probe_r10.py [factor]
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
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from defenda_data_lake_spark.operators.dedup import minhash_signatures
    from defenda_data_lake_spark.session import get_spark

    spark = get_spark(app_name="sig-kernel-probe")
    docs = spark.read.parquet(f"{base}/documents.parquet")
    big = docs
    for r in range(1, factor):
        # word-salt each replica (same rationale as scale_pairing_r10:
        # identical replica text would hand the pandas kernel's
        # worker-side memo cache a ~100% hit rate — flattering it; a
        # real growing corpus has mostly-new vocabulary)
        big = big.unionAll(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * 100_000_000))
            .withColumn(
                "text",
                F.concat(
                    F.regexp_replace(F.col("text"), r"(\S)(\s+)", f"$1_r{r}$2"),
                    F.lit(f"_r{r}"),
                ),
            )
        )
    big = big.localCheckpoint()  # freeze the input so both kernels
    # read identical in-memory blocks (no parquet-decode noise)
    n = big.count()

    def timed(kernel: str) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            minhash_signatures(big, "text", "doc_id", kernel=kernel).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    for k in ("pandas", "sql"):  # untimed warm (C2 + python workers)
        minhash_signatures(big, "text", "doc_id", kernel=k).write.format(
            "noop"
        ).mode("overwrite").save()
    walls = {k: timed(k) for k in ("pandas", "sql", "pandas", "sql")[:2]}
    # interleave a second sweep to de-bias drift
    walls2 = {k: timed(k) for k in ("sql", "pandas")}
    result = {
        "stage": "signatures_only",
        "rows": n,
        "factor": factor,
        "loadavg": tuple(round(x, 2) for x in os.getloadavg()),
        "pandas_sec": round(min(walls["pandas"], walls2["pandas"]), 3),
        "sql_sec": round(min(walls["sql"], walls2["sql"]), 3),
    }
    result["sql_over_pandas"] = round(result["sql_sec"] / result["pandas_sec"], 2)
    print(json.dumps(result), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
