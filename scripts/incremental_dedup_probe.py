#!/usr/bin/env python
"""Scale probe for operators/incremental_dedup.py: at Nx corpus
replication, compare (a) a FULL minhash_bucket_dedupe re-run over the
whole corpus — what a pipeline without the index must do every night —
against (b) an incremental_near_dedup probe of a 1/32-sized increment
against the persisted index of everything prior.

Usage: python scripts/incremental_dedup_probe.py [factor]
Prints one JSON line; record results in SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TZ", "UTC")
time.tzset()


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    from pyspark.sql import functions as F

    from defenda_data_lake_spark.operators.dedup import minhash_bucket_dedupe
    from defenda_data_lake_spark.operators.incremental_dedup import (
        build_dedup_index,
        incremental_near_dedup,
    )
    from defenda_data_lake_spark.session import get_spark

    spark = get_spark(app_name="incremental-dedup-probe")
    tmp = tempfile.mkdtemp(prefix="incdedup_probe_")
    try:
        # landed corpus: factor-1 replicas of 90% of the texts;
        # increment: the held-out 10% (fresh text the corpus has never
        # seen) plus a 2%-of-base slice of replicated text (real
        # near-dups to catch).  A nightly increment is MOSTLY new —
        # the earlier all-replica construction made every increment
        # doc a near-dup touching 100% of buckets, which measures the
        # degenerate case, reported separately below.
        base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        n_base = base.count()
        cut = int(n_base * 0.9)
        dup_slice = int(n_base * 0.02)
        copies = [
            base.filter(F.col("doc_id") < cut).withColumn(
                "doc_id", F.col("doc_id") + F.lit(r * 100_000_000)
            )
            for r in range(factor - 1)
        ]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionAll(c)
        big.write.parquet(f"{tmp}/landed")
        incr_df = base.filter(
            (F.col("doc_id") >= cut) | (F.col("doc_id") < dup_slice)
        ).withColumn(
            "doc_id", F.col("doc_id") + F.lit((factor - 1) * 100_000_000)
        )
        incr_df.write.parquet(f"{tmp}/incr")
        landed = spark.read.parquet(f"{tmp}/landed")
        incr = spark.read.parquet(f"{tmp}/incr")
        docs = landed.unionAll(incr)
        n = docs.count()

        t0 = time.perf_counter()
        build_dedup_index(landed, f"{tmp}/idx")
        t_build = time.perf_counter() - t0

        best_full = best_inc = float("inf")
        n_flagged_full = n_flagged_inc = -1
        for _ in range(2):
            t0 = time.perf_counter()
            n_flagged_full = (
                minhash_bucket_dedupe(docs)
                .filter(F.col("dup_of").isNotNull())
                .count()
            )
            best_full = min(best_full, time.perf_counter() - t0)
        for _ in range(2):
            t0 = time.perf_counter()
            marked, _rows = incremental_near_dedup(incr, f"{tmp}/idx")
            n_flagged_inc = marked.filter(F.col("dup_of").isNotNull()).count()
            best_inc = min(best_inc, time.perf_counter() - t0)

        print(
            json.dumps(
                {
                    "factor": factor,
                    "corpus_docs": n,
                    "full_rerun_s": round(best_full, 3),
                    "index_build_s": round(t_build, 3),
                    "incremental_probe_s": round(best_inc, 3),
                    "speedup": round(best_full / max(best_inc, 1e-9), 1),
                    "flagged_full": n_flagged_full,
                    "flagged_increment": n_flagged_inc,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
