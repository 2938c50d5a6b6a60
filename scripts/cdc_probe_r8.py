#!/usr/bin/env python
"""CDC-maintenance scale probe: is the per-batch fold cost really
O(batch + touched buckets), independent of snapshot size?

Builds snapshots of increasing size (same bucket count), folds an
IDENTICAL fixed-size change batch into each, and times the fold.  A
flat fold time across a 16x snapshot growth validates the
touched-bucket claim; linear growth would falsify it.  Also probes the
opposite axis: a batch touching 1 bucket vs all buckets on the largest
snapshot.

Usage: PYTHONPATH=/root/repo python scripts/cdc_probe_r8.py
Prints one JSON line.  Best-of-3 per cell (the jitter protocol).
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

BUCKETS = 64
BATCH = 5_000


def main() -> None:
    from pyspark.sql import functions as F

    from defenda_data_lake_spark.session import get_spark
    from defenda_data_lake_spark.streaming.cdc import fold_cdc_batch

    spark = get_spark(app_name="cdc-probe")
    out: dict = {"buckets": BUCKETS, "batch_rows": BATCH, "loadavg": []}
    with open("/proc/loadavg") as f:
        out["loadavg"].append([float(x) for x in f.read().split()[:3]])

    def mk_changes(lo: int, hi: int, seq0: int, key_mod: int | None = None):
        df = spark.range(lo, hi).select(
            F.lit("U").alias("op"),
            (F.col("id") + seq0).alias("seq"),
            (
                F.col("id") if key_mod is None else (F.col("id") % key_mod)
            ).alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        )
        return df

    tmp = tempfile.mkdtemp(prefix="cdc_probe_")
    try:
        results = {}
        for size in (50_000, 200_000, 800_000):
            path = os.path.join(tmp, f"snap_{size}")
            fold_cdc_batch(
                spark, path, mk_changes(0, size, 0), ["k"],
                num_buckets=BUCKETS,
            )
            # identical fixed-size update batch (keys spread over all
            # buckets), folded with warm JVM: best-of-3
            best = None
            for trial in range(3):
                batch = mk_changes(0, BATCH, 10_000_000 * (trial + 1))
                t0 = time.perf_counter()
                stats = fold_cdc_batch(
                    spark, path, batch, ["k"], num_buckets=BUCKETS,
                    table_exists=True,
                )
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                assert stats["applied"] == BATCH
            results[str(size)] = round(best, 3)
        out["fold_s_by_snapshot_rows"] = results
        out["flat_ratio_800k_vs_50k"] = round(
            results["800000"] / results["50000"], 2
        )

        # touched-bucket axis on the largest snapshot: an equal-size
        # batch whose keys ALL hash into ONE bucket — the fold should
        # read/rewrite 1/64th of the table
        path = os.path.join(tmp, "snap_800000")
        one_bucket_keys = (
            spark.range(0, 800_000)
            .filter(F.pmod(F.hash(F.col("id")), F.lit(BUCKETS)) == 0)
            .limit(BATCH)
            .localCheckpoint(eager=True)
        )
        one_bucket = None
        for trial in range(3):
            batch = one_bucket_keys.select(
                F.lit("U").alias("op"),
                (F.col("id") + 50_000_000 * (trial + 1)).alias("seq"),
                F.col("id").alias("k"),
                F.lit("x").alias("v"),
            )
            t0 = time.perf_counter()
            stats = fold_cdc_batch(
                spark, path, batch, ["k"], num_buckets=BUCKETS,
                table_exists=True,
            )
            dt = time.perf_counter() - t0
            one_bucket = dt if one_bucket is None else min(one_bucket, dt)
        out["fold_s_one_bucket_800k"] = round(one_bucket, 3)
        out["touched_one_bucket"] = len(stats["touched_buckets"])
        with open("/proc/loadavg") as f:
            out["loadavg"].append([float(x) for x in f.read().split()[:3]])
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
