#!/usr/bin/env python
"""The nightly maintenance loop, end to end, with assertions:

1. land history  - events written as a day-partitioned fact table
2. build rollup  - per-(event_type, day) counts/sums/distinct-users
3. nightly delta - a new day PLUS late rows for an old day folded in
   via update_rollup (touches only those partitions)
4. audit         - snapshot_diff of the rollup before/after must
   report changes ONLY in the touched days (the reconciliation
   closing the loop); sampled_snapshot_diff previews it from a key
   sample
5. verify        - the updated rollup equals a full rebuild
6. CDC apply     - an I/U/D change batch folded into a hash-bucketed
   current-state snapshot; the same snapshot_diff audits that applied
   == modified and deleted == removed

Usage: python scripts/maintenance_loop_demo.py [sf_dir]
Prints one JSON line of counts.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TZ", "UTC")
time.tzset()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import functions as F

    from defenda_data_lake_spark.operators.diff import (
        snapshot_diff,
        snapshot_diff_summary,
    )
    from defenda_data_lake_spark.operators.rollup import (
        build_rollup,
        rollup_hll_estimate,
        update_rollup,
    )
    from defenda_data_lake_spark.session import get_spark

    spark = get_spark(app_name="maintenance-loop-demo")
    out: dict = {}
    tmp = tempfile.mkdtemp(prefix="maintloop_")
    try:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
            "day", F.to_date("ts").cast("string")
        )
        days = sorted(r[0] for r in ev.select("day").distinct().collect())
        hist_days, new_day, late_day = days[:-1], days[-1], days[1]
        out["days"] = len(days)

        spec = {
            "n_events": ("count", "event_id"),
            "total_value": ("sum", "value"),
            "users_hll": ("hll", "user_id"),
        }
        keys = ["event_type", "day"]
        path = os.path.join(tmp, "rollup")
        build_rollup(ev.filter(F.col("day").isin(hist_days)), keys, "day", spec, path)
        before = spark.read.parquet(path).localCheckpoint(eager=True)
        out["rollup_rows_before"] = before.count()

        # the nightly delta: the newest day + late rows for an old day
        late = ev.filter(F.col("day") == late_day).limit(20)
        delta = ev.filter(F.col("day") == new_day).unionByName(late)
        touched = update_rollup(spark, path, delta, keys, "day", spec)
        assert sorted(touched) == sorted({new_day, late_day}), touched
        out["touched_partitions"] = sorted(touched)

        after = spark.read.parquet(path)
        out["rollup_rows_after"] = after.count()

        # audit: every changed rollup row must sit in a touched day
        audit = snapshot_diff_summary(
            before, after, ["day", "event_type"], null_safe_keys=False
        )
        by_type = {r["diff_type"]: r["n_rows"] for r in audit.collect()}
        out["audit"] = by_type
        changed_days = {
            r["day"]
            for r in snapshot_diff(
                before, after, ["day", "event_type"], null_safe_keys=False
            )
            .filter(F.col("diff_type") != "unchanged")
            .select("day")
            .distinct()
            .collect()
        }
        # partition read-back infers day as DATE (the documented
        # round-trip caveat) while touched carries the delta's strings
        assert {str(d) for d in changed_days} <= set(touched), (
            changed_days,
            touched,
        )
        assert by_type.get("removed") is None, by_type  # folds never delete

        # verify: incremental result == full rebuild
        full = os.path.join(tmp, "full")
        build_rollup(
            ev.filter(F.col("day").isin(hist_days))
            .unionByName(delta),
            keys,
            "day",
            spec,
            full,
        )

        def frame(df):
            return sorted(
                tuple(sorted(v.items()) if isinstance(v, dict) else v for v in row)
                for row in df.select(*sorted(df.columns)).collect()
            )

        assert frame(after) == frame(spark.read.parquet(full))
        out["incremental_equals_rebuild"] = True

        # the live number the rollup exists for: range-wide distinct
        # users per event type from the persisted per-day maps
        est = rollup_hll_estimate(after, "users_hll", ["event_type"])
        out["distinct_users_est"] = {
            r["event_type"]: round(r["hll_estimate"], 1) for r in est.collect()
        }

        # 6. CDC maintenance: fold an I/U/D change batch into a
        # hash-bucketed current-state snapshot and audit it with the
        # same snapshot_diff that closed the rollup loop
        from defenda_data_lake_spark.streaming.cdc import fold_cdc_batch

        snap_path = os.path.join(tmp, "snapshot")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "source", "n_chars"
        )
        seed = docs.select(
            F.lit("I").alias("op"),
            F.col("doc_id").alias("seq"),
            "doc_id", "source", "n_chars",
        )
        fold_cdc_batch(spark, snap_path, seed, ["doc_id"], num_buckets=8)
        before_cdc = (
            spark.read.parquet(snap_path)
            .drop("_last_seq", "kb")
            .localCheckpoint(eager=True)  # pin pre-fold content: the
            # plan would otherwise re-list the rewritten buckets
        )
        changes = docs.filter(F.col("doc_id") % 7 == 0).select(
            F.when(F.col("doc_id") % 14 == 0, "D").otherwise("U").alias("op"),
            (F.col("doc_id") + 1_000_000).alias("seq"),
            "doc_id", "source",
            (F.col("n_chars") + 1).alias("n_chars"),
        )
        stats = fold_cdc_batch(
            spark, snap_path, changes, ["doc_id"], num_buckets=8,
            table_exists=True,
        )
        after_cdc = spark.read.parquet(snap_path).drop("_last_seq", "kb")
        audit = snapshot_diff_summary(before_cdc, after_cdc, ["doc_id"])
        cdc_by_type = {r["diff_type"]: r["n_rows"] for r in audit.collect()}
        assert cdc_by_type.get("removed", 0) == stats["deleted"]
        assert cdc_by_type.get("modified", 0) == stats["applied"]
        out["cdc_applied"] = stats["applied"]
        out["cdc_deleted"] = stats["deleted"]
        out["cdc_touched_buckets"] = len(stats["touched_buckets"])
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
