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
   current-state snapshot (tombstones=4); the same snapshot_diff
   audits that applied == modified and deleted == removed
7. loss lines    - a PLANTED late batch (2 live-key lates + 1
   deleted-key late caught by its tombstone) folded with
   on_late='drop'; every fold prints a fold_log_line so the operator
   sees late_dropped/tombstoned per batch, and the demo asserts the
   logged count equals the planted count (VERDICT r8 item 6)
8. SCD-2 fold    - same visibility contract for the history table
   (one planted late observation, logged and asserted)
9. stream audit  - event-mode near-dedup drops a planted late doc at
   the engine watermark; watermark_drop_counts makes the loss a log
   line (stateful-stage rows = bands x docs)

Usage: python scripts/maintenance_loop_demo.py [sf_dir]
Prints per-batch [stage] loss lines and one JSON line of counts.
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
        from defenda_data_lake_spark.utils.obs import fold_log_line

        snap_path = os.path.join(tmp, "snapshot")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "source", "n_chars"
        )
        seed = docs.select(
            F.lit("I").alias("op"),
            F.col("doc_id").alias("seq"),
            "doc_id", "source", "n_chars",
        )
        stats0 = fold_cdc_batch(
            spark, snap_path, seed, ["doc_id"], num_buckets=8, tombstones=4
        )
        print(fold_log_line("cdc", 0, stats0))
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
            table_exists=True, tombstones=4,
        )
        print(fold_log_line("cdc", 1, stats))
        after_cdc = spark.read.parquet(snap_path).drop("_last_seq", "kb")
        audit = snapshot_diff_summary(before_cdc, after_cdc, ["doc_id"])
        cdc_by_type = {r["diff_type"]: r["n_rows"] for r in audit.collect()}
        assert cdc_by_type.get("removed", 0) == stats["deleted"]
        assert cdc_by_type.get("modified", 0) == stats["applied"]
        out["cdc_applied"] = stats["applied"]
        out["cdc_deleted"] = stats["deleted"]
        out["cdc_touched_buckets"] = len(stats["touched_buckets"])

        # 7. loss visibility (VERDICT r8 item 6): a PLANTED late batch
        # — two changes behind live keys' HWMs plus one for a DELETED
        # key (caught only because tombstones=4 above retained its
        # seq) — folded with on_late='drop'; the per-batch log line
        # carries the count, and the demo asserts it equals what was
        # planted
        live = [r["doc_id"] for r in docs.filter(
            (F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 14 != 0)
        ).limit(2).collect()]
        deleted = [r["doc_id"] for r in docs.filter(
            F.col("doc_id") % 14 == 0
        ).limit(1).collect()]
        late = docs.filter(F.col("doc_id").isin(live + deleted)).select(
            F.lit("U").alias("op"),
            F.lit(5).cast("long").alias("seq"),  # far below every HWM
            "doc_id", "source", "n_chars",
        )
        stats_late = fold_cdc_batch(
            spark, snap_path, late, ["doc_id"], num_buckets=8,
            table_exists=True, on_late="drop", tombstones=4,
        )
        print(fold_log_line("cdc", 2, stats_late))
        assert stats_late["late_dropped"] == len(live) + len(deleted), stats_late
        assert stats_late["applied"] == 0
        out["cdc_late_dropped"] = stats_late["late_dropped"]

        # 8. SCD-2 fold with one planted late observation, same
        # visibility contract
        from defenda_data_lake_spark.streaming.scd import fold_scd2_batch

        scd_path = os.path.join(tmp, "scd")
        obs = docs.select(
            "doc_id", "source", F.lit("2026-01-02T00:00:00").cast("timestamp").alias("seen_at")
        )
        s0 = fold_scd2_batch(
            spark, scd_path, obs, ["doc_id"], ["source"], "seen_at",
            num_buckets=8,
        )
        print(fold_log_line("scd2", 0, s0))
        late_obs = obs.limit(1).select(
            "doc_id", F.lit("moved").alias("source"),
            F.lit("2026-01-01T00:00:00").cast("timestamp").alias("seen_at"),
        )
        s1 = fold_scd2_batch(
            spark, scd_path, late_obs, ["doc_id"], ["source"], "seen_at",
            num_buckets=8, table_exists=True, on_late="drop",
        )
        print(fold_log_line("scd2", 1, s1))
        assert s1["late_dropped"] == 1, s1
        out["scd_late_dropped"] = s1["late_dropped"]

        # 9. streaming near-dedup in event mode: the engine itself
        # drops late rows at the watermark; watermark_drop_counts makes
        # the loss auditable (stateful-stage rows = bands x docs)
        import json as _json

        from defenda_data_lake_spark.streaming.dedup import (
            near_dedupe_stream,
            watermark_drop_counts,
        )

        landing = os.path.join(tmp, "dedup_landing")
        os.makedirs(landing)
        stream = (
            spark.readStream.format("text")
            .schema("value string")
            .load(landing)
            .select(
                F.get_json_object("value", "$.doc_id").cast("long").alias("doc_id"),
                F.get_json_object("value", "$.ts").alias("ts"),
                F.get_json_object("value", "$.text").alias("text"),
            )
        )
        q = (
            near_dedupe_stream(stream, event_time_col="ts", timeout_mode="event")
            .writeStream.format("noop")
            .option("checkpointLocation", os.path.join(tmp, "dedup_ckpt"))
            .start()
        )
        try:
            with open(os.path.join(landing, "b1.ndjson"), "w") as f:
                f.write(_json.dumps({
                    "doc_id": 1, "ts": "2026-01-01T10:00:00+00:00",
                    "text": "the quick brown fox jumps over the lazy dog",
                }) + "\n")
            q.processAllAvailable()
            with open(os.path.join(landing, "b2.ndjson"), "w") as f:
                f.write(_json.dumps({
                    "doc_id": 2, "ts": "2026-01-01T00:30:00+00:00",
                    "text": "the quick brown fox jumps over the lazy dog",
                }) + "\n")
            q.processAllAvailable()
            n_dropped = watermark_drop_counts(q)
        finally:
            q.stop()
        print(fold_log_line("near-dedup-stream", "audit",
                            {"dropped_by_watermark": n_dropped}))
        assert n_dropped == 2, n_dropped  # 1 late doc x bands(=2) rows
        out["dedup_dropped_by_watermark"] = n_dropped

        # 10. IVF index maintenance: fold an embedding arrival batch
        # into the persisted ANN index and surface the drift verdict —
        # the vector-index twin of the CDC/SCD fold stages above
        from defenda_data_lake_spark.operators.incremental_ivf import (
            append_ivf_index,
        )
        from defenda_data_lake_spark.operators.similarity import (
            build_ivf_index,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        ivf_dir = os.path.join(tmp, "ivf")
        build_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), ivf_dir)
        r1 = append_ivf_index(
            spark, ivf_dir,
            emb.filter(F.col("vec_id") % 2 == 1), partition_col="label",
        )
        print(fold_log_line("ivf", 0, {
            "appended": r1["appended"],
            "delta_fit": r1["delta_fit"],  # fold_log_line formats/na-guards
            "rebuild_recommended": r1["rebuild_recommended"],
        }))
        assert not r1["rebuild_recommended"]  # first fold: history starts
        out["ivf_appended"] = r1["appended"]
        out["ivf_rebuild_recommended"] = r1["rebuild_recommended"]
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
