#!/usr/bin/env python
"""Round-6 probe (VERDICT r5 item 7): retention + compaction + the
README queries against a 32x-replicated events table.

Builds ~3.2M shell events across 72 hour partitions (3 days x 24 h,
8 files/partition to give compaction real work), then measures:

1. the two README queries (verbatim SQL) on the fragmented table,
2. ``expire_partitions`` dropping the oldest day (24 partitions),
3. ``compact_partition`` over every hour of one remaining day,
4. the same queries again — asserting identical results on the
   retained window before/after maintenance.

Run: PYTHONPATH=/root/repo python scripts/maintenance_probe_r6.py
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TZ", "UTC")
time.tzset()

N_ROWS = 3_200_000
DAYS = ["01", "02", "03"]
FILES_PER_PART = 8

README_Q1 = """
SELECT summary, count(*) AS n FROM "defenda_data_lake"."events"
WHERE json_extract_scalar(details, '$.action') = 'ACCEPT'
GROUP BY summary ORDER BY n DESC, summary LIMIT 5
"""
README_Q2 = """
SELECT count(*) AS n FROM "defenda_data_lake"."events"
WHERE json_array_contains(json_extract(details, '$._ipaddresses'), '10.1.2.3')
"""


def main() -> None:
    from pyspark.sql import functions as F

    from defenda_data_lake_spark import get_spark
    from defenda_data_lake_spark.lake import EVENTS_TABLE, create_events_table
    from defenda_data_lake_spark.lake_maintenance import (
        compact_partition,
        expire_partitions,
    )

    tmp = tempfile.mkdtemp(prefix="maint_probe_")
    loc = os.path.join(tmp, "events_data")
    spark = get_spark(
        app_name="maintenance-probe",
        extra_conf={"spark.sql.warehouse.dir": os.path.join(tmp, "wh")},
    )
    timings: dict[str, float] = {}
    try:
        create_events_table(spark, location=loc)

        t0 = time.perf_counter()
        df = (
            spark.range(N_ROWS)
            .withColumn("day_i", (F.col("id") % len(DAYS)).cast("int"))
            .withColumn("hour_i", ((F.col("id") / len(DAYS)) % 24).cast("int"))
            .withColumn("file_i", (F.col("id") % FILES_PER_PART).cast("int"))
            .select(
                F.concat(F.lit("ev-"), F.col("id")).alias("eventid"),
                F.concat(
                    F.lit("2026-01-"),
                    F.lpad(F.col("day_i") + 1, 2, "0"),
                    F.lit("T"),
                    F.lpad(F.col("hour_i"), 2, "0"),
                    F.lit(":00:00+00:00"),
                ).alias("utctimestamp"),
                F.lit("INFO").alias("severity"),
                F.concat(F.lit("flow "), (F.col("id") % 97)).alias("summary"),
                F.lit("flow").alias("category"),
                F.lit("s3json").alias("source"),
                F.array(F.lit("probe")).alias("tags"),
                F.array(F.lit("ip_addresses")).alias("plugins"),
                F.concat(
                    F.lit('{"action":"'),
                    F.when(F.col("id") % 3 == 0, "REJECT").otherwise("ACCEPT"),
                    F.lit('","_ipaddresses":["10.'),
                    (F.col("id") % 5),
                    F.lit(".2.3"),
                    F.lit('"],"sig":"'),
                    F.md5(F.col("id").cast("string")),
                    F.lit('"}'),
                ).alias("details"),
                F.lit("2026").alias("year"),
                F.lit("01").alias("month"),
                F.lpad(F.col("day_i") + 1, 2, "0").alias("day"),
                F.lpad(F.col("hour_i"), 2, "0").alias("hour"),
                "file_i",
            )
        )
        # fragment deliberately: 8 separate appends -> >=8 files per
        # hour partition (a single insertInto can't fragment — planned
        # write redistributes on the partition columns, one task and
        # one file per hour)
        for i in range(FILES_PER_PART):
            df.filter(F.col("file_i") == i).drop("file_i").coalesce(
                24
            ).write.mode("append").insertInto(EVENTS_TABLE)
        timings["build_table_s"] = round(time.perf_counter() - t0, 2)

        def run_queries(tag: str):
            reps = []
            for _ in range(3):
                t = time.perf_counter()
                r1 = [tuple(r) for r in spark.sql(README_Q1).collect()]
                r2 = [tuple(r) for r in spark.sql(README_Q2).collect()]
                reps.append(time.perf_counter() - t)
            timings[f"queries_{tag}_s"] = round(min(reps), 2)
            return r1, r2

        # retained-window baseline: day 01 will be expired, so compare
        # on days 02-03 only (run after expiry for the 'before' answer
        # of the compaction comparison)
        full_before = run_queries("fragmented_full")

        t0 = time.perf_counter()
        res = expire_partitions(
            spark,
            loc,
            retention_days=2,
            now=datetime.datetime(2026, 1, 4, 0, 0, tzinfo=datetime.timezone.utc),
        )
        timings["expire_s"] = round(time.perf_counter() - t0, 2)
        assert len(res["dropped"]) == 24, res["dropped"]
        assert not res["delete_failures"]
        timings["expire_freed_mb"] = round(res["freed_bytes"] / 1e6, 1)

        retained_before = run_queries("retained_before_compact")

        t0 = time.perf_counter()
        stats = []
        # target_file_bytes scaled to the probe's ~1 MB partitions the
        # way 128 MB targets GB-scale partitions: compacting an hour
        # into ONE sub-row-group file would serialize its scan (parquet
        # can't split a tiny file) — measured 2.0 s -> 7.5 s on the
        # retained-window queries when tried with the 128 MB default
        # here, the miniature of the same mistake at prod scale.
        for hour in range(24):
            stats.append(
                compact_partition(
                    spark, loc, "2026", "01", "02", f"{hour:02d}",
                    target_file_bytes=512 * 1024,
                )
            )
        timings["compact_24_parts_s"] = round(time.perf_counter() - t0, 2)
        timings["files_before"] = sum(s["files_before"] for s in stats)
        timings["files_after"] = sum(s["files_after"] for s in stats)

        retained_after = run_queries("retained_after_compact")
        assert retained_before == retained_after, "maintenance changed query results"
        print(json.dumps({"probe": "maintenance_32x", "rows": N_ROWS, **timings}))
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
