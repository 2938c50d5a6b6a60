#!/usr/bin/env python
"""Throughput + state-boundedness probe for streaming group-budget
admission (``streaming/sampling.py``).

Feeds N synthetic documents (4 metered languages + optional
high-cardinality unlisted groups) through ``group_budget_admission``
in file-batch micro-batches and reports rows/s, per-batch progress,
and the state-store row count (must equal the number of METERED
groups observed — the no-counter-for-budgetless-groups guard).

Usage: python scripts/admission_probe_r9.py [n_rows] [n_batches] [n_junk_groups]
Writes one JSON line.
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
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n_junk = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000

    from pyspark.sql import functions as F

    from defenda_data_lake_spark.session import get_spark
    from defenda_data_lake_spark.streaming.sampling import (
        group_budget_admission,
    )

    spark = get_spark(app_name="admission-probe")
    tmp = tempfile.mkdtemp(prefix="adm_probe_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    try:
        langs = ["en", "de", "fr", "ja"]
        per_batch = n_rows // n_batches
        base = (
            spark.range(n_rows)
            .select(
                F.col("id").cast("string").alias("id"),
                F.when(
                    F.col("id") % (n_rows // max(n_junk, 1)) == 0,
                    F.concat(F.lit("junk_"), F.col("id")),
                )
                .otherwise(
                    F.element_at(
                        F.array(*[F.lit(x) for x in langs]),
                        (F.col("id") % 4 + 1).cast("int"),
                    )
                )
                .alias("grp"),
                (F.col("id") % 997 + 1).cast("long").alias("tokens"),
                F.col("id").cast("long").alias("ord"),
            )
        )
        for b in range(n_batches):
            hi = (b + 1) * per_batch if b < n_batches - 1 else n_rows
            base.filter(
                (F.col("ord") >= b * per_batch) & (F.col("ord") < hi)
            ).coalesce(4).write.mode("append").parquet(src)

        # budget ~25% of each metered language's token mass
        budgets = {x: (n_rows // 4) * 499 // 4 for x in langs}
        # maxFilesPerTrigger is a SOURCE option: on the sink builder it
        # is silently ignored and the whole backlog runs as one giant
        # micro-batch (the first published run made that mistake —
        # numbers re-recorded in SCALING.md)
        stream = (
            spark.readStream.schema(
                "id string, grp string, tokens long, ord long"
            )
            .option("maxFilesPerTrigger", 4)
            .parquet(src)
        )
        out = os.path.join(tmp, "out")
        t0 = time.perf_counter()
        q = (
            group_budget_admission(
                stream, "id", "tokens", "grp", "ord", budgets=budgets
            )
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .start()
        )
        q.processAllAvailable()
        wall = time.perf_counter() - t0
        state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
        q.stop()

        res = spark.read.parquet(out)
        emitted = res.count()
        admitted = res.filter("admitted").count()
        junk_admitted = res.filter(
            F.col("admitted") & F.col("grp").startswith("junk_")
        ).count()
        print(
            json.dumps(
                {
                    "metric": "admission_rows_per_s",
                    "value": round(n_rows / wall, 1),
                    "wall_s": round(wall, 2),
                    "rows": n_rows,
                    "emitted": emitted,
                    "admitted": admitted,
                    "junk_admitted": junk_admitted,
                    "state_rows": int(state_rows),
                    "loadavg": os.getloadavg()[0],
                }
            )
        )
        assert emitted == n_rows, "no-row-lost violated"
        assert junk_admitted == 0
        assert state_rows == len(langs), state_rows
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
