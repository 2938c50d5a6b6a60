#!/usr/bin/env python
"""Round-6 streaming probe: throughput of the ingest stream WITH the
in-stream near-dedup stage vs without, same corpus, file-landing
source, processAllAvailable over multi-file micro-batches.

Run: PYTHONPATH=/root/repo python scripts/streaming_probe_r6.py [n_events]
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


def _write_landing(landing: str, n: int, n_files: int, dup_every: int) -> None:
    os.makedirs(landing)
    per = n // n_files
    k = 0
    for f_idx in range(n_files):
        with open(os.path.join(landing, f"ev_{f_idx:04d}.ndjson"), "w") as f:
            for _ in range(per):
                # every dup_every-th event re-posts a rotating template
                # summary (a near-dup family); the rest are distinct
                if k % dup_every == 0:
                    s = f"scheduled maintenance window notice copy {k % 7} for rack"
                else:
                    s = f"login burst from host {k} with severity marker {k * 7 % 997}"
                f.write(
                    json.dumps(
                        {
                            "summary": s,
                            "utctimestamp": f"2026-01-01T{(k // 3600) % 24:02d}:{(k // 60) % 60:02d}:{k % 60:02d}+00:00",
                            "details": {"seq": k},
                        }
                    )
                    + "\n"
                )
                k += 1


def run(mode: str, n: int) -> dict:
    from defenda_data_lake_spark import get_spark
    from defenda_data_lake_spark.lake import EVENTS_TABLE
    from defenda_data_lake_spark.streaming.ingest import (
        start_deduped_ingest,
        start_ingest,
    )

    tmp = tempfile.mkdtemp(prefix=f"stream_probe_{mode}_")
    spark = get_spark(
        app_name=f"stream-probe-{mode}",
        extra_conf={"spark.sql.warehouse.dir": os.path.join(tmp, "wh")},
    )
    try:
        import pandas as pd

        spark.range(1000).repartition(32).mapInPandas(
            lambda it: (pd.DataFrame({"id": b["id"]}) for b in it), schema="id long"
        ).count()
        spark.sql("DROP TABLE IF EXISTS defenda_data_lake.events")
        landing = os.path.join(tmp, "landing")
        _write_landing(landing, n, n_files=32, dup_every=5)
        kwargs = {}
        if mode == "plain":
            starter = start_ingest
        else:
            starter = start_deduped_ingest
            # "dedup" = the default sharded bucket-table kernel;
            # "dedup_pergroup" = the per-bucket reference kernel
            kwargs["dedup_shards"] = None if mode == "dedup_pergroup" else 256
        t0 = time.perf_counter()
        q = starter(
            spark,
            landing_path=landing,
            checkpoint_path=os.path.join(tmp, "ckpt"),
            quarantine_path=os.path.join(tmp, "quarantine"),
            trigger_seconds=1,
            max_files_per_trigger=8,  # 4 micro-batches
            **kwargs,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        wall = time.perf_counter() - t0
        landed = spark.table(EVENTS_TABLE).count()
        qdir = os.path.join(tmp, "quarantine")
        quarantined = (
            spark.read.json(qdir).count() if os.path.isdir(qdir) else 0
        )
        # no-row-lost invariant: every written event either lands or is
        # quarantined (as a near-dup Drop or a ProcessingFailed) —
        # round 7 caught the event-time watermark silently discarding
        # 239k/500k "late" rows here before the arrival-time-watermark
        # fix in streaming/dedup.py
        written = (n // 32) * 32
        assert landed + quarantined == written, (
            f"{mode}: {landed} landed + {quarantined} quarantined "
            f"!= {written} written — rows lost"
        )
        return {
            "wall_s": round(wall, 2),
            "events_per_s": int(n / wall),
            "landed": landed,
            "quarantined": quarantined,
        }
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    modes = sys.argv[2:] or ["plain", "dedup", "dedup_pergroup"]
    out = {"probe": "streaming_ingest", "n_events": n}
    for mode in modes:
        out[mode] = run(mode, n)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
