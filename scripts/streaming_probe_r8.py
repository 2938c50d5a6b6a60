#!/usr/bin/env python
"""Round-8 streaming probe: like streaming_probe_r6 but self-diagnosing —
dumps per-micro-batch progress (durationMs breakdown, per-operator rows
and state timings) plus host loadavg before/after, so a co-loaded run is
identifiable from the artifact alone.

Run: PYTHONPATH=/root/repo python scripts/streaming_probe_r8.py [n_events] [modes...]
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

from streaming_probe_r6 import _write_landing  # noqa: E402


def _loadavg():
    with open("/proc/loadavg") as f:
        return [float(x) for x in f.read().split()[:3]]


def run(mode: str, n: int) -> dict:
    from defenda_data_lake_spark import get_spark
    from defenda_data_lake_spark.lake import EVENTS_TABLE
    from defenda_data_lake_spark.streaming.ingest import (
        start_deduped_ingest,
        start_ingest,
    )

    tmp = tempfile.mkdtemp(prefix=f"stream_probe8_{mode}_")
    spark = get_spark(
        app_name=f"stream-probe8-{mode}",
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
            kwargs["dedup_shards"] = (
                None
                if mode == "dedup_pergroup"
                else int(os.environ.get("PROBE_SHARDS", "256"))
            )
            sp = int(os.environ.get("PROBE_SCANPAR", "0"))
            if sp:
                kwargs["scan_parallelism"] = sp
        load0 = _loadavg()
        t0 = time.perf_counter()
        q = starter(
            spark,
            landing_path=landing,
            checkpoint_path=os.path.join(tmp, "ckpt"),
            quarantine_path=os.path.join(tmp, "quarantine"),
            trigger_seconds=1,
            # default 8 -> 4 micro-batches of 125k; round-9 batch-size
            # sweep overrides via PROBE_MAXFILES (16 -> 2 batches,
            # 32 -> 1 batch) to amortize the ~6 s first-batch warmup
            max_files_per_trigger=int(os.environ.get("PROBE_MAXFILES", "8")),
            **kwargs,
        )
        try:
            q.processAllAvailable()
            progress = [json.loads(p.json) for p in q.recentProgress]
        finally:
            q.stop()
        wall = time.perf_counter() - t0
        landed = spark.table(EVENTS_TABLE).count()
        qdir = os.path.join(tmp, "quarantine")
        quarantined = (
            spark.read.json(qdir).count() if os.path.isdir(qdir) else 0
        )
        written = (n // 32) * 32
        assert landed + quarantined == written, (
            f"{mode}: {landed} landed + {quarantined} quarantined "
            f"!= {written} written — rows lost"
        )
        batches = [
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": p.get("durationMs"),
                "stateOperators": [
                    {
                        k: so.get(k)
                        for k in (
                            "operatorName",
                            "numRowsTotal",
                            "numRowsUpdated",
                            "allUpdatesTimeMs",
                            "allRemovalsTimeMs",
                            "commitTimeMs",
                            "numShufflePartitions",
                        )
                    }
                    for so in p.get("stateOperators", [])
                ],
            }
            for p in progress
            if p.get("numInputRows", 0) > 0
        ]
        return {
            "wall_s": round(wall, 2),
            "events_per_s": int(n / wall),
            "landed": landed,
            "quarantined": quarantined,
            "loadavg_before": load0,
            "loadavg_after": _loadavg(),
            "batches": batches,
        }
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    modes = sys.argv[2:] or ["plain", "dedup"]
    out = {"probe": "streaming_ingest_r8", "n_events": n}
    for mode in modes:
        out[mode] = run(mode, n)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
