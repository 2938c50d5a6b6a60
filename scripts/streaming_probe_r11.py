#!/usr/bin/env python
"""Round-11 streaming probe: the JVM exact pre-drop lever
(`near_dedupe_stream(exact_predrop=True)` — VERDICT r10 item 3's
"second lever").

Same harness/corpus as streaming_probe_r8 (500k default, 32 files,
every 5th event a byte-identical re-post of one of 7 rotating
templates — the at-least-once transport's common case), three modes:

* plain          — start_ingest (the ratio denominator)
* dedup          — start_deduped_ingest, today's default
* dedup_predrop  — + exact_predrop=True: byte-identical re-sends are
                   suppressed by a pure-JVM dropDuplicatesWithinWatermark
                   BEFORE the Python signature + stateful stages

Accounting: in predrop mode suppressed rows neither land nor
quarantine, so the conservation law becomes
landed + quarantined + predropped == written, and correctness is
cross-checked against the dedup mode: the LANDED (survivor) count
must be IDENTICAL — the pre-drop only converts would-be-quarantined
exact re-sends into suppressed rows.

Run: PYTHONPATH=/root/repo python scripts/streaming_probe_r11.py [n] [modes...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TZ", "UTC")
time.tzset()

from streaming_probe_r6 import _write_landing  # noqa: E402
from streaming_probe_r8 import _loadavg  # noqa: E402


def run(mode: str, n: int) -> dict:
    from defenda_data_lake_spark import get_spark
    from defenda_data_lake_spark.lake import EVENTS_TABLE
    from defenda_data_lake_spark.streaming.ingest import (
        start_deduped_ingest,
        start_ingest,
    )

    tmp = tempfile.mkdtemp(prefix=f"stream_probe11_{mode}_")
    spark = get_spark(
        app_name=f"stream-probe11-{mode}",
        extra_conf={"spark.sql.warehouse.dir": os.path.join(tmp, "wh")},
    )
    try:
        import pandas as pd

        # warm the python worker pool off the clock (same as r8)
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
            kwargs["dedup_shards"] = int(os.environ.get("PROBE_SHARDS", "256"))
            if mode == "dedup_predrop":
                kwargs["exact_predrop"] = True
        load0 = _loadavg()
        t0 = time.perf_counter()
        q = starter(
            spark,
            landing_path=landing,
            checkpoint_path=os.path.join(tmp, "ckpt"),
            quarantine_path=os.path.join(tmp, "quarantine"),
            trigger_seconds=1,
            max_files_per_trigger=int(os.environ.get("PROBE_MAXFILES", "8")),
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
        written = (n // 32) * 32
        predropped = written - landed - quarantined
        if mode == "dedup_predrop":
            assert predropped >= 0, (
                f"{mode}: negative pre-drop count — rows duplicated"
            )
        else:
            assert predropped == 0, (
                f"{mode}: {landed} landed + {quarantined} quarantined "
                f"!= {written} written — rows lost"
            )
        return {
            "wall_s": round(wall, 2),
            "events_per_s": int(n / wall),
            "landed": landed,
            "quarantined": quarantined,
            "predropped": predropped,
            "loadavg_before": load0,
            "loadavg_after": _loadavg(),
        }
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    modes = sys.argv[2:] or ["plain", "dedup", "dedup_predrop"]
    out = {"probe": "streaming_ingest_r11_exact_predrop", "n_events": n}
    for mode in modes:
        out[mode] = run(mode, n)
    if "dedup" in out and "dedup_predrop" in out:
        # survivor-set conservation: pre-drop must not change WHAT lands
        out["landed_match"] = out["dedup"]["landed"] == out["dedup_predrop"]["landed"]
        if out["plain"]["wall_s"] if "plain" in out else None:
            out["ratio_dedup"] = round(
                out["dedup"]["wall_s"] / out["plain"]["wall_s"], 2
            )
            out["ratio_predrop"] = round(
                out["dedup_predrop"]["wall_s"] / out["plain"]["wall_s"], 2
            )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
