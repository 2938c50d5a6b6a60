"""Round-12 probe: the RAW-LINE exact pre-drop vs the default deduped
ingest, on a corpus of TRUE byte-identical re-sends.

Why a new corpus: the r6/r11 corpus's "re-posts" share only their
SUMMARY (fresh details.seq + timestamp per copy), so they are NEAR-dup
work for the signature stage, not transport re-delivery.  An
at-least-once transport re-sends the same BYTES — and the round-12
raw-level pre-drop (`start_deduped_ingest(exact_predrop=True)`) keys on
exactly that.  Here every 5th line is an exact copy of an earlier line
(20% re-send fraction, the r11 probe's rate), so:

* default mode: re-sends mint fresh eventids, get flagged by signature
  agreement against the stored claimant, and land in the quarantine
  with dup_of — landed = distinct lines, quarantined = re-sends.
* predrop mode: re-sends are suppressed by the raw-line
  dropDuplicatesWithinWatermark BEFORE normalize — they skip the whole
  Python pipeline; landed identical, quarantine empty.

Invariants checked every run: landed_default == landed_predrop ==
distinct lines; quarantined_default == predropped_predrop == the exact
re-send count.  Usage:

    python scripts/streaming_probe_r12.py [n_events] [modes...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/repo")


def _loadavg():
    return [round(x, 2) for x in os.getloadavg()]


def _write_landing(landing: str, n: int, n_files: int, dup_every: int) -> int:
    """Every ``dup_every``-th line is a BYTE-IDENTICAL copy of one of
    the 7 most recent distinct lines.  Distinct lines get hash-salted
    word soup (the r10 scale-pairing trick) so no two DISTINCT lines
    are near-dups of each other — the quarantine then counts re-sends
    EXACTLY, keeping the mode accounting crisp.  Returns the distinct
    count."""
    import hashlib

    os.makedirs(landing)
    per = n // n_files
    recent: list[str] = []
    k = 0
    n_distinct = 0
    for f_idx in range(n_files):
        with open(os.path.join(landing, f"ev_{f_idx:04d}.ndjson"), "w") as f:
            for _ in range(per):
                if k % dup_every == 0 and recent:
                    line = recent[k % len(recent)]  # exact re-send
                else:
                    h = hashlib.md5(f"salt-{k}".encode()).hexdigest()
                    words = " ".join(h[i : i + 4] for i in range(0, 24, 4))
                    line = json.dumps(
                        {
                            "summary": f"event {words} marker {k * 7 % 997}",
                            "utctimestamp": f"2026-01-01T{(k // 3600) % 24:02d}:{(k // 60) % 60:02d}:{k % 60:02d}+00:00",
                            "details": {"seq": k},
                        }
                    )
                    n_distinct += 1
                    recent.append(line)
                    if len(recent) > 7:
                        recent.pop(0)
                f.write(line + "\n")
                k += 1
    return n_distinct


def run(mode: str, n: int) -> dict:
    from defenda_data_lake_spark import get_spark
    from defenda_data_lake_spark.lake import EVENTS_TABLE
    from defenda_data_lake_spark.streaming.ingest import start_deduped_ingest

    tmp = tempfile.mkdtemp(prefix=f"stream_probe12_{mode}_")
    conf = {"spark.sql.warehouse.dir": os.path.join(tmp, "wh")}
    if os.environ.get("PROBE_STATE_PROVIDER", "").lower() == "rocksdb":
        # the predrop's dropDuplicates state is per-key entries in the
        # default HDFSBackedStateStore (full-map in memory, snapshot
        # churn); RocksDB trades that for LSM files — applies to BOTH
        # modes' stateful stages, so the pairing stays fair
        conf["spark.sql.streaming.stateStore.providerClass"] = (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
    spark = get_spark(app_name=f"stream-probe12-{mode}", extra_conf=conf)
    try:
        # warm the python worker pool off the clock (same as r8/r11)
        spark.range(1000).repartition(32).mapInPandas(
            lambda it: (pd.DataFrame({"id": b["id"]}) for b in it), schema="id long"
        ).count()
        spark.sql("DROP TABLE IF EXISTS defenda_data_lake.events")
        landing = os.path.join(tmp, "landing")
        n_distinct = _write_landing(
            landing, n, n_files=32,
            dup_every=int(os.environ.get("PROBE_DUP_EVERY", "5")),
        )
        load0 = _loadavg()
        t0 = time.perf_counter()
        q = start_deduped_ingest(
            spark,
            landing_path=landing,
            checkpoint_path=os.path.join(tmp, "ckpt"),
            quarantine_path=os.path.join(tmp, "quarantine"),
            trigger_seconds=1,
            max_files_per_trigger=int(os.environ.get("PROBE_MAXFILES", "8")),
            dedup_shards=int(os.environ.get("PROBE_SHARDS", "256")),
            exact_predrop=(mode == "predrop"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        wall = time.perf_counter() - t0
        landed = spark.table(EVENTS_TABLE).count()
        qdir = os.path.join(tmp, "quarantine")
        try:
            qf = spark.read.json(qdir)
            quarantined = (
                qf.count() if "_status" in qf.columns else 0
            )
        except Exception:
            quarantined = 0
        written = (n // 32) * 32
        predropped = written - landed - quarantined
        # the hash-salted corpus can still contain O(few) CHANCE
        # near-dup pairs at millions of docs (two salts sharing their
        # leading words put both docs in one LSH bucket) — those are
        # flagged identically in both modes, so the exact invariants
        # are mode-relative; the 2M run measured exactly 2 of 1.6M
        chance_flags = n_distinct - landed
        assert 0 <= chance_flags <= 10, (
            f"{mode}: {landed} landed vs {n_distinct} distinct lines"
        )
        if mode == "predrop":
            assert predropped == written - n_distinct, (
                f"{mode}: predropped {predropped} != re-sends {written - n_distinct}"
            )
            assert quarantined == chance_flags, (
                f"{mode}: {quarantined} quarantined != {chance_flags} chance flags"
            )
        else:
            assert predropped == 0, f"{mode}: rows lost"
            assert quarantined == written - n_distinct + chance_flags, (
                f"{mode}: quarantined {quarantined} != re-sends + chance flags"
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
    modes = sys.argv[2:] or ["default", "predrop"]
    out = {"probe": "streaming_ingest_r12_raw_predrop", "n_events": n}
    for mode in modes:
        out[mode] = run(mode, n)
    if "default" in out and "predrop" in out:
        out["landed_match"] = out["default"]["landed"] == out["predrop"]["landed"]
        out["ratio_predrop_vs_default"] = round(
            out["predrop"]["wall_s"] / out["default"]["wall_s"], 2
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
