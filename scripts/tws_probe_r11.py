#!/usr/bin/env python
"""Round-11 feasibility micro-probe: transformWithStateInPandas (the
Spark 4.x stateful API) vs applyInPandasWithState (the incumbent) on
the streaming-dedup-shaped workload — TODO r11 item 4's question
"do the new API's state-server round-trips beat the per-group Arrow
slicing?".

Workload shape mirrors the sharded dedup stage: N_KEYS groups
(default 512, like bands x shards), a per-group table in ONE state
value, every input row emitted with a verdict column.  Both kernels
do identical work (first-seen-id claim per key), so the delta is pure
API overhead: state (de)serialization + the per-group dispatch path.

Run: PYTHONPATH=/root/repo python scripts/tws_probe_r11.py [n_rows] [n_keys]

ROUND-11 RESULT: ENVIRONMENT-BLOCKED.  The API exists in this
PySpark (4.1.2 — `GroupedData.transformWithStateInPandas` present)
but its Python driver worker speaks protobuf to the state server and
`google.protobuf` is not installed in this container (no pip):

    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE ... ImportError:
    cannot import name 'descriptor' from 'google.protobuf'

The incumbent applyInPandasWithState path has no such dependency.
This probe self-activates (run it; the A/B prints one JSON line) if
protobuf ever appears — same contract as the ffmpeg-gated video test.
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

import pandas as pd  # noqa: E402

OUT_SCHEMA = "key int, doc string, dup_of string"


def _write_landing(landing: str, n: int, n_keys: int, n_files: int = 8) -> None:
    os.makedirs(landing)
    per = n // n_files
    k = 0
    for f_idx in range(n_files):
        with open(os.path.join(landing, f"r_{f_idx:03d}.ndjson"), "w") as f:
            for _ in range(per):
                # 4 docs share each (key, content) family -> dups exist
                f.write(
                    json.dumps({"key": k % n_keys, "doc": f"d{k}",
                                "grp": (k // n_keys) % 4})
                    + "\n"
                )
                k += 1


def run_apipws(spark, landing: str, ckpt: str) -> tuple[float, int]:
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = (
        spark.readStream.format("text").schema("value string").load(landing)
        .select(
            F.get_json_object("value", "$.key").cast("int").alias("key"),
            F.get_json_object("value", "$.doc").alias("doc"),
            F.get_json_object("value", "$.grp").cast("int").alias("grp"),
        )
        .withColumn("_arr", F.current_timestamp())
        .withWatermark("_arr", "1 hour")
    )

    def kernel(key, batches, state):
        claim = dict(json.loads(state.get[0])) if state.exists else {}
        outs = []
        for chunk in batches:
            if not len(chunk):
                continue
            dup = []
            for doc, grp in zip(chunk["doc"], chunk["grp"]):
                got = claim.get(str(int(grp)))
                if got is None:
                    claim[str(int(grp))] = doc
                    dup.append(None)
                else:
                    dup.append(got if got != doc else None)
            outs.append(pd.DataFrame({
                "key": chunk["key"], "doc": chunk["doc"],
                "dup_of": pd.Series(dup, dtype=object),
            }))
        state.update((json.dumps(claim),))
        for o in outs:
            yield o

    out = src.groupBy("key").applyInPandasWithState(
        kernel, OUT_SCHEMA, "claims string", "append",
        GroupStateTimeout.NoTimeout,
    )
    rows = {"n": 0}

    def sink(df, _bid):
        rows["n"] += df.count()

    t0 = time.perf_counter()
    q = (out.writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt).trigger(processingTime="1 second")
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return time.perf_counter() - t0, rows["n"]


def run_tws(spark, landing: str, ckpt: str) -> tuple[float, int]:
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Claim(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("claims", "claims string")

        def handleInputRows(self, key, rows, timerValues):
            got = self._state.get()
            claim = dict(json.loads(got[0])) if got is not None else {}
            for chunk in rows:
                if not len(chunk):
                    continue
                dup = []
                for doc, grp in zip(chunk["doc"], chunk["grp"]):
                    prev = claim.get(str(int(grp)))
                    if prev is None:
                        claim[str(int(grp))] = doc
                        dup.append(None)
                    else:
                        dup.append(prev if prev != doc else None)
                yield pd.DataFrame({
                    "key": chunk["key"], "doc": chunk["doc"],
                    "dup_of": pd.Series(dup, dtype=object),
                })
            self._state.update((json.dumps(claim),))

        def close(self) -> None:
            pass

    src = (
        spark.readStream.format("text").schema("value string").load(landing)
        .select(
            F.get_json_object("value", "$.key").cast("int").alias("key"),
            F.get_json_object("value", "$.doc").alias("doc"),
            F.get_json_object("value", "$.grp").cast("int").alias("grp"),
        )
    )
    out = src.groupBy("key").transformWithStateInPandas(
        statefulProcessor=Claim(),
        outputStructType=OUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
    rows = {"n": 0}

    def sink(df, _bid):
        rows["n"] += df.count()

    t0 = time.perf_counter()
    q = (out.writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt).trigger(processingTime="1 second")
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return time.perf_counter() - t0, rows["n"]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    from defenda_data_lake_spark import get_spark

    tmp = tempfile.mkdtemp(prefix="tws_probe_")
    spark = get_spark(app_name="tws-probe",
                      extra_conf={"spark.sql.shuffle.partitions": "32"})
    try:
        landing = os.path.join(tmp, "landing")
        _write_landing(landing, n, n_keys)
        # warm python workers off the clock
        spark.range(1000).repartition(32).mapInPandas(
            lambda it: (pd.DataFrame({"id": b["id"]}) for b in it),
            schema="id long",
        ).count()
        out = {"probe": "tws_vs_apipws_r11", "n_rows": n, "n_keys": n_keys,
               "loadavg": tuple(round(x, 2) for x in os.getloadavg())}
        # interleave A/B twice so box drift hits both
        walls = {"apipws": [], "tws": []}
        counts = {}
        for i in range(2):
            w, c = run_apipws(spark, landing, os.path.join(tmp, f"ck_a{i}"))
            walls["apipws"].append(round(w, 2)); counts["apipws"] = c
            w, c = run_tws(spark, landing, os.path.join(tmp, f"ck_t{i}"))
            walls["tws"].append(round(w, 2)); counts["tws"] = c
        out["walls"] = walls
        out["rows_out"] = counts
        out["best"] = {k: min(v) for k, v in walls.items()}
        out["tws_over_apipws"] = round(
            out["best"]["tws"] / out["best"]["apipws"], 2
        )
        print(json.dumps(out), flush=True)
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
