#!/usr/bin/env python
"""Round-13 ingest decomposition (VERDICT r12 item 5): if a clean
32-core run still shows ingest_100k > 1.5 s, split `_bench_ingest`'s
wall into (a) the normalize kernel (noop sink — no output files) and
(b) the partitioned parquet write (32 tasks x 28 day-partitions of
small files), measured under the bench's own session/state.

Also runs the pure-Python fan-out probe (the r12 builder's /tmp
multiprocessing probe, committed this time): the ingest kernel's
per-event cost single-process vs at 32-way process fan-out, isolating
box-level fan-out degradation from anything Spark."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TZ", "UTC")
time.tzset()


def make_events(n_events: int, landing: str, n_files: int) -> None:
    per_file = n_events // n_files
    n = 0
    for f_idx in range(n_files):
        with open(os.path.join(landing, f"events_{f_idx}.json"), "w") as f:
            for _ in range(per_file):
                f.write(
                    json.dumps(
                        {
                            "EventTime": f"2026-01-{(n % 28) + 1:02d}T12:{n % 60:02d}:00Z",
                            "srcaddr": f"10.{n % 256}.{(n // 256) % 256}.{n % 250}",
                            "dstaddr": f"192.0.2.{n % 250}",
                            "Action": "ACCEPT" if n % 3 else "REJECT",
                            "bytes": n * 17 % 100000,
                            "nested": {"level": {"deep_time": n}},
                        }
                    )
                    + "\n"
                )
                n += 1


def fanout_probe(n_procs: int, events_per_proc: int = 3125) -> dict:
    """Pure-Python probe: run the normalize kernel over synthetic event
    dicts in 1 process vs n_procs concurrent processes (no Spark)."""
    import multiprocessing as mp

    def kernel_worker(n_ev: int, out_q) -> None:
        t0 = time.perf_counter()
        from defenda_data_lake_spark.operators.pipeline import (
            default_plugins,
            order_plugins,
            run_pipeline,
        )

        plugins = order_plugins(default_plugins())
        t_import = time.perf_counter() - t0
        events = []
        for n in range(n_ev):
            events.append(
                {
                    "EventTime": f"2026-01-{(n % 28) + 1:02d}T12:{n % 60:02d}:00Z",
                    "srcaddr": f"10.{n % 256}.{(n // 256) % 256}.{n % 250}",
                    "dstaddr": f"192.0.2.{n % 250}",
                    "Action": "ACCEPT" if n % 3 else "REJECT",
                    "bytes": n * 17 % 100000,
                    "nested": {"level": {"deep_time": n}},
                }
            )
        t1 = time.perf_counter()
        for ev in events:
            run_pipeline(ev, plugins)
        t_kernel = time.perf_counter() - t1
        out_q.put((t_import, t_kernel))

    def run(n_p: int) -> list[tuple[float, float]]:
        q: mp.Queue = mp.Queue()
        procs = [
            mp.Process(target=kernel_worker, args=(events_per_proc, q))
            for _ in range(n_p)
        ]
        t0 = time.perf_counter()
        for p in procs:
            p.start()
        res = [q.get() for _ in procs]
        for p in procs:
            p.join()
        wall = time.perf_counter() - t0
        return wall, res

    wall1, res1 = run(1)
    wallN, resN = run(n_procs)
    us1 = res1[0][1] / events_per_proc * 1e6
    usN = sorted(r[1] / events_per_proc * 1e6 for r in resN)
    return {
        "single_proc_us_per_event": round(us1, 1),
        "fanout_procs": n_procs,
        "fanout_us_per_event_min/med/max": [
            round(usN[0], 1),
            round(usN[len(usN) // 2], 1),
            round(usN[-1], 1),
        ],
        "fanout_degradation_med": round(usN[len(usN) // 2] / us1, 2),
        "single_wall": round(wall1, 3),
        "fanout_wall": round(wallN, 3),
        "import_time_med": round(sorted(r[0] for r in resN)[len(resN) // 2], 3),
    }


def main() -> None:
    import shutil
    import tempfile

    n_events = 100_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))

    print("fanout_probe:", json.dumps(fanout_probe(cpus)), flush=True)

    from defenda_data_lake_spark.operators.intake import read_ndjson_events
    from defenda_data_lake_spark.operators.pipeline import (
        STATUS_OK,
        add_partition_columns,
        normalize_df,
    )
    from defenda_data_lake_spark.session import get_spark, tune_for_input_scale

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ingest-decomp-r13")
    tune_for_input_scale(spark, sf_dir)
    # same warmups the bench does before timing ingest
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    import pandas as _pd

    spark.range(1000).repartition(cpus).mapInPandas(
        lambda it: (_pd.DataFrame({"id": b["id"]}) for b in it), schema="id long"
    ).count()

    tmp = tempfile.mkdtemp(prefix="ingest_decomp_")
    landing = os.path.join(tmp, "landing")
    os.makedirs(landing)
    make_events(n_events, landing, cpus)

    def pipeline_df():
        raw = read_ndjson_events(spark, landing)
        normalized = normalize_df(raw, raw_col="raw", source_col="source")
        return add_partition_columns(
            normalized.filter(normalized["_status"] == STATUS_OK)
        ).drop("_status", "_raw")

    stages = {}
    for rep in range(4):
        # (a) read only
        spark.sparkContext.setJobDescription("ingest: raw read only")
        t0 = time.perf_counter()
        read_ndjson_events(spark, landing).write.format("noop").mode(
            "overwrite"
        ).save()
        stages.setdefault("read_only", []).append(time.perf_counter() - t0)

        # (b) read + normalize kernel, noop sink (no output commit)
        spark.sparkContext.setJobDescription("ingest: kernel noop")
        t0 = time.perf_counter()
        pipeline_df().write.format("noop").mode("overwrite").save()
        stages.setdefault("kernel_noop", []).append(time.perf_counter() - t0)

        # (c) full: kernel + partitioned parquet write (the bench shape)
        spark.sparkContext.setJobDescription("ingest: full partitioned write")
        out = os.path.join(tmp, f"out_{rep}")
        t0 = time.perf_counter()
        pipeline_df().write.mode("overwrite").partitionBy(
            "year", "month", "day", "hour"
        ).parquet(out)
        stages.setdefault("full_partitioned_write", []).append(
            time.perf_counter() - t0
        )
        n_files = sum(
            1 for _, _, fs in os.walk(out) for f in fs if f.endswith(".parquet")
        )
        stages.setdefault("n_output_files", []).append(n_files)

        # (d) full write WITHOUT partitionBy (control: commit cost of
        # 32 files vs ~900)
        spark.sparkContext.setJobDescription("ingest: flat write control")
        out2 = os.path.join(tmp, f"outflat_{rep}")
        t0 = time.perf_counter()
        pipeline_df().write.mode("overwrite").parquet(out2)
        stages.setdefault("flat_write", []).append(time.perf_counter() - t0)

    spark.sparkContext.setJobDescription(None)
    print(
        "stage_decomp:",
        json.dumps(
            {
                k: ([round(x, 3) for x in v] if k != "n_output_files" else v)
                for k, v in stages.items()
            }
        ),
        flush=True,
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
