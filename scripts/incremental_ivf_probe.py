#!/usr/bin/env python
"""Scale probe for operators/incremental_ivf.py: at Nx embedding
replication, compare (a) a FULL build_ivf_index rebuild over the whole
corpus — the O(corpus) rewrite a pipeline without incremental
maintenance pays per arrival batch — against (b) append_ivf_index
folding a 1/32-sized delta into the persisted index (the O(delta +
|lists|) claim), then verify a probe over the folded index still
partition-prunes and returns rows.

Usage: python scripts/incremental_ivf_probe.py [factor]
Prints one JSON line; record results in SCALING.md.
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
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    from pyspark.sql import functions as F

    from defenda_data_lake_spark.operators.incremental_ivf import (
        append_ivf_index,
    )
    from defenda_data_lake_spark.operators.similarity import (
        build_ivf_index,
        ivf_probe,
    )
    from defenda_data_lake_spark.session import get_spark

    spark = get_spark(app_name="incremental-ivf-probe")
    tmp = tempfile.mkdtemp(prefix="incivf_probe_")
    try:
        base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        n_ids = base.count()
        copies = [
            base.withColumn("vec_id", F.col("vec_id") + F.lit(r * n_ids))
            for r in range(factor)
        ]
        corpus = copies[0]
        for c in copies[1:]:
            corpus = corpus.unionByName(c)
        # materialize the replicated corpus so neither side pays the
        # union lineage during timing
        corpus_path = os.path.join(tmp, "corpus_parquet")
        corpus.write.parquet(corpus_path)
        corpus = spark.read.parquet(corpus_path)
        delta = corpus.filter(F.col("vec_id") % 32 == 0)
        landed = corpus.filter(F.col("vec_id") % 32 != 0)
        n_delta, n_landed = delta.count(), landed.count()

        idx = os.path.join(tmp, "ivf")
        t0 = time.time()
        build_ivf_index(landed, idx)
        build_s = time.time() - t0

        t0 = time.time()
        rep = append_ivf_index(spark, idx, delta, partition_col="label")
        append_s = time.time() - t0

        full = os.path.join(tmp, "ivf_full")
        t0 = time.time()
        build_ivf_index(corpus, full)
        rebuild_s = time.time() - t0

        queries = base.filter(F.col("vec_id") < 5)
        t0 = time.time()
        probe_rows = ivf_probe(spark, idx, queries, k=10, n_probe=2).count()
        probe_s = time.time() - t0

        print(
            json.dumps(
                {
                    "factor": factor,
                    "n_landed": n_landed,
                    "n_delta": n_delta,
                    "initial_build_s": round(build_s, 3),
                    "append_delta_s": round(append_s, 3),
                    "full_rebuild_s": round(rebuild_s, 3),
                    "rebuild_over_append": round(rebuild_s / append_s, 2),
                    "appended": rep["appended"],
                    "misassigned_frac": round(rep["misassigned_frac"], 4),
                    "probe_rows": probe_rows,
                    "probe_s": round(probe_s, 3),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
