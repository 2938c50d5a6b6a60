#!/usr/bin/env python
"""Round-7 scaling probe for the edit-distance linkage operator (q102)
and the NB quality classifier (q103).

Measures, at 1x and Nx (default 32x) replicated documents:
  (a) q102 sorted-neighborhood form (the catalog entry, window=10)
  (b) q102 all-pairs-in-block form (neighbor_window=None) — the
      quadratic strawman the sorted-neighborhood form replaces
  (c) the sorted-neighborhood form with the equal-prefix short-circuit
      and length-difference prune REMOVED (raw thresholded levenshtein
      on every candidate) — isolates what the guards buy
  (d) q103 end-to-end (train split -> fit -> score corpus)

Replicas offset doc_id but keep text identical (the scale_probe.py
convention), so every block gains N identical-prefix rows — the
worst realistic shape for linkage (near-dup floods).

Usage: python scripts/linkage_probe_r7.py [factor]
Writes one JSON line with per-variant seconds and ratios.
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


def build_replica(spark, base: str, tmp: str, factor: int) -> None:
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{base}/documents.parquet")
    copies = []
    for r in range(factor):
        copies.append(df.withColumn("doc_id", F.col("doc_id") + F.lit(r * 100_000_000)))
    out = copies[0]
    for c in copies[1:]:
        out = out.unionAll(c)
    out.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")


def unguarded_neighborhood_pairs(df, neighbor_window: int = 10, **kw):
    """The q102 sorted-neighborhood plan with the distance guards
    stripped: raw thresholded levenshtein on every candidate pair.
    Candidate generation is the operator's own ``candidate_pairs``, so
    this strawman can never desynchronize from the real plan — only
    the distance expression differs."""
    from pyspark.sql import functions as F

    from defenda_data_lake_spark.operators.linkage import candidate_pairs

    max_distance = kw.pop("max_distance", 8)
    pairs = candidate_pairs(
        df, "doc_id", "text", neighbor_window=neighbor_window, **kw
    )
    return (
        pairs.withColumn(
            "distance", F.levenshtein(F.col("_pa"), F.col("_pb"), max_distance)
        )
        .filter(F.col("distance") >= 0)
        .select("id_a", "id_b", F.col("distance").cast("int").alias("distance"))
    )


def best_of(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    base = "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from defenda_data_lake_spark.operators.classify import nb_quality_scores
    from defenda_data_lake_spark.operators.linkage import edit_distance_pairs
    from defenda_data_lake_spark.session import get_spark

    spark = get_spark(app_name="linkage-probe-r7")
    tmp = tempfile.mkdtemp(prefix="linkage_probe_")
    try:
        build_replica(spark, base, tmp, factor)
        spark.read.parquet(f"{tmp}/documents.parquet").count()  # warm

        kw = dict(block_tokens=3, prefix_len=64, max_distance=8, max_block_rows=1000)
        result = {"factor": factor}
        for label, path in (("1x", f"{base}/documents.parquet"), (f"{factor}x", f"{tmp}/documents.parquet")):
            docs = spark.read.parquet(path)
            result[f"q102_neighborhood_{label}"] = best_of(
                lambda: edit_distance_pairs(docs, "doc_id", "text", neighbor_window=10, **kw).count()
            )
            result[f"q102_allpairs_{label}"] = best_of(
                lambda: edit_distance_pairs(docs, "doc_id", "text", neighbor_window=None, **kw).count()
            )
            result[f"q102_unguarded_{label}"] = best_of(
                lambda: unguarded_neighborhood_pairs(docs, 10, **kw).count()
            )
            result[f"q103_{label}"] = best_of(
                lambda: nb_quality_scores(docs, F.col("n_chars") >= 300).count()
            )
        for v in ("q102_neighborhood", "q102_allpairs", "q102_unguarded", "q103"):
            result[f"{v}_ratio"] = round(result[f"{v}_{factor}x"] / result[f"{v}_1x"], 2)
        print(json.dumps(result))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
