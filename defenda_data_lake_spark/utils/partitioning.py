"""Input-parallelism guard for compute-heavy operators.

A small dimension table often arrives as ONE parquet file → one input
partition → one task, strangling any operator whose per-row cost is
non-trivial (shingle generation, signature hashing, vector math).  At
100 TB inputs are naturally multi-split, but medium inputs (a few
hundred MB in one file) hit exactly this; the guard buys full-cluster
parallelism for one cheap round-robin shuffle of the small input.

Only used inside operators with heavy per-row compute — plain scans and
aggregations are left to Spark's split planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition when the plan reads fewer input files
    than (by default) the cluster's default parallelism.

    Uses driver-side file metadata (``df.inputFiles()``), never
    ``df.rdd.getNumPartitions()`` — converting the plan to an RDD just
    to count partitions forces an extra plan translation per call, a
    measurable fixed cost on sub-second queries.  File count
    under-estimates split count for files larger than
    ``maxPartitionBytes``, but any input that large is already parallel
    enough for the guard to be a no-op by intent."""
    import os

    try:
        target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    except Exception:
        # Spark Connect sessions don't expose sparkContext
        target = min_partitions or int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if 0 < target <= n_files:
        return df
    return df.repartition(target)
