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
    """Round-robin repartition when the plan has fewer input partitions
    than (by default) the cluster's default parallelism."""
    import os

    try:
        target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
        current = df.rdd.getNumPartitions()
    except Exception:
        # Spark Connect sessions expose neither sparkContext nor .rdd;
        # repartition unconditionally (cheap for the small inputs this
        # guard exists for)
        target = min_partitions or int(os.environ.get("SPARK_GRAFT_CPUS", 32))
        return df.repartition(target)
    if current < target:
        return df.repartition(target)
    return df
