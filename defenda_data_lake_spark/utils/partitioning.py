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
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
