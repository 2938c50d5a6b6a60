"""Shared physical-layout helpers for the persisted maintenance tables
(rollup / SCD-2 / CDC snapshot).  The bucket function is the tables'
layout CONTRACT — scd and cdc snapshots written by one copy must be
read back by the same function, so there is exactly one definition."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def bucket_col(keys: Sequence[str], num_buckets: int):
    """Hash-bucket partition column over the key columns."""
    return F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(num_buckets))


def _fs_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf), p


def path_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence check (works for s3a://, hdfs://, local)."""
    fs, p = _fs_path(spark, path)
    return fs.exists(p)


def parquet_has_data(spark: SparkSession, path: str) -> bool:
    """True when the table directory holds at least one parquet data
    file in a ``kb=`` bucket.  A table whose every row was deleted
    keeps its directory and marker but has no files left to infer a
    schema from — readers must treat it as a fresh table, not crash
    on schema inference."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return False
    jvm = spark.sparkContext._jvm
    glob = jvm.org.apache.hadoop.fs.Path(f"{path}/kb=*/*.parquet")
    statuses = fs.globStatus(glob)
    return statuses is not None and len(statuses) > 0
