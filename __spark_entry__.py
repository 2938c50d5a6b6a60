"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual implementations live in
``defenda_data_lake_spark.plans.catalog`` — this module only adapts
them to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("TZ", "UTC")
time.tzset()


def _configure(spark: SparkSession) -> SparkSession:
    """Apply session-level settings the engine needs on a driver-made
    session (nanos timestamps, Presto-compat functions)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf already set, or read path will fail loudly later
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for key, value in [
        ("spark.sql.ansi.doubleQuotedIdentifiers", "true"),
        # a driver-made session may default to 200 shuffle partitions —
        # wasteful at these scales; AQE coalesces from this ceiling
        ("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32")),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        # mirror session.get_spark: coalesce tiny shuffles aggressively
        # but keep mid-size CPU-dense shuffles parallel (8 MB advisory)
        ("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false"),
        ("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m"),
        ("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m"),
        ("spark.sql.autoBroadcastJoinThreshold", "64MB"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ]:
        try:
            spark.conf.set(key, value)
        except Exception:
            pass
    from defenda_data_lake_spark.functions.compat import register_compat_functions

    register_compat_functions(spark)
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    q05 (regional revenue): the full dimension-chain star join —
    exercises broadcast joins, the big fact-fact shuffle, and
    aggregation in one plan.
    """
    from defenda_data_lake_spark.plans.catalog import CATALOG

    _configure(spark)
    fn, _ = CATALOG["q05_regional_revenue"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from defenda_data_lake_spark.plans.catalog import CATALOG

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, (fn, _) in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per query (omitted for the
    approximate/stub operators → rows-only check)."""
    from defenda_data_lake_spark.plans.catalog import CATALOG

    return {name: sql for name, (_, sql) in CATALOG.items() if sql is not None}
