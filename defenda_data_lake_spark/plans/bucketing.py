"""Bucketed-table support: co-located fact-fact joins without shuffle.

At 100 TB the dominant cost of the TPC-H-ish surface is the
lineitem⋈orders shuffle on orderkey (every other dimension broadcasts).
Hive-style bucketing pre-partitions both facts on the join key at write
time, so the join becomes a zero-shuffle sort-merge over co-located
buckets — the standard warehouse layout for repeated fact-fact joins.

Bucket-count sizing: pick ``buckets`` so one bucket of the *larger*
fact fits an executor's task comfortably (~128-256 MB compressed);
e.g. 100 TB of lineitem at 200 MB/bucket → ~8192 buckets (power of two
keeps AQE coalescing clean).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_SPECS: dict[str, str] = {
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
}


def create_bucketed_tables(
    spark: SparkSession,
    sf_dir: str,
    buckets: int = 8,
    database: str = "bucketed",
) -> None:
    """Write orders/lineitem as bucketed+sorted tables on their join
    key.  One-time layout cost; every subsequent orderkey join is
    shuffle-free."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    for table, key in BUCKET_SPECS.items():
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        (
            df.write.mode("overwrite")
            .bucketBy(buckets, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(f"{database}.{table}")
        )


def bucketed_order_revenue(
    spark: SparkSession, database: str = "bucketed"
) -> DataFrame:
    """lineitem⋈orders revenue per order-priority over the bucketed
    layout — the join itself needs no exchange."""
    orders = spark.table(f"{database}.orders")
    li = spark.table(f"{database}.lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )
