"""Bucketed co-located join: the fact-fact shuffle must disappear."""

import pytest
from pyspark.sql import functions as F

from defenda_data_lake_spark.plans.bucketing import (
    bucketed_order_revenue,
    create_bucketed_tables,
)


@pytest.fixture(scope="module")
def bucketed(spark):
    create_bucketed_tables(spark, "/root/testdata/sf0.001", buckets=4)
    yield spark
    for t in ("orders", "lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS bucketed.{t}")


def test_bucketed_join_has_no_join_shuffle(bucketed):
    spark = bucketed
    # force the sort-merge path so the test exercises bucket co-location
    # (broadcast would hide the shuffle question entirely)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_order_revenue(spark)
        df.collect()
        plan = (
            df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
        )
        assert "SortMergeJoin" in plan
        # the only exchange allowed is the final groupBy aggregation;
        # the join itself reads co-located buckets
        join_part = plan.split("SortMergeJoin")[1]
        assert "Exchange" not in join_part
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")


def test_bucketed_join_matches_unbucketed(bucketed):
    spark = bucketed
    got = {
        r["o_orderpriority"]: (r["revenue"], r["n_items"])
        for r in bucketed_order_revenue(spark).collect()
    }
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    want = {
        r["o_orderpriority"]: (r["revenue"], r["n_items"])
        for r in (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue"),
                F.count("*").alias("n_items"),
            )
            .collect()
        )
    }
    assert got == want
