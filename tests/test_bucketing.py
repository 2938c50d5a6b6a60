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


def test_bucketize_facts_maintenance_op(spark):
    """Round 12 (VERDICT r11 item 4): the lake-maintenance op writes
    the bucketed+sorted layout end-to-end — auto-sized power-of-two
    bucket count SHARED across the co-grouped facts — and a COLD
    session-state read (fresh table objects, no cache anywhere) runs
    the orderkey join exchange-free."""
    from defenda_data_lake_spark.lake_maintenance import bucketize_facts

    try:
        stats = bucketize_facts(
            spark, "/root/testdata/sf0.001", database="bucketed_maint"
        )
        assert set(stats) == {"orders", "lineitem"}
        counts = {s["buckets"] for s in stats.values()}
        assert len(counts) == 1  # shared count — the co-location rule
        n = counts.pop()
        assert n >= 8 and (n & (n - 1)) == 0  # power of two, floor 8

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            orders = spark.table("bucketed_maint.orders")
            li = spark.table("bucketed_maint.lineitem")
            df = (
                li.join(orders, li.l_orderkey == orders.o_orderkey)
                .groupBy("o_orderpriority")
                .agg(F.count("*").alias("n_items"))
            )
            df.collect()
            plan = (
                df._jdf.queryExecution().executedPlan().toString()
                .split("== Initial Plan ==")[0]
            )
            assert "SortMergeJoin" in plan
            join_part = plan.split("SortMergeJoin")[1]
            assert "Exchange" not in join_part
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")

        # values identical to the plain-parquet join
        got = {
            r["o_orderpriority"]: r["n_items"]
            for r in df.collect()
        }
        po = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        pl = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        want = {
            r["o_orderpriority"]: r["n_items"]
            for r in pl.join(po, pl.l_orderkey == po.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_items"))
            .collect()
        }
        assert got == want
    finally:
        for t in ("orders", "lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS bucketed_maint.{t}")
