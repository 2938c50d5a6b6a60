"""Deterministic HLL sketch (operators/sketches.py)."""

import pytest
from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.sketches import hll_distinct


def test_hll_accuracy_bands(spark):
    # standard error for m=256 is ~6.5%/sqrt-free ≈ 6.5%; assert a
    # loose 15% band across three cardinality regimes
    for true_card, n in [(50, 5000), (3777, 50000), (60000, 120000)]:
        df = spark.range(n).select(
            (F.col("id") % true_card).cast("string").alias("v")
        )
        est = hll_distinct(df, "v").collect()[0]["hll_estimate"]
        assert abs(est - true_card) / true_card < 0.15, (true_card, est)


def test_hll_deterministic_and_grouped(spark):
    df = spark.range(20000).select(
        (F.col("id") % 4).alias("g"), (F.col("id") % 997).cast("string").alias("v")
    )
    a = sorted(map(tuple, hll_distinct(df, "v", ["g"]).collect()))
    b = sorted(map(tuple, hll_distinct(df, "v", ["g"]).collect()))
    assert a == b and len(a) == 4


def test_hll_rejects_unaligned_p(spark):
    df = spark.range(10).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError):
        hll_distinct(df, "v", p=7)
