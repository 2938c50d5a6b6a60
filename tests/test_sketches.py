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


def test_hll_ignores_nulls(spark):
    # count(DISTINCT) semantics: NULL values contribute nothing.  An
    # all-NULL-plus-k-values column must estimate ~k, not pick up a
    # phantom max-rho register from md5(NULL).
    df = spark.range(1000).select(
        F.when(F.col("id") % 2 == 0, (F.col("id") % 20).cast("string")).alias("v")
    )
    # even ids mod 20 -> the 10 even residues; odd rows are NULL
    est = hll_distinct(df, "v").collect()[0]["hll_estimate"]
    assert abs(est - 10) / 10 < 0.15, est

    all_null = spark.range(100).select(F.lit(None).cast("string").alias("v"))
    rows = hll_distinct(all_null, "v").collect()
    assert len(rows) == 1 and rows[0]["hll_estimate"] == 0.0


def test_bloom_accuracy_bands(spark):
    from defenda_data_lake_spark.operators.sketches import bloom_cardinality

    for true_card, n in [(50, 5000), (3777, 50000), (30000, 90000)]:
        df = spark.range(n).select(
            (F.col("id") % true_card).cast("string").alias("v")
        )
        est = bloom_cardinality(df, "v").collect()[0]["bloom_estimate"]
        assert abs(est - true_card) / true_card < 0.1, (true_card, est)


def test_bloom_nulls_empty_and_validation(spark):
    from defenda_data_lake_spark.operators.sketches import bloom_cardinality

    # NULLs ignored like count(DISTINCT)
    df = spark.range(1000).select(
        F.when(F.col("id") % 2 == 0, (F.col("id") % 20).cast("string")).alias("v")
    )
    est = bloom_cardinality(df, "v").collect()[0]["bloom_estimate"]
    assert abs(est - 10) / 10 < 0.2, est

    all_null = spark.range(50).select(F.lit(None).cast("string").alias("v"))
    rows = bloom_cardinality(all_null, "v").collect()
    assert len(rows) == 1 and rows[0]["bloom_estimate"] == 0.0

    # grouped determinism
    g = spark.range(20000).select(
        (F.col("id") % 4).alias("g"), (F.col("id") % 997).cast("string").alias("v")
    )
    a = sorted(map(tuple, bloom_cardinality(g, "v", ["g"]).collect()))
    b = sorted(map(tuple, bloom_cardinality(g, "v", ["g"]).collect()))
    assert a == b and len(a) == 4

    import pytest as _pytest
    with _pytest.raises(ValueError):
        bloom_cardinality(g, "v", m_hex_digits=0)
    with _pytest.raises(ValueError):
        bloom_cardinality(g, "v", m_hex_digits=8, k=5)  # 40 hex > 32


def test_bloom_saturation_returns_null(spark):
    from defenda_data_lake_spark.operators.sketches import bloom_cardinality

    # m=16 bits, k=2: 200 distinct values saturate every position
    df = spark.range(200).select(F.col("id").cast("string").alias("v"))
    rows = bloom_cardinality(df, "v", m_hex_digits=1, k=2).collect()
    assert len(rows) == 1 and rows[0]["bloom_estimate"] is None
