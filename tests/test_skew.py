"""Salted-join equivalence on skewed data."""

from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.skew import salted_join


def test_salted_inner_join_matches_plain(spark):
    # 90% of rows share one hot key
    large = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(50)], ["k", "label"]
    )
    plain = large.join(small, "k").groupBy("k", "label").count()
    salted = salted_join(large, small, on="k").groupBy("k", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    large = spark.createDataFrame([(1, "a"), (99, "b")], ["k", "v"])
    small = spark.createDataFrame([(1, "dim")], ["k", "label"])
    rows = {tuple(r) for r in salted_join(large, small, on="k", how="left").collect()}
    assert (1, "a", "dim") in rows
    assert (99, "b", None) in rows


def test_salt_distribution_spreads_hot_key(spark):
    from defenda_data_lake_spark.operators.skew import with_salt

    hot = spark.range(0, 1000).select(F.lit(7).alias("k"), F.col("id").alias("p"))
    n_salts = with_salt(hot, 16).select("_salt").distinct().count()
    assert n_salts > 8  # the hot key now spans most salt buckets
