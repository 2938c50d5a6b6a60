"""The headline queries that ship as Spark-SQL strings (driver-side
plan-build cost, SCALING.md round 5) must stay behaviorally identical
to the operator implementations they mirror — otherwise a future change
to the operator silently diverges from the catalog query (and its
oracle) while both stay green."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_q30_matches_exact_duplicate_groups_operator(spark):
    from defenda_data_lake_spark.operators.dedup import exact_duplicate_groups
    from defenda_data_lake_spark.plans.catalog import CATALOG

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    op = exact_duplicate_groups(docs).select(
        "content_hash",
        F.col("dup_count").cast("long"),
        F.col("keep_id").cast("long"),
    )
    fn, _ = CATALOG["q30_dedup_exact"]
    assert _rows(op) == _rows(fn(spark, SF))


def test_q36_matches_fingerprint_operator(spark):
    from defenda_data_lake_spark.operators.text import fingerprint
    from defenda_data_lake_spark.plans.catalog import CATALOG

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    op = (
        fingerprint(docs)
        .groupBy("fingerprint")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("keep_id"),
        )
    )
    fn, _ = CATALOG["q36_text_fingerprint"]
    assert _rows(op) == _rows(fn(spark, SF))


def test_q32_normalization_matches_normalized_text_operator(spark):
    """_NORM_SPARK (the SQL-text normalization used by q30/q36) must
    equal dedup.normalized_text for every document."""
    from defenda_data_lake_spark.operators.dedup import normalized_text
    from defenda_data_lake_spark.plans.catalog import _NORM_SPARK

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    diff = docs.select(
        (normalized_text(F.col("text")) == F.expr(_NORM_SPARK)).alias("same")
    ).filter(~F.col("same"))
    assert diff.count() == 0
