"""Incremental boilerplate-chunk index
(operators/incremental_boilerplate.py): 3-increment index equals a
full build, cleaning with the full index equals the batch operator
exactly, and subset cleaning uses corpus-wide frequencies."""

from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.dedup import boilerplate_chunk_removal
from defenda_data_lake_spark.operators.incremental_boilerplate import (
    build_chunk_index,
    chunk_doc_frequencies,
    clean_with_index,
    update_chunk_index,
)

SF = "/root/testdata/sf0.001"


def _frame(df):
    return sorted(tuple(r) for r in df.collect())


def test_three_increment_index_equals_full_build(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = docs.filter(F.col("doc_id") < 150)
    b = docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 320))
    c = docs.filter(F.col("doc_id") >= 320)

    path = str(tmp_path / "chunk_index")
    build_chunk_index(a, path)
    update_chunk_index(spark, path, b)
    update_chunk_index(spark, path, c)

    got = _frame(spark.read.parquet(path))
    want = _frame(chunk_doc_frequencies(docs))
    assert got == want and got  # row-identical, non-trivial


def test_clean_with_full_index_equals_batch_operator(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "chunk_index")
    build_chunk_index(docs, path)
    index = spark.read.parquet(path)

    got = {
        r["id"]: (r["n_chunks"], r["n_boiler"], r["clean_text"])
        for r in clean_with_index(docs, index, min_doc_freq=2).collect()
    }
    want = {
        r["id"]: (r["n_chunks"], r["n_boiler"], r["clean_text"])
        for r in boilerplate_chunk_removal(docs, min_doc_freq=2).collect()
    }
    assert got == want
    assert sum(v[1] for v in want.values()) > 0  # non-trivial removal


def test_subset_cleaning_sees_corpus_wide_frequencies(spark, tmp_path):
    """Cleaning ONE new doc against the index must flag a chunk that is
    frequent corpus-wide even though the subset alone can't know that
    — the property the index exists for."""
    corpus = spark.createDataFrame(
        [(1, "the footer text"), (2, "the footer text"), (3, "unique a b")],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "idx")
    build_chunk_index(corpus, path, chunk_words=3)
    update_chunk_index(
        spark, path,
        spark.createDataFrame([(4, "the footer text")], ["doc_id", "text"]),
        chunk_words=3,
    )
    index = spark.read.parquet(path)

    newdoc = spark.createDataFrame(
        [(9, "the footer text"), (10, "fresh words here")],
        ["doc_id", "text"],
    )
    got = {
        r["id"]: (r["n_boiler"], r["clean_text"])
        for r in clean_with_index(
            newdoc, index, chunk_words=3, min_doc_freq=3
        ).collect()
    }
    # doc 9's only chunk appears in 3 indexed docs -> boilerplate;
    # doc 10's chunk is absent from the index (df 0) -> kept
    assert got == {9: (1, ""), 10: (0, "fresh words here")}
