"""Bloom file-skipping index (operators/file_index.py): no false
negatives, real pruning, empty-result short-circuit."""

import pytest
from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.file_index import (
    bloom_prune_files,
    build_bloom_file_index,
    read_with_bloom,
    value_positions,
)


@pytest.fixture()
def table(spark, tmp_path, sf_dir):
    tdir = str(tmp_path / "docs")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartitionByRange(8, "doc_id")
        .write.parquet(tdir)
    )
    idir = str(tmp_path / "docs_bloom")
    build_bloom_file_index(spark, tdir, "doc_id", idir)
    return tdir, idir


def test_no_false_negatives_and_exact_rows(spark, table):
    tdir, idir = table
    full = spark.read.parquet(tdir)
    n_files = len({
        r["f"] for r in full.select(
            F.input_file_name().alias("f")).distinct().collect()
    })
    assert n_files == 8
    some_ids = [r["doc_id"] for r in full.select("doc_id").limit(20).collect()]
    pruned_counts = 0
    for did in some_ids:
        got = sorted(
            r["doc_id"]
            for r in read_with_bloom(
                spark, tdir, idir, "doc_id", did
            ).collect()
        )
        want = sorted(
            r["doc_id"]
            for r in full.filter(F.col("doc_id") == did).collect()
        )
        assert got == want and len(want) >= 1
        pruned_counts += len(bloom_prune_files(spark, idir, did))
    # pruning is real: on average a lookup reads far fewer than all 8
    # files (each doc_id lives in exactly 1; false positives only)
    assert pruned_counts < 20 * 8


def test_absent_value_short_circuits(spark, table):
    tdir, idir = table
    # an id far outside the corpus: usually prunes to zero files; the
    # read must return zero ROWS either way (exact filter), with the
    # table's schema
    out = read_with_bloom(spark, tdir, idir, "doc_id", 10**15)
    assert out.collect() == []
    assert out.schema == spark.read.parquet(tdir).schema


def test_stale_index_never_skips_uncovered_files(spark, table, tmp_path):
    # ADVICE r7: files landed AFTER the index build are absent from the
    # sidecar; a sidecar-only prune silently skipped them — a false
    # negative on every value that lives only in the new file.  The
    # no-false-negatives guarantee requires uncovered files to be
    # candidates unconditionally.
    tdir, idir = table
    new_id = 987_654_321
    spark.createDataFrame(
        [(new_id, "landed after the index build")], "doc_id long, text string"
    ).write.mode("append").parquet(tdir)

    # the lookup goes through the stale index and must still find it
    got = read_with_bloom(spark, tdir, idir, "doc_id", new_id).collect()
    assert [r["doc_id"] for r in got] == [new_id]

    # prune-level contract: with table_dir the uncovered file is a
    # candidate; the sidecar-only form is a strict subset (the caller
    # owns staleness there — old behavior, still available)
    with_table = bloom_prune_files(spark, idir, new_id, table_dir=tdir)
    assert len(with_table) >= 1
    sidecar_only = bloom_prune_files(spark, idir, new_id)
    assert set(sidecar_only) <= set(with_table)

    # covered files still prune: an existing id's candidate set must
    # not balloon to the whole table just because one file is new
    old_id = (
        spark.read.parquet(tdir)
        .filter(F.col("doc_id") != new_id)
        .select("doc_id")
        .limit(1)
        .collect()[0]["doc_id"]
    )
    cands = bloom_prune_files(spark, idir, old_id, table_dir=tdir)
    n_files = len(spark.read.parquet(tdir).inputFiles())
    assert len(cands) < n_files


def test_position_parity_and_validation(spark):
    # driver-side hashlib positions must equal Spark's md5 substrings
    df = spark.createDataFrame([(12345,), (0,)], "v long")
    h = F.md5(F.col("v").cast("string"))
    rows = df.select(
        "v",
        F.array(
            F.substring(h, 1, 4), F.substring(h, 5, 4)
        ).alias("pos"),
    ).collect()
    for r in rows:
        assert set(r["pos"]) == value_positions(r["v"], 4, 2)
    with pytest.raises(ValueError):
        value_positions("x", m_hex_digits=0)
    with pytest.raises(ValueError):
        value_positions("x", m_hex_digits=8, k=5)
