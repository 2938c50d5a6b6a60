"""Incremental near-dedup index (operators/incremental_dedup.py): the
parity law — increments reproduce the full-batch dup_of map exactly."""

import pytest
from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.dedup import minhash_bucket_dedupe
from defenda_data_lake_spark.operators.incremental_dedup import (
    append_dedup_index,
    build_dedup_index,
    incremental_near_dedup,
)


def _dup_map(df, id_col="doc_id"):
    return {
        r[id_col]: r["dup_of"]
        for r in df.select(id_col, "dup_of").collect()
    }


def test_incremental_parity_with_full_batch(spark, tmp_path, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # the parity law requires ids STRING-monotone across increments
    # (claimant order is string order) — split by string rank
    ids = sorted(
        (r["doc_id"] for r in docs.select("doc_id").collect()), key=str
    )
    c1, c2 = str(ids[len(ids) // 3]), str(ids[2 * len(ids) // 3])
    s = F.col("doc_id").cast("string")
    a = docs.filter(s <= c1)
    b = docs.filter((s > c1) & (s <= c2))
    c = docs.filter(s > c2)

    full = minhash_bucket_dedupe(docs)
    want = _dup_map(full)
    assert any(v is not None for v in want.values()), (
        "corpus must contain near-dups for the test to mean anything"
    )

    idx = str(tmp_path / "dedup_index")
    build_dedup_index(a, idx)
    marked_b, rows_b = incremental_near_dedup(b, idx)
    got_b = _dup_map(marked_b)
    assert got_b == {k: v for k, v in want.items() if k in got_b}

    append_dedup_index(idx, rows_b)
    marked_c, _ = incremental_near_dedup(c, idx)
    got_c = _dup_map(marked_c)
    assert got_c == {k: v for k, v in want.items() if k in got_c}

    # first increment's verdicts also match the full batch (the
    # initial index IS batch a's signatures, so this checks a-vs-a
    # claimant consistency through the index round-trip)
    marked_a, _ = incremental_near_dedup(a, idx)
    # a's docs are all in the index themselves: every doc collides
    # with its own index rows, but self-pairs (id_s == first_id with
    # the doc as claimant) must not self-flag; dups inside a still
    # resolve to their batch claimants
    got_a = _dup_map(marked_a)
    assert got_a == {k: v for k, v in want.items() if k in got_a}


def test_index_keeps_duplicate_rows(spark, tmp_path):
    # a duplicate that claims ANOTHER bucket must still catch later
    # arrivals — the reason append keeps flagged docs' rows
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
    ]
    later = [(3, "alpha beta gamma delta epsilon zeta eta theta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "idx")
    build_dedup_index(docs, idx)
    marked, _ = incremental_near_dedup(
        spark.createDataFrame(later, "doc_id long, text string"), idx
    )
    m = _dup_map(marked)
    assert m[3] == "1"


def test_params_round_trip_and_probe_uses_them(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    idx = str(tmp_path / "idx")
    build_dedup_index(docs, idx, num_hashes=4, bands=2, shingle_n=2)
    marked, rows = incremental_near_dedup(docs, idx)
    # 4 hashes -> h0..h3 present in the emitted index rows
    assert {"h0", "h1", "h2", "h3"}.issubset(set(rows.columns))
    assert "h4" not in rows.columns
    assert _dup_map(marked)[1] is None


def test_incremental_probe_plan_shape(spark, tmp_path, sf_dir):
    """The index must be filtered by a BROADCAST semi-join on the
    increment's bucket keys (the increment is the small side by
    definition) — a shuffled semi-join of the index, or any cartesian,
    is the 100 TB regression this pins against."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "idx")
    build_dedup_index(docs.filter(F.col("doc_id") < 400), idx)
    marked, _ = incremental_near_dedup(
        docs.filter(F.col("doc_id") >= 400), idx
    )
    marked.collect()
    plan = marked._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan
