"""Incremental IVF maintenance (`incremental_ivf.append_ivf_index`):
delta folds must be equivalent to a full rebuild (membership exactly,
centroids to running-mean FP reordering), probes over the folded index
must stay partition-pruned and match the rebuild's results, and the
drift report must fire on a delta the centroids no longer fit.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.incremental_ivf import (
    append_ivf_index,
)
from defenda_data_lake_spark.operators.similarity import (
    build_ivf_index,
    ivf_probe,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _members(spark, idx):
    return sorted(
        (r["vec_id"], r["__ivf_list"])
        for r in spark.read.parquet(f"{idx}/corpus")
        .select("vec_id", F.col("__ivf_list").cast("string").alias("__ivf_list"))
        .collect()
    )


def _centroids(spark, idx):
    return {
        r["list_id"]: (np.array(list(r["centroid"])), r["n"])
        for r in spark.read.parquet(f"{idx}/centroids").collect()
    }


def test_labeled_append_equals_full_rebuild(spark, tmp_path, emb):
    base = emb.filter(F.col("vec_id") % 5 != 0)
    delta = emb.filter(F.col("vec_id") % 5 == 0)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    build_ivf_index(base, inc)
    rep = append_ivf_index(spark, inc, delta, partition_col="label")
    build_ivf_index(emb, full)

    assert rep["appended"] == delta.count() > 0
    # first append after a build: no arrival history yet, no verdict
    assert rep["baseline_fit"] is None
    assert not rep["rebuild_recommended"]
    assert _members(spark, inc) == _members(spark, full)
    ci, cf = _centroids(spark, inc), _centroids(spark, full)
    assert set(ci) == set(cf)
    for lid in ci:
        assert ci[lid][1] == cf[lid][1]  # exact counts
        np.testing.assert_allclose(ci[lid][0], cf[lid][0], rtol=1e-9)

    # probes over the two indexes agree row-for-row
    queries = emb.filter(F.col("vec_id") < 5)
    want = sorted(
        (r["query_id"], r["neighbor_id"], round(r["cosine"], 9), r["rank"])
        for r in ivf_probe(spark, full, queries, k=10, n_probe=2).collect()
    )
    got_df = ivf_probe(spark, inc, queries, k=10, n_probe=2)
    got = sorted(
        (r["query_id"], r["neighbor_id"], round(r["cosine"], 9), r["rank"])
        for r in got_df.collect()
    )
    assert got == want and len(got) > 0
    # the folded index still partition-prunes (the whole point of the
    # layout survives the append)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    scan = next(
        l for l in plan.splitlines()
        if "FileScan parquet" in l and "PartitionFilters" in l
    )
    assert "__ivf_list" in scan.split("PartitionFilters")[1].split("]")[0]


def test_labeled_append_creates_new_list(spark, tmp_path, emb):
    base = emb.filter(F.col("label") != 0)
    delta = emb.filter(F.col("label") == 0)
    inc = str(tmp_path / "inc")
    build_ivf_index(base, inc)
    assert "0" not in _centroids(spark, inc)
    rep = append_ivf_index(spark, inc, delta, partition_col="label")
    assert rep["new_lists"] == ["0"]
    full = str(tmp_path / "full")
    build_ivf_index(emb, full)
    assert _members(spark, inc) == _members(spark, full)
    ci, cf = _centroids(spark, inc), _centroids(spark, full)
    for lid in cf:
        assert ci[lid][1] == cf[lid][1]
        np.testing.assert_allclose(ci[lid][0], cf[lid][0], rtol=1e-9)


def test_nearest_mode_assigns_argmax_cosine(spark, tmp_path, emb):
    base = emb.filter(F.col("vec_id") % 7 != 0)
    delta = emb.filter(F.col("vec_id") % 7 == 0).drop("label")
    inc = str(tmp_path / "inc")
    build_ivf_index(base, inc)
    cents = _centroids(spark, inc)
    rep = append_ivf_index(spark, inc, delta)
    assert rep["new_lists"] == [] and rep["misassigned_frac"] == 0.0

    # every appended row sits in the list of its nearest OLD centroid
    lids = sorted(cents)
    C = np.array([cents[l][0] for l in lids])
    got = dict(_members(spark, inc))
    for r in delta.collect():
        v = np.array(list(r["embedding"]), dtype=np.float64)
        sims = (C @ v) / (np.linalg.norm(C, axis=1) * np.linalg.norm(v))
        assert got[r["vec_id"]] == lids[int(np.argmax(sims))]


def test_empty_delta_is_noop(spark, tmp_path, emb):
    inc = str(tmp_path / "inc")
    build_ivf_index(emb, inc)
    before = _centroids(spark, inc)
    rep = append_ivf_index(
        spark, inc, emb.filter(F.col("vec_id") < 0), partition_col="label"
    )
    assert rep == {
        "appended": 0,
        "lists_touched": [],
        "new_lists": [],
        "misassigned_frac": 0.0,
        "delta_fit": None,
        "baseline_fit": None,
        "rebuild_recommended": False,
    }
    after = _centroids(spark, inc)
    assert set(before) == set(after)
    for lid in before:
        assert before[lid][1] == after[lid][1]


def test_drift_report_fires_on_shifted_delta(spark, tmp_path, emb):
    """In-distribution arrivals establish the fit history without
    firing; a later delta from a DIFFERENT geometry (vectors in the
    orthogonal complement of the centroid span — the new-encoder /
    new-modality arrival) collapses below the history and trips
    rebuild_recommended.  Nearest-centroid mode: healthy arrivals get
    the best of all lists (fit ~0.18 here), the orthogonal batch gets
    ~0 from EVERY list — no carried key involved."""
    inc = str(tmp_path / "inc")
    build_ivf_index(emb.filter(F.col("vec_id") % 3 == 1), inc)
    healthy = emb.filter(F.col("vec_id") % 3 == 2).drop("label")
    r1 = append_ivf_index(spark, inc, healthy)
    assert r1["baseline_fit"] is None  # fresh build: history starts here
    assert r1["delta_fit"] > 0.1

    cents = np.array(
        [
            list(r["centroid"])
            for r in spark.read.parquet(f"{inc}/centroids").collect()
        ]
    )
    Q, _ = np.linalg.qr(cents.T)  # orthonormal basis of the span
    rng = np.random.default_rng(7)
    V = rng.normal(size=(150, cents.shape[1]))
    V = V - (V @ Q) @ Q.T
    V = V / np.linalg.norm(V, axis=1)[:, None]
    shifted = spark.createDataFrame(
        [(int(1_000_000 + i), [float(x) for x in V[i]]) for i in range(len(V))],
        "vec_id long, embedding array<float>",
    )
    r2 = append_ivf_index(spark, inc, shifted)
    assert r2["baseline_fit"] == pytest.approx(r1["delta_fit"])
    assert r2["misassigned_frac"] == 0.0  # assignment can't disagree
    assert abs(r2["delta_fit"]) < 0.05 < r2["baseline_fit"]
    assert r2["rebuild_recommended"]


def test_healthy_arrivals_do_not_fire(spark, tmp_path, emb):
    """Same-distribution arrival batches never trip the drift signal:
    their fits agree to well under the threshold, and the history
    folds across appends."""
    inc = str(tmp_path / "inc")
    build_ivf_index(emb.filter(F.col("vec_id") % 3 == 1), inc)
    a = emb.filter(F.col("vec_id") % 3 == 2)
    b = emb.filter(F.col("vec_id") % 3 == 0)
    r1 = append_ivf_index(spark, inc, a, partition_col="label")
    r2 = append_ivf_index(spark, inc, b, partition_col="label")
    assert r2["baseline_fit"] == pytest.approx(r1["delta_fit"])
    assert abs(r2["delta_fit"] - r2["baseline_fit"]) < 0.05
    assert not r2["rebuild_recommended"]


def test_pre_counts_layout_fallback(spark, tmp_path, emb):
    """An index whose centroid table predates the maintenance columns
    (``n``/``unit_sum``/``fit``) is still appendable: counts are
    recovered from the corpus partitions, the fit signal is reported
    unavailable, and the fold's membership/centroids match the full
    rebuild."""
    inc = str(tmp_path / "inc")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    build_ivf_index(base, inc)
    # rewrite the centroid table without the maintenance column and
    # drop the arrival-fit history — the full legacy layout
    old = spark.read.parquet(f"{inc}/centroids").drop("n")
    old.coalesce(1).write.mode("overwrite").parquet(f"{inc}/centroids_old")
    import shutil

    shutil.rmtree(f"{inc}/centroids")
    shutil.move(f"{inc}/centroids_old", f"{inc}/centroids")
    shutil.rmtree(f"{inc}/arrival_fit")

    delta = emb.filter(F.col("vec_id") % 5 == 0)
    rep = append_ivf_index(spark, inc, delta, partition_col="label")
    assert rep["baseline_fit"] is None  # no history table in the old layout
    assert not rep["rebuild_recommended"]
    full = str(tmp_path / "full")
    build_ivf_index(emb, full)
    assert _members(spark, inc) == _members(spark, full)
    ci, cf = _centroids(spark, inc), _centroids(spark, full)
    for lid in cf:
        assert ci[lid][1] == cf[lid][1]
        np.testing.assert_allclose(ci[lid][0], cf[lid][0], rtol=1e-9)


def test_null_partition_value_rejected(spark, tmp_path, emb):
    inc = str(tmp_path / "inc")
    build_ivf_index(emb, inc)
    bad = emb.limit(3).withColumn("label", F.lit(None).cast("int"))
    with pytest.raises(ValueError, match="NULL label"):
        append_ivf_index(spark, inc, bad, partition_col="label")


def test_compact_reduces_files_data_identical(spark, tmp_path, emb):
    from defenda_data_lake_spark.operators.incremental_ivf import (
        compact_ivf_index,
    )

    inc = str(tmp_path / "inc")
    build_ivf_index(emb.filter(F.col("vec_id") % 3 == 1), inc)
    for m in (2, 0):
        append_ivf_index(
            spark, inc, emb.filter(F.col("vec_id") % 3 == m),
            partition_col="label",
        )
    before = _members(spark, inc)
    cents_before = _centroids(spark, inc)
    rep = compact_ivf_index(spark, inc)
    assert rep["duplicates_removed"] == 0
    assert rep["rows_after"] == rep["rows_before"] == len(before)
    assert rep["files_after"] < rep["files_before"]
    assert rep["files_after"] == len(cents_before)  # one file per list
    assert _members(spark, inc) == before
    after = _centroids(spark, inc)  # untouched without dedupe
    for lid in cents_before:
        assert after[lid][1] == cents_before[lid][1]
        np.testing.assert_array_equal(after[lid][0], cents_before[lid][0])


def test_compact_dedupe_heals_marker_gap_duplicates(spark, tmp_path, emb):
    """Replaying an append (the crash-in-marker-gap scenario the
    streaming docstring documents) duplicates rows; dedupe compaction
    restores the exactly-once corpus AND the exact centroid table of a
    full rebuild."""
    from defenda_data_lake_spark.operators.incremental_ivf import (
        compact_ivf_index,
    )

    inc = str(tmp_path / "inc")
    base = emb.filter(F.col("vec_id") % 3 != 0)
    delta = emb.filter(F.col("vec_id") % 3 == 0)
    build_ivf_index(base, inc)
    append_ivf_index(spark, inc, delta, partition_col="label")
    append_ivf_index(spark, inc, delta, partition_col="label")  # replay
    n_dup = delta.count()
    assert len(_members(spark, inc)) == base.count() + 2 * n_dup

    rep = compact_ivf_index(spark, inc, dedupe_ids=True)
    assert rep["duplicates_removed"] == n_dup
    full = str(tmp_path / "full")
    build_ivf_index(emb, full)
    assert _members(spark, inc) == _members(spark, full)
    ci, cf = _centroids(spark, inc), _centroids(spark, full)
    for lid in cf:
        assert ci[lid][1] == cf[lid][1]
        np.testing.assert_allclose(ci[lid][0], cf[lid][0], rtol=1e-9)
    # probes over the healed index match the rebuild
    queries = emb.filter(F.col("vec_id") < 5)
    want = sorted(
        (r["query_id"], r["neighbor_id"], round(r["cosine"], 9), r["rank"])
        for r in ivf_probe(spark, full, queries, k=10, n_probe=2).collect()
    )
    got = sorted(
        (r["query_id"], r["neighbor_id"], round(r["cosine"], 9), r["rank"])
        for r in ivf_probe(spark, inc, queries, k=10, n_probe=2).collect()
    )
    assert got == want and len(got) > 0


def test_non_canonical_list_keys_survive_maintenance(spark, tmp_path, emb):
    """String list keys that partition-type inference would mangle
    ('007' reads back as int 7) must survive the legacy-counts path
    AND compaction — keys are read as raw directory strings."""
    from defenda_data_lake_spark.operators.incremental_ivf import (
        compact_ivf_index,
    )

    keyed = emb.withColumn(
        "label", F.format_string("%03d", F.col("label"))
    )
    inc = str(tmp_path / "inc")
    base = keyed.filter(F.col("vec_id") % 3 != 0)
    build_ivf_index(base, inc)
    assert "007" in _centroids(spark, inc)

    # legacy layout: no n column, counts recovered from partitions
    old = spark.read.parquet(f"{inc}/centroids").drop("n")
    old.coalesce(1).write.mode("overwrite").parquet(f"{inc}/centroids_old")
    import shutil

    shutil.rmtree(f"{inc}/centroids")
    shutil.move(f"{inc}/centroids_old", f"{inc}/centroids")

    delta = keyed.filter(F.col("vec_id") % 3 == 0)
    rep = append_ivf_index(spark, inc, delta, partition_col="label")
    assert rep["appended"] == delta.count()

    rep2 = compact_ivf_index(spark, inc, dedupe_ids=True)
    assert rep2["duplicates_removed"] == 0
    # every padded key survives: centroid keys and the RAW corpus
    # directory keys agree (a plain inference-enabled read would show
    # '7' for dir __ivf_list=007 — that mangling is exactly what the
    # operators guard against)
    from defenda_data_lake_spark.operators.incremental_ivf import (
        _raw_partition_strings,
    )

    cents = _centroids(spark, inc)
    assert all(len(lid) == 3 for lid in cents)
    with _raw_partition_strings(spark):
        got_lists = {
            r["__ivf_list"]
            for r in spark.read.parquet(f"{inc}/corpus")
            .select("__ivf_list")
            .distinct()
            .collect()
        }
    assert got_lists == set(cents)


def test_delta_fit_ignores_zero_norm_rows(spark, tmp_path, emb):
    """A batch of in-distribution vectors padded with degenerate
    all-zero embeddings reports the SAME delta_fit as the batch alone:
    zero-norm rows contribute to neither the unit-sum numerator nor
    the denominator, so they cannot deflate the fit and falsely trip
    rebuild_recommended (round-9 advice finding)."""
    inc = str(tmp_path / "inc")
    clean = str(tmp_path / "clean")
    base = emb.filter(F.col("vec_id") % 3 == 1)
    build_ivf_index(base, inc)
    build_ivf_index(base, clean)
    healthy = emb.filter(F.col("vec_id") % 3 == 2).drop("label")
    r1 = append_ivf_index(spark, inc, healthy)
    append_ivf_index(spark, clean, healthy)

    dim = len(base.select("embedding").first()[0])
    zeros = spark.createDataFrame(
        [(int(2_000_000 + i), [0.0] * dim) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    batch = emb.filter(F.col("vec_id") % 3 == 0).drop("label")
    padded = append_ivf_index(spark, inc, batch.unionByName(zeros))
    plain = append_ivf_index(spark, clean, batch)
    assert padded["delta_fit"] == pytest.approx(plain["delta_fit"])
    assert padded["baseline_fit"] == pytest.approx(r1["delta_fit"])
    assert not padded["rebuild_recommended"]
