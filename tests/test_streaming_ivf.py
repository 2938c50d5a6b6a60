"""Streaming IVF maintenance (`streaming/ann.py`): micro-batch folds
must equal a single batch append AND a full rebuild (the associative
fold law), redeliveries must be no-ops, and the drift report must
reach the on_batch hook.
"""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.similarity import build_ivf_index
from defenda_data_lake_spark.streaming.ann import start_ivf_maintenance

SF = "/root/testdata/sf0.001"
SCHEMA = "vec_id long, embedding array<float>, label int"


@pytest.fixture()
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _write_batch(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(
                json.dumps(
                    {
                        "vec_id": r["vec_id"],
                        "embedding": [float(x) for x in r["embedding"]],
                        "label": r["label"],
                    }
                )
                + "\n"
            )


def _run(spark, landing, idx, ckpt, stats=None, **kw):
    def hook(bid, rep):
        if stats is not None:
            stats.append((bid, rep))

    stream = (
        spark.readStream.format("json")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(str(landing))
    )
    q = start_ivf_maintenance(
        stream,
        str(idx),
        checkpoint_path=str(ckpt),
        trigger_seconds=None,
        on_batch=hook,
        **kw,
    )
    q.awaitTermination()
    return q


def _members(spark, idx):
    return sorted(
        (r["vec_id"], r["__ivf_list"])
        for r in spark.read.parquet(f"{idx}/corpus")
        .select(
            "vec_id", F.col("__ivf_list").cast("string").alias("__ivf_list")
        )
        .collect()
    )


def _centroids(spark, idx):
    return {
        r["list_id"]: (np.array(list(r["centroid"])), r["n"])
        for r in spark.read.parquet(f"{idx}/centroids").collect()
    }


def test_streamed_folds_equal_full_rebuild(spark, tmp_path, emb):
    landing = tmp_path / "landing"
    landing.mkdir()
    idx = tmp_path / "ivf"
    base = emb.filter(F.col("vec_id") % 3 == 1)
    build_ivf_index(base, str(idx))

    b1 = emb.filter(F.col("vec_id") % 3 == 2).collect()
    b2 = emb.filter(F.col("vec_id") % 3 == 0).collect()
    _write_batch(landing / "b1.json", b1)
    _write_batch(landing / "b2.json", b2)
    stats = []
    _run(
        spark, landing, idx, tmp_path / "ckpt",
        stats=stats, partition_col="label",
    )
    assert [bid for bid, _ in stats] == [0, 1]
    # one file per trigger; their discovery order is not pinned
    assert sorted(rep["appended"] for _, rep in stats) == sorted(
        [len(b1), len(b2)]
    )
    # second batch compares against the first's arrival fit — healthy
    assert stats[1][1]["baseline_fit"] == pytest.approx(
        stats[0][1]["delta_fit"]
    )
    assert not stats[1][1]["rebuild_recommended"]

    full = tmp_path / "full"
    build_ivf_index(emb, str(full))
    assert _members(spark, str(idx)) == _members(spark, str(full))
    ci, cf = _centroids(spark, str(idx)), _centroids(spark, str(full))
    assert set(ci) == set(cf)
    for lid in cf:
        assert ci[lid][1] == cf[lid][1]
        np.testing.assert_allclose(ci[lid][0], cf[lid][0], rtol=1e-6)


def test_restart_without_new_files_is_noop(spark, tmp_path, emb):
    landing = tmp_path / "landing"
    landing.mkdir()
    idx = tmp_path / "ivf"
    build_ivf_index(emb.filter(F.col("vec_id") % 3 == 1), str(idx))
    _write_batch(
        landing / "b1.json", emb.filter(F.col("vec_id") % 3 == 2).collect()
    )
    stats = []
    _run(spark, landing, idx, tmp_path / "ckpt", stats=stats,
         partition_col="label")
    before = _members(spark, str(idx))
    # restart from the same checkpoint, nothing new landed
    _run(spark, landing, idx, tmp_path / "ckpt", stats=stats,
         partition_col="label")
    assert _members(spark, str(idx)) == before  # no duplicates
    # ...and a genuinely new file folds exactly once
    _write_batch(
        landing / "b2.json", emb.filter(F.col("vec_id") % 3 == 0).collect()
    )
    _run(spark, landing, idx, tmp_path / "ckpt", stats=stats,
         partition_col="label")
    full = tmp_path / "full"
    build_ivf_index(emb, str(full))
    assert _members(spark, str(idx)) == _members(spark, str(full))


def test_drift_report_reaches_hook(spark, tmp_path, emb):
    """An orthogonal-subspace batch arriving after healthy history
    recommends a rebuild THROUGH the stream hook (nearest mode)."""
    landing = tmp_path / "landing"
    landing.mkdir()
    idx = tmp_path / "ivf"
    build_ivf_index(emb.filter(F.col("vec_id") % 3 == 1), str(idx))
    healthy = emb.filter(F.col("vec_id") % 3 == 2).collect()

    # two availableNow runs on one checkpoint pin the batch order
    # (two files present at start may be discovered in either order)
    _write_batch(landing / "b1.json", [
        {"vec_id": r["vec_id"], "embedding": r["embedding"], "label": r["label"]}
        for r in healthy
    ])
    stats = []
    _run(spark, landing, idx, tmp_path / "ckpt", stats=stats)

    # orthogonalize against the POST-fold centroids: the healthy fold
    # moves the span, and batch 2 is scored against what the index
    # holds at its arrival
    cents = np.array(
        [
            list(r["centroid"])
            for r in spark.read.parquet(f"{idx}/centroids").collect()
        ]
    )
    Q, _ = np.linalg.qr(cents.T)
    rng = np.random.default_rng(11)
    V = rng.normal(size=(120, cents.shape[1]))
    V = V - (V @ Q) @ Q.T
    V = V / np.linalg.norm(V, axis=1)[:, None]
    shifted = [
        {"vec_id": 1_000_000 + i, "embedding": V[i], "label": 0}
        for i in range(len(V))
    ]
    _write_batch(landing / "b2.json", shifted)
    _run(spark, landing, idx, tmp_path / "ckpt", stats=stats)
    assert len(stats) == 2
    assert not stats[0][1]["rebuild_recommended"]
    assert stats[1][1]["rebuild_recommended"]
    assert stats[1][1]["delta_fit"] < stats[1][1]["baseline_fit"] - 0.1


def test_rebuild_resets_marker_for_fresh_checkpoint(spark, tmp_path, emb):
    """The documented rebuild-and-restart workflow: after a rebuild,
    a FRESH checkpoint renumbers batches from 0 — the rebuild must
    clear the old high-water marker or every new batch would look
    like a redelivery and be silently skipped."""
    landing = tmp_path / "landing"
    landing.mkdir()
    idx = tmp_path / "ivf"
    build_ivf_index(emb.filter(F.col("vec_id") % 3 == 1), str(idx))
    _write_batch(
        landing / "b1.json", emb.filter(F.col("vec_id") % 3 == 2).collect()
    )
    stats = []
    _run(spark, landing, idx, tmp_path / "ckpt1", stats=stats,
         partition_col="label")
    assert len(stats) == 1  # marker now at batch 0

    # drift verdict says rebuild: do it, then restart FRESH
    build_ivf_index(emb.filter(F.col("vec_id") % 3 != 0), str(idx))
    landing2 = tmp_path / "landing2"
    landing2.mkdir()
    _write_batch(
        landing2 / "b1.json", emb.filter(F.col("vec_id") % 3 == 0).collect()
    )
    stats2 = []
    _run(spark, landing2, idx, tmp_path / "ckpt2", stats=stats2,
         partition_col="label")
    assert len(stats2) == 1 and stats2[0][1]["appended"] > 0
    full = tmp_path / "full"
    build_ivf_index(emb, str(full))
    assert _members(spark, str(idx)) == _members(spark, str(full))
