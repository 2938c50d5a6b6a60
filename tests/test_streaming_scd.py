"""Streaming SCD-2 maintenance (streaming/scd.py): the maintained
dimension-history table must equal the batch scd2_history over
everything delivered, across any batch split; redelivered batches are
no-ops; late (behind-high-water-mark) arrivals fail loudly or are
dropped with a count; only touched buckets are rewritten."""

import json
import shutil

import pytest
from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.scd import scd2_history
from defenda_data_lake_spark.streaming.rollup import _read_last_batch_id
from defenda_data_lake_spark.streaming.scd import (
    fold_scd2_batch,
    start_scd2_maintenance,
)

SCHEMA = "oid long, uid long, status string, ts timestamp"
OUT_COLS = [
    "uid", "status", "version", "valid_from_s", "valid_to_s", "n_obs",
]


def _rows(lo, hi, n_users=7):
    out = []
    for i in range(lo, hi):
        out.append(
            {
                "oid": i,
                "uid": i % n_users,
                # status flips deterministically but not every step
                "status": ["new", "new", "active", "active", "active", "churned"][
                    (i // n_users + i) % 6
                ],
                "ts": f"2024-03-01T00:{i // 60:02d}:{i % 60:02d}",
            }
        )
    return out


def _write_batch(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _stream(spark, landing):
    return spark.readStream.format("json").schema(SCHEMA).load(str(landing))


def _batch_df(spark, rows):
    return spark.createDataFrame(
        [tuple(r.values()) for r in rows],
        "oid long, uid long, status string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _frame(df, cols=OUT_COLS):
    return sorted(tuple(row[c] for c in cols) for row in df.collect())


def _start(spark, landing, table, ckpt, stats=None, **kw):
    def hook(bid, st):
        if stats is not None:
            stats.append((bid, st))

    return start_scd2_maintenance(
        _stream(spark, landing),
        str(table),
        ["uid"],
        ["status"],
        "ts",
        checkpoint_path=str(ckpt),
        order_cols=["oid"],
        num_buckets=4,
        trigger_seconds=None,
        on_batch=hook,
        **kw,
    )


def test_stream_matches_batch_build_across_splits(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    table, ckpt = tmp_path / "scd", tmp_path / "ckpt"
    b1, b2, b3 = _rows(0, 100), _rows(100, 130), _rows(130, 260)

    for i, b in enumerate([b1, b2, b3]):
        _write_batch(landing / f"b{i}.json", b)
        q = _start(spark, landing, table, ckpt)
        q.awaitTermination()

    want = scd2_history(
        _batch_df(spark, b1 + b2 + b3), ["uid"], ["status"], "ts", ["oid"]
    )
    got = spark.read.parquet(str(table))
    assert _frame(got) == _frame(want)
    assert _read_last_batch_id(spark, str(table)) == 2


def test_single_batch_equals_batch_operator(spark, tmp_path):
    rows = _rows(0, 80)
    table = tmp_path / "scd"
    fold_scd2_batch(
        spark, str(table), _batch_df(spark, rows), ["uid"], ["status"], "ts",
        order_cols=["oid"], num_buckets=4,
    )
    want = scd2_history(_batch_df(spark, rows), ["uid"], ["status"], "ts", ["oid"])
    assert _frame(spark.read.parquet(str(table))) == _frame(want)


def test_redelivered_batch_is_skipped(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    table, ckpt = tmp_path / "scd", tmp_path / "ckpt"
    _write_batch(landing / "b1.json", _rows(0, 90))
    q = _start(spark, landing, table, ckpt)
    q.awaitTermination()
    before = _frame(spark.read.parquet(str(table)))

    shutil.rmtree(str(ckpt))  # same file re-read as batch 0 again
    q = _start(spark, landing, table, ckpt)
    q.awaitTermination()
    assert _frame(spark.read.parquet(str(table))) == before


def test_late_arrival_errors_by_default(spark, tmp_path):
    table = tmp_path / "scd"
    fold_scd2_batch(
        spark, str(table), _batch_df(spark, _rows(50, 100)), ["uid"],
        ["status"], "ts", order_cols=["oid"], num_buckets=4,
    )
    with pytest.raises(RuntimeError, match="high-water mark"):
        fold_scd2_batch(
            spark, str(table), _batch_df(spark, _rows(0, 50)), ["uid"],
            ["status"], "ts", order_cols=["oid"], num_buckets=4,
        )


def test_late_arrival_drop_mode_counts_and_keeps_truth(spark, tmp_path):
    table = tmp_path / "scd"
    early = _rows(50, 100)
    mixed = _rows(0, 50) + _rows(100, 120)  # 50 stale + 20 new
    fold_scd2_batch(
        spark, str(table), _batch_df(spark, early), ["uid"], ["status"],
        "ts", order_cols=["oid"], num_buckets=4,
    )
    stats = fold_scd2_batch(
        spark, str(table), _batch_df(spark, mixed), ["uid"], ["status"],
        "ts", order_cols=["oid"], num_buckets=4, on_late="drop",
    )
    # rows 0..49 are behind every uid's high-water mark; 100..119 fold
    assert stats["late_dropped"] == 50
    tbl = spark.read.parquet(str(table))
    # dropping can only have folded the non-late remainder: the table
    # still matches a batch build over early + kept rows
    want = scd2_history(
        _batch_df(spark, early + _rows(100, 120)),
        ["uid"], ["status"], "ts", ["oid"],
    )
    assert _frame(tbl) == _frame(want)


def test_only_touched_buckets_rewritten(spark, tmp_path):
    import os

    table = tmp_path / "scd"
    fold_scd2_batch(
        spark, str(table), _batch_df(spark, _rows(0, 100, n_users=40)),
        ["uid"], ["status"], "ts", order_cols=["oid"], num_buckets=4,
    )

    def bucket_mtimes():
        out = {}
        for d in os.listdir(table):
            if d.startswith("kb="):
                files = sorted(os.listdir(table / d))
                out[d] = [
                    (f, os.path.getmtime(table / d / f))
                    for f in files if f.endswith(".parquet")
                ]
        return out

    before = bucket_mtimes()
    # a delta touching ONE uid → one bucket
    delta = [
        {"oid": 1000, "uid": 3, "status": "churned", "ts": "2024-03-02T00:00:00"}
    ]
    stats = fold_scd2_batch(
        spark, str(table), _batch_df(spark, delta), ["uid"], ["status"],
        "ts", order_cols=["oid"], num_buckets=4,
    )
    assert len(stats["touched_buckets"]) == 1
    after = bucket_mtimes()
    changed = [d for d in before if before[d] != after[d]]
    assert len(changed) == 1


def test_open_versions_unique_per_key(spark, tmp_path):
    table = tmp_path / "scd"
    for lo, hi in [(0, 60), (60, 120), (120, 200)]:
        fold_scd2_batch(
            spark, str(table), _batch_df(spark, _rows(lo, hi)), ["uid"],
            ["status"], "ts", order_cols=["oid"], num_buckets=4,
        )
    tbl = spark.read.parquet(str(table))
    open_per_key = (
        tbl.filter(F.col("valid_to_s").isNull()).groupBy("uid").count()
    )
    assert open_per_key.filter(F.col("count") != 1).count() == 0
    # version sequences are dense 1..max
    agg = tbl.groupBy("uid").agg(
        F.count("*").alias("n"), F.max("version").alias("mx"),
        F.countDistinct("version").alias("d"),
    )
    assert agg.filter("n != mx or d != n").count() == 0
