"""CDC apply (operators/cdc.py) and streaming CDC maintenance
(streaming/cdc.py): net-effect collapsing with the winning-seq tie
guard, merge-with-deletes semantics, batch-split parity, redelivery
no-ops, idempotent re-fold (the marker-gap repair), late-seq guard,
and touched-bucket-only rewrites."""

import glob
import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.cdc import cdc_apply, cdc_collapse
from defenda_data_lake_spark.streaming.cdc import (
    fold_cdc_batch,
    start_cdc_maintenance,
)
from defenda_data_lake_spark.streaming.rollup import _read_last_batch_id

SCHEMA = "op string, seq long, k long, v string"


def _changes(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _frame(df, cols=("k", "v")):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ----------------------------------------------------------- collapse


def test_collapse_latest_seq_wins(spark):
    net = cdc_collapse(
        _changes(
            spark,
            [
                ("U", 1, 1, "a"), ("U", 3, 1, "c"), ("U", 2, 1, "b"),
                ("D", 5, 2, None), ("I", 4, 2, "x"),
                ("I", 7, 3, "y"),
            ],
        ),
        ["k"],
    )
    got = sorted((r["k"], r["op"], r["seq"], r["v"]) for r in net.collect())
    assert got == [(1, "U", 3, "c"), (2, "D", 5, None), (3, "I", 7, "y")]


def test_collapse_tie_at_winning_seq_raises(spark):
    bad = _changes(spark, [("U", 3, 1, "a"), ("D", 3, 1, None)])
    with pytest.raises(Exception, match="tie at winning seq"):
        cdc_collapse(bad, ["k"]).collect()
    # a tie BELOW the winner cannot change the net effect: allowed
    ok = _changes(spark, [("U", 1, 1, "a"), ("U", 1, 1, "b"), ("U", 2, 1, "c")])
    assert [r["v"] for r in cdc_collapse(ok, ["k"]).collect()] == ["c"]


def test_collapse_unknown_op_raises(spark):
    bad = _changes(spark, [("X", 1, 1, "a")])
    with pytest.raises(Exception, match="unknown op"):
        cdc_collapse(bad, ["k"]).collect()


# -------------------------------------------------------------- apply


def test_apply_merge_with_deletes(spark):
    snap = _snap(spark, [(1, "old1"), (2, "old2"), (3, "old3")])
    changes = _changes(
        spark,
        [
            ("U", 1, 1, "new1"),          # update existing
            ("D", 2, 2, None),            # delete existing
            ("I", 3, 4, "new4"),          # insert new key
            ("D", 4, 5, None),            # delete absent key: no-op
            ("D", 5, 6, None), ("I", 6, 6, "back6"),  # delete+reinsert
        ],
    )
    got = _frame(cdc_apply(snap, changes, ["k"]))
    assert got == [(1, "new1"), (3, "old3"), (4, "new4"), (6, "back6")]


def test_apply_missing_payload_column_raises(spark):
    snap = spark.createDataFrame([(1, "a", 2)], "k long, v string, extra long")
    with pytest.raises(ValueError, match="missing snapshot columns"):
        cdc_apply(snap, _changes(spark, [("U", 1, 1, "x")]), ["k"])


def test_q113_plan_windowgrouplimit_no_cartesian(spark):
    from defenda_data_lake_spark.plans.catalog import CATALOG

    fn, _ = CATALOG["q113_cdc_apply"]
    plan = fn(spark, "/root/testdata/sf0.001")._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    plan = plan.split("== Initial Plan ==")[0]
    assert "WindowGroupLimit" in plan  # collapse prunes before the exchange
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------- streaming


def _write_batch(path, rows):
    with open(path, "w") as f:
        for op, seq, k, v in rows:
            f.write(json.dumps({"op": op, "seq": seq, "k": k, "v": v}) + "\n")


def _start(spark, landing, table, ckpt, stats=None, **kw):
    def hook(bid, st):
        if stats is not None:
            stats.append((bid, st))

    stream = spark.readStream.format("json").schema(SCHEMA).load(str(landing))
    return start_cdc_maintenance(
        stream,
        str(table),
        ["k"],
        checkpoint_path=str(ckpt),
        num_buckets=4,
        trigger_seconds=None,
        on_batch=hook,
        **kw,
    )


def _log(lo, hi, n_keys=11):
    """Deterministic change log: seq i touches key i%n, cycling
    U/U/D/I so keys are repeatedly updated, deleted, re-inserted."""
    rows = []
    for i in range(lo, hi):
        op = ["U", "U", "D", "I"][(i // n_keys) % 4]
        rows.append((op, i, i % n_keys, None if op == "D" else f"v{i}"))
    return rows


def test_stream_matches_single_batch_apply_across_splits(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    table, ckpt = tmp_path / "snap", tmp_path / "ckpt"
    b1, b2, b3 = _log(0, 40), _log(40, 55), _log(55, 120)

    for i, b in enumerate([b1, b2, b3]):
        _write_batch(landing / f"b{i}.json", b)
        q = _start(spark, landing, table, ckpt)
        q.awaitTermination()

    want = cdc_apply(
        _snap(spark, []).limit(0),  # empty snapshot
        _changes(spark, b1 + b2 + b3),
        ["k"],
    )
    got = spark.read.parquet(str(table))
    assert _frame(got) == _frame(want)
    assert _read_last_batch_id(spark, str(table)) == 2


def test_redelivered_batch_is_skipped_and_refold_is_idempotent(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    table, ckpt = tmp_path / "snap", tmp_path / "ckpt"
    b1, b2 = _log(0, 40), _log(40, 80)
    for i, b in enumerate([b1, b2]):
        _write_batch(landing / f"b{i}.json", b)
        q = _start(spark, landing, table, ckpt)
        q.awaitTermination()
    before = _frame(spark.read.parquet(str(table)))

    # marker protocol: checkpoint wipe redelivers everything, no-op
    shutil.rmtree(str(ckpt))
    q = _start(spark, landing, table, ckpt)
    q.awaitTermination()
    assert _frame(spark.read.parquet(str(table))) == before

    # marker-gap repair: re-folding the LAST batch directly onto the
    # already-folded table (crash between table write and marker
    # write) converges to the same content — equal seqs re-apply
    # idempotently, they are not "late"
    fold_cdc_batch(
        spark, str(table), _changes(spark, b2), ["k"],
        num_buckets=4, table_exists=True,
    )
    assert _frame(spark.read.parquet(str(table))) == before


def test_late_seq_errors_by_default_and_drop_counts(spark, tmp_path):
    table = tmp_path / "snap"
    fold_cdc_batch(
        spark, str(table), _changes(spark, [("U", 10, 1, "a"), ("U", 11, 2, "b")]),
        ["k"], num_buckets=4,
    )
    late = _changes(spark, [("U", 5, 1, "stale"), ("U", 12, 2, "b2")])
    with pytest.raises(RuntimeError, match="behind a key's folded seq"):
        fold_cdc_batch(
            spark, str(table), late, ["k"], num_buckets=4, table_exists=True
        )
    stats = fold_cdc_batch(
        spark, str(table), late, ["k"], num_buckets=4,
        on_late="drop", table_exists=True,
    )
    assert stats["late_dropped"] == 1
    assert _frame(spark.read.parquet(str(table))) == [(1, "a"), (2, "b2")]


def test_deleted_key_late_reinsert_is_documented_blind_spot(spark, tmp_path):
    """Tombstone-free: once a key is deleted its seq HWM is gone, so a
    late change re-inserts it undetected — pin the documented behavior
    so a future 'fix' is a conscious contract change."""
    table = tmp_path / "snap"
    fold_cdc_batch(
        spark, str(table), _changes(spark, [("U", 1, 1, "a"), ("D", 9, 2, None),
                                            ("U", 2, 2, "gone")]),
        ["k"], num_buckets=4,
    )
    assert _frame(spark.read.parquet(str(table))) == [(1, "a")]
    stats = fold_cdc_batch(
        spark, str(table), _changes(spark, [("U", 3, 2, "zombie")]),
        ["k"], num_buckets=4, table_exists=True,
    )
    assert stats["late_dropped"] == 0
    assert _frame(spark.read.parquet(str(table))) == [(1, "a"), (2, "zombie")]


def test_only_touched_buckets_rewritten(spark, tmp_path):
    table = tmp_path / "snap"
    # spread keys over all 4 buckets
    fold_cdc_batch(
        spark, str(table),
        _changes(spark, [("I", i, i, f"v{i}") for i in range(40)]),
        ["k"], num_buckets=4,
    )
    files_before = {
        p: os.path.getmtime(p)
        for p in glob.glob(str(table / "kb=*" / "*.parquet"))
    }
    # touch exactly one key -> one bucket
    stats = fold_cdc_batch(
        spark, str(table), _changes(spark, [("U", 100, 7, "updated")]),
        ["k"], num_buckets=4, table_exists=True,
    )
    assert len(stats["touched_buckets"]) == 1
    (kb,) = stats["touched_buckets"]
    for p, mtime in files_before.items():
        if f"kb={kb}" in p:
            continue
        assert os.path.exists(p) and os.path.getmtime(p) == mtime, p


def test_collapse_null_seq_raises(spark):
    bad = _changes(spark, [("U", None, 1, "a")])
    with pytest.raises(Exception, match="NULL seq"):
        cdc_collapse(bad, ["k"]).collect()


def test_fold_schema_drift_raises_clearly(spark, tmp_path):
    table = tmp_path / "snap"
    fold_cdc_batch(
        spark, str(table), _changes(spark, [("I", 1, 1, "a")]), ["k"],
        num_buckets=4,
    )
    drifted = spark.createDataFrame([("U", 2, 1)], "op string, seq long, k long")
    with pytest.raises(ValueError, match="missing snapshot columns"):
        fold_cdc_batch(
            spark, str(table), drifted, ["k"], num_buckets=4, table_exists=True
        )


def test_fold_recovers_after_every_row_deleted(spark, tmp_path):
    """A batch that net-deletes every remaining row leaves a directory
    with no parquet data files; the next fold must treat the table as
    fresh instead of crashing on schema inference forever."""
    table = tmp_path / "snap"
    fold_cdc_batch(
        spark, str(table), _changes(spark, [("I", 1, 1, "a"), ("I", 2, 2, "b")]),
        ["k"], num_buckets=4,
    )
    stats = fold_cdc_batch(
        spark, str(table),
        _changes(spark, [("D", 3, 1, None), ("D", 4, 2, None)]),
        ["k"], num_buckets=4, table_exists=True,
    )
    assert stats["deleted"] == 2 and stats["applied"] == 0
    # table is now empty of data files; the next insert must succeed
    stats = fold_cdc_batch(
        spark, str(table), _changes(spark, [("I", 5, 3, "c")]),
        ["k"], num_buckets=4, table_exists=True,
    )
    assert stats["applied"] == 1
    assert _frame(spark.read.parquet(str(table))) == [(3, "c")]


# -------------------------------------------------- tombstones (opt-in)


def test_tombstones_detect_late_change_for_deleted_key(spark, tmp_path):
    """The opt-in fix for the blind spot pinned above: with
    tombstones=N a late change for a deleted key is DETECTED within
    the retention horizon — error by default, counted drop with
    on_late='drop' — instead of silently re-inserting."""
    table = tmp_path / "snap"
    stats = fold_cdc_batch(
        spark, str(table),
        _changes(spark, [("U", 1, 1, "a"), ("D", 9, 2, None),
                         ("U", 2, 2, "gone")]),
        ["k"], num_buckets=4, tombstones=4,
    )
    assert stats["tombstoned"] == 1
    assert _frame(spark.read.parquet(str(table))) == [(1, "a")]
    with pytest.raises(RuntimeError, match="DELETED key's tombstoned seq"):
        fold_cdc_batch(
            spark, str(table), _changes(spark, [("U", 3, 2, "zombie")]),
            ["k"], num_buckets=4, table_exists=True, tombstones=4,
        )
    stats = fold_cdc_batch(
        spark, str(table), _changes(spark, [("U", 3, 2, "zombie")]),
        ["k"], num_buckets=4, table_exists=True, tombstones=4,
        on_late="drop",
    )
    assert stats["late_dropped"] == 1 and stats["applied"] == 0
    assert _frame(spark.read.parquet(str(table))) == [(1, "a")]


def test_tombstone_equal_seq_delete_redelivery_is_idempotent(spark, tmp_path):
    """An EQUAL seq is the redelivery of the delete itself: not late,
    re-applies as a no-op, refreshes the tombstone."""
    table = tmp_path / "snap"
    fold_cdc_batch(
        spark, str(table),
        _changes(spark, [("U", 1, 1, "a"), ("D", 9, 2, None),
                         ("U", 2, 2, "gone")]),
        ["k"], num_buckets=4, tombstones=4,
    )
    stats = fold_cdc_batch(
        spark, str(table), _changes(spark, [("D", 9, 2, None)]),
        ["k"], num_buckets=4, table_exists=True, tombstones=4,
    )
    assert stats["late_dropped"] == 0 and stats["tombstoned"] == 1
    assert _frame(spark.read.parquet(str(table))) == [(1, "a")]


def test_tombstone_cleared_on_reinsert(spark, tmp_path):
    """A legitimate re-insert (seq above the tombstone) clears the
    tombstone; the snapshot row carries the HWM from then on."""
    table = tmp_path / "snap"
    fold_cdc_batch(
        spark, str(table),
        _changes(spark, [("D", 9, 2, None), ("U", 2, 2, "gone")]),
        ["k"], num_buckets=4, tombstones=4,
    )
    stats = fold_cdc_batch(
        spark, str(table), _changes(spark, [("I", 10, 2, "back")]),
        ["k"], num_buckets=4, table_exists=True, tombstones=4,
    )
    assert stats["applied"] == 1 and stats["late_dropped"] == 0
    assert _frame(spark.read.parquet(str(table))) == [(2, "back")]
    # the late guard is now the snapshot row's HWM (10), not the
    # expired tombstone's (9)
    with pytest.raises(RuntimeError, match="behind a key's folded seq"):
        fold_cdc_batch(
            spark, str(table), _changes(spark, [("U", 5, 2, "stale")]),
            ["k"], num_buckets=4, table_exists=True, tombstones=4,
        )


def test_tombstone_expires_after_horizon(spark, tmp_path):
    """Beyond the N-fold retention horizon the tombstone expires and
    the documented pre-tombstone behavior returns (late change
    re-inserts undetected) — TTL is a bound, not a forever-guard."""
    table = tmp_path / "snap"
    fold_cdc_batch(
        spark, str(table),
        _changes(spark, [("U", 1, 1, "a"), ("D", 9, 2, None),
                         ("U", 2, 2, "gone")]),
        ["k"], num_buckets=4, tombstones=2,
    )
    # two delete-free folds advance the fold counter past the horizon
    for seq in (20, 21):
        fold_cdc_batch(
            spark, str(table), _changes(spark, [("U", seq, 1, f"a{seq}")]),
            ["k"], num_buckets=4, table_exists=True, tombstones=2,
        )
    stats = fold_cdc_batch(
        spark, str(table), _changes(spark, [("U", 3, 2, "zombie")]),
        ["k"], num_buckets=4, table_exists=True, tombstones=2,
    )
    assert stats["late_dropped"] == 0 and stats["applied"] == 1
    assert (2, "zombie") in _frame(spark.read.parquet(str(table)))


def test_tombstone_internal_names_rejected_up_front(spark, tmp_path):
    """With tombstones enabled the fold's internal columns join the
    reserved set: a payload column named _fold/_ts_seq/_ts_late must
    fail the clear up-front ValueError, not an ambiguous-reference
    error deep inside the fold."""
    bad = spark.createDataFrame(
        [("I", 1, 1, "a", 0)], "op string, seq long, k long, v string, _fold long"
    )
    with pytest.raises(ValueError, match="collide"):
        fold_cdc_batch(
            spark, str(tmp_path / "snap"), bad, ["k"], tombstones=2
        )
    # without tombstones the same payload is legal (no internal names)
    stats = fold_cdc_batch(spark, str(tmp_path / "snap2"), bad, ["k"])
    assert stats["applied"] == 1


def test_tombstone_ttl_boundary_protects_n_full_folds(spark, tmp_path):
    """The exact expiry boundary (the off-by-one regression pin): a
    tombstone written at fold C guards folds C+1..C+N inclusive.
    tombstones=1 must protect the IMMEDIATELY FOLLOWING fold, and
    tombstones=2 must still be live exactly N folds later."""
    # tombstones=1: delete at fold 1, late change at fold 2 — caught
    table = tmp_path / "snap1"
    fold_cdc_batch(
        spark, str(table),
        _changes(spark, [("U", 1, 1, "a"), ("D", 9, 2, None),
                         ("U", 2, 2, "gone")]),
        ["k"], num_buckets=4, tombstones=1,
    )
    with pytest.raises(RuntimeError, match="DELETED key's tombstoned seq"):
        fold_cdc_batch(
            spark, str(table), _changes(spark, [("U", 3, 2, "zombie")]),
            ["k"], num_buckets=4, table_exists=True, tombstones=1,
        )
    # tombstones=2: delete at fold 1, one intervening fold, late
    # change at fold 3 (exactly N folds later) — still caught
    table = tmp_path / "snap2"
    fold_cdc_batch(
        spark, str(table),
        _changes(spark, [("U", 1, 1, "a"), ("D", 9, 2, None),
                         ("U", 2, 2, "gone")]),
        ["k"], num_buckets=4, tombstones=2,
    )
    fold_cdc_batch(
        spark, str(table), _changes(spark, [("U", 20, 1, "a20")]),
        ["k"], num_buckets=4, table_exists=True, tombstones=2,
    )
    with pytest.raises(RuntimeError, match="DELETED key's tombstoned seq"):
        fold_cdc_batch(
            spark, str(table), _changes(spark, [("U", 3, 2, "zombie")]),
            ["k"], num_buckets=4, table_exists=True, tombstones=2,
        )


def test_tombstones_survive_full_deletion_rebuild(spark, tmp_path):
    """The all-rows-deleted fold flips the next fold to the fresh-table
    rebuild path, whose static overwrite removes everything under the
    table dir — the pinned tombstones must be written back and still
    detect a late change for a deleted key."""
    table = tmp_path / "snap"
    fold_cdc_batch(
        spark, str(table), _changes(spark, [("I", 1, 1, "a")]),
        ["k"], num_buckets=4, tombstones=4,
    )
    fold_cdc_batch(
        spark, str(table), _changes(spark, [("D", 9, 1, None)]),
        ["k"], num_buckets=4, table_exists=True, tombstones=4,
    )
    # fresh-rebuild fold (no data files left): inserts a different key
    stats = fold_cdc_batch(
        spark, str(table), _changes(spark, [("I", 10, 3, "c")]),
        ["k"], num_buckets=4, table_exists=True, tombstones=4,
    )
    assert stats["applied"] == 1
    with pytest.raises(RuntimeError, match="DELETED key's tombstoned seq"):
        fold_cdc_batch(
            spark, str(table), _changes(spark, [("U", 5, 1, "zombie")]),
            ["k"], num_buckets=4, table_exists=True, tombstones=4,
        )


def test_tombstones_invisible_to_snapshot_readers(spark, tmp_path):
    """The side table lives under an underscore-prefixed dir, so a
    plain spark.read.parquet(path) of the snapshot never sees it."""
    table = tmp_path / "snap"
    fold_cdc_batch(
        spark, str(table),
        _changes(spark, [("U", 1, 1, "a"), ("D", 9, 2, None),
                         ("U", 2, 2, "gone")]),
        ["k"], num_buckets=4, tombstones=4,
    )
    got = spark.read.parquet(str(table))
    assert set(got.columns) == {"k", "v", "_last_seq", "kb"}
    assert _frame(got) == [(1, "a")]
    assert os.path.isdir(str(table / "_tombstones"))


def test_fold_rejects_extra_batch_columns(spark, tmp_path):
    table = tmp_path / "snap"
    fold_cdc_batch(
        spark, str(table), _changes(spark, [("I", 1, 1, "a")]), ["k"],
        num_buckets=4,
    )
    drifted = spark.createDataFrame(
        [("U", 2, 1, "b", "x")], "op string, seq long, k long, v string, w string"
    )
    with pytest.raises(ValueError, match="extra batch columns \\['w'\\]"):
        fold_cdc_batch(
            spark, str(table), drifted, ["k"], num_buckets=4,
            table_exists=True,
        )


def test_fold_rejects_reserved_column_names(spark, tmp_path):
    bad = spark.createDataFrame(
        [("I", 1, 1, 7)], "op string, seq long, k long, _last_seq long"
    )
    with pytest.raises(ValueError, match="reserved columns"):
        fold_cdc_batch(spark, str(tmp_path / "snap"), bad, ["k"], num_buckets=4)


def test_fold_log_line_reports_planted_late_count(spark, tmp_path):
    """The observability contract the demos rely on (VERDICT r8 item
    6): the per-batch log line's late_dropped equals the planted
    late-row count, for both the CDC and the SCD fold."""
    from defenda_data_lake_spark.streaming.scd import fold_scd2_batch
    from defenda_data_lake_spark.utils.obs import fold_log_line

    table = tmp_path / "snap"
    fold_cdc_batch(
        spark, str(table),
        _changes(spark, [("U", 10, 1, "a"), ("U", 11, 2, "b"),
                         ("D", 12, 3, None), ("U", 2, 3, "was")]),
        ["k"], num_buckets=4, tombstones=4,
    )
    planted = _changes(
        spark,
        [("U", 5, 1, "late1"), ("U", 6, 2, "late2"), ("U", 7, 3, "late3")],
    )
    stats = fold_cdc_batch(
        spark, str(table), planted, ["k"], num_buckets=4,
        table_exists=True, on_late="drop", tombstones=4,
    )
    line = fold_log_line("cdc", 7, stats)
    assert "late_dropped=3" in line and "[cdc] batch=7 " in line
    assert stats["late_dropped"] == 3  # 2 live-key + 1 tombstoned

    scd = tmp_path / "scd"
    obs = spark.createDataFrame(
        [(1, "x", "2026-01-02T00:00:00")], "k long, v string, seen string"
    ).select("k", "v", F.col("seen").cast("timestamp").alias("seen"))
    fold_scd2_batch(spark, str(scd), obs, ["k"], ["v"], "seen", num_buckets=4)
    late_obs = obs.select(
        "k", F.lit("old").alias("v"),
        F.lit("2026-01-01T00:00:00").cast("timestamp").alias("seen"),
    )
    s1 = fold_scd2_batch(
        spark, str(scd), late_obs, ["k"], ["v"], "seen",
        num_buckets=4, table_exists=True, on_late="drop",
    )
    assert "late_dropped=1" in fold_log_line("scd2", 8, s1)
