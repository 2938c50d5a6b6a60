"""Incrementally-maintained rollup tables (operators/rollup.py):
update-with-delta must equal a full rebuild exactly, touch only the
delta's partitions, and keep sketch estimates identical to the batch
operator over raw data."""

import os

import pytest
from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.rollup import (
    build_rollup,
    rollup_hll_estimate,
    update_rollup,
)

SPEC = {
    "n_events": ("count", "event_id"),
    "total_value": ("sum", "value"),
    "min_value": ("min", "value"),
    "max_value": ("max", "value"),
    "users_hll": ("hll", "user_id"),
}
KEYS = ["event_type", "day"]


def _events(spark, lo, hi, day_mod=4):
    """Synthetic events: day in d0..d{day_mod-1}, skewed types."""
    return spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("d"), (F.col("id") % day_mod).cast("string")).alias(
            "day"
        ),
        (F.col("id") % 157).alias("user_id"),
        F.element_at(
            F.array(F.lit("click"), F.lit("view"), F.lit("error")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("event_type"),
        ((F.col("id") * 7) % 100).cast("double").alias("value"),
    )


def _frame(df):
    return sorted(
        tuple(
            sorted(v.items()) if isinstance(v, dict) else v for v in row
        )
        for row in df.select(*sorted(df.columns)).collect()
    )


def test_update_equals_full_rebuild(spark, tmp_path):
    """History build + (new-day AND late-data) delta update must equal
    a direct build over history+delta — row-for-row, register-for-
    register."""
    hist = _events(spark, 0, 5000, day_mod=3)  # d0..d2
    # delta: a brand-new day d3 plus LATE rows landing in existing d1
    new_day = _events(spark, 5000, 6000, day_mod=4).filter(
        F.col("day") == "d3"
    )
    late = _events(spark, 6000, 6500, day_mod=4).filter(F.col("day") == "d1")
    delta = new_day.unionByName(late)

    inc_path = str(tmp_path / "inc")
    build_rollup(hist, KEYS, "day", SPEC, inc_path)
    touched = update_rollup(spark, inc_path, delta, KEYS, "day", SPEC)
    assert sorted(touched) == ["d1", "d3"]

    full_path = str(tmp_path / "full")
    build_rollup(hist.unionByName(delta), KEYS, "day", SPEC, full_path)

    assert _frame(spark.read.parquet(inc_path)) == _frame(
        spark.read.parquet(full_path)
    )


def test_update_touches_only_delta_partitions(spark, tmp_path):
    """Dynamic overwrite must leave untouched partitions' files alone
    (same paths, same bytes, same mtimes) — the property that makes
    maintenance O(delta), not O(history)."""
    hist = _events(spark, 0, 4000, day_mod=3)
    path = str(tmp_path / "r")
    build_rollup(hist, KEYS, "day", SPEC, path)

    def files_of(day):
        d = os.path.join(path, f"day={day}")
        return {
            f: os.stat(os.path.join(d, f)).st_mtime_ns
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before_d0, before_d2 = files_of("d0"), files_of("d2")
    delta = _events(spark, 4000, 4500, day_mod=3).filter(F.col("day") == "d1")
    touched = update_rollup(spark, path, delta, KEYS, "day", SPEC)
    assert touched == ["d1"]
    assert files_of("d0") == before_d0
    assert files_of("d2") == before_d2


def test_update_reads_existing_partition_pruned(spark, tmp_path):
    """The read-back of existing rollup rows must prune to the touched
    partitions (PartitionFilters on the scan), never list-and-read the
    whole table."""
    hist = _events(spark, 0, 4000, day_mod=3)
    path = str(tmp_path / "r")
    build_rollup(hist, KEYS, "day", SPEC, path)
    pruned = spark.read.parquet(path).filter(F.col("day").isin(["d1"]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [day" in plan.replace("#", " #").replace(
        "day#", "day #"
    ) or "PartitionFilters" in plan and "day" in plan.split(
        "PartitionFilters"
    )[1][:120]


def test_rollup_hll_estimate_matches_batch_operator(spark, tmp_path):
    """Merging per-day register maps across the whole range must give
    the EXACT same estimate as hll_distinct over the raw rows — the
    register-identical merge law, through the persisted map column."""
    from defenda_data_lake_spark.operators.sketches import hll_distinct

    raw = _events(spark, 0, 6000, day_mod=4)
    path = str(tmp_path / "r")
    build_rollup(raw, KEYS, "day", SPEC, path)
    got = {
        r["event_type"]: r["hll_estimate"]
        for r in rollup_hll_estimate(
            spark.read.parquet(path), "users_hll", ["event_type"]
        ).collect()
    }
    want = {
        r["event_type"]: r["hll_estimate"]
        for r in hll_distinct(raw, "user_id", ["event_type"]).collect()
    }
    assert got == want


def test_empty_delta_is_a_noop(spark, tmp_path):
    hist = _events(spark, 0, 1000, day_mod=2)
    path = str(tmp_path / "r")
    build_rollup(hist, KEYS, "day", SPEC, path)
    before = _frame(spark.read.parquet(path))
    touched = update_rollup(
        spark, path, hist.filter(F.lit(False)), KEYS, "day", SPEC
    )
    assert touched == []
    assert _frame(spark.read.parquet(path)) == before


def test_rollup_rejects_bad_spec(spark, tmp_path):
    df = _events(spark, 0, 10)
    with pytest.raises(ValueError):
        build_rollup(df, KEYS, "day", {}, str(tmp_path / "x"))
    with pytest.raises(ValueError):
        build_rollup(
            df, KEYS, "day", {"o": ("median", "value")}, str(tmp_path / "x")
        )
    with pytest.raises(ValueError):
        build_rollup(
            df, KEYS, "hour", {"o": ("sum", "value")}, str(tmp_path / "x")
        )
