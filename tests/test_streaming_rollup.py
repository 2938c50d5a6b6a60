"""Streaming rollup maintenance (streaming/rollup.py): the maintained
table must equal a batch build over everything delivered, survive a
checkpoint restart, and skip a redelivered batch instead of
double-folding it."""

import json

from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.rollup import build_rollup
from defenda_data_lake_spark.streaming.rollup import (
    _read_last_batch_id,
    _write_last_batch_id,
    start_rollup_maintenance,
)

SPEC = {
    "n_events": ("count", "event_id"),
    "total_value": ("sum", "value"),
    "users_hll": ("hll", "user_id"),
}
KEYS = ["event_type", "day"]
SCHEMA = "event_id long, day string, user_id long, event_type string, value double"


def _write_batch(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _rows(lo, hi, day_mod=3):
    return [
        {
            "event_id": i,
            "day": f"d{i % day_mod}",
            "user_id": i % 41,
            "event_type": ["click", "view", "error"][i % 3],
            "value": float((i * 7) % 100),
        }
        for i in range(lo, hi)
    ]


def _stream(spark, landing):
    return (
        spark.readStream.format("json").schema(SCHEMA).load(str(landing))
    )


def _frame(df):
    return sorted(
        tuple(sorted(v.items()) if isinstance(v, dict) else v for v in row)
        for row in df.select(*sorted(df.columns)).collect()
    )


def _start(spark, landing, table, ckpt):
    return start_rollup_maintenance(
        _stream(spark, landing),
        str(table),
        KEYS,
        "day",
        SPEC,
        checkpoint_path=str(ckpt),
        trigger_seconds=None,  # availableNow in tests
    )


def test_stream_matches_batch_build(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    table, ckpt = tmp_path / "rollup", tmp_path / "ckpt"
    b1, b2 = _rows(0, 400), _rows(400, 700)

    _write_batch(landing / "b1.json", b1)
    q = _start(spark, landing, table, ckpt)
    q.awaitTermination()
    _write_batch(landing / "b2.json", b2)
    q = _start(spark, landing, table, ckpt)
    q.awaitTermination()

    want_path = str(tmp_path / "direct")
    build_rollup(
        spark.createDataFrame(
            [tuple(r.values()) for r in b1 + b2], SCHEMA
        ),
        KEYS,
        "day",
        SPEC,
        want_path,
    )
    assert _frame(spark.read.parquet(str(table))) == _frame(
        spark.read.parquet(want_path)
    )
    # two batches committed: batch ids 0 and 1
    assert _read_last_batch_id(spark, str(table)) == 1


def test_redelivered_batch_is_skipped(spark, tmp_path):
    """Crash-after-fold-before-checkpoint replay: foreachBatch calls
    the fold again with the SAME batchId — the marker must make it a
    no-op (sums would double otherwise)."""
    landing = tmp_path / "landing"
    landing.mkdir()
    table, ckpt = tmp_path / "rollup", tmp_path / "ckpt"
    _write_batch(landing / "b1.json", _rows(0, 300))
    q = _start(spark, landing, table, ckpt)
    q.awaitTermination()
    before = _frame(spark.read.parquet(str(table)))

    # simulate the redelivery: wipe the checkpoint so the SAME file is
    # re-read as batch 0 again; the table marker must suppress the fold
    import shutil

    shutil.rmtree(str(ckpt))
    q = _start(spark, landing, table, ckpt)
    q.awaitTermination()
    assert _frame(spark.read.parquet(str(table))) == before


def test_uncommitted_first_attempt_is_rebuilt_not_folded(spark, tmp_path):
    """Crash DURING the first fold (table written, marker not): the
    restart must overwrite the partial content, not fold onto it."""
    landing = tmp_path / "landing"
    landing.mkdir()
    table, ckpt = tmp_path / "rollup", tmp_path / "ckpt"
    rows = _rows(0, 300)
    # fake the crashed first attempt: table content exists, no marker
    build_rollup(
        spark.createDataFrame([tuple(r.values()) for r in rows], SCHEMA),
        KEYS,
        "day",
        SPEC,
        str(table),
    )
    _write_batch(landing / "b1.json", rows)
    q = _start(spark, landing, table, ckpt)
    q.awaitTermination()

    want = str(tmp_path / "direct")
    build_rollup(
        spark.createDataFrame([tuple(r.values()) for r in rows], SCHEMA),
        KEYS,
        "day",
        SPEC,
        want,
    )
    assert _frame(spark.read.parquet(str(table))) == _frame(
        spark.read.parquet(want)
    )
    assert _read_last_batch_id(spark, str(table)) == 0


def test_marker_round_trip(spark, tmp_path):
    table = tmp_path / "t"
    table.mkdir()
    assert _read_last_batch_id(spark, str(table)) == -1
    _write_last_batch_id(spark, str(table), 7)
    assert _read_last_batch_id(spark, str(table)) == 7
    _write_last_batch_id(spark, str(table), 8)
    assert _read_last_batch_id(spark, str(table)) == 8


def test_corrupt_marker_fails_loudly(spark, tmp_path):
    """A truncated marker must raise with remediation — NOT read as
    'no marker', which would rebuild the table from one batch and
    silently lose history."""
    import pytest

    table = tmp_path / "t"
    table.mkdir()
    (table / "_last_batch_id").write_text("")  # crash mid-write
    with pytest.raises(RuntimeError, match="corrupt rollup batch marker"):
        _read_last_batch_id(spark, str(table))


def test_live_rollup_over_ingested_events_table(spark, tmp_path):
    """Lake composition: ingest lands events into the partitioned
    events table; a SECOND stream reads the table's files and
    maintains a per-(source, hour) rollup — the live dashboard view.
    The maintained rollup must equal a batch build over the table."""
    import json as _json

    from defenda_data_lake_spark.lake import EVENTS_TABLE
    from defenda_data_lake_spark.streaming.ingest import start_ingest

    landing = tmp_path / "landing"
    landing.mkdir()
    spark.sql("DROP TABLE IF EXISTS defenda_data_lake.events")
    q = start_ingest(
        spark,
        landing_path=str(landing),
        checkpoint_path=str(tmp_path / "ingest_ckpt"),
        quarantine_path=str(tmp_path / "quarantine"),
        trigger_seconds=1,
    )
    try:
        with open(landing / "b1.ndjson", "w") as f:
            for i in range(40):
                f.write(
                    _json.dumps(
                        {
                            "eventid": f"e{i}",
                            "source": ["alpha", "beta"][i % 2],
                            "details": {"n": i},
                        }
                    )
                    + "\n"
                )
        q.processAllAvailable()
    finally:
        q.stop()

    table_dir = next(
        r["data_type"]
        for r in spark.sql(f"DESC FORMATTED {EVENTS_TABLE}").collect()
        if r["col_name"] == "Location"
    )
    spec = {"n_events": ("count", "eventid"), "hll_ids": ("hll", "eventid")}
    keys = ["source", "hour"]
    # the events table's partition dirs are reference-verbatim (not
    # hive-style key=value), so a file stream can't infer the hour
    # partition column — derive the rollup's hour key from the DATA
    # (utctimestamp), which works identically for stream and batch
    hour_of = F.substring(F.col("utctimestamp"), 12, 2)
    schema = spark.table(EVENTS_TABLE).drop("year", "month", "day", "hour").schema
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(table_dir)
        .select("source", hour_of.alias("hour"), "eventid")
    )
    rq = start_rollup_maintenance(
        stream,
        str(tmp_path / "live_rollup"),
        keys,
        "hour",
        spec,
        checkpoint_path=str(tmp_path / "rollup_ckpt"),
        trigger_seconds=None,
    )
    rq.awaitTermination()

    build_rollup(
        spark.table(EVENTS_TABLE).select(
            "source", hour_of.alias("hour"), "eventid"
        ),
        keys,
        "hour",
        spec,
        str(tmp_path / "direct"),
    )
    assert _frame(spark.read.parquet(str(tmp_path / "live_rollup"))) == _frame(
        spark.read.parquet(str(tmp_path / "direct"))
    )
    spark.sql("DROP TABLE IF EXISTS defenda_data_lake.events")
