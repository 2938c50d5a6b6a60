"""Event-time streaming operators: windowed aggregation with watermark
and the applyInPandasWithState sessionizer."""

import json
import time

from pyspark.sql import functions as F

from defenda_data_lake_spark.streaming.windows import (
    sessionize,
    windowed_severity_counts,
)


def _event(ts: str, severity: str = "INFO", source: str = "syslog") -> str:
    return json.dumps(
        {"utctimestamp": ts, "severity": severity, "source": source, "summary": "x"}
    )


def test_windowed_counts_batch_semantics(spark):
    """The same operator works on a batch DataFrame (streaming/batch
    unification)."""
    rows = [
        ("2026-01-01T00:01:00+00:00", "INFO"),
        ("2026-01-01T00:02:00+00:00", "INFO"),
        ("2026-01-01T00:07:00+00:00", "ERROR"),
    ]
    df = spark.createDataFrame(rows, ["utctimestamp", "severity"])
    got = {
        (str(r["window_start"]), r["severity"]): r["n_events"]
        for r in windowed_severity_counts(df).collect()
    }
    assert got[("2026-01-01 00:00:00", "INFO")] == 2
    assert got[("2026-01-01 00:05:00", "ERROR")] == 1


def test_windowed_counts_streaming(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    with open(landing / "b1.ndjson", "w") as f:
        f.write(_event("2026-01-01T00:01:00+00:00") + "\n")
        f.write(_event("2026-01-01T00:02:30+00:00") + "\n")
        f.write(_event("2026-01-01T00:06:00+00:00", "ERROR") + "\n")

    raw = (
        spark.readStream.format("text")
        .schema("value string")
        .load(str(landing))
        .select(
            F.get_json_object("value", "$.utctimestamp").alias("utctimestamp"),
            F.get_json_object("value", "$.severity").alias("severity"),
        )
    )
    query = (
        windowed_severity_counts(raw)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        got = {
            (str(r["window_start"]), r["severity"]): r["n_events"]
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        assert got[("2026-01-01 00:00:00", "INFO")] == 2
        assert got[("2026-01-01 00:05:00", "ERROR")] == 1
    finally:
        query.stop()


def test_sessionize_stateful(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    # session 1: two events close together; then an event 2 hours later
    # (advances the watermark far past session 1's gap -> emits it)
    with open(landing / "b1.ndjson", "w") as f:
        f.write(_event("2026-01-01T00:00:00+00:00", "INFO") + "\n")
        f.write(_event("2026-01-01T00:10:00+00:00", "ERROR") + "\n")

    raw = (
        spark.readStream.format("text")
        .schema("value string")
        .load(str(landing))
        .select(
            F.get_json_object("value", "$.utctimestamp").alias("utctimestamp"),
            F.get_json_object("value", "$.severity").alias("severity"),
            F.get_json_object("value", "$.source").alias("source"),
        )
    )
    query = (
        sessionize(raw)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        # second batch far in the future closes the first session
        with open(landing / "b2.ndjson", "w") as f:
            f.write(_event("2026-01-01T02:00:00+00:00") + "\n")
        query.processAllAvailable()
        # one more to push the watermark so the timeout fires
        with open(landing / "b3.ndjson", "w") as f:
            f.write(_event("2026-01-01T04:00:00+00:00") + "\n")
        query.processAllAvailable()

        rows = spark.sql("SELECT * FROM sessions").collect()
        assert len(rows) >= 1
        first = min(rows, key=lambda r: r["session_start"])
        assert first["source"] == "syslog"
        assert first["n_events"] == 2
        assert first["n_high_severity"] == 1
        assert str(first["session_start"]).startswith("2026-01-01 00:00:00")
        assert str(first["session_end"]).startswith("2026-01-01 00:10:00")
    finally:
        query.stop()
