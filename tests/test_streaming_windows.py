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


def test_stream_interval_enrich_matches_batch(spark, tmp_path):
    """Stream-stream interval join = the batch interval join over the
    same rows (inner form; outer trails the watermark by design)."""
    import json as _json

    from defenda_data_lake_spark.streaming.windows import (
        stream_interval_enrich,
    )

    facts_dir, ctx_dir = tmp_path / "facts", tmp_path / "ctx"
    facts_dir.mkdir(), ctx_dir.mkdir()
    base = 1_700_000_000
    facts = [
        {"user": f"u{i % 3}", "ts": base + 60 * i, "action": f"a{i}"}
        for i in range(12)
    ]
    ctx = [
        {"user": f"u{i % 3}", "ts": base + 60 * i - lag, "origin": f"o{i}_{lag}"}
        for i in range(12)
        for lag in (30, 400)  # one inside the 300 s horizon, one outside
    ]
    with open(facts_dir / "f.json", "w") as fh:
        for r in facts:
            fh.write(_json.dumps(r) + "\n")
    with open(ctx_dir / "c.json", "w") as fh:
        for r in ctx:
            fh.write(_json.dumps(r) + "\n")

    def load(d, schema):
        return (
            spark.readStream.format("json")
            .schema(schema)
            .load(str(d))
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )

    fs = load(facts_dir, "user string, ts long, action string")
    cs = load(ctx_dir, "user string, ts long, origin string")
    joined = stream_interval_enrich(
        fs, cs, "user", max_lag_seconds=300, watermark_seconds=60
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["f_action"], r["c_origin"])
        for r in spark.sql("SELECT * FROM enriched").collect()
    }

    bf = spark.createDataFrame(
        [(r["user"], r["ts"], r["action"]) for r in facts],
        "user string, ts long, action string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    bc = spark.createDataFrame(
        [(r["user"], r["ts"], r["origin"]) for r in ctx],
        "user string, ts long, origin string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    want = {
        (r["action"], r["origin"])
        for r in bf.alias("f")
        .join(
            bc.alias("c"),
            (F.col("f.user") == F.col("c.user"))
            & (F.col("c.ts") <= F.col("f.ts"))
            & (F.col("c.ts") >= F.col("f.ts") - F.expr("INTERVAL 300 SECONDS")),
        )
        .collect()
    }
    assert got == want and len(want) > 0


def test_stream_interval_enrich_rejects_bad_args(spark, tmp_path):
    import pytest

    from defenda_data_lake_spark.streaming.windows import (
        stream_interval_enrich,
    )

    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError):
        stream_interval_enrich(df, df, "value", max_lag_seconds=0)
