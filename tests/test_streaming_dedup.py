"""Streaming dedup (streaming/dedup.py): re-deliveries within the
watermark horizon are dropped; batch fallback dedups plainly."""

import json

from pyspark.sql import functions as F

from defenda_data_lake_spark.streaming.dedup import (
    content_dedupe_stream,
    dedupe_stream,
)


def _event(eventid, ts, summary="login ok"):
    return json.dumps(
        {"eventid": eventid, "utctimestamp": ts, "summary": summary}
    )


def _stream(spark, landing):
    return (
        spark.readStream.format("text")
        .schema("value string")
        .load(str(landing))
        .select(
            F.get_json_object("value", "$.eventid").alias("eventid"),
            F.get_json_object("value", "$.utctimestamp").alias("utctimestamp"),
            F.get_json_object("value", "$.summary").alias("summary"),
        )
    )


def test_dedupe_stream_drops_redeliveries(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    with open(landing / "b1.ndjson", "w") as f:
        f.write(_event("e1", "2026-01-01T00:01:00+00:00") + "\n")
        f.write(_event("e1", "2026-01-01T00:01:00+00:00") + "\n")  # dup, same batch
        f.write(_event("e2", "2026-01-01T00:02:00+00:00") + "\n")

    query = (
        dedupe_stream(_stream(spark, landing), keys=("eventid",))
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        # second delivery of e1 in a later microbatch, still in horizon
        with open(landing / "b2.ndjson", "w") as f:
            f.write(_event("e1", "2026-01-01T00:03:00+00:00") + "\n")
            f.write(_event("e3", "2026-01-01T00:04:00+00:00") + "\n")
        query.processAllAvailable()
        ids = sorted(
            r["eventid"]
            for r in spark.sql("SELECT eventid FROM dedup_out").collect()
        )
        assert ids == ["e1", "e2", "e3"]
        # output schema is the input schema — no helper columns leak
        assert spark.table("dedup_out").columns == [
            "eventid", "utctimestamp", "summary",
        ]
    finally:
        query.stop()


def test_content_dedupe_stream(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    with open(landing / "b1.ndjson", "w") as f:
        # different ids, same normalized content -> one survivor
        f.write(_event("a", "2026-01-01T00:01:00+00:00", "Alert  FIRED") + "\n")
        f.write(_event("b", "2026-01-01T00:01:30+00:00", "alert fired") + "\n")
        f.write(_event("c", "2026-01-01T00:02:00+00:00", "all quiet") + "\n")

    query = (
        content_dedupe_stream(_stream(spark, landing))
        .writeStream.format("memory")
        .queryName("content_dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        rows = spark.sql(
            "SELECT eventid, summary FROM content_dedup_out"
        ).collect()
        assert len(rows) == 2
        assert {r["summary"].lower().replace("  ", " ") for r in rows} == {
            "alert fired",
            "all quiet",
        }
    finally:
        query.stop()


def test_dedupe_batch_fallback(spark):
    df = spark.createDataFrame(
        [
            ("e1", "2026-01-01T00:01:00+00:00", "x"),
            ("e1", "2026-01-01T00:05:00+00:00", "x"),
            ("e2", "2026-01-01T00:02:00+00:00", "y"),
        ],
        ["eventid", "utctimestamp", "summary"],
    )
    out = dedupe_stream(df, keys=("eventid",))
    assert out.count() == 2
