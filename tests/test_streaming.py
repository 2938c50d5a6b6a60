"""Structured-Streaming ingest test: landing file → micro-batch →
partitioned events table (SURVEY.md §3.1 re-trace)."""

import json

from defenda_data_lake_spark.lake import EVENTS_TABLE
from defenda_data_lake_spark.streaming.ingest import start_ingest
from tests.fixtures.events import ALL_FIXTURES


def test_streaming_ingest(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    spark.sql("DROP TABLE IF EXISTS defenda_data_lake.events")

    query = start_ingest(
        spark,
        landing_path=str(landing),
        checkpoint_path=str(tmp_path / "ckpt"),
        quarantine_path=str(tmp_path / "quarantine"),
        trigger_seconds=1,
    )
    try:
        with open(landing / "batch1.ndjson", "w") as f:
            for name in ("cloudtrail", "vpc_flow"):
                f.write(json.dumps(ALL_FIXTURES[name]()) + "\n")
            f.write("this is not json\n")
        query.processAllAvailable()

        df = spark.table(EVENTS_TABLE)
        assert df.count() == 2
        assert df.filter("eventid IS NOT NULL").count() == 2

        # quarantine got the bad record with the original payload
        bad = spark.read.json(str(tmp_path / "quarantine"))
        assert bad.count() == 1
        assert bad.first()["_status"] == "ProcessingFailed"

        # late second batch appends incrementally
        with open(landing / "batch2.ndjson", "w") as f:
            f.write(json.dumps(ALL_FIXTURES["syslog"]()) + "\n")
        query.processAllAvailable()
        assert spark.table(EVENTS_TABLE).count() == 3
    finally:
        query.stop()
        spark.sql("DROP TABLE IF EXISTS defenda_data_lake.events")


def test_streaming_deduped_ingest(spark, tmp_path):
    """End-to-end: normalize -> in-stream MinHash near-dedup ->
    three-way routing (events table / Dropped near-dup / failed)."""
    from defenda_data_lake_spark.streaming.ingest import start_deduped_ingest

    landing = tmp_path / "landing"
    landing.mkdir()
    spark.sql("DROP TABLE IF EXISTS defenda_data_lake.events")

    base = "suspicious login burst from external address range detected"
    near = base + " again"
    query = start_deduped_ingest(
        spark,
        landing_path=str(landing),
        checkpoint_path=str(tmp_path / "ckpt"),
        quarantine_path=str(tmp_path / "quarantine"),
        trigger_seconds=1,
    )
    try:
        with open(landing / "batch1.ndjson", "w") as f:
            f.write(json.dumps({"eventid": "aaa", "summary": base,
                                "utctimestamp": "2026-01-01T00:01:00+00:00"}) + "\n")
            f.write(json.dumps({"eventid": "zzz", "summary": "completely unrelated maintenance notice",
                                "utctimestamp": "2026-01-01T00:02:00+00:00"}) + "\n")
            f.write("not json at all\n")
        query.processAllAvailable()
        assert spark.table(EVENTS_TABLE).count() == 2

        # a near-re-post in a LATER micro-batch, inside the horizon:
        # dropped via state, not table lookback
        with open(landing / "batch2.ndjson", "w") as f:
            f.write(json.dumps({"eventid": "bbb", "summary": near,
                                "utctimestamp": "2026-01-01T00:05:00+00:00"}) + "\n")
        query.processAllAvailable()

        table = spark.table(EVENTS_TABLE)
        assert table.count() == 2
        # eventids are MINTED by the pipeline (reference quirk: incoming
        # eventid demotes into details), so identify rows by summary
        summaries = {r["summary"] for r in table.select("summary").collect()}
        assert summaries == {base, "completely unrelated maintenance notice"}

        q = spark.read.json(str(tmp_path / "quarantine"))
        near_dups = q.filter(q["_status"] == "Dropped").collect()
        assert len(near_dups) == 1
        # dup_of points at the surviving claimant's minted eventid
        claimant_id = table.filter(table["summary"] == base).first()["eventid"]
        assert near_dups[0]["dup_of"] == claimant_id
        assert q.filter(q["_status"] == "ProcessingFailed").count() == 1
    finally:
        query.stop()
        spark.sql("DROP TABLE IF EXISTS defenda_data_lake.events")
