"""Partition compaction: many small streaming-written files -> few,
with identical data."""

import json

from defenda_data_lake_spark.lake import EVENTS_TABLE, create_events_table, ingest_batch
from defenda_data_lake_spark.lake_maintenance import compact_partition
from tests.fixtures.events import ALL_FIXTURES


def test_compact_partition_roundtrip(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    location = str(tmp_path / "events_tbl")
    spark.sql("DROP TABLE IF EXISTS defenda_data_lake.events")
    create_events_table(spark, location=location)

    # several separate appends -> several files in the same hour partition
    with open(landing / "b.ndjson", "w") as f:
        for name in ("cloudtrail", "vpc_flow", "syslog"):
            f.write(json.dumps(ALL_FIXTURES[name]()) + "\n")
    for _ in range(4):
        ingest_batch(spark, str(landing), mode="ndjson")

    total_before = spark.table(EVENTS_TABLE).count()
    assert total_before == 12
    part = spark.sql(
        f"SELECT year, month, day, hour FROM {EVENTS_TABLE} LIMIT 1"
    ).first()

    stats = compact_partition(
        spark, location, part["year"], part["month"], part["day"], part["hour"]
    )
    assert stats["files_before"] >= 4
    assert stats["files_after"] == 1  # tiny partition -> one target file

    # data identical after the swap
    assert spark.table(EVENTS_TABLE).count() == total_before
    row = spark.sql(
        f"SELECT count(DISTINCT eventid) AS n FROM {EVENTS_TABLE}"
    ).first()
    assert row["n"] == total_before
    spark.sql("DROP TABLE IF EXISTS defenda_data_lake.events")
