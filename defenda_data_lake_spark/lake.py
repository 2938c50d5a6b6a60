"""The data-lake facade: catalog setup, batch/streaming ingest, query.

Ties the pieces together the way the reference deployment does
(reference main.tf:205-290 Glue table, README.md:89-136 query surface),
but in one Spark session:

* ``create_events_table`` — the ``defenda_data_lake.events`` table,
  Parquet + zstd, hive-partitioned by processing-time
  ``year/month/day/hour`` (partition pruning ≡ the reference's only
  query-cost lever, README.md:114,230);
* ``ingest_batch`` / ``streaming.ingest.start_ingest`` — landing files →
  intake → plugin pipeline → partitioned append (replaces the
  S3→lambda→Firehose→lambda→S3 hop chain);
* ``spark.sql`` — the full Presto-surface replacement, including the
  compat JSON functions, so both README sample queries run verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from defenda_data_lake_spark.operators.intake import (
    read_blob_events,
    read_ndjson_events,
)
from defenda_data_lake_spark.operators.pipeline import (
    STATUS_OK,
    add_partition_columns,
    normalize_df,
)

DATABASE = "defenda_data_lake"
EVENTS_TABLE = f"{DATABASE}.events"


def create_events_table(spark: SparkSession, location: str | None = None) -> None:
    """Create the events database/table if absent.  With ``location``
    the table is external (the lake layout on shared storage)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DATABASE}")
    location_clause = f" LOCATION '{location}'" if location else ""
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {EVENTS_TABLE} (
            eventid STRING,
            utctimestamp STRING,
            severity STRING,
            summary STRING,
            category STRING,
            source STRING,
            tags ARRAY<STRING>,
            plugins ARRAY<STRING>,
            details STRING,
            year STRING,
            month STRING,
            day STRING,
            hour STRING
        )
        USING PARQUET
        PARTITIONED BY (year, month, day, hour)
        {location_clause}
        """
    )


def ingest_batch(
    spark: SparkSession,
    input_path: str,
    mode: str = "blob",
    quarantine_path: str | None = None,
) -> DataFrame:
    """Batch-ingest landed files into ``defenda_data_lake.events``.

    ``mode='blob'`` uses the whole-file intake (concatenated JSON,
    CloudTrail bundles); ``mode='ndjson'`` uses the splittable
    line-based scan.  Returns the normalized good-rows DataFrame (after
    it has been appended to the table)."""
    reader = read_blob_events if mode == "blob" else read_ndjson_events
    raw = reader(spark, input_path)
    normalized = normalize_df(raw, raw_col="raw", source_col="source")
    good = add_partition_columns(
        normalized.filter(normalized["_status"] == STATUS_OK)
    ).drop("_status", "_raw")
    good.write.mode("append").insertInto(EVENTS_TABLE)
    if quarantine_path:
        bad = normalized.filter(normalized["_status"] != STATUS_OK).select(
            "_status", "_raw"
        )
        bad.write.mode("append").json(quarantine_path)
    return spark.table(EVENTS_TABLE)


def register_hour_partition(
    spark: SparkSession,
    base_location: str,
    parts: tuple[str, str, str, str] | None = None,
) -> str:
    """Register one hour partition with the reference's VERBATIM DDL
    (reference generate_partitions.py:26-34): ``ALTER TABLE
    defenda_data_lake.events ADD IF NOT EXISTS PARTITION
    (year=..., month=..., day=..., hour=...) LOCATION
    '<base>/<year>/<month>/<day>/<hour>'`` — the bare ``Y/M/D/H`` path
    layout the reference's Firehose writer produces (NOT hive-style
    ``year=Y/...``), which is exactly why the reference needs explicit
    per-partition DDL instead of ``MSCK REPAIR``.

    ``parts`` defaults to the current UTC wall-clock hour, zero-padded,
    matching the reference's processing-time cron
    (generate_partitions.py:15-24, utils/dates.py:11-33).  Returns the
    statement (the reference logs it; callers/tests inspect it).

    Athena treats ``ADD IF NOT EXISTS`` on a registered partition as a
    true no-op, but Spark RE-POINTS the existing partition to the new
    LOCATION (orphaning its data) — so this helper checks registration
    first and skips the ALTER when the partition already exists,
    preserving the reference cron's fire-every-10-minutes idempotency."""
    if parts is None:
        from datetime import datetime, timezone

        now = datetime.now(timezone.utc)
        parts = (
            str(now.year),
            str(now.month).rjust(2, "0"),
            str(now.day).rjust(2, "0"),
            str(now.hour).rjust(2, "0"),
        )
    year, month, day, hour = parts
    query = f"""
    ALTER TABLE {DATABASE}.events
    ADD IF NOT EXISTS PARTITION
    (year='{year}',
    month='{month}',
    day='{day}',
    hour='{hour}'
    )
    location '{base_location}/{year}/{month}/{day}/{hour}'
    """
    already = spark.sql(
        f"SHOW PARTITIONS {DATABASE}.events "
        f"PARTITION (year='{year}', month='{month}', day='{day}', hour='{hour}')"
    ).count()
    if not already:
        spark.sql(query)
    return query


def repair_events_table(spark: SparkSession) -> None:
    """Re-register partitions for an externally-written events layout —
    the Spark equivalent of the reference's 10-minute partition cron
    (reference generate_partitions.py:14-52; ``MSCK REPAIR TABLE``).
    Only needed when files were placed by an external writer; Spark's
    own ``insertInto`` registers partitions at write time."""
    spark.catalog.recoverPartitions(EVENTS_TABLE)


def query_pandas(spark: SparkSession, sql: str):
    """Run SQL, return a pandas DataFrame — the reference's
    query-to-pandas hand-off (reference utils/athena.py:30-38,
    README.md:146-176) collapsed to one Arrow-backed call."""
    return spark.sql(sql).toPandas()
