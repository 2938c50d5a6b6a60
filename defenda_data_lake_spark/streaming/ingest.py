"""Structured-Streaming ingest: the Firehose replacement.

The reference's stream is Kinesis Firehose with a 60 s / 1 MB delivery
buffer and a transform lambda per batch (reference main.tf:616-631,
processor.py:17-84).  Here a file-landing prefix stands in for the
delivery stream (SURVEY.md §3.1 re-trace): producers drop NDJSON (or
arbitrary JSON blobs) into the landing path; a 60 s processing-time
trigger micro-batch matches the Firehose buffer-latency floor
(BASELINE.md).

Semantics preserved:

* the pipeline is stateless per record — no watermarks or state stores
  needed for parity (reference has no streaming SQL, SURVEY.md §2B);
* failed/dropped records go to a quarantine sink instead of the main
  table (the ``ProcessingFailed`` envelope, processor.py:59-76);
* partition columns are **processing time** at write (§1.2).

Scale notes: each micro-batch is a narrow scan → mapInPandas →
partitioned append; no shuffle.  For very high event rates, raise
``maxFilesPerTrigger`` and pre-size landing files ~128 MB so each task
gets one file.  ``foreachBatch`` writes through ``insertInto`` so new
hours appear in the catalog immediately — the reference's 10-minute
partition-registration cron (generate_partitions.py) is unnecessary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from defenda_data_lake_spark.lake import EVENTS_TABLE, create_events_table
from defenda_data_lake_spark.operators.pipeline import (
    STATUS_OK,
    add_partition_columns,
    normalize_df,
)


def start_ingest(
    spark: SparkSession,
    landing_path: str | None = None,
    checkpoint_path: str | None = None,
    quarantine_path: str | None = None,
    trigger_seconds: int = 60,
    max_files_per_trigger: int | None = None,
    source=None,
) -> StreamingQuery:
    """Start the source → events-table stream.  Returns the
    StreamingQuery (caller owns its lifecycle).

    ``source`` is any adapter from ``defenda_data_lake_spark.sources``
    (streaming DataFrame with a ``raw`` string column); when omitted, a
    ``FileLandingSource`` over ``landing_path`` — the reference's own
    Firehose→S3 delivery layout."""
    if checkpoint_path is None:
        raise ValueError("checkpoint_path is required")
    create_events_table(spark)

    if source is None:
        if landing_path is None:
            raise ValueError("pass landing_path or an explicit source")
        from defenda_data_lake_spark.sources import FileLandingSource

        source = FileLandingSource(landing_path, max_files_per_trigger)
    lines = source.load(spark)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        raw = batch_df.filter(F.length(F.trim(F.col("raw"))) > 0).select("raw")
        normalized = normalize_df(raw, raw_col="raw").cache()
        try:
            good = add_partition_columns(
                normalized.filter(normalized["_status"] == STATUS_OK)
            ).drop("_status", "_raw")
            good.write.mode("append").insertInto(EVENTS_TABLE)
            # appending into an already-scanned partition leaves the
            # session's file-status cache stale; refresh so concurrent
            # readers see the new files immediately
            spark.catalog.refreshTable(EVENTS_TABLE)
            if quarantine_path:
                bad = normalized.filter(normalized["_status"] != STATUS_OK).select(
                    "_status", "_raw"
                )
                bad.write.mode("append").json(quarantine_path)
        finally:
            normalized.unpersist()

    return (
        lines.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
