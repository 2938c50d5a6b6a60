"""Streaming deduplication over the event stream.

The batch dedup operators (``operators.dedup``) answer "which documents
in the corpus are duplicates"; these answer the streaming form: "drop
re-deliveries as they arrive".  Re-delivery is the normal case for the
reference's transport (Firehose retries are at-least-once; reference
README.md's ingest path has no dedup stage, so duplicate events land in
the table) — a continuous pipeline wants them dropped at ingest.

Built on ``dropDuplicatesWithinWatermark``: exact-once *within the
watermark horizon* with state bounded by it — the engine evicts a key's
state once the watermark passes its event time, so memory is
O(keys per horizon), not O(all keys ever).  An unbounded
``dropDuplicates`` on a stream would grow state forever; a horizon is
the correct contract at 100 TB/day (a duplicate delivered three days
late is a reprocessing job, not a streaming concern).

Scale: one shuffle on the dedup key; the state store partitions the
same way, so executors split compute and state linearly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedupe_stream(
    events: DataFrame,
    keys: Sequence[str] = ("eventid",),
    watermark_delay: str = "1 hour",
    event_time_col: str = "utctimestamp",
) -> DataFrame:
    """Drop re-deliveries of the same ``keys`` arriving within
    ``watermark_delay`` of each other.  Works on batch DataFrames too
    (plain ``dropDuplicates`` — batch has no horizon to bound).

    The output schema is the input schema, unchanged — the event-time
    column the watermark needs is internal (underscore-named so it
    can't clobber a caller's column) and dropped before returning."""
    df = events.withColumn(
        "_dedup_event_time", F.to_timestamp(F.col(event_time_col))
    )
    if df.isStreaming:
        df = df.withWatermark("_dedup_event_time", watermark_delay)
        deduped = df.dropDuplicatesWithinWatermark(list(keys))
    else:
        deduped = df.dropDuplicates(list(keys))
    return deduped.drop("_dedup_event_time")


def content_dedupe_stream(
    events: DataFrame,
    text_col: str = "summary",
    watermark_delay: str = "1 hour",
    event_time_col: str = "utctimestamp",
) -> DataFrame:
    """Content-hash variant: dedup on a digest of the normalized text
    (the streaming twin of ``operators.dedup.exact_dedup``) rather than
    an id — catches re-sends that minted fresh event ids.  Schema is
    the input schema, unchanged (the digest is internal)."""
    from defenda_data_lake_spark.operators.dedup import normalized_text

    df = events.withColumn(
        "_dedup_content_hash", F.md5(normalized_text(F.col(text_col)))
    )
    return dedupe_stream(
        df,
        keys=("_dedup_content_hash",),
        watermark_delay=watermark_delay,
        event_time_col=event_time_col,
    ).drop("_dedup_content_hash")
