"""Lake maintenance: small-file compaction for streaming-written
partitions.

The 60 s micro-batch ingest appends one-or-more parquet files per
trigger per hour partition — a day of streaming at 60 s triggers is
~1440 files/partition-day.  At 100 TB that file count (not data size)
becomes the scan bottleneck: task-per-file scheduling, footer reads,
and object-store LIST costs.  ``compact_partition`` rewrites one hive
partition into ~``target_file_bytes`` files; run it per closed hour
(the partition is processing-time, so an hour stops receiving appends
once the trigger clock passes it — no concurrent-writer window).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from defenda_data_lake_spark.lake import EVENTS_TABLE


def partition_path(
    root: str, year: str, month: str, day: str, hour: str
) -> str:
    return os.path.join(
        root, f"year={year}", f"month={month}", f"day={day}", f"hour={hour}"
    )


def compact_partition(
    spark: SparkSession,
    table_location: str,
    year: str,
    month: str,
    day: str,
    hour: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    table_name: str = EVENTS_TABLE,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite one hour partition into size-targeted files.

    Reads the partition directory, coalesces to
    ``ceil(bytes / target_file_bytes)`` output files, writes to a
    sibling temp dir, then atomically swaps directories and refreshes
    the table.  Returns {files_before, files_after, bytes}.

    ``sort_by`` additionally range-partitions and sorts the rewrite on
    the given columns (e.g. ``["source", "category"]``) — the
    Z-order-lite clustering pass: each output file/row group then
    covers a narrow, largely disjoint value range, so parquet min/max
    statistics prune entire files for selective predicates on those
    columns.  At 100 TB this is the difference between a filter
    touching every compacted file and touching one — compaction is the
    natural (and only) place to pay the sort, since the hour partition
    is already being rewritten."""
    part_dir = partition_path(table_location, year, month, day, hour)
    data_files = [
        f
        for f in os.listdir(part_dir)
        if f.endswith(".parquet") and not f.startswith(".")
    ]
    total_bytes = sum(os.path.getsize(os.path.join(part_dir, f)) for f in data_files)
    if len(data_files) <= 1:
        return {
            "files_before": len(data_files),
            "files_after": len(data_files),
            "bytes": total_bytes,
        }
    n_out = max(1, -(-total_bytes // target_file_bytes))  # ceil

    df = spark.read.parquet(part_dir)
    tmp_dir = os.path.join(
        os.path.dirname(part_dir), f".compact-{uuid.uuid4().hex[:8]}"
    )
    if sort_by:
        # range-partition so each output file owns a disjoint key range,
        # then sort within files so row groups are clustered too
        out = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        out = df.coalesce(n_out)
    out.write.mode("overwrite").parquet(tmp_dir)

    old_dir = part_dir + f".old-{uuid.uuid4().hex[:8]}"
    os.rename(part_dir, old_dir)
    os.rename(tmp_dir, part_dir)
    shutil.rmtree(old_dir)

    try:
        spark.catalog.refreshTable(table_name)
    except Exception:
        pass  # table may not be registered (raw-path usage)
    files_after = len(
        [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
    )
    return {
        "files_before": len(data_files),
        "files_after": files_after,
        "bytes": total_bytes,
    }


def upsert_corpus_snapshot(
    spark: SparkSession,
    corpus_dir: str,
    updates,
    key: str = "doc_id",
) -> dict:
    """MERGE-lite for a parquet corpus: rows in ``updates`` replace
    same-key rows in the corpus, new keys append — the incremental
    crawl-snapshot maintenance a training corpus needs without a table
    format.  Writes the merged corpus to a sibling temp dir and
    atomically swaps, so readers never observe a partial state.
    Returns {rows_before, rows_updates, rows_after}.

    Scale notes (100 TB): the merge is one left-anti equi-join on the
    key (hash-partitioned; the updates side of a snapshot delta is
    usually small enough to broadcast, which AQE decides from its
    size) plus a union — the corpus is read and written once.  At real
    scale the corpus would be hive-partitioned (e.g. by crawl date or
    key bucket) and only partitions containing updated keys rewritten;
    this single-directory form is the per-partition primitive of that
    scheme."""
    old = spark.read.parquet(corpus_dir)
    rows_before = old.count()
    rows_updates = updates.count()
    merged = updates.unionByName(
        old.join(updates.select(key).distinct(), key, "left_anti")
    )

    parent = os.path.dirname(corpus_dir.rstrip("/"))
    tmp_dir = os.path.join(parent, f".upsert-{uuid.uuid4().hex[:8]}")
    merged.write.mode("overwrite").parquet(tmp_dir)

    old_dir = corpus_dir.rstrip("/") + f".old-{uuid.uuid4().hex[:8]}"
    os.rename(corpus_dir, old_dir)
    os.rename(tmp_dir, corpus_dir)
    shutil.rmtree(old_dir)

    rows_after = spark.read.parquet(corpus_dir).count()
    return {
        "rows_before": rows_before,
        "rows_updates": rows_updates,
        "rows_after": rows_after,
    }
