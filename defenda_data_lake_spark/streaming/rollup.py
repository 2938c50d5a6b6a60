"""Streaming rollup maintenance: a persisted rollup table kept live by
a stream — the lake's materialized view, fed one micro-batch at a time.

Composes :mod:`~defenda_data_lake_spark.operators.rollup` with
``foreachBatch``: every micro-batch is a delta, and
``update_rollup``'s merge law (all aggregates mergeable, HLL maps
register-identical) makes per-batch folding EXACT — the maintained
table equals a batch build over everything the stream has delivered.

Exactly-once: ``foreachBatch`` is at-least-once — after a crash
between the rollup write and the checkpoint commit, the restarted
query REDELIVERS the last micro-batch, and re-folding it would
double-count sums.  The standard remedy is implemented here: the last
applied ``batchId`` is persisted next to the table
(``_last_batch_id``, leading underscore so parquet listing ignores
it), written immediately after each fold; a redelivered batch
(``batchId <=`` stored) is skipped.  Safe because Spark's checkpoint
replays the SAME batch content per batchId (same source offsets).
Honest residual window: a crash BETWEEN the table write and the
marker write still double-folds that one batch on replay (for the
first batch even this is closed — no committed marker means any table
content is an uncommitted partial and is rebuilt, not folded).
Closing the residual window for every batch needs a transactional
table format; with plain parquet directories this marker is the
standard 99-percent remedy, and the limit is stated rather than
hidden.

Scale: identical to the batch operator — per batch it aggregates only
the delta (map-side combine), reads back only touched partitions, and
overwrites only those; steady-state cost per trigger is O(batch +
touched partitions), independent of table history.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from defenda_data_lake_spark.operators.rollup import (
    _check_spec,
    build_rollup,
    update_rollup,
)

_MARKER = "_last_batch_id"


def _marker_path(path: str) -> str:
    return os.path.join(path, _MARKER)


def _read_last_batch_id(spark: SparkSession, path: str) -> int:
    """Last applied batchId, -1 if none.  Goes through the Hadoop FS
    API so URI table paths (s3a://, hdfs://) work like local ones."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(_marker_path(path))
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return -1
    stream = fs.open(p)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        line = reader.readLine()
        return int(line.strip())
    except (TypeError, ValueError, AttributeError) as exc:
        # a truncated/corrupt marker (crash mid-write) is AMBIGUOUS:
        # treating it as "no marker" would make the next batch REBUILD
        # the table from one micro-batch — silent history loss.  Fail
        # loudly with the remediation instead.
        raise RuntimeError(
            f"corrupt rollup batch marker at {_marker_path(path)}: "
            "restore it to the last applied batchId (or delete BOTH the "
            "marker and the table to rebuild from the stream's "
            "retained history) before restarting the query"
        ) from exc
    finally:
        stream.close()


def _write_last_batch_id(spark: SparkSession, path: str, batch_id: int) -> None:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(_marker_path(path))
    fs = p.getFileSystem(conf)
    out = fs.create(p, True)
    try:
        out.write(bytearray(str(int(batch_id)).encode("utf-8")))
    finally:
        out.close()


def start_rollup_maintenance(
    stream_df: DataFrame,
    path: str,
    keys: Sequence[str],
    partition_col: str,
    agg_spec: dict[str, tuple[str, str]],
    checkpoint_path: str,
    p: int = 8,
    trigger_seconds: int | None = 60,
    query_name: str = "rollup_maintenance",
) -> StreamingQuery:
    """Start maintaining the rollup at ``path`` from ``stream_df``
    (a streaming DataFrame already projected to the raw columns
    ``agg_spec`` references plus ``keys``).  If the table does not
    exist yet, the first batch creates it.

    The caller owns the returned query's lifecycle.  Restart-safe: the
    checkpoint replays the in-flight batch and the ``_last_batch_id``
    marker makes the replay a no-op instead of a double-fold (pinned
    by ``test_streaming_rollup.py``)."""
    _check_spec(agg_spec)
    spark = stream_df.sparkSession

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        last = _read_last_batch_id(spark, path)
        if batch_id <= last:
            return  # redelivered after a crash-before-checkpoint: skip
        if last < 0:
            # no batch ever COMMITTED (marker is written after each
            # fold): any existing table content is an uncommitted
            # partial from a crashed first attempt — overwrite, don't
            # fold onto it
            build_rollup(batch_df, keys, partition_col, agg_spec, path, p=p)
        else:
            update_rollup(
                spark, path, batch_df, keys, partition_col, agg_spec, p=p
            )
        _write_last_batch_id(spark, path, batch_id)

    writer = stream_df.writeStream.foreachBatch(fold).queryName(query_name)
    writer = writer.option("checkpointLocation", checkpoint_path)
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
