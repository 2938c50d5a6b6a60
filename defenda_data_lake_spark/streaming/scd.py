"""Streaming SCD-2 maintenance: a persisted dimension-history table
(the :func:`~defenda_data_lake_spark.operators.scd.scd2_history` shape)
kept live by an observation stream, one micro-batch at a time.

Fold law: within a batch the runs are built by the BATCH operator
itself (``scd2_history(include_last_obs=True)``), then merged against
each key's open version — extend it when the first run's attributes
match (null-safely), close it at the first run's ``valid_from`` when
they don't, and renumber the batch's runs to continue the key's
version sequence.  The result equals a batch build over everything
delivered so far, row-for-row (pinned in ``test_streaming_scd.py``)
PROVIDED observations arrive in non-decreasing event time per key
across batches — the one assumption a fold cannot avoid, because an
SCD interval is defined by event order.  Violations are DETECTED (the
open version carries ``last_obs_us``, the key's event-time high-water
mark) and handled per ``on_late``: ``"error"`` (default) fails the
batch loudly; ``"drop"`` discards the late rows before the run build
(at-least-the-truth history, like the watermark drop in any streaming
engine, but counted and logged, never silent).

Exactly-once: same ``_last_batch_id`` marker protocol as
``streaming/rollup.py`` (redelivered batch → no-op; no marker → table
content is an uncommitted partial and is rebuilt), same honest
residual window (crash between table write and marker write).

Scale: the table is hash-bucketed on the dimension key
(``kb = pmod(hash(keys), num_buckets)`` partition directories), and a
batch reads back and dynamically overwrites ONLY the buckets its keys
touch — steady-state cost per trigger is O(batch + touched buckets),
independent of history length, exactly the rollup-maintenance trade.
All merge steps are key-equi-joins between the batch's runs (small)
and the touched buckets' open rows; nothing driver-side beyond the
touched-bucket value list (≤ ``num_buckets`` entries).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from defenda_data_lake_spark.operators.scd import scd2_history
from defenda_data_lake_spark.streaming.rollup import (
    _read_last_batch_id,
    _write_last_batch_id,
)
from defenda_data_lake_spark.streaming._tables import (
    bucket_col as _bucket,  # ONE bucket definition across scd/cdc tables
    path_exists as _path_exists,
)


def _table_cols(keys: Sequence[str], attrs: Sequence[str]) -> list[str]:
    return [
        *keys, *attrs, "version", "valid_from_s", "valid_to_s", "n_obs",
        "first_obs_us", "last_obs_us", "kb",
    ]


def fold_scd2_batch(
    spark: SparkSession,
    path: str,
    batch_df: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    order_cols: Sequence[str] = (),
    num_buckets: int = 16,
    on_late: str = "error",
    table_exists: bool | None = None,
) -> dict:
    """Fold ONE batch of observations into the SCD table at ``path``.
    Returns ``{"runs": n, "late_dropped": n, "touched_buckets": [...]}``.
    Usable directly for incremental BATCH maintenance too (a nightly
    delta is just a big micro-batch)."""
    if on_late not in ("error", "drop"):
        raise ValueError("on_late must be 'error' or 'drop'")
    keys = list(key_cols)
    attrs = list(attr_cols)
    cols = _table_cols(keys, attrs)

    if table_exists is None:
        table_exists = _path_exists(spark, path)

    late_dropped = 0
    if not table_exists:
        runs = scd2_history(
            batch_df, keys, attrs, ts_col, order_cols, include_last_obs=True
        ).withColumn("kb", _bucket(keys, num_buckets))
        runs = runs.select(*cols).localCheckpoint(eager=True)
        runs.write.mode("overwrite").partitionBy("kb").parquet(path)
        touched = [r[0] for r in runs.select("kb").distinct().collect()]
        return {
            "runs": runs.count(),
            "late_dropped": 0,
            "touched_buckets": sorted(touched),
        }

    src = batch_df.withColumn("kb", _bucket(keys, num_buckets))
    touched = [r[0] for r in src.select("kb").distinct().collect()]
    if not touched:
        return {"runs": 0, "late_dropped": 0, "touched_buckets": []}
    tbl = spark.read.parquet(path).filter(F.col("kb").isin(touched))
    open_rows = tbl.filter(F.col("valid_to_s").isNull())

    # ---- late-arrival handling against the per-key high-water mark
    hwm = open_rows.select(*keys, F.col("last_obs_us").alias("_hwm_us"))
    obs_us = F.unix_micros(F.col(ts_col))
    marked = src.join(hwm, keys, "left").withColumn(
        "_late", F.col("_hwm_us").isNotNull() & (obs_us < F.col("_hwm_us"))
    )
    if on_late == "error":
        n_late = marked.filter("_late").count()
        if n_late:
            raise RuntimeError(
                f"{n_late} observation(s) arrived behind a key's folded "
                f"event-time high-water mark; an SCD fold cannot insert "
                f"history retroactively.  Rebuild the table from the full "
                f"log (fold_scd2_batch on the concatenated history) or "
                f"use on_late='drop'."
            )
        clean = marked
    else:
        kept = marked.filter(~F.col("_late")).localCheckpoint(eager=True)
        late_dropped = marked.count() - kept.count()
        clean = kept
    clean = clean.drop("_hwm_us", "_late", "kb")

    runs = scd2_history(
        clean, keys, attrs, ts_col, order_cols, include_last_obs=True
    )
    r1 = runs.filter(F.col("version") == 1).select(
        *keys,
        *[F.col(a).alias(f"_r_{a}") for a in attrs],
        F.col("valid_from_s").alias("_r_from_s"),
        F.col("valid_to_s").alias("_r_to_s"),
        F.col("n_obs").alias("_r_n"),
        F.col("last_obs_us").alias("_r_last_us"),
    )
    o = open_rows.select(
        *keys,
        *[F.col(a).alias(f"_o_{a}") for a in attrs],
        F.col("version").alias("_o_ver"),
        F.col("valid_from_s").alias("_o_from_s"),
        F.col("n_obs").alias("_o_n"),
        F.col("first_obs_us").alias("_o_first_us"),
        F.col("last_obs_us").alias("_o_last_us"),
    )
    same = F.lit(True)
    for a in attrs:
        same = same & F.col(f"_o_{a}").eqNullSafe(F.col(f"_r_{a}"))
    meta = o.join(r1, keys, "full_outer").withColumn(
        "_extends", F.col("_o_ver").isNotNull() & F.col("_r_n").isNotNull() & same
    ).withColumn(
        "_offset",
        F.when(F.col("_o_ver").isNull(), F.lit(0))
        .when(F.col("_extends"), F.col("_o_ver") - 1)
        .otherwise(F.col("_o_ver")),
    )

    # open rows of keys the batch didn't touch pass through unchanged;
    # touched open rows are extended (attrs equal) or closed at the
    # first new run's valid_from
    head = meta.filter(F.col("_o_ver").isNotNull()).select(
        *keys,
        *[F.col(f"_o_{a}").alias(a) for a in attrs],
        F.col("_o_ver").alias("version"),
        F.col("_o_from_s").alias("valid_from_s"),
        F.when(F.col("_r_n").isNull(), F.lit(None).cast("long"))
        .when(F.col("_extends"), F.col("_r_to_s"))
        .otherwise(F.col("_r_from_s"))
        .alias("valid_to_s"),
        (
            F.col("_o_n")
            + F.when(F.col("_extends"), F.col("_r_n")).otherwise(F.lit(0))
        ).alias("n_obs"),
        F.col("_o_first_us").alias("first_obs_us"),
        F.when(F.col("_extends"), F.col("_r_last_us"))
        .otherwise(F.col("_o_last_us"))
        .alias("last_obs_us"),
    )
    appended = (
        runs.join(meta.select(*keys, "_extends", "_offset"), keys)
        .filter(~((F.col("version") == 1) & F.col("_extends")))
        .select(
            *keys,
            *attrs,
            (F.col("version") + F.col("_offset")).alias("version"),
            "valid_from_s",
            "valid_to_s",
            "n_obs",
            "first_obs_us",
            "last_obs_us",
        )
    )
    closed = tbl.filter(F.col("valid_to_s").isNotNull()).drop("kb")
    merged = (
        closed.unionByName(head)
        .unionByName(appended)
        .withColumn("kb", _bucket(keys, num_buckets))
        .select(*cols)
        # materialize BEFORE the dynamic overwrite: merged reads the
        # same parquet buckets the write replaces
        .localCheckpoint(eager=True)
    )
    n_runs = runs.count()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("kb").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {
        "runs": n_runs,
        "late_dropped": int(late_dropped),
        "touched_buckets": sorted(touched),
    }


def start_scd2_maintenance(
    stream_df: DataFrame,
    path: str,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    checkpoint_path: str,
    order_cols: Sequence[str] = (),
    num_buckets: int = 16,
    on_late: str = "error",
    trigger_seconds: int | None = 60,
    query_name: str = "scd2_maintenance",
    on_batch: Callable[[int, dict], None] | None = None,
) -> StreamingQuery:
    """Maintain the SCD-2 table at ``path`` from ``stream_df``.  Same
    restart contract as ``start_rollup_maintenance``: the
    ``_last_batch_id`` marker makes checkpoint redeliveries no-ops,
    and a crashed FIRST attempt (no committed marker) rebuilds rather
    than folds.  ``num_buckets`` is a TABLE constant — changing it on
    an existing table strands rows in stale buckets; rebuild instead.
    ``on_batch(batch_id, stats)`` is an observability hook (tests use
    it)."""
    spark = stream_df.sparkSession

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        last = _read_last_batch_id(spark, path)
        if batch_id <= last:
            return
        stats = fold_scd2_batch(
            spark,
            path,
            batch_df,
            key_cols,
            attr_cols,
            ts_col,
            order_cols=order_cols,
            num_buckets=num_buckets,
            on_late=on_late,
            table_exists=last >= 0,
        )
        _write_last_batch_id(spark, path, batch_id)
        if on_batch is not None:
            on_batch(batch_id, stats)

    writer = stream_df.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint_path
    ).queryName(query_name)
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
