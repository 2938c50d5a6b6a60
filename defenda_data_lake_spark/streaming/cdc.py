"""Streaming CDC maintenance: a persisted current-state snapshot kept
live by a change-data-capture stream (insert/update/delete rows with a
monotone ``seq``), one micro-batch at a time — the streaming twin of
``operators/cdc.py``'s batch apply and the current-state sibling of
``streaming/scd.py`` (which keeps full history).

Fold law: each batch is collapsed to its per-key net effect
(:func:`~defenda_data_lake_spark.operators.cdc.cdc_collapse`) and
applied over the snapshot; the result equals a single batch
``cdc_apply`` over the concatenated change log PROVIDED the log is
delivered in non-decreasing ``seq`` order per key across batches — the
property every real CDC transport (binlog, LSN, Kinesis shard)
provides.  Violations are DETECTED per key: every snapshot row carries
``_last_seq``, and a change with ``seq`` strictly below it is late —
``on_late='error'`` (default) fails the batch, ``'drop'`` discards and
counts.  A change with ``seq`` EQUAL to ``_last_seq`` re-applies
idempotently (same seq ⇒ same content under the transport's
uniqueness), which makes the fold itself idempotent — a crash between
the table write and the ``_last_batch_id`` marker write is repaired by
the redelivered batch folding to the identical table, closing the
residual window ``streaming/scd.py`` documents.  The one blind spot is
tombstone-free deletes: once a key's row is gone its ``_last_seq`` is
gone, so a late change for a deleted key re-inserts it undetected
(standard for snapshot stores without tombstone retention).  OPT-IN
FIX: ``tombstones=N`` retains each deleted key's ``(key, seq)`` in a
TTL'd side table for N folds, so late changes for deleted keys are
detected within that horizon (see :func:`fold_cdc_batch`); beyond it
the blind spot returns — size N to the transport's maximum delivery
skew.  And as
with any schema-on-read parquet table, a snapshot whose every row has
been deleted has no files left to infer a schema from — the next fold
must treat it as a fresh table.

Scale: the snapshot is hash-bucketed on the key
(``kb = pmod(hash(keys), num_buckets)`` partition directories); a
batch reads back and dynamically overwrites ONLY the buckets its keys
touch — steady-state cost per trigger is O(batch + touched buckets),
independent of snapshot size (the rollup/SCD-maintenance trade).  All
steps are key-equi joins between the batch's net changes (small) and
the touched buckets; nothing driver-side beyond the touched-bucket
value list (≤ ``num_buckets`` entries).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from defenda_data_lake_spark.operators.cdc import cdc_collapse
from defenda_data_lake_spark.streaming.rollup import (
    _read_last_batch_id,
    _write_last_batch_id,
)
from defenda_data_lake_spark.streaming._tables import (
    bucket_col as _bucket,  # ONE bucket definition across scd/cdc tables
    parquet_has_data as _parquet_has_data,
    path_exists as _path_exists,
)


def _delete_bucket_dirs(spark: SparkSession, path: str, kbs) -> None:
    """Remove ``kb=`` bucket directories a dynamic overwrite left
    stale (touched but written no rows).  Hadoop FS API so s3a://,
    hdfs:// and local paths all work."""
    if not kbs:
        return
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    for kb in sorted(kbs):
        p = jvm.org.apache.hadoop.fs.Path(f"{path}/kb={kb}")
        fs = p.getFileSystem(conf)
        if fs.exists(p):
            fs.delete(p, True)


def fold_cdc_batch(
    spark: SparkSession,
    path: str,
    batch_df: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
    num_buckets: int = 16,
    on_late: str = "error",
    table_exists: bool | None = None,
    tombstones: int | None = None,
) -> dict:
    """Fold ONE batch of change rows into the snapshot at ``path``.
    Returns ``{"applied": n, "deleted": n, "late_dropped": n,
    "tombstoned": n, "touched_buckets": [...]}``.  Usable directly for
    incremental BATCH maintenance too (a nightly change extract is
    just a big micro-batch).

    ``tombstones=N`` (opt-in) closes the deleted-key blind spot the
    module docstring describes: each net-deleted key's ``(key, seq)``
    is retained in a side table under ``{path}/_tombstones``
    (underscore-prefixed, so snapshot reads never see it) for N folds,
    and a change arriving with ``seq`` strictly below a live
    tombstone's is LATE — ``on_late`` decides error vs counted drop,
    exactly like the snapshot-row guard.  An EQUAL seq is the
    idempotent redelivery of the delete itself and re-applies cleanly
    (refreshing the tombstone's TTL).  Beyond the N-fold horizon the
    tombstone expires and the pre-tombstone behavior returns — size N
    to the transport's maximum delivery skew.  Scale: the side table
    is bucketed on the same ``kb`` as the snapshot and only touched
    buckets are rewritten per fold; its size is bounded by the keys
    deleted within the horizon, not by the snapshot."""
    if on_late not in ("error", "drop"):
        raise ValueError("on_late must be 'error' or 'drop'")
    if tombstones is not None and int(tombstones) < 1:
        raise ValueError("tombstones must be a positive fold count")
    keys = list(key_cols)
    payload = [c for c in batch_df.columns if c not in (op_col, seq_col)]
    reserved = {"_last_seq", "kb"}
    if tombstones is not None:
        # the tombstone path introduces its own internal names; a
        # colliding payload column would fail as an ambiguous
        # reference deep inside the fold instead of up front
        reserved |= {"_ts_seq", "_ts_late", "_fold"}
    clash = [c for c in payload if c in reserved]
    if clash:
        # same up-front rule as the missing/extra checks below: the
        # bookkeeping names are the snapshot's, and a batch that uses
        # them would silently corrupt the seq HWM / bucket layout
        raise ValueError(
            f"fold_cdc_batch: batch payload columns {clash} collide "
            f"with the snapshot's reserved columns {sorted(reserved)}"
        )
    cols = [*payload, "_last_seq", "kb"]

    if table_exists is None:
        table_exists = _path_exists(spark, path)
    if table_exists and not _parquet_has_data(spark, path):
        # a batch that net-deleted every remaining row left the table
        # with a directory and marker but NO data files — reading it
        # would fail schema inference forever, wedging the stream.
        # Treat it as a fresh table (the net effect of the emptied
        # history is exactly "nothing exists yet").
        table_exists = False

    # the collapsed net is tiny relative to the snapshot but sits on
    # the batch's window sort and both raise_error guards; without
    # pinning it, the touched-bucket collect, the late count, the
    # merge, and the applied/deleted stats would each re-execute it
    net = cdc_collapse(
        batch_df, keys, seq_col=seq_col, op_col=op_col
    ).localCheckpoint(eager=True)

    # ---- tombstone side state (opt-in).  Read and PIN before any
    # snapshot write: a fresh-table rebuild statically overwrites
    # `path`, which removes everything under it including the side
    # table — the pinned copy is written back below.
    ts_path = path.rstrip("/") + "/_tombstones"
    ts_meta = path.rstrip("/") + "/_tombstones_meta"
    ts_old = None
    current_fold = 0
    ts_late_dropped = 0
    ts_touched: list = []
    if tombstones is not None:
        # touched-bucket collect only on the opt-in path: callers with
        # tombstones disabled must not pay an extra per-fold job
        src_pre = net.withColumn("kb", _bucket(keys, num_buckets))
        ts_touched = [r[0] for r in src_pre.select("kb").distinct().collect()]
        current_fold = _read_last_batch_id(spark, ts_meta) + 1
        if _parquet_has_data(spark, ts_path):
            ts_old = spark.read.parquet(ts_path).localCheckpoint(eager=True)
            # live for N FULL folds after the writing fold: a
            # tombstone written at fold C guards folds C+1..C+N
            # (>= — a strict > guarded only N-1, so tombstones=1
            # protected nothing)
            live = ts_old.filter(
                F.col("_fold") >= F.lit(current_fold - int(tombstones))
            )
            thwm = live.select(*keys, F.col("_last_seq").alias("_ts_seq"))
            tmarked = src_pre.join(thwm, keys, "left").withColumn(
                "_ts_late",
                F.col("_ts_seq").isNotNull()
                & (F.col(seq_col) < F.col("_ts_seq")),
            )
            if on_late == "error":
                n_ts_late = tmarked.filter("_ts_late").count()
                if n_ts_late:
                    raise RuntimeError(
                        f"{n_ts_late} change(s) arrived behind a DELETED "
                        f"key's tombstoned seq high-water mark (within "
                        f"the {int(tombstones)}-fold retention horizon); "
                        f"a snapshot fold cannot apply changes "
                        f"retroactively.  Rebuild from the full log or "
                        f"use on_late='drop'."
                    )
            else:
                kept = tmarked.filter(
                    ~F.col("_ts_late")
                ).localCheckpoint(eager=True)
                ts_late_dropped = tmarked.count() - kept.count()
                net = kept.drop("_ts_seq", "_ts_late", "kb")

    def _ts_writeback(clean_net: DataFrame, full_rewrite: bool) -> int:
        """Fold this batch's net deletes into the tombstone side table
        and advance the fold counter.  ``full_rewrite`` after a
        fresh-table static overwrite of ``path`` (which removed the
        on-disk side table): every bucket is written back from the
        pinned copy; otherwise only touched buckets are rewritten and
        expired rows in untouched buckets are dropped lazily at read
        (the ``live`` filter) until their bucket's next rewrite."""
        new_ts = (
            clean_net.filter(F.col(op_col) == "D")
            .select(
                *keys,
                F.col(seq_col).alias("_last_seq"),
                F.lit(int(current_fold)).cast("long").alias("_fold"),
            )
            .withColumn("kb", _bucket(keys, num_buckets))
        )
        # ANY row for a key supersedes its tombstone: a re-insert
        # clears it (the snapshot row carries the HWM again), a fresh
        # delete replaces it with the new seq and a refreshed TTL
        batch_keys = clean_net.select(*keys).distinct()
        if ts_old is not None:
            surv = ts_old.filter(
                F.col("_fold") >= F.lit(current_fold - int(tombstones))
            ).join(batch_keys, keys, "left_anti")
            if not full_rewrite:
                surv = surv.filter(F.col("kb").isin(ts_touched))
            merged_ts = surv.unionByName(new_ts)
        else:
            merged_ts = new_ts
        merged_ts = merged_ts.localCheckpoint(eager=True)
        n_new = new_ts.count()
        if ts_old is None or full_rewrite:
            if ts_old is not None or n_new:
                merged_ts.write.mode("overwrite").partitionBy("kb").parquet(
                    ts_path
                )
        else:
            prev = spark.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "static"
            )
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                merged_ts.write.mode("overwrite").partitionBy("kb").parquet(
                    ts_path
                )
            finally:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
            written = {r[0] for r in merged_ts.select("kb").distinct().collect()}
            _delete_bucket_dirs(spark, ts_path, set(ts_touched) - written)
        _write_last_batch_id(spark, ts_meta, current_fold)
        return n_new

    if not table_exists:
        rows = (
            net.filter(F.col(op_col) != "D")
            .select(*payload, F.col(seq_col).alias("_last_seq"))
            .withColumn("kb", _bucket(keys, num_buckets))
            .select(*cols)
            .localCheckpoint(eager=True)
        )
        rows.write.mode("overwrite").partitionBy("kb").parquet(path)
        touched = [r[0] for r in rows.select("kb").distinct().collect()]
        tombstoned = (
            _ts_writeback(net, full_rewrite=True)
            if tombstones is not None
            else 0
        )
        return {
            "applied": rows.count(),
            "deleted": 0,
            "late_dropped": int(ts_late_dropped),
            "tombstoned": int(tombstoned),
            "touched_buckets": sorted(touched),
        }

    src = net.withColumn("kb", _bucket(keys, num_buckets))
    touched = [r[0] for r in src.select("kb").distinct().collect()]
    if not touched:
        if tombstones is not None:
            _write_last_batch_id(spark, ts_meta, current_fold)
        return {
            "applied": 0, "deleted": 0,
            "late_dropped": int(ts_late_dropped), "tombstoned": 0,
            "touched_buckets": [],
        }
    tbl = spark.read.parquet(path).filter(F.col("kb").isin(touched))
    table_payload = [c for c in tbl.columns if c not in ("_last_seq", "kb")]
    missing = [c for c in table_payload if c not in payload]
    extra = [c for c in payload if c not in table_payload]
    if missing or extra:
        # same up-front check (and reason) as cdc_apply: a drifted
        # batch schema would otherwise surface as an unrelated
        # analysis error deep inside the union — and an EXTRA batch
        # column is the same drift in the other direction (it would
        # fail unionByName below, or on a fresh table silently widen
        # the snapshot schema and break every later consistent batch)
        raise ValueError(
            f"fold_cdc_batch: batch schema drifted from the snapshot: "
            f"missing snapshot columns {missing}, "
            f"extra batch columns {extra}"
        )

    # ---- late-arrival guard against each row's per-key seq HWM.
    # Strict '<': an EQUAL seq is the idempotent redelivery of the
    # change that produced the row and must re-apply cleanly.
    hwm = tbl.select(*keys, F.col("_last_seq").alias("_hwm_seq"))
    marked = src.join(hwm, keys, "left").withColumn(
        "_late",
        F.col("_hwm_seq").isNotNull() & (F.col(seq_col) < F.col("_hwm_seq")),
    )
    late_dropped = int(ts_late_dropped)
    if on_late == "error":
        n_late = marked.filter("_late").count()
        if n_late:
            raise RuntimeError(
                f"{n_late} change(s) arrived behind a key's folded seq "
                f"high-water mark; a snapshot fold cannot apply changes "
                f"retroactively.  Rebuild from the full log (one "
                f"fold_cdc_batch over the concatenated history) or use "
                f"on_late='drop'."
            )
        clean = marked
    else:
        kept = marked.filter(~F.col("_late")).localCheckpoint(eager=True)
        late_dropped += marked.count() - kept.count()
        clean = kept
    clean = clean.drop("_hwm_seq", "_late")
    if tombstones is not None:
        # pin: the tombstone write-back runs AFTER the snapshot
        # overwrite, and clean's plan (via the HWM join) reads the
        # snapshot files that write replaces
        clean = clean.localCheckpoint(eager=True)

    survivors = tbl.join(clean.select(*keys), keys, "left_anti").drop("kb")
    upserts = clean.filter(F.col(op_col) != "D").select(
        *payload, F.col(seq_col).alias("_last_seq")
    )
    merged = (
        survivors.unionByName(upserts)
        .withColumn("kb", _bucket(keys, num_buckets))
        .select(*cols)
        # materialize BEFORE the dynamic overwrite: merged reads the
        # same parquet buckets the write replaces
        .localCheckpoint(eager=True)
    )
    n_applied = upserts.count()
    n_deleted = clean.filter(F.col(op_col) == "D").count()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("kb").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # dynamic overwrite replaces only partitions PRESENT in the written
    # data — a touched bucket whose every row was net-deleted produces
    # no rows, so its stale files would silently survive (deleted keys
    # resurrecting).  Such buckets are exactly (touched − written):
    # every row in them was superseded by this batch.  Remove them.
    written = {r[0] for r in merged.select("kb").distinct().collect()}
    _delete_bucket_dirs(spark, path, set(touched) - written)
    tombstoned = (
        _ts_writeback(clean.drop("kb"), full_rewrite=False)
        if tombstones is not None
        else 0
    )
    return {
        "applied": int(n_applied),
        "deleted": int(n_deleted),
        "late_dropped": int(late_dropped),
        "tombstoned": int(tombstoned),
        "touched_buckets": sorted(touched),
    }


def start_cdc_maintenance(
    stream_df: DataFrame,
    path: str,
    key_cols: Sequence[str],
    checkpoint_path: str,
    seq_col: str = "seq",
    op_col: str = "op",
    num_buckets: int = 16,
    on_late: str = "error",
    trigger_seconds: int | None = 60,
    query_name: str = "cdc_maintenance",
    on_batch: Callable[[int, dict], None] | None = None,
    tombstones: int | None = None,
) -> StreamingQuery:
    """Maintain the snapshot at ``path`` from a change stream.  Same
    restart contract as ``start_rollup_maintenance`` /
    ``start_scd2_maintenance``: the ``_last_batch_id`` marker makes
    checkpoint redeliveries no-ops (and the fold is itself idempotent,
    so even the marker-gap residual window repairs itself — see the
    module docstring).  ``num_buckets`` is a TABLE constant — changing
    it on an existing snapshot strands rows in stale buckets; rebuild
    instead.  ``on_batch(batch_id, stats)`` is an observability hook.
    ``tombstones=N`` enables deleted-key tombstone retention for N
    folds (see :func:`fold_cdc_batch`)."""
    spark = stream_df.sparkSession

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        last = _read_last_batch_id(spark, path)
        if batch_id <= last:
            return
        stats = fold_cdc_batch(
            spark,
            path,
            batch_df,
            key_cols,
            seq_col=seq_col,
            op_col=op_col,
            num_buckets=num_buckets,
            on_late=on_late,
            table_exists=last >= 0,
            tombstones=tombstones,
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
