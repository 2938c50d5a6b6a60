"""Shared physical-layout helpers for the persisted maintenance tables
(rollup / SCD-2 / CDC snapshot).  The bucket function is the tables'
layout CONTRACT — scd and cdc snapshots written by one copy must be
read back by the same function, so there is exactly one definition."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def bucket_col(keys: Sequence[str], num_buckets: int):
    """Hash-bucket partition column over the key columns."""
    return F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(num_buckets))


def _fs_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf), p


def path_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence check (works for s3a://, hdfs://, local)."""
    fs, p = _fs_path(spark, path)
    return fs.exists(p)


def swap_directory(spark: SparkSession, tmp_dir: str, path: str) -> None:
    """Replace the directory at ``path`` with ``tmp_dir`` via the
    Hadoop FileSystem API, so the maintenance tables' swap works on
    every FS Spark can write (local, s3a://, hdfs://), not just local
    paths.  Same durability contract as
    ``lake_maintenance.upsert_corpus_snapshot``: the new content is
    fully written before the swap, so no reader ever sees a
    HALF-WRITTEN table — but the swap is two renames, so there is a
    brief window where the canonical path does not exist (a concurrent
    read fails cleanly and retries) and a crash between them leaves
    the complete old table at a ``.old-*`` sibling for manual
    recovery.  True atomic swap needs a table format's metadata
    pointer; this is the honest parquet-directory approximation.
    (On object stores rename is copy+delete, so the window is longer
    there — the same reason a table format is the real answer at
    deployment scale.)"""
    import uuid as _uuid

    jvm = spark.sparkContext._jvm
    fs, p = _fs_path(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(tmp_dir)
    old = jvm.org.apache.hadoop.fs.Path(
        path.rstrip("/") + f".old-{_uuid.uuid4().hex[:8]}"
    )
    if not fs.rename(p, old):
        raise IOError(f"swap_directory: rename {path} -> {old} failed")
    # the second rename can FAIL by returning false OR by throwing
    # (wrong-FS Path args, object-store IOException mid-copy) — both
    # paths must attempt the restore, or the canonical path is left
    # missing with no recovery guidance
    try:
        ok = fs.rename(tmp, p)
        err = None
    except Exception as exc:  # noqa: BLE001 - any JVM-side failure
        ok = False
        err = exc
    if not ok:
        # put the old table back so the canonical path is never left
        # dangling longer than necessary — and if even the restore
        # fails, say exactly where the surviving copy sits instead of
        # leaving the reader to discover a missing canonical path
        try:
            restored = fs.rename(old, p)
        except Exception:  # noqa: BLE001
            restored = False
        raise IOError(
            f"swap_directory: rename {tmp_dir} -> {path} failed"
            + (f" ({err})" if err is not None else "")
            + (
                ""
                if restored
                else (
                    f"; RESTORE ALSO FAILED — the complete old table "
                    f"survives at {old.toString()} and the new content "
                    f"at {tmp_dir}; the canonical path is missing until "
                    f"one is renamed back manually"
                )
            )
        )
    if not fs.delete(old, True):
        # non-fatal: the swap is complete; the leftover sibling only
        # wastes space and is named for manual cleanup
        import warnings

        warnings.warn(
            f"swap_directory: could not delete {old.toString()}; "
            f"stale sibling left behind",
            stacklevel=2,
        )


def parquet_has_data(spark: SparkSession, path: str) -> bool:
    """True when the table directory holds at least one parquet data
    file in a ``kb=`` bucket.  A table whose every row was deleted
    keeps its directory and marker but has no files left to infer a
    schema from — readers must treat it as a fresh table, not crash
    on schema inference."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return False
    jvm = spark.sparkContext._jvm
    glob = jvm.org.apache.hadoop.fs.Path(f"{path}/kb=*/*.parquet")
    statuses = fs.globStatus(glob)
    return statuses is not None and len(statuses) > 0
