"""Input-parallelism guard for compute-heavy operators.

A small dimension table often arrives as ONE parquet file → one input
partition → one task, strangling any operator whose per-row cost is
non-trivial (shingle generation, signature hashing, vector math).  At
100 TB inputs are naturally multi-split, but medium inputs (a few
hundred MB in one file) hit exactly this; the guard buys full-cluster
parallelism for one cheap round-robin shuffle of the small input.

Only used inside operators with heavy per-row compute — plain scans and
aggregations are left to Spark's split planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition when the plan's input parallelism is
    below (by default) the cluster's default parallelism.

    Checks driver-side file metadata (``df.inputFiles()``) first, so
    the common parquet-backed case never converts the plan to an RDD
    (``df.rdd.getNumPartitions()`` forces an extra plan translation per
    call — a measurable fixed cost on sub-second queries).  Plans with
    no file leaves (``createDataFrame``, post-shuffle inputs) fall back
    to the accurate RDD partition count rather than being repartitioned
    blindly — an input already at or above the target must pass through
    untouched (repartitioning it would add a full shuffle AND could
    reduce its parallelism).  File count under-estimates split count
    for files larger than ``maxPartitionBytes``, but any input that
    large is already parallel enough for the guard to be a no-op by
    intent."""
    import os

    try:
        target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    except Exception:
        # Spark Connect sessions don't expose sparkContext
        target = min_partitions or int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if 0 < target <= n_files:
        return df
    if n_files == 0:
        try:
            if df.rdd.getNumPartitions() >= target > 0:
                return df
        except Exception:
            pass  # Spark Connect: no RDD access; fall through and spread
    return df.repartition(target)


def _input_bytes(df: DataFrame) -> int | None:
    """Driver-visible total size of the plan's input files, or ``None``
    when it can't be determined cheaply (non-local filesystems, virtual
    plans).  Local-path stat only — no filesystem RPCs."""
    import os
    from urllib.parse import unquote, urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file"):
            return None
        try:
            total += os.path.getsize(unquote(parsed.path))
        except OSError:
            return None
    return total


def scaled_keyed_partitions(
    df: DataFrame,
    expansion: float = 8.0,
    bytes_per_task: int = 8 << 20,
    cap_multiple: int = 4,
) -> int:
    """Partition count for an *explicit* keyed ``repartition`` feeding a
    CPU-dense stage (pair-expansion joins, signature kernels).

    An explicit repartition is exempt from AQE coalescing — that is the
    point (AQE's byte-based view would funnel a small-in-bytes but
    CPU-heavy shuffle into one task) — but it also means a flat
    ``defaultParallelism`` count over-partitions tiny inputs, paying
    ~10-20 ms of scheduling per empty-ish task.  Scale the count with
    the driver-visible input size instead: ``input_bytes * expansion /
    bytes_per_task``, clamped to [defaultParallelism / 2, cap_multiple *
    defaultParallelism].  When input size is unknown (object stores,
    computed inputs), fall back to ``defaultParallelism`` — on a real
    cluster that is the sane default, and the clamp keeps the count
    proportional to the cluster everywhere."""
    import os

    try:
        par = df.sparkSession.sparkContext.defaultParallelism
    except Exception:
        par = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    size = _input_bytes(df)
    if size is None:
        return par
    want = int(size * expansion // bytes_per_task) + 1
    return max(min(want, cap_multiple * par), max(par // 2, 1))
