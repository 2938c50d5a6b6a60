"""Bloom-filter FILE-SKIPPING index: per-file sidecar filters that
turn a point lookup over a 100 TB table into a read of the handful of
files that can possibly contain the value.

Parquet footers give min/max per column chunk — great for range
predicates on clustered columns, useless for equality on
high-cardinality unclustered ones (every file's [min, max] spans the
value).  The standard lakehouse answer is a per-file Bloom filter
(Parquet's own optional bloom, Delta/Iceberg file skipping); this
module builds one as a plain parquet SIDECAR dataset so the engine
needs no reader support: one row per (file, set bit position), ≤ m
rows per file, queried with an ordinary aggregation before the real
scan.

The filter construction is ``operators.sketches.bloom_cardinality``'s:
each of the ``k`` probe positions is a disjoint ``m_hex_digits``-char
substring of ``md5(value-as-string)`` — deterministic, engine-free,
and the lookup side can compute a value's positions anywhere (here:
driver-side ``hashlib.md5``, which matches Spark's ``md5`` on the
cast-to-string form by definition of md5).

Guarantees: NO FALSE NEGATIVES — a file containing the value always
has all k positions set, so it is never skipped; false positives
(reading a file that turns out not to match) cost only the pruned-scan
row filter.  NULLs set no positions (an IS NULL lookup is not a point
lookup — use the row filter).

Scale: the index build is one pass over the table (map-side distinct
combine per file); the sidecar is ≤ m rows/file (m = 16^m_hex_digits
bits), ~100k-row sidecars for multi-GB files; the lookup aggregates
the sidecar (pruned to k positions by a pushed-down IN filter) and
returns a file list — driver traffic is file names only.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _bloom_check(m_hex_digits: int, k: int) -> None:
    if not 1 <= m_hex_digits <= 8:
        raise ValueError(f"m_hex_digits must be 1..8; got {m_hex_digits}")
    if k < 1 or m_hex_digits * k > 32:
        raise ValueError(
            f"need k >= 1 and m_hex_digits * k <= 32; got k={k}"
        )


def value_positions(value, m_hex_digits: int = 4, k: int = 2) -> set[str]:
    """The k probe positions of ``value`` — the same hex substrings of
    ``md5(str(value))`` the index build computes with Spark's ``md5``
    on the cast-to-string column.  Pass the value in its column-cast
    string form (ints/strings round-trip identically; avoid float
    columns, whose string forms are engine-formatting territory)."""
    _bloom_check(m_hex_digits, k)
    h = hashlib.md5(str(value).encode("utf-8")).hexdigest()
    return {
        h[i * m_hex_digits : (i + 1) * m_hex_digits] for i in range(k)
    }


def build_bloom_file_index(
    spark: SparkSession,
    table_dir: str,
    col: str,
    index_dir: str,
    m_hex_digits: int = 4,
    k: int = 2,
) -> None:
    """One pass over ``table_dir``: for every parquet file, the
    DISTINCT bloom positions of ``col``'s values in that file, written
    to ``index_dir`` as ``(file string, _bf_pos string)``.  Rebuild
    (or build per new partition and append) after ingest — like any
    secondary index, a stale sidecar must never cover files it wasn't
    built from.  :func:`read_with_bloom` (and
    :func:`bloom_prune_files` when given the table dir) treats files
    absent from the sidecar as "may contain", preserving
    no-false-negatives under staleness; pruning just degrades for the
    uncovered files until the rebuild."""
    _bloom_check(m_hex_digits, k)
    df = (
        spark.read.parquet(table_dir)
        .select(F.col(col), F.input_file_name().alias("file"))
        .filter(F.col(col).isNotNull())
    )
    h = F.md5(F.col(col).cast("string"))
    positions = F.array(
        *[
            F.substring(h, 1 + i * m_hex_digits, m_hex_digits)
            for i in range(k)
        ]
    )
    (
        df.select("file", F.explode(positions).alias("_bf_pos"))
        .distinct()
        .write.mode("overwrite")
        .parquet(index_dir)
    )


def _norm_file_uri(p: str) -> str:
    """Normalize a file URI for set comparison: ``input_file_name()``
    (sidecar rows) and ``DataFrame.inputFiles`` (table listing) render
    the local scheme with different slash counts (``file:///x`` vs
    ``file:/x``)."""
    if p.startswith("file:"):
        return "file:///" + p[5:].lstrip("/")
    return p


def bloom_prune_files(
    spark: SparkSession,
    index_dir: str,
    value,
    m_hex_digits: int = 4,
    k: int = 2,
    table_dir: str | None = None,
) -> list[str]:
    """Files that MAY contain ``value``: those whose sidecar holds ALL
    of the value's probe positions — PLUS, when ``table_dir`` is given,
    every table file the sidecar does not cover at all.  A sidecar is
    stale the moment ingest lands a file after the build, and a point
    lookup that consulted only the sidecar would silently skip such
    files — a false NEGATIVE, the one failure mode a Bloom index must
    never have.  Unknown files are therefore "may contain" by
    definition; callers that pass no ``table_dir`` get the raw
    sidecar-only candidate list and own the staleness contract
    themselves.

    The position IN filter pushes into the sidecar scan; the
    aggregation output is one row per candidate file.  The staleness
    check costs one more aggregation over the (small) sidecar for its
    covered-file set plus the table's file LISTING (metadata only —
    ``DataFrame.inputFiles`` comes from the file index, no data scan)."""
    want = value_positions(value, m_hex_digits, k)
    sidecar = spark.read.parquet(index_dir)
    rows = (
        sidecar.filter(F.col("_bf_pos").isin(sorted(want)))
        .groupBy("file")
        .agg(F.countDistinct("_bf_pos").alias("_bf_hits"))
        .filter(F.col("_bf_hits") == len(want))
        .select("file")
        .collect()
    )
    files = {r["file"] for r in rows}
    if table_dir is not None:
        covered = {
            _norm_file_uri(r["file"])
            for r in sidecar.select("file").distinct().collect()
        }
        files |= {
            f
            for f in spark.read.parquet(table_dir).inputFiles()
            if _norm_file_uri(f) not in covered
        }
    return sorted(files)


def read_with_bloom(
    spark: SparkSession,
    table_dir: str,
    index_dir: str,
    col: str,
    value,
    m_hex_digits: int = 4,
    k: int = 2,
) -> DataFrame:
    """Point lookup through the index: prune to candidate files (table
    files the sidecar doesn't cover are always candidates — a stale
    index must never skip a freshly-landed file), scan only those,
    apply the exact equality filter (false positives die here).  Zero
    candidate files short-circuits to an empty DataFrame with the
    table's schema — no scan at all."""
    files = bloom_prune_files(
        spark, index_dir, value, m_hex_digits, k, table_dir=table_dir
    )
    schema_df = spark.read.parquet(table_dir)
    if not files:
        return spark.createDataFrame([], schema_df.schema)
    return spark.read.schema(schema_df.schema).parquet(*files).filter(
        F.col(col) == F.lit(value)
    )
