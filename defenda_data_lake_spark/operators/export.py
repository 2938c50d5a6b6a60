"""Training-shard export: corpus → deterministic JSONL shards.

The last step of every curation pipeline is materializing the cleaned
corpus as *shards* a training loader can stream: bounded-size files,
stable membership, stable intra-shard order, and a manifest the loader
(and the audit trail) can trust.  ``df.write.json`` alone gives none of
that: file membership follows whatever partitioning the plan happened
to end with, so a re-run after a repartition or an AQE re-plan scatters
rows differently and no two exports are comparable.

Design (Spark-first, 100 TB-minded):

* **Deterministic membership**: shard = ``md5(salt || id) % n_shards``
  — content-addressed, engine-independent (same scheme as
  ``operators.sampling``), so a row lands in the same shard on every
  run, cluster, and engine.  Choosing ``n_shards`` sets shard size;
  at 100 TB you pick ``total_rows / records_per_shard`` and the write
  is one hash-partitioned pass, no global sort.
* **Deterministic order**: rows sort by id *within* each shard
  (``repartition(shard) + sortWithinPartitions``) — a local sort per
  task, never a global one.
* **One file per shard**: the writer partitions the output directory
  by ``shard=N``; because the data is hash-partitioned ON the shard
  column first, each shard's rows live in exactly one task, hence one
  file per shard directory.
* **Manifest**: per-shard row counts (and the chosen salt/columns) are
  computed with one small aggregation and written as
  ``_manifest.json`` next to the shards (underscore-prefixed so
  Hadoop-convention readers and partition discovery skip it as a
  non-data file).

Gzip output is reproducible byte-for-byte: Hadoop's gzip codec writes
a zero MTIME header, and the row order is pinned.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARD_COL = "shard"


def shard_assignment(id_col: str, n_shards: int, salt: str = "shard") -> F.Column:
    """Deterministic shard id in ``[0, n_shards)`` from ``md5(salt ||
    id)`` — first 8 hex chars → int, modulo.  Pure codegen expression,
    replayable in any engine with md5."""
    hexpart = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
    )
    return (F.conv(hexpart, 16, 10).cast("long") % n_shards).cast("int")


def export_jsonl_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str,
    n_shards: int,
    salt: str = "shard",
    compression: str | None = "gzip",
    order: str = "id",
) -> dict:
    """Export ``df`` as ``n_shards`` deterministic JSONL shards under
    ``out_dir`` (``shard=N/part-*.json[.gz]``) plus a ``_manifest.json``
    (underscore-prefixed: Hadoop-convention readers treat it as a
    hidden non-data file, so foreign engines' partition inference
    never ingests it).

    ``order`` controls the intra-shard row order: ``"id"`` (sorted by
    ``id_col`` — compact, mergeable) or ``"hash"`` (sorted by
    ``md5(salt || id)`` — a deterministic pseudo-shuffle, the standard
    prep for training loaders that read shards sequentially and must
    not see the corpus in insertion order).  Both are local sorts per
    shard task, never global.

    Returns the manifest dict: ``{"n_shards", "total_rows", "salt",
    "id_col", "order", "columns", "shards": {shard: n_rows}}``.

    Two jobs total: the per-shard count aggregation (rows = n_shards)
    and the partitioned write.  The corpus is shuffled exactly once, on
    the shard key."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1 (got {n_shards})")
    if order not in ("id", "hash"):
        raise ValueError(f"order must be 'id' or 'hash' (got {order!r})")
    tagged = df.withColumn(SHARD_COL, shard_assignment(id_col, n_shards, salt))
    counts = {
        int(r[SHARD_COL]): int(r["n"])
        for r in tagged.groupBy(SHARD_COL).agg(F.count("*").alias("n")).collect()
    }
    if order == "hash":
        sort_key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    else:
        sort_key = F.col(id_col)
    writer = (
        tagged.withColumn("_ord", sort_key)
        .repartition(n_shards, SHARD_COL)
        .sortWithinPartitions(SHARD_COL, "_ord", id_col)
        .drop("_ord")
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(out_dir)
    manifest = {
        "n_shards": n_shards,
        "total_rows": sum(counts.values()),
        "salt": salt,
        "id_col": id_col,
        "order": order,
        "columns": [c for c in df.columns],
        "shards": {str(s): counts.get(s, 0) for s in range(n_shards)},
    }
    _write_text(
        df.sparkSession,
        out_dir,
        "_manifest.json",
        json.dumps(manifest, indent=2, sort_keys=True),
    )
    return manifest


def _write_text(spark, out_dir: str, name: str, text: str) -> None:
    """Write a small sidecar file next to the shards.  Local paths use
    plain ``open``; URI paths (s3a://, hdfs://, …) go through the
    Hadoop FileSystem API so the manifest lands wherever the shards
    did — a local-only ``open`` would throw AFTER the expensive corpus
    write and leave the export without its audit manifest."""
    from urllib.parse import urlparse

    if not urlparse(out_dir).scheme:
        with open(os.path.join(out_dir, name), "w") as f:
            f.write(text)
        return
    jvm = spark._jvm
    jsc = spark._jsc
    conf = jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(out_dir.rstrip("/") + "/" + name)
    fs = hpath.getFileSystem(conf)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_jsonl_shards(spark, out_dir: str, shards: list[int] | None = None):
    """Read an exported shard set back (all shards, or a subset by
    shard id — partition pruning keeps unrequested shards unread)."""
    df = spark.read.option("recursiveFileLookup", "false").json(out_dir)
    if shards is not None:
        df = df.filter(F.col(SHARD_COL).isin([int(s) for s in shards]))
    return df
