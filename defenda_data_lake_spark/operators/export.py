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


def _sort_key(order: str, salt: str, id_col: str) -> F.Column:
    """ONE definition of the intra-shard order for the full export AND
    the incremental fold — two copies could silently stop increments
    being byte-identical to full re-exports."""
    if order == "hash":
        return F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return F.col(id_col)


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
    "id_col", "order", "columns", "schema", "compression",
    "shards": {shard: n_rows}}`` — the manifest is the layout
    AUTHORITY: `incremental_export_jsonl` takes every parameter,
    including column types and the compression codec, from it.

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
    writer = (
        tagged.withColumn("_ord", _sort_key(order, salt, id_col))
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
        "schema": [[f.name, f.dataType.simpleString()] for f in df.schema.fields],
        "compression": compression,
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



def incremental_export_jsonl(
    spark,
    delta: DataFrame,
    out_dir: str,
    id_col: str | None = None,
    if_exists: str = "error",
) -> dict:
    """Fold a DELTA of new documents into an existing
    :func:`export_jsonl_shards` shard set — the nightly form: corpus
    growth re-materializes ONLY the shards the new ids hash into,
    never the whole export.

    The export layout (salt, n_shards, order, column NAMES AND TYPES,
    compression codec) comes from the shard set's own
    ``_manifest.json``, so an increment can never silently fork it: a
    delta whose columns or types disagree raises up front, and the
    read-back schema is built from the MANIFEST (a delta-derived
    schema would silently re-type or null out old rows).  Mechanics
    per call:

    * tag the delta with the manifest's deterministic shard
      assignment — membership is content-addressed, so a doc lands in
      the same shard a full export would have put it in;
    * read back ONLY the touched ``shard=N`` directories that EXIST
      (partitionBy never creates empty-shard dirs, so a shard can be
      manifest-known but directory-absent), reject any delta id
      already present (append-only contract, enforced — a retried
      nightly job must fail loudly, not double rows), union, restore
      the deterministic intra-shard order (the SHARED ``_sort_key``),
      and dynamic-partition-overwrite just those directories (the
      streaming-CDC touched-bucket pattern);
    * fold the per-shard counts into the manifest additively.

    The result is IDENTICAL to re-running the full export over the
    union — file-for-file, line-for-line (gzip included: zero-MTIME
    headers + pinned order; parity test reads the bytes back).  Cost
    is O(delta + touched shards); untouched shards are neither read
    nor written.

    Legacy manifests (pre ``schema``/``compression`` keys) degrade to
    the name-only column check and a filename sniff for the codec.

    ``if_exists``: ``"error"`` (default) raises on ANY delta id
    already exported; ``"verify-noop"`` returns a no-op report with
    ``"replayed": True`` when the ENTIRE delta is already present —
    the self-healing redelivery mode ``streaming/export.py`` folds
    with (a partial overlap is never a replay and still raises).

    Returns ``{"appended", "touched_shards", "total_rows"}``."""
    from urllib.parse import urlparse

    if if_exists not in ("error", "verify-noop"):
        raise ValueError(
            f"if_exists must be 'error' or 'verify-noop' (got {if_exists!r})"
        )
    is_uri = bool(urlparse(out_dir).scheme)
    manifest_path = out_dir.rstrip("/") + "/_manifest.json"
    if is_uri:
        manifest = json.loads(_read_text_hadoop(spark, manifest_path))
    else:
        with open(manifest_path) as fh:
            manifest = json.load(fh)
    id_col = id_col or manifest["id_col"]
    if id_col != manifest["id_col"]:
        raise ValueError(
            f"id_col {id_col!r} != manifest id_col {manifest['id_col']!r}"
        )
    cols = manifest["columns"]
    missing = [c for c in cols if c not in delta.columns]
    extra = [c for c in delta.columns if c not in cols]
    problems = []
    if missing or extra:
        problems.append(f"missing {missing}, extra {extra}")
    m_schema = manifest.get("schema")
    if m_schema and not missing:
        delta_types = {
            f.name: f.dataType.simpleString()
            for f in delta.select(*cols).schema.fields
        }
        bad_types = [
            (n, t, delta_types[n]) for n, t in m_schema if delta_types[n] != t
        ]
        if bad_types:
            problems.append(
                "type mismatches (col, manifest, delta): " + str(bad_types)
            )
    if problems:
        raise ValueError(
            "delta disagrees with the manifest: "
            + "; ".join(problems)
            + " (an increment cannot fork the export layout)"
        )
    n_shards, salt, order = (
        manifest["n_shards"],
        manifest["salt"],
        manifest["order"],
    )

    tagged = delta.select(*cols).withColumn(
        SHARD_COL, shard_assignment(id_col, n_shards, salt)
    )
    agg_rows = (
        tagged.groupBy(SHARD_COL)
        .agg(
            F.count("*").alias("n"),
            # equal ids hash to the SAME shard, so per-shard distinct
            # counts sum to the global one — the internal-duplicate
            # check rides the aggregation the fold already pays
            F.countDistinct(id_col).alias("nd"),
        )
        .collect()
    )
    delta_counts = {int(r[SHARD_COL]): int(r["n"]) for r in agg_rows}
    if sum(r["n"] for r in agg_rows) != sum(r["nd"] for r in agg_rows):
        raise ValueError(
            "delta contains duplicate ids within the batch (append-only "
            "contract: each id exports exactly once)"
        )
    if not delta_counts:
        return {
            "appended": 0,
            "touched_shards": [],
            "total_rows": manifest["total_rows"],
        }
    touched = sorted(delta_counts)

    # read back ONLY the touched shards that exist on disk, with the
    # MANIFEST's schema (legacy manifests: the delta's, already
    # name-checked)
    if m_schema:
        ddl = ", ".join(f"`{n}` {t}" for n, t in m_schema)
        schema = spark.createDataFrame([], ddl).schema
    else:
        schema = delta.select(*cols).schema
    shard_dirs = [
        out_dir.rstrip("/") + f"/{SHARD_COL}={s}" for s in touched
    ]
    existing = [
        p for p in shard_dirs if _dir_exists(spark, p, is_uri)
    ]
    if existing:
        old = spark.read.schema(schema).json(existing)
    else:
        old = spark.createDataFrame([], schema)
    overlap = (
        old.select(id_col)
        .distinct()
        .join(tagged.select(id_col).distinct(), id_col)
        .count()
    )
    if overlap:
        n_delta_ids = tagged.select(id_col).distinct().count()
        if if_exists == "verify-noop" and overlap == n_delta_ids:
            # the WHOLE delta is already exported: this is a replayed
            # fold (e.g. a streaming crash between the shard write and
            # the batch marker) — already applied, nothing to do.  A
            # PARTIAL overlap is never a replay and still raises.
            return {
                "appended": 0,
                "touched_shards": [],
                "total_rows": manifest["total_rows"],
                "replayed": True,
            }
        raise ValueError(
            "delta contains ids already exported (append-only contract; "
            "a retried job must not double rows — re-export instead)"
        )
    merged = old.withColumn(
        SHARD_COL, shard_assignment(id_col, n_shards, salt)
    ).unionByName(tagged)
    writer = (
        merged.withColumn("_ord", _sort_key(order, salt, id_col))
        .repartition(len(touched), SHARD_COL)
        .sortWithinPartitions(SHARD_COL, "_ord", id_col)
        .drop("_ord")
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
    )
    if "compression" in manifest:
        compression = manifest["compression"]
    else:
        compression = (
            "gzip"
            if not existing or _shards_gzipped(spark, existing[0], is_uri)
            else None
        )
    if compression:
        writer = writer.option("compression", compression)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        writer.json(out_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    appended = sum(delta_counts.values())
    for s, n in delta_counts.items():
        manifest["shards"][str(s)] = manifest["shards"].get(str(s), 0) + n
    manifest["total_rows"] += appended
    _write_text(
        spark,
        out_dir,
        "_manifest.json",
        json.dumps(manifest, indent=2, sort_keys=True),
    )
    return {
        "appended": appended,
        "touched_shards": touched,
        "total_rows": manifest["total_rows"],
    }


def _dir_exists(spark, path: str, is_uri: bool) -> bool:
    if not is_uri:
        return os.path.isdir(path)
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()).exists(p)


def _shards_gzipped(spark, shard_dir: str, is_uri: bool) -> bool:
    """Legacy-manifest codec sniff over an EXISTING shard directory
    (new manifests record ``compression`` and never get here)."""
    import glob

    if not is_uri:
        return any(
            p.endswith(".gz") for p in glob.glob(os.path.join(shard_dir, "part-*"))
        )
    jvm = spark._jvm
    d = jvm.org.apache.hadoop.fs.Path(shard_dir)
    fs = d.getFileSystem(spark._jsc.hadoopConfiguration())
    return any(
        st.getPath().getName().endswith(".gz") for st in fs.listStatus(d)
    )


def _read_text_hadoop(spark, path: str) -> str:
    """UTF-8 file contents via the Hadoop FS API (the
    streaming/rollup marker-reader pattern: a py4j ``bytearray``
    passed to ``InputStream.read`` is copied by VALUE, so the Python
    buffer never fills — read through a Java-side BufferedReader
    instead)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(p)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        lines = []
        while True:
            line = reader.readLine()
            if line is None:
                break
            lines.append(line)
        return "\n".join(lines)
    finally:
        stream.close()
