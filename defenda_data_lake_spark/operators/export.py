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


def _id_hash_agg(id_col: str) -> F.Column:
    """Per-shard membership checksum aggregate: ``bit_xor`` of
    ``xxhash64(id)``.  Order-insensitive (XOR commutes), so it is
    stable across partitioning/AQE re-plans, and XOR-foldable: an
    append-only increment updates it as ``old ^ delta`` without
    re-reading the shard.  An empty shard's checksum is 0 (the XOR
    identity)."""
    return F.expr(f"bit_xor(xxhash64(cast(`{id_col}` as string)))")


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
    agg_rows = (
        tagged.groupBy(SHARD_COL)
        .agg(F.count("*").alias("n"), _id_hash_agg(id_col).alias("h"))
        .collect()
    )
    counts = {int(r[SHARD_COL]): int(r["n"]) for r in agg_rows}
    hashes = {int(r[SHARD_COL]): int(r["h"]) for r in agg_rows}
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
        # per-shard membership checksum (bit_xor of xxhash64(id)): a
        # reader can detect a torn/partial shard rewrite by recomputing
        # it (verify_export).  XOR is order-insensitive and, because
        # increments are append-only with disjoint ids, the fold is
        # new = old XOR delta — the checksum rides the count agg.
        "id_hashes": {str(s): hashes.get(s, 0) for s in range(n_shards)},
    }
    _write_text(
        df.sparkSession,
        out_dir,
        "_manifest.json",
        json.dumps(manifest, indent=2, sort_keys=True),
    )
    return manifest


def _load_manifest(spark, out_dir: str) -> tuple[dict, bool]:
    """Read ``_manifest.json`` for an export dir (local path or URI).
    ONE definition — the fold, the repair, and the audit must all parse
    the same manifest the same way, or an audit could check a different
    layout than the fold wrote."""
    from urllib.parse import urlparse

    is_uri = bool(urlparse(out_dir).scheme)
    manifest_path = out_dir.rstrip("/") + "/_manifest.json"
    if is_uri:
        manifest = json.loads(_read_text_hadoop(spark, manifest_path))
    else:
        with open(manifest_path) as fh:
            manifest = json.load(fh)
    return manifest, is_uri


def _sniff_compression(spark, manifest: dict, existing: list, out_dir: str,
                       is_uri: bool):
    """Codec for a fold's shard write: the manifest's recorded codec
    when present; for legacy manifests, sniff an EXISTING shard dir —
    any one in the whole export, not just the touched ones (a delta
    touching only a previously-empty shard must not fork a plain-JSON
    export to gzip).  ONE definition shared by the fold and the repair
    so a sniff fix can't drift between them."""
    if "compression" in manifest:
        return manifest["compression"]
    probe = existing or _any_shard_dirs(spark, out_dir, is_uri, limit=1)
    return (
        "gzip"
        if not probe or _shards_gzipped(spark, probe[0], is_uri)
        else None
    )


def _apply_manifest_counts(
    spark,
    manifest: dict,
    expected: dict[int, tuple[int, int]],
    out_dir: str,
) -> list[int]:
    """Set each shard's manifest row count and id checksum to the
    ``expected`` ``{shard: (rows, id_hash)}`` values, adjusting
    ``total_rows`` by the difference, and rewrite ``_manifest.json``
    only if anything changed.  ONE definition of the
    count/checksum/total_rows invariant, shared by the replay
    reconcile and the torn-fold repair.  Returns the changed shards,
    sorted."""
    reconciled: list[int] = []
    for s, (n_new, h_new) in expected.items():
        changed = False
        if manifest["shards"].get(str(s), 0) != n_new:
            manifest["total_rows"] += n_new - manifest["shards"].get(str(s), 0)
            manifest["shards"][str(s)] = n_new
            changed = True
        if (
            "id_hashes" in manifest
            and manifest["id_hashes"].get(str(s), 0) != h_new
        ):
            manifest["id_hashes"][str(s)] = h_new
            changed = True
        if changed:
            reconciled.append(s)
    if reconciled:
        _write_text(
            spark,
            out_dir,
            "_manifest.json",
            json.dumps(manifest, indent=2, sort_keys=True),
        )
    return sorted(reconciled)


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

    Durability: the shard write and the manifest write are two steps.
    A crash BETWEEN them leaves correct shard data with a stale
    (undercounting) manifest — the next ``verify-noop`` redelivery of
    the same delta detects this and REWRITES the manifest from the
    observed shard contents (counts + membership checksums), so a
    replay reconciles metadata, not just data.  A crash DURING the
    multi-shard dynamic overwrite can commit some touched shards and
    not others; every later redelivery then sees a partial overlap and
    raises — use :func:`repair_incremental_export` with the same delta
    to finish the fold shard-by-shard and reconcile the manifest.

    Returns ``{"appended", "touched_shards", "total_rows"}`` (plus
    ``"replayed": True`` and ``"reconciled_shards"`` on a self-healed
    redelivery)."""
    if if_exists not in ("error", "verify-noop"):
        raise ValueError(
            f"if_exists must be 'error' or 'verify-noop' (got {if_exists!r})"
        )
    p = _prepare_fold(spark, delta, out_dir, id_col)
    manifest, is_uri, id_col = p["manifest"], p["is_uri"], p["id_col"]
    n_shards, salt, order = p["n_shards"], p["salt"], p["order"]
    tagged, schema = p["tagged"], p["schema"]
    delta_counts, delta_hashes = p["delta_counts"], p["delta_hashes"]
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
        # _prepare_fold already raised unless the delta's ids are
        # internally distinct, so the distinct-id total IS the row
        # total — no extra delta-sized job on the recovery path
        n_delta_ids = sum(delta_counts.values())
        if if_exists == "verify-noop" and overlap == n_delta_ids:
            # the WHOLE delta is already exported: this is a replayed
            # fold (e.g. a streaming crash between the shard write and
            # the batch marker) — the shard DATA is already applied.
            # The crash may also have hit the window between the shard
            # write and the MANIFEST write, leaving the manifest
            # undercounting rows this replay proves are on disk — so
            # reconcile the touched shards' manifest entries against
            # their observed contents before declaring the no-op
            # (the manifest is the layout authority; a replay must
            # heal metadata, not just skip the data).  A PARTIAL
            # overlap is never a replay and still raises.
            reconciled = _reconcile_manifest_from_observed(
                spark, manifest, old, id_col, n_shards, salt, touched,
                out_dir,
            )
            return {
                "appended": 0,
                "touched_shards": [],
                "total_rows": manifest["total_rows"],
                "replayed": True,
                "reconciled_shards": reconciled,
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
    compression = _sniff_compression(spark, manifest, existing, out_dir, is_uri)
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
    if "id_hashes" in manifest:
        # disjoint ids → the membership checksum folds as XOR
        for s, h in delta_hashes.items():
            manifest["id_hashes"][str(s)] = (
                manifest["id_hashes"].get(str(s), 0) ^ h
            )
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


def _prepare_fold(spark, delta: DataFrame, out_dir: str, id_col: str | None):
    """Shared head of the incremental fold and the repair path: load
    the manifest, enforce the layout contract (column names AND
    types), tag the delta with the manifest's shard assignment, and
    run the ONE delta-sized aggregation (per-shard counts, the
    internal-duplicate check, and the membership checksum all ride
    it)."""
    manifest, is_uri = _load_manifest(spark, out_dir)
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
            _id_hash_agg(id_col).alias("h"),
        )
        .collect()
    )
    delta_counts = {int(r[SHARD_COL]): int(r["n"]) for r in agg_rows}
    delta_hashes = {int(r[SHARD_COL]): int(r["h"]) for r in agg_rows}
    if sum(r["n"] for r in agg_rows) != sum(r["nd"] for r in agg_rows):
        raise ValueError(
            "delta contains duplicate ids within the batch (append-only "
            "contract: each id exports exactly once)"
        )
    if m_schema:
        ddl = ", ".join(f"`{n}` {t}" for n, t in m_schema)
        schema = spark.createDataFrame([], ddl).schema
    else:
        schema = delta.select(*cols).schema
    return {
        "manifest": manifest,
        "is_uri": is_uri,
        "id_col": id_col,
        "cols": cols,
        "schema": schema,
        "n_shards": n_shards,
        "salt": salt,
        "order": order,
        "tagged": tagged,
        "delta_counts": delta_counts,
        "delta_hashes": delta_hashes,
    }


def _reconcile_manifest_from_observed(
    spark,
    manifest: dict,
    old: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str,
    touched: list[int],
    out_dir: str,
) -> list[int]:
    """Compare the manifest's entries for ``touched`` shards against
    the shards' OBSERVED contents (``old`` = the read-back of the
    existing touched shard dirs) and rewrite ``_manifest.json`` if any
    disagree — mutates ``manifest`` in place and returns the shard ids
    that needed reconciling.  One small aggregation over the already-
    read touched shards; only runs on the rare replay/repair paths."""
    observed = {
        int(r[SHARD_COL]): (int(r["n"]), int(r["h"]))
        for r in (
            old.groupBy(
                shard_assignment(id_col, n_shards, salt).alias(SHARD_COL)
            )
            .agg(F.count("*").alias("n"), _id_hash_agg(id_col).alias("h"))
            .collect()
        )
    }
    return _apply_manifest_counts(
        spark,
        manifest,
        {s: observed.get(s, (0, 0)) for s in touched},
        out_dir,
    )


def verify_export(spark, out_dir: str) -> dict:
    """Audit a shard set against its manifest: recompute every
    existing shard's row count and membership checksum in ONE pass and
    compare with the manifest's.  Detects torn dynamic overwrites,
    manifests stranded by a crash-before-manifest-write, hand-edited
    shard files, and phantom shard dirs outside the manifest's
    ``n_shards`` range (reported as rows ``(0, observed)``).  Returns
    ``{"ok": bool, "mismatches":
    {shard: {"rows": (manifest, observed), "id_hash": (manifest,
    observed)}}}`` (a key is present only when that field disagrees;
    legacy manifests without ``id_hashes`` check counts only)."""
    manifest, _is_uri = _load_manifest(spark, out_dir)
    id_col = manifest["id_col"]
    m_schema = manifest.get("schema")
    reader = spark.read
    if m_schema:
        ddl = (
            ", ".join(f"`{n}` {t}" for n, t in m_schema)
            + f", `{SHARD_COL}` int"
        )
        reader = reader.schema(ddl)
    observed = {
        int(r[SHARD_COL]): (int(r["n"]), int(r["h"]))
        for r in (
            reader.json(out_dir)
            .groupBy(SHARD_COL)
            .agg(F.count("*").alias("n"), _id_hash_agg(id_col).alias("h"))
            .collect()
        )
    }
    mismatches: dict[str, dict] = {}
    for s in range(manifest["n_shards"]):
        n_obs, h_obs = observed.get(s, (0, 0))
        bad = {}
        n_man = manifest["shards"].get(str(s), 0)
        if n_man != n_obs:
            bad["rows"] = (n_man, n_obs)
        if "id_hashes" in manifest:
            h_man = manifest["id_hashes"].get(str(s), 0)
            if h_man != h_obs:
                bad["id_hash"] = (h_man, h_obs)
        if bad:
            mismatches[str(s)] = bad
    # shard dirs OUTSIDE the manifest's range are phantom data (a bad
    # restore, or a differently-sharded export crashed into the same
    # out_dir): every consumer reading out_dir sees their rows, so a
    # clean verdict would be a lie
    for s in sorted(set(observed) - set(range(manifest["n_shards"]))):
        n_obs, h_obs = observed[s]
        bad = {"rows": (0, n_obs)}
        if "id_hashes" in manifest:
            bad["id_hash"] = (0, h_obs)
        mismatches[str(s)] = bad
    return {"ok": not mismatches, "mismatches": mismatches}


def repair_incremental_export(
    spark,
    delta: DataFrame,
    out_dir: str,
    id_col: str | None = None,
) -> dict:
    """Recover a shard set wedged by a crash DURING an incremental
    fold's multi-shard dynamic overwrite: some touched shards
    committed (old rows + their delta slice), others did not (old rows
    only), and the manifest was never rewritten — every subsequent
    redelivery of the delta then sees a partial overlap and raises.

    Given the SAME delta, this finishes the fold shard-by-shard and
    idempotently:

    * a touched shard whose delta slice is FULLY present is left
      untouched (its manifest entry is reconciled from the observed
      contents);
    * a touched shard with NO delta ids gets the standard fold
      (old ∪ slice, deterministic re-sort, single-shard overwrite);
    * a shard containing only PART of its delta slice is corrupt
      beyond shard-level repair (dynamic partition overwrite commits
      whole directories) and raises — re-export from the source of
      truth.

    The result is byte-identical to the fold having succeeded.
    Returns ``{"applied_shards", "already_applied_shards",
    "reconciled_shards", "total_rows"}``."""
    p = _prepare_fold(spark, delta, out_dir, id_col)
    manifest, is_uri, id_col = p["manifest"], p["is_uri"], p["id_col"]
    n_shards, salt, order = p["n_shards"], p["salt"], p["order"]
    tagged, schema = p["tagged"], p["schema"]
    delta_counts, delta_hashes = p["delta_counts"], p["delta_hashes"]
    touched = sorted(delta_counts)
    if not touched:
        return {
            "applied_shards": [],
            "already_applied_shards": [],
            "reconciled_shards": [],
            "total_rows": manifest["total_rows"],
        }
    shard_dirs = [out_dir.rstrip("/") + f"/{SHARD_COL}={s}" for s in touched]
    existing = [d for d in shard_dirs if _dir_exists(spark, d, is_uri)]
    if existing:
        old = spark.read.schema(schema).json(existing)
    else:
        old = spark.createDataFrame([], schema)
    old_tag = old.withColumn(
        SHARD_COL, shard_assignment(id_col, n_shards, salt)
    )
    # ONE pass over the touched shards: per-shard old count, how many
    # old rows are delta ids (the overlap), and the old checksum
    stats = {
        int(r[SHARD_COL]): (int(r["n"]), int(r["ov"]), int(r["h"]))
        for r in (
            old_tag.join(
                tagged.select(F.col(id_col), F.lit(1).alias("_in_delta")),
                id_col,
                "left",
            )
            .groupBy(SHARD_COL)
            .agg(
                F.count("*").alias("n"),
                F.sum(F.coalesce(F.col("_in_delta"), F.lit(0))).alias("ov"),
                _id_hash_agg(id_col).alias("h"),
            )
            .collect()
        )
    }
    applied, unapplied = [], []
    for s in touched:
        n_old, ov, _h = stats.get(s, (0, 0, 0))
        if ov == 0:
            unapplied.append(s)
        elif ov == delta_counts[s]:
            applied.append(s)
        else:
            raise ValueError(
                f"shard {s} contains {ov} of its {delta_counts[s]} delta "
                "ids — a partial shard is corrupt beyond shard-level "
                "repair (dynamic overwrite commits whole directories); "
                "re-export from the source of truth"
            )
    if unapplied:
        merged = old_tag.filter(F.col(SHARD_COL).isin(unapplied)).unionByName(
            tagged.filter(F.col(SHARD_COL).isin(unapplied))
        )
        writer = (
            merged.withColumn("_ord", _sort_key(order, salt, id_col))
            .repartition(len(unapplied), SHARD_COL)
            .sortWithinPartitions(SHARD_COL, "_ord", id_col)
            .drop("_ord")
            .write.mode("overwrite")
            .partitionBy(SHARD_COL)
        )
        compression = _sniff_compression(
            spark, manifest, existing, out_dir, is_uri
        )
        if compression:
            writer = writer.option("compression", compression)
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            writer.json(out_dir)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # reconcile the manifest for EVERY touched shard from what is now
    # on disk: already-applied shards report their observed contents;
    # just-applied shards fold old + delta
    expected: dict[int, tuple[int, int]] = {}
    for s in touched:
        n_old, _ov, h_old = stats.get(s, (0, 0, 0))
        if s in applied:
            expected[s] = (n_old, h_old)
        else:
            expected[s] = (n_old + delta_counts[s], h_old ^ delta_hashes[s])
    reconciled = _apply_manifest_counts(spark, manifest, expected, out_dir)
    return {
        "applied_shards": unapplied,
        "already_applied_shards": applied,
        "reconciled_shards": reconciled,
        "total_rows": manifest["total_rows"],
    }


def _any_shard_dirs(spark, out_dir: str, is_uri: bool, limit: int) -> list[str]:
    """Up to ``limit`` existing ``shard=N`` directories anywhere in the
    export (legacy-manifest codec sniffing — ONE directory listing,
    not an n_shards-sized existence probe)."""
    if not is_uri:
        names = sorted(
            n
            for n in (os.listdir(out_dir) if os.path.isdir(out_dir) else [])
            if n.startswith(f"{SHARD_COL}=")
        )
        return [os.path.join(out_dir, n) for n in names[:limit]]
    jvm = spark._jvm
    d = jvm.org.apache.hadoop.fs.Path(out_dir)
    fs = d.getFileSystem(spark._jsc.hadoopConfiguration())
    out = sorted(
        str(st.getPath())
        for st in fs.listStatus(d)
        if st.isDirectory()
        and st.getPath().getName().startswith(f"{SHARD_COL}=")
    )
    return out[:limit]


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
