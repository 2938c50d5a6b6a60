"""Deterministic training-shard export (operators/export.py)."""

import glob
import gzip
import json
import os

from defenda_data_lake_spark.operators.export import (
    export_jsonl_shards,
    read_jsonl_shards,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_export_shards_membership_and_manifest(spark, tmp_path):
    out = str(tmp_path / "shards")
    docs = _docs(spark)
    manifest = export_jsonl_shards(docs, out, "doc_id", n_shards=4)
    assert manifest["n_shards"] == 4
    assert manifest["total_rows"] == docs.count()
    assert sum(manifest["shards"].values()) == manifest["total_rows"]
    # one data file per shard directory
    for s in range(4):
        files = [
            f
            for f in glob.glob(os.path.join(out, f"shard={s}", "*"))
            if not os.path.basename(f).startswith((".", "_"))
        ]
        assert len(files) == 1, files
    # manifest on disk matches the returned one
    with open(os.path.join(out, "_manifest.json")) as f:
        assert json.load(f) == manifest


def test_export_is_byte_deterministic(spark, tmp_path):
    docs = _docs(spark)
    outs = []
    for name in ("a", "b"):
        out = str(tmp_path / name)
        export_jsonl_shards(docs, out, "doc_id", n_shards=3)
        blobs = {}
        for s in range(3):
            (f,) = [
                p
                for p in glob.glob(os.path.join(out, f"shard={s}", "*"))
                if not os.path.basename(p).startswith((".", "_"))
            ]
            with open(f, "rb") as fh:
                blobs[s] = fh.read()
        outs.append(blobs)
    assert outs[0] == outs[1]


def test_export_rows_sorted_within_shard(spark, tmp_path):
    out = str(tmp_path / "shards")
    export_jsonl_shards(_docs(spark), out, "doc_id", n_shards=2)
    (f,) = [
        p
        for p in glob.glob(os.path.join(out, "shard=0", "*"))
        if not os.path.basename(p).startswith((".", "_"))
    ]
    with gzip.open(f, "rt") as fh:
        ids = [json.loads(line)["doc_id"] for line in fh]
    assert ids == sorted(ids)
    assert ids


def test_roundtrip_and_shard_pruning(spark, tmp_path):
    out = str(tmp_path / "shards")
    docs = _docs(spark)
    manifest = export_jsonl_shards(docs, out, "doc_id", n_shards=4)
    back = read_jsonl_shards(spark, out)
    assert back.count() == docs.count()
    one = read_jsonl_shards(spark, out, shards=[2])
    assert one.count() == manifest["shards"]["2"]
    # partition pruning reaches the scan (shard is a partition filter,
    # not a post-scan row filter)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan.split("PartitionFilters")[1][:120]


def test_rejects_bad_shard_count(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        export_jsonl_shards(_docs(spark), str(tmp_path / "x"), "doc_id", 0)


def test_export_hash_order_pseudo_shuffle(spark, tmp_path):
    import hashlib

    out = str(tmp_path / "shards")
    export_jsonl_shards(_docs(spark), out, "doc_id", n_shards=2, order="hash")
    (f,) = [
        p
        for p in glob.glob(os.path.join(out, "shard=1", "*"))
        if not os.path.basename(p).startswith((".", "_"))
    ]
    with gzip.open(f, "rt") as fh:
        ids = [json.loads(line)["doc_id"] for line in fh]
    assert ids != sorted(ids)  # not insertion order
    keys = [hashlib.md5(f"shard{i}".encode()).hexdigest() for i in ids]
    assert keys == sorted(keys)  # but exactly the deterministic hash order

    import pytest

    with pytest.raises(ValueError):
        export_jsonl_shards(_docs(spark), out, "doc_id", 2, order="random")


def test_export_uri_out_dir_writes_manifest_via_hadoop_fs(spark, tmp_path):
    out = "file://" + str(tmp_path / "shards")
    manifest = export_jsonl_shards(_docs(spark), out, "doc_id", n_shards=2)
    local = os.path.join(str(tmp_path / "shards"), "_manifest.json")
    with open(local) as f:
        assert json.load(f) == manifest


def _shard_blobs(out, n_shards):
    blobs = {}
    for s in range(n_shards):
        files = [
            p
            for p in glob.glob(os.path.join(out, f"shard={s}", "*"))
            if not os.path.basename(p).startswith((".", "_"))
        ]
        assert len(files) == 1, files
        with open(files[0], "rb") as fh:
            data = fh.read()
        if files[0].endswith(".gz"):
            data = gzip.decompress(data)
        blobs[s] = data
    return blobs


def test_incremental_export_equals_full_rerun(spark, tmp_path):
    """Two delta folds over a base export produce the same shard set —
    line-for-line per shard — as one full export of the union, only
    touched shards are rewritten, and the manifest counts fold."""
    from pyspark.sql import functions as F

    from defenda_data_lake_spark.operators.export import (
        incremental_export_jsonl,
    )

    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 3 == 0)
    d1 = docs.filter(F.col("doc_id") % 3 == 1)
    d2 = docs.filter(F.col("doc_id") % 3 == 2)

    inc = str(tmp_path / "inc")
    export_jsonl_shards(base, inc, "doc_id", n_shards=5)
    r1 = incremental_export_jsonl(spark, d1, inc)
    assert r1["appended"] == d1.count()
    r2 = incremental_export_jsonl(spark, d2, inc)
    assert r2["total_rows"] == docs.count()

    full = str(tmp_path / "full")
    export_jsonl_shards(docs, full, "doc_id", n_shards=5)
    assert _shard_blobs(inc, 5) == _shard_blobs(full, 5)
    with open(os.path.join(inc, "_manifest.json")) as f:
        mi = json.load(f)
    with open(os.path.join(full, "_manifest.json")) as f:
        mf = json.load(f)
    assert mi == mf


def test_incremental_export_touches_only_hashed_shards(spark, tmp_path):
    """A one-document delta rewrites exactly one shard directory: the
    others' file mtimes (and bytes) are untouched."""
    from pyspark.sql import functions as F

    from defenda_data_lake_spark.operators.export import (
        incremental_export_jsonl,
        shard_assignment,
    )

    docs = _docs(spark)
    out = str(tmp_path / "inc")
    export_jsonl_shards(
        docs.filter(F.col("doc_id") > 0), out, "doc_id", n_shards=4
    )
    one = docs.filter(F.col("doc_id") == 0)
    (expect_shard,) = [
        r[0]
        for r in one.select(shard_assignment("doc_id", 4)).collect()
    ]
    before = _shard_blobs(out, 4)
    rep = incremental_export_jsonl(spark, one, out)
    assert rep["touched_shards"] == [expect_shard]
    after = _shard_blobs(out, 4)
    for s in range(4):
        if s == expect_shard:
            assert after[s] != before[s]
        else:
            assert after[s] == before[s]


def test_incremental_export_rejects_layout_fork(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from defenda_data_lake_spark.operators.export import (
        incremental_export_jsonl,
    )

    docs = _docs(spark)
    out = str(tmp_path / "inc")
    export_jsonl_shards(docs, out, "doc_id", n_shards=3)
    with pytest.raises(ValueError, match="fork the export layout"):
        incremental_export_jsonl(
            spark, docs.withColumn("extra", F.lit(1)), out
        )
    with pytest.raises(ValueError, match="fork the export layout"):
        incremental_export_jsonl(spark, docs.drop("lang"), out)
    # empty delta: clean noop
    rep = incremental_export_jsonl(
        spark, docs.filter(F.col("doc_id") < 0), out
    )
    assert rep == {
        "appended": 0,
        "touched_shards": [],
        "total_rows": docs.count(),
    }


def test_incremental_export_hash_order_parity(spark, tmp_path):
    """The pseudo-shuffle order survives increments byte-for-byte."""
    from pyspark.sql import functions as F

    from defenda_data_lake_spark.operators.export import (
        incremental_export_jsonl,
    )

    docs = _docs(spark)
    inc = str(tmp_path / "inc")
    export_jsonl_shards(
        docs.filter(F.col("doc_id") % 2 == 0), inc, "doc_id",
        n_shards=3, order="hash",
    )
    incremental_export_jsonl(spark, docs.filter(F.col("doc_id") % 2 == 1), inc)
    full = str(tmp_path / "full")
    export_jsonl_shards(docs, full, "doc_id", n_shards=3, order="hash")
    assert _shard_blobs(inc, 3) == _shard_blobs(full, 3)


def test_incremental_export_fills_empty_shard(spark, tmp_path):
    """A shard that was EMPTY in the base export has no shard=N dir
    (partitionBy skips empty partitions); a delta hashing into it must
    create it, not crash on the missing path."""
    from pyspark.sql import functions as F

    from defenda_data_lake_spark.operators.export import (
        incremental_export_jsonl,
        shard_assignment,
    )

    docs = _docs(spark)
    # find a doc whose shard (of 8) no OTHER base doc occupies
    assigned = docs.select(
        "doc_id", shard_assignment("doc_id", 8).alias("s")
    ).collect()
    by_shard = {}
    for r in assigned:
        by_shard.setdefault(r["s"], []).append(r["doc_id"])
    lone_shard, ids = next(
        (s, ids) for s, ids in by_shard.items() if len(ids) >= 1
    )
    probe_id = ids[0]
    base = docs.filter(
        shard_assignment("doc_id", 8) != lone_shard
    )
    out = str(tmp_path / "inc")
    m = export_jsonl_shards(base, out, "doc_id", n_shards=8)
    assert m["shards"][str(lone_shard)] == 0
    assert not os.path.isdir(os.path.join(out, f"shard={lone_shard}"))

    delta = docs.filter(F.col("doc_id") == probe_id)
    rep = incremental_export_jsonl(spark, delta, out)
    assert rep["touched_shards"] == [lone_shard]
    rows = read_jsonl_shards(spark, out, [lone_shard]).collect()
    assert [r["doc_id"] for r in rows] == [probe_id]


def test_incremental_export_rejects_duplicate_ids_and_type_fork(
    spark, tmp_path
):
    import pytest
    from pyspark.sql import functions as F

    from defenda_data_lake_spark.operators.export import (
        incremental_export_jsonl,
    )

    docs = _docs(spark)
    out = str(tmp_path / "inc")
    export_jsonl_shards(
        docs.filter(F.col("doc_id") % 2 == 0), out, "doc_id", n_shards=3
    )
    # replayed delta (ids already exported) fails loudly, no doubling
    with pytest.raises(ValueError, match="append-only contract"):
        incremental_export_jsonl(
            spark, docs.filter(F.col("doc_id") % 2 == 0).limit(5), out
        )
    # same names, different type: rejected up front (a delta-derived
    # read-back schema would silently null out old rows)
    retyped = docs.filter(F.col("doc_id") % 2 == 1).withColumn(
        "n_chars", F.col("n_chars").cast("string")
    )
    with pytest.raises(ValueError, match="type mismatches"):
        incremental_export_jsonl(spark, retyped, out)
    with open(os.path.join(out, "_manifest.json")) as f:
        m = json.load(f)
    assert m["total_rows"] == docs.filter(F.col("doc_id") % 2 == 0).count()


def test_incremental_export_uri_out_dir(spark, tmp_path):
    """file:// URI shard sets work end to end (manifest read via the
    Hadoop BufferedReader — a py4j bytearray read fills nothing)."""
    from pyspark.sql import functions as F

    from defenda_data_lake_spark.operators.export import (
        incremental_export_jsonl,
    )

    docs = _docs(spark)
    out = "file://" + str(tmp_path / "inc")
    export_jsonl_shards(
        docs.filter(F.col("doc_id") % 2 == 0), out, "doc_id", n_shards=3
    )
    rep = incremental_export_jsonl(
        spark, docs.filter(F.col("doc_id") % 2 == 1), out
    )
    assert rep["appended"] == docs.filter(F.col("doc_id") % 2 == 1).count()
    full = str(tmp_path / "full")
    export_jsonl_shards(docs, full, "doc_id", n_shards=3)
    assert _shard_blobs(str(tmp_path / "inc"), 3) == _shard_blobs(full, 3)


def test_incremental_export_rejects_internal_duplicate_ids(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from defenda_data_lake_spark.operators.export import (
        incremental_export_jsonl,
    )

    docs = _docs(spark)
    out = str(tmp_path / "inc")
    export_jsonl_shards(
        docs.filter(F.col("doc_id") % 2 == 0), out, "doc_id", n_shards=3
    )
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    doubled = odd.unionByName(odd.limit(1))
    with pytest.raises(ValueError, match="duplicate ids within the batch"):
        incremental_export_jsonl(spark, doubled, out)


def test_manifest_id_hashes_fold_to_full_export(spark, tmp_path):
    """The per-shard membership checksum (bit_xor of xxhash64(id))
    folds across increments to exactly what a full export computes,
    and verify_export passes on a healthy shard set."""
    from pyspark.sql import functions as F

    from defenda_data_lake_spark.operators.export import (
        incremental_export_jsonl,
        verify_export,
    )

    docs = _docs(spark)
    inc = str(tmp_path / "inc")
    export_jsonl_shards(
        docs.filter(F.col("doc_id") % 2 == 0), inc, "doc_id", n_shards=3
    )
    incremental_export_jsonl(spark, docs.filter(F.col("doc_id") % 2 == 1), inc)
    full = str(tmp_path / "full")
    mf = export_jsonl_shards(docs, full, "doc_id", n_shards=3)
    with open(os.path.join(inc, "_manifest.json")) as f:
        mi = json.load(f)
    assert mi["id_hashes"] == mf["id_hashes"]
    assert verify_export(spark, inc) == {"ok": True, "mismatches": {}}


def test_verify_export_detects_membership_corruption(spark, tmp_path):
    """A shard whose row COUNT matches the manifest but whose ids were
    swapped is invisible to count checks — the membership checksum
    catches it; a deleted shard dir trips the count check."""
    from defenda_data_lake_spark.operators.export import verify_export

    out = str(tmp_path / "shards")
    export_jsonl_shards(
        _docs(spark), out, "doc_id", n_shards=3, compression=None
    )
    assert verify_export(spark, out)["ok"]
    # count-preserving id swap in shard 1
    (f,) = [
        p
        for p in glob.glob(os.path.join(out, "shard=1", "*"))
        if not os.path.basename(p).startswith((".", "_"))
    ]
    with open(f) as fh:
        lines = fh.read().splitlines()
    rec = json.loads(lines[0])
    rec["doc_id"] = 99_999_999
    lines[0] = json.dumps(rec)
    with open(f, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    # drop Hadoop's local-FS CRC sidecar: this test simulates an
    # object-store overwrite (no CRC there), not a bit flip
    for crc in glob.glob(os.path.join(out, "shard=1", ".*.crc")):
        os.remove(crc)
    rep = verify_export(spark, out)
    assert not rep["ok"]
    assert set(rep["mismatches"]) == {"1"}
    assert "id_hash" in rep["mismatches"]["1"]
    assert "rows" not in rep["mismatches"]["1"]
    # a torn-away shard dir trips the row-count check
    import shutil

    shutil.rmtree(os.path.join(out, "shard=2"))
    rep2 = verify_export(spark, out)
    assert "rows" in rep2["mismatches"]["2"]


def test_verify_export_detects_phantom_shard(spark, tmp_path):
    """A populated shard dir OUTSIDE the manifest's n_shards range
    (a bad restore, or a differently-sharded export crashed into the
    same out_dir) must fail the audit — consumers reading out_dir see
    its rows, so a clean verdict would be a lie."""
    import shutil

    from defenda_data_lake_spark.operators.export import verify_export

    out = str(tmp_path / "shards")
    export_jsonl_shards(
        _docs(spark), out, "doc_id", n_shards=3, compression=None
    )
    assert verify_export(spark, out)["ok"]
    # clone shard 0 as a phantom shard=3 (outside range(3))
    shutil.copytree(
        os.path.join(out, "shard=0"), os.path.join(out, "shard=3")
    )
    rep = verify_export(spark, out)
    assert not rep["ok"]
    assert "3" in rep["mismatches"]
    assert rep["mismatches"]["3"]["rows"][0] == 0
    assert rep["mismatches"]["3"]["rows"][1] > 0
    assert "id_hash" in rep["mismatches"]["3"]


def test_replayed_fold_reconciles_torn_manifest(spark, tmp_path):
    """Crash BETWEEN the shard write and the manifest write: the shard
    data is post-fold, the manifest is pre-fold (undercounting).  The
    verify-noop redelivery must REWRITE the manifest from the observed
    shard contents, not just skip the data — after it, the manifest is
    byte-equal to a full export's and verify_export passes."""
    from pyspark.sql import functions as F

    from defenda_data_lake_spark.operators.export import (
        incremental_export_jsonl,
        verify_export,
    )

    docs = _docs(spark)
    out = str(tmp_path / "inc")
    export_jsonl_shards(
        docs.filter(F.col("doc_id") % 2 == 0), out, "doc_id", n_shards=3
    )
    mpath = os.path.join(out, "_manifest.json")
    with open(mpath) as f:
        pre_fold_manifest = f.read()
    delta = docs.filter(F.col("doc_id") % 2 == 1)
    incremental_export_jsonl(spark, delta, out)
    # simulate the crash: data landed, manifest write never happened
    with open(mpath, "w") as f:
        f.write(pre_fold_manifest)
    assert not verify_export(spark, out)["ok"]

    rep = incremental_export_jsonl(spark, delta, out, if_exists="verify-noop")
    assert rep["replayed"] is True
    assert rep["reconciled_shards"]
    assert rep["total_rows"] == docs.count()
    full = str(tmp_path / "full")
    export_jsonl_shards(docs, full, "doc_id", n_shards=3)
    with open(mpath) as f:
        mi = json.load(f)
    with open(os.path.join(full, "_manifest.json")) as f:
        assert mi == json.load(f)
    assert verify_export(spark, out)["ok"]


def test_legacy_codec_sniff_spans_whole_export(spark, tmp_path):
    """Legacy manifest (no compression key), plain-JSON shards, and a
    delta touching ONLY a shard with no directory on disk: the codec
    sniff must consult the export's OTHER shard dirs and keep writing
    plain JSON, not fork the layout to gzip."""
    from pyspark.sql import functions as F

    from defenda_data_lake_spark.operators.export import (
        incremental_export_jsonl,
        shard_assignment,
    )

    docs = _docs(spark)
    assigned = docs.select(
        "doc_id", shard_assignment("doc_id", 8).alias("s")
    ).collect()
    by_shard = {}
    for r in assigned:
        by_shard.setdefault(r["s"], []).append(r["doc_id"])
    lone_shard, ids = next(iter(by_shard.items()))
    probe_id = ids[0]
    base = docs.filter(shard_assignment("doc_id", 8) != lone_shard)
    out = str(tmp_path / "inc")
    export_jsonl_shards(base, out, "doc_id", n_shards=8, compression=None)
    mpath = os.path.join(out, "_manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    del manifest["compression"]
    with open(mpath, "w") as f:
        json.dump(manifest, f)

    delta = docs.filter(F.col("doc_id") == probe_id)
    rep = incremental_export_jsonl(spark, delta, out)
    assert rep["touched_shards"] == [lone_shard]
    files = [
        p
        for p in glob.glob(os.path.join(out, f"shard={lone_shard}", "*"))
        if not os.path.basename(p).startswith((".", "_"))
    ]
    assert files and not any(p.endswith(".gz") for p in files)


def test_repair_after_partial_overwrite(spark, tmp_path):
    """Mid-commit crash during the multi-shard dynamic overwrite: one
    touched shard committed (old + delta), another did not (old only),
    manifest unwritten.  The normal fold then wedges on the partial
    overlap; repair_incremental_export with the same delta finishes
    shard-by-shard and the result is byte-identical to a clean fold."""
    import shutil

    import pytest
    from pyspark.sql import functions as F

    from defenda_data_lake_spark.operators.export import (
        incremental_export_jsonl,
        repair_incremental_export,
        verify_export,
    )

    docs = _docs(spark)
    out = str(tmp_path / "inc")
    export_jsonl_shards(
        docs.filter(F.col("doc_id") % 2 == 0), out, "doc_id", n_shards=3
    )
    mpath = os.path.join(out, "_manifest.json")
    with open(mpath) as f:
        pre_manifest = f.read()
    pre_shards = _shard_blobs(out, 3)  # decompressed per-shard bytes
    delta = docs.filter(F.col("doc_id") % 2 == 1)
    rep = incremental_export_jsonl(spark, delta, out)
    touched = rep["touched_shards"]
    assert len(touched) >= 2  # need a committed AND an uncommitted shard
    # simulate the torn commit: roll ONE touched shard back to its
    # pre-fold contents and restore the pre-fold manifest
    rollback = touched[0]
    sdir = os.path.join(out, f"shard={rollback}")
    shutil.rmtree(sdir)
    os.makedirs(sdir)
    # (plain .json: _shard_blobs decompressed it; Spark reads the
    # codec per file extension, so a mixed dir is still readable)
    with open(os.path.join(sdir, "part-rolledback.json"), "wb") as f:
        f.write(pre_shards[rollback])
    with open(mpath, "w") as f:
        f.write(pre_manifest)

    # every redelivery now wedges — the documented failure mode
    with pytest.raises(ValueError, match="append-only contract"):
        incremental_export_jsonl(spark, delta, out, if_exists="verify-noop")

    fix = repair_incremental_export(spark, delta, out)
    assert fix["applied_shards"] == [rollback]
    assert sorted(fix["already_applied_shards"]) == sorted(touched[1:])
    assert fix["total_rows"] == docs.count()
    full = str(tmp_path / "full")
    export_jsonl_shards(docs, full, "doc_id", n_shards=3)
    assert _shard_blobs(out, 3) == _shard_blobs(full, 3)
    with open(mpath) as f:
        mi = json.load(f)
    with open(os.path.join(full, "_manifest.json")) as f:
        assert mi == json.load(f)
    assert verify_export(spark, out)["ok"]
