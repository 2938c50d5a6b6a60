"""Streaming shard-export maintenance (`streaming/export.py`):
micro-batch folds must equal one full export byte-for-byte, restarts
must not double rows, and the marker-gap redelivery must self-heal via
the verify-noop contract.
"""

import glob
import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.export import (
    export_jsonl_shards,
    incremental_export_jsonl,
)
from defenda_data_lake_spark.streaming.export import (
    start_export_maintenance,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _write_batch(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r.asDict()) + "\n")


def _run(spark, landing, out, ckpt, stats=None):
    def hook(bid, rep):
        if stats is not None:
            stats.append((bid, rep))

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    stream = (
        spark.readStream.format("json")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(landing))
    )
    q = start_export_maintenance(
        stream,
        str(out),
        checkpoint_path=str(ckpt),
        trigger_seconds=None,
        on_batch=hook,
    )
    q.awaitTermination()


def _blobs(out, n_shards):
    blobs = {}
    for s in range(n_shards):
        files = [
            p
            for p in glob.glob(os.path.join(str(out), f"shard={s}", "*"))
            if not os.path.basename(p).startswith((".", "_"))
        ]
        assert len(files) == 1, files
        with open(files[0], "rb") as fh:
            data = fh.read()
        blobs[s] = gzip.decompress(data) if files[0].endswith(".gz") else data
    return blobs


def test_streamed_folds_equal_full_export(spark, tmp_path, docs):
    landing = tmp_path / "landing"
    landing.mkdir()
    out = tmp_path / "shards"
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    base = docs.select(*cols).filter(F.col("doc_id") % 3 == 0)
    export_jsonl_shards(base, str(out), "doc_id", n_shards=4)
    _write_batch(
        landing / "b1.json",
        docs.select(*cols).filter(F.col("doc_id") % 3 == 1).collect(),
    )
    _write_batch(
        landing / "b2.json",
        docs.select(*cols).filter(F.col("doc_id") % 3 == 2).collect(),
    )
    stats = []
    _run(spark, landing, out, tmp_path / "ckpt", stats=stats)
    assert len(stats) == 2 and all(not r.get("replayed") for _, r in stats)
    assert sum(r["appended"] for _, r in stats) == docs.filter(
        F.col("doc_id") % 3 != 0
    ).count()

    full = tmp_path / "full"
    export_jsonl_shards(docs.select(*cols), str(full), "doc_id", n_shards=4)
    assert _blobs(out, 4) == _blobs(full, 4)
    with open(out / "_manifest.json") as f:
        mi = json.load(f)
    with open(full / "_manifest.json") as f:
        mf = json.load(f)
    assert mi == mf


def test_marker_gap_redelivery_self_heals(spark, tmp_path, docs):
    """Crash between the shard write and the marker write: on restart
    the batch is redelivered with the fold already applied.  The
    verify-noop contract reports replayed=True and the shard set is
    unchanged — the append-only analogue of the CDC equal-seq
    idempotent re-apply."""
    landing = tmp_path / "landing"
    landing.mkdir()
    out = tmp_path / "shards"
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    export_jsonl_shards(
        docs.select(*cols).filter(F.col("doc_id") % 2 == 0),
        str(out), "doc_id", n_shards=3,
    )
    delta = docs.select(*cols).filter(F.col("doc_id") % 2 == 1)
    _write_batch(landing / "b1.json", delta.collect())
    stats = []
    _run(spark, landing, out, tmp_path / "ckpt", stats=stats)
    assert stats[0][1]["appended"] == delta.count()
    before = _blobs(out, 3)

    # simulate the crash-in-marker-gap: the fold landed but the marker
    # did not, and the checkpoint was lost -> the same batch replays
    os.remove(out / "_last_batch_id")
    stats2 = []
    _run(spark, landing, out, tmp_path / "ckpt2", stats=stats2)
    assert stats2[0][1]["replayed"] is True
    assert stats2[0][1]["appended"] == 0
    assert _blobs(out, 3) == before  # nothing doubled
    # ...and the marker is restored, so the next restart skips cleanly
    assert os.path.exists(out / "_last_batch_id")


def test_partial_overlap_still_fails(spark, tmp_path, docs):
    """A batch that is only PARTLY exported is never a replay: the
    verify-noop mode must fail it loudly rather than guess."""
    out = tmp_path / "shards"
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    export_jsonl_shards(
        docs.select(*cols).filter(F.col("doc_id") % 2 == 0),
        str(out), "doc_id", n_shards=3,
    )
    mixed = docs.select(*cols).filter(F.col("doc_id") < 10)  # both parities
    with pytest.raises(ValueError, match="append-only contract"):
        incremental_export_jsonl(
            spark, mixed, str(out), if_exists="verify-noop"
        )
