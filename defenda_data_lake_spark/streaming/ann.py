"""Streaming IVF (ANN) index maintenance: the persisted
`build_ivf_index` layout kept live by an embedding stream, one
micro-batch at a time — the streaming twin of
``operators/incremental_ivf.py`` and the vector-index sibling of
``streaming/cdc.py`` / ``streaming/rollup.py``.

Fold law: each micro-batch runs `append_ivf_index` — membership is
append-only, and the centroid running-mean fold is associative, so
ANY batching of the same rows yields the same index (membership
exactly, centroids to FP reordering; parity-tested against a single
batch append AND a full rebuild).

Restart contract — WEAKER than the CDC fold, stated honestly: the
``_last_batch_id`` marker makes checkpoint redeliveries no-ops, but
the append itself is NOT idempotent (no per-row seq exists to detect
a replayed row), so a crash in the window between the corpus append
and the marker write DUPLICATES that batch's rows on redelivery.
``streaming/cdc.py``'s fold self-repairs in that window because equal
seqs re-apply idempotently; an append-only corpus has no such anchor.
Mitigations: ids are carried, so duplicates are detectable, and
``incremental_ivf.compact_ivf_index(dedupe_ids=True)`` restores the
exactly-once corpus and exact centroids (test-pinned against a full
rebuild); size the window by putting the marker on the same
filesystem as the index.  The same at-least-once contract as
`append_dedup_index` — documented there and here.

Drift: each batch's `append_ivf_index` report (arrival-fit vs
history, `rebuild_recommended`) flows to the ``on_batch`` hook — wire
it to the operational log exactly like the CDC/SCD fold loss
counters; when a batch recommends a rebuild, the operator stops the
stream, rebuilds, and restarts with a FRESH checkpoint (the index
dir's arrival-fit history is reset by the rebuild).

Scale: per trigger cost is `append_ivf_index`'s O(batch + |lists|) —
one wide aggregation and one partitioned append; the indexed corpus
is never rescanned, and probes stay partition-pruned throughout.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from defenda_data_lake_spark.operators.incremental_ivf import (
    append_ivf_index,
)
from defenda_data_lake_spark.streaming.rollup import (
    _read_last_batch_id,
    _write_last_batch_id,
)


def start_ivf_maintenance(
    stream_df: DataFrame,
    index_dir: str,
    checkpoint_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partition_col: str | None = None,
    fit_drop_threshold: float = 0.1,
    trigger_seconds: int | None = 60,
    query_name: str = "ivf_maintenance",
    on_batch: Callable[[int, dict], None] | None = None,
) -> StreamingQuery:
    """Maintain the IVF index at ``index_dir`` from an embedding
    stream.  The index must exist (``build_ivf_index``) — bootstrap is
    a batch decision, not a streaming one.  ``on_batch(batch_id,
    report)`` receives each fold's full `append_ivf_index` report
    (appended counts, delta/baseline fit, ``rebuild_recommended``)."""
    spark = stream_df.sparkSession

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        last = _read_last_batch_id(spark, index_dir)
        if batch_id <= last:
            return  # redelivered after a crash-after-marker: skip
        report = append_ivf_index(
            spark,
            index_dir,
            batch_df,
            id_col=id_col,
            vec_col=vec_col,
            partition_col=partition_col,
            fit_drop_threshold=fit_drop_threshold,
        )
        _write_last_batch_id(spark, index_dir, batch_id)
        if on_batch is not None:
            on_batch(batch_id, report)

    writer = (
        stream_df.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_path)
        .queryName(query_name)
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
