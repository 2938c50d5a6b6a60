"""Incremental boilerplate-chunk index — the nightly-batch form of
:func:`~defenda_data_lake_spark.operators.dedup.
boilerplate_chunk_removal`: maintain a persisted per-chunk
document-frequency table so that cleaning a growing corpus never
re-runs the (expensive) chunking kernel over text that already landed.

Index contract: one row per distinct normalized chunk —
``(h, df_docs)`` where ``h`` is the md5 chunk hash and ``df_docs`` the
number of DISTINCT documents it has appeared in so far.  Increments
are additive because document ids NEVER REAPPEAR across increments
(the same append-only contract ``incremental_dedup`` documents): a
delta's per-chunk distinct-doc count simply adds to the stored count.
Re-delivering an increment would double-count — the caller's
exactly-once layer (the ``_last_batch_id`` marker pattern) owns that,
exactly as for the rollup/SCD/CDC folds.

Cleaning with the index (:func:`clean_with_index`) reproduces the
batch operator's output EXACTLY when the index covers the same corpus
(pinned by test) — and, unlike the batch operator, can clean ANY
subset (e.g. just today's landing) against corpus-wide frequencies.

Scale (100 TB corpus, GB-scale daily increment): the chunking kernel
runs ONLY over the delta; the index merge is one h-keyed aggregation
over (old index ∪ delta counts) — cost O(index + delta), no corpus
text touched.  The index is Heaps-law unbounded but orders of
magnitude smaller than the corpus (one 16-byte hash + a count per
DISTINCT chunk); at deployment scale write it as a bucketed table on
``h`` so the merge and the cleaning join are co-located.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.dedup import _word_chunks
from defenda_data_lake_spark.streaming._tables import swap_directory


def chunk_doc_frequencies(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 20,
) -> DataFrame:
    """Per-chunk distinct-document counts ``(h, df_docs)`` for one
    document set — the unit an increment contributes.  NULL text
    counts as empty text (the batch operator's contract)."""
    ex = _word_chunks(
        df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit(""))),
        text_col,
        id_col,
        chunk_words,
    )
    return ex.select(F.md5("chunk").alias("h"), "id").groupBy("h").agg(
        F.count_distinct("id").alias("df_docs")
    )


def build_chunk_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 20,
) -> int:
    """Create the persisted index from an initial corpus.  Returns the
    number of distinct chunks indexed."""
    counts = chunk_doc_frequencies(df, text_col, id_col, chunk_words)
    counts.write.mode("overwrite").parquet(path)
    return counts.count()


def update_chunk_index(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 20,
) -> int:
    """Fold one increment of NEW documents into the index: the
    chunking kernel runs only over ``delta``; the merge is one h-keyed
    sum over (index ∪ delta counts).  Written to a sibling temp dir
    first, then swapped through the Hadoop FileSystem API
    (:func:`~defenda_data_lake_spark.streaming._tables.swap_directory`,
    so s3a://, hdfs:// and local paths all work) — the
    ``upsert_corpus_snapshot`` durability contract: no reader ever
    sees a HALF-WRITTEN index, though the two-rename swap leaves a
    brief window where the canonical path does not exist (a concurrent
    read fails cleanly and retries).  Returns the delta's
    distinct-chunk count."""
    dc = chunk_doc_frequencies(delta, text_col, id_col, chunk_words)
    old = spark.read.parquet(path)
    merged = (
        old.unionByName(dc)
        .groupBy("h")
        .agg(F.sum("df_docs").alias("df_docs"))
        # materialize before the swap: the plan reads the files the
        # swap replaces
        .localCheckpoint(eager=True)
    )
    parent = os.path.dirname(path.rstrip("/"))
    tmp_dir = os.path.join(parent, f".chunkidx-{uuid.uuid4().hex[:8]}")
    try:
        merged.write.mode("overwrite").parquet(tmp_dir)
    except Exception:
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
        raise
    swap_directory(spark, tmp_dir, path)
    return dc.count()


def clean_with_index(
    df: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 20,
    min_doc_freq: int = 3,
) -> DataFrame:
    """Boilerplate-clean ``df`` against corpus-wide chunk frequencies:
    same output schema and semantics as ``boilerplate_chunk_removal``
    (``(id, n_chunks, n_boiler, clean_text)``), with the document
    frequency coming from the INDEX instead of a corpus self-agg — so
    ``df`` can be any subset (today's landing) while the threshold
    still reflects everything ever indexed.  A chunk absent from the
    index is df_docs=0 (never boilerplate) — cleaning documents the
    index hasn't absorbed yet under-counts their own contribution by
    design; fold them in first for exact batch parity."""
    ex = _word_chunks(
        df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit(""))),
        text_col,
        id_col,
        chunk_words,
    )
    hashed = ex.select("id", "start", "chunk", F.md5("chunk").alias("h"))
    flagged = hashed.join(index, "h", "left").select(
        "id",
        "start",
        "chunk",
        (F.coalesce(F.col("df_docs"), F.lit(0)) >= min_doc_freq).alias(
            "is_boiler"
        ),
    )
    return flagged.groupBy("id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.col("is_boiler").cast("long")).alias("n_boiler"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("is_boiler"), F.struct("start", "chunk"))
                    )
                ),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
    )
