"""Incremental near-dedup against a PERSISTED signature index — the
nightly-batch reality of a growing training corpus: dedupe today's
documents against everything already landed WITHOUT rescanning the
corpus, by joining against an index that holds one banded-signature
row per (document, band).

Semantics are ``dedup.minhash_bucket_dedupe``'s claimant form applied
to (index ∪ new batch): per LSH bucket the string-min id claims, and a
NEW document whose full minhash signature agrees with its bucket
claimant's on ≥ ``min_hash_agreement`` of the families is flagged
``dup_of`` that claimant.  Indexed documents are never re-flagged
(they already landed — incremental processing cannot retroact), and
the index keeps EVERY processed document's rows — including flagged
duplicates — because a duplicate can still be the claimant of some
OTHER bucket in the batch-equivalent run; dropping its rows would
silently change later verdicts.  With that invariant, the parity law
is exact WHEN ids are STRING-monotone across increments (every later
document's id string-sorts after every earlier one — the claimant
order is string order, ``minhash_bucket_dedupe``'s documented
choice): each increment's documents then get the same ``dup_of`` map
a single ``minhash_bucket_dedupe`` over the full corpus produces
(pinned by test).  Without monotonicity the semantics degrade to
FIRST-ARRIVAL — a future string-smaller id cannot claim a bucket it
hasn't reached yet — which flips WHO survives but keeps the surviving
content set equivalent, the same caveat
``streaming.dedup.near_dedupe_stream`` documents for out-of-order
delivery.

Scale (100 TB corpus, GB-scale daily increment): the corpus TEXT is
never touched again — the probe is one exchange of banded signature
rows (index + increment) keyed by (band, band_sig), and the agreement
verify uses only the signature columns already in the index rows (no
second look at documents, the property the claimant form exists for).
The index is written pre-clustered on that key; to remove the
index-side exchange entirely at deployment scale, register the
signatures as a BUCKETED table on (band, band_sig)
(``plans/bucketing.py``) — the window then reads co-located buckets
and only the increment shuffles.  Index growth is ``bands`` rows per
document ever processed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.dedup import (
    band_structs_expr,
    minhash_signatures,
)


def _banded_rows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    shingle_n: int,
) -> DataFrame:
    """(id_s, band, band_sig, h0..h{n-1}) — the signature rows both
    the index and the increment use (``dedup.minhash_bucket_dedupe``'s
    banding, one definition via ``band_structs_expr``)."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    hs = [f"h{i}" for i in range(num_hashes)]
    return sigs.select(
        F.col("id").cast("string").alias("id_s"),
        *hs,
        F.explode(band_structs_expr(hs, bands)).alias("bs"),
    ).select("id_s", *hs, "bs.band", "bs.band_sig")


def build_dedup_index(
    docs: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 2,
    shingle_n: int = 3,
) -> None:
    """Initialize the index from an already-deduped (or initial)
    corpus: one pass computes every document's banded signature rows,
    written bucket-partitioned (hash of band_sig) so later probes
    co-locate.  Parameters are persisted alongside — a probe with
    mismatched sketch parameters is meaningless and is rejected."""
    spark = docs.sparkSession
    rows = _banded_rows(docs, text_col, id_col, num_hashes, bands, shingle_n)
    (
        rows.repartition("band", "band_sig")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/signatures")
    )
    spark.createDataFrame(
        [(num_hashes, bands, shingle_n)],
        "num_hashes int, bands int, shingle_n int",
    ).write.mode("overwrite").parquet(f"{index_dir}/params")


def _load_params(spark: SparkSession, index_dir: str) -> tuple[int, int, int]:
    r = spark.read.parquet(f"{index_dir}/params").collect()[0]
    return r["num_hashes"], r["bands"], r["shingle_n"]


def incremental_near_dedup(
    new_docs: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_hash_agreement: float = 0.5,
    max_bucket_docs: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Dedupe ``new_docs`` against the index AND each other.

    Returns ``(marked, new_rows)``: ``marked`` is ``new_docs`` plus
    ``dup_of`` (string claimant id, NULL for survivors — same contract
    as ``minhash_bucket_dedupe``); ``new_rows`` is the increment's
    banded signature rows, ALL of them, to hand to
    :func:`append_dedup_index` once the increment is accepted (see the
    module docstring for why duplicates' rows must be kept).

    ``max_bucket_docs`` skips oversized buckets counting index + new
    members, mirroring the batch twin's degenerate-bucket cap."""
    spark = new_docs.sparkSession
    num_hashes, bands, shingle_n = _load_params(spark, index_dir)
    hs = [f"h{i}" for i in range(num_hashes)]
    new_rows = _banded_rows(
        new_docs, text_col, id_col, num_hashes, bands, shingle_n
    )
    # only buckets the increment TOUCHES matter: an index row in an
    # untouched bucket cannot affect any new document, so semi-join
    # the index down to the increment's bucket keys before the window
    # — without this the claimant window re-processes the ENTIRE
    # index every increment (measured: the 32x probe's full-corpus
    # window; with it the probe touches O(increment x bucket size)
    # rows).  The increment's distinct keys are the broadcast side by
    # definition of "increment".
    keys = new_rows.select("band", "band_sig").distinct()
    idx = spark.read.parquet(f"{index_dir}/signatures").join(
        F.broadcast(keys), ["band", "band_sig"], "left_semi"
    )
    both = idx.withColumn("_is_new", F.lit(False)).unionByName(
        new_rows.withColumn("_is_new", F.lit(True))
    )

    # identical claimant logic to minhash_bucket_dedupe (string-min id
    # claims; agreement against the claimant's signature columns)
    w_claim = Window.partitionBy("band", "band_sig").orderBy("id_s")
    w_all = Window.partitionBy("band", "band_sig")
    claimed = both.select(
        "id_s",
        "_is_new",
        *hs,
        F.first("id_s").over(w_claim).alias("first_id"),
        *[F.first(h).over(w_claim).alias(f"c_{h}") for h in hs],
        F.count("*").over(w_all).alias("n_bucket"),
    )
    agreement = sum(
        F.when(F.col(h) == F.col(f"c_{h}"), 1).otherwise(0) for h in hs
    ) / F.lit(float(num_hashes))
    flagged = claimed.filter(
        F.col("_is_new")
        & (F.col("id_s") != F.col("first_id"))
        & (agreement >= F.lit(min_hash_agreement))
    )
    if max_bucket_docs is not None:
        flagged = flagged.filter(F.col("n_bucket") <= max_bucket_docs)
    dup_map = flagged.groupBy("id_s").agg(F.min("first_id").alias("dup_of"))
    marked = new_docs.join(
        dup_map, F.col(id_col).cast("string") == dup_map["id_s"], "left"
    ).drop("id_s")
    return marked, new_rows


def append_dedup_index(index_dir: str, new_rows: DataFrame) -> None:
    """Append an accepted increment's signature rows (the ``new_rows``
    half of :func:`incremental_near_dedup`'s return) to the index."""
    (
        new_rows.repartition("band", "band_sig")
        .write.mode("append")
        .parquet(f"{index_dir}/signatures")
    )
