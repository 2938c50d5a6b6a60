"""Streaming DSIR scoring: apply a batch-fitted hashed-ngram
importance model (``operators.sampling.dsir_bucket_counts``) to a
document STREAM — the domain-matching filter running at ingest time
instead of over a corpus at rest.

Same plan-shape move as ``streaming/classify.py``: the batch scorer
explodes features and re-aggregates per doc, but a per-doc aggregation
on a stream would need state it has no reason to hold — scoring a
document only ever needs ITS OWN features.  The ≤``buckets``-row
counts table folds into ONE broadcast row carrying a
``map<bucket, log_ratio>`` plus the smoothed zero-count default, and
each document row reduces its own feature array with ``F.aggregate``:
pure append mode, no state store, no watermark, no shuffle.

The default matters more here than for NB: the batch scorer never
needs one (the raw model is fitted on the same corpus it scores, so
every scored bucket has a count), but a STREAMED document can hash a
novel feature into a bucket the fitted corpus never produced — it
takes the add-alpha zero-count ratio ``ln((raw_tot+aB)/(tgt_tot+aB))``
rather than poisoning the reduce with a NULL.

Float caveat: the batch scorer averages per-feature log ratios in
hash-agg order, this one in array order — parity holds at the
catalog's 4-decimal rounding (the q54/q103/NB-stream determinism
pattern), pinned by the batch-parity test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.sampling import (
    dsir_bucket_of,
    dsir_bucket_ratios,
    dsir_feature_array,
)


def dsir_model_row(
    counts: DataFrame, buckets: int = 1024, alpha: float = 0.5
) -> DataFrame:
    """Fold :func:`~defenda_data_lake_spark.operators.sampling.
    dsir_bucket_counts`'s table into ONE row: ``(_dsir_map,
    _dsir_default)`` — the bucket→log-ratio map and the smoothed
    ratio of a bucket with zero fitted counts.  ``buckets``/``alpha``
    must match the fit; the shared ratio builder raises on the
    detectable mismatch (a bucket id outside the declared space).

    The per-bucket ratios come from the SAME
    :func:`~defenda_data_lake_spark.operators.sampling.
    dsir_bucket_ratios` the batch scorer joins, so the smoothing
    formula cannot drift between the two scorers."""
    denom = alpha * buckets
    torow = counts.agg(
        F.sum("raw_c").alias("_raw_tot"), F.sum("tgt_c").alias("_tgt_tot")
    )
    entries = (
        dsir_bucket_ratios(counts, buckets=buckets, alpha=alpha)
        .select(F.struct(F.col("bucket"), F.col("logr").alias("lr")).alias("e"))
        .agg(F.map_from_entries(F.collect_list("e")).alias("_dsir_map"))
    )
    default = torow.select(
        F.log(
            (F.col("_raw_tot") + F.lit(denom)) / (F.col("_tgt_tot") + F.lit(denom))
        ).alias("_dsir_default")
    )
    # cache the fold: Structured Streaming re-evaluates the STATIC
    # side of a stream-static join every micro-batch
    return entries.crossJoin(F.broadcast(default)).cache()


def dsir_score_stream(
    stream_df: DataFrame,
    model_row: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
) -> DataFrame:
    """Score every streamed document against a fitted model row
    (:func:`dsir_model_row`): append-mode-safe stream of
    ``(id_col, n_feats, avg_logw)`` — same columns and (4dp) values as
    the batch :func:`~defenda_data_lake_spark.operators.sampling.
    dsir_importance_weights`, including NULL/empty text scoring as the
    single ``''``-unigram rather than being dropped."""
    feats = dsir_feature_array(text_col)
    joined = stream_df.withColumn("_dsir_k", F.lit(1)).join(
        F.broadcast(model_row.withColumn("_dsir_k", F.lit(1))), "_dsir_k"
    )
    total = F.aggregate(
        feats,
        F.lit(0.0),
        lambda acc, feat: acc
        + F.coalesce(
            F.element_at(F.col("_dsir_map"), dsir_bucket_of(feat, buckets)),
            F.col("_dsir_default"),
        ),
    )
    n = F.size(feats)
    return joined.select(
        F.col(id_col).alias("id"),
        # long, matching the batch scorer's count() so the two outputs
        # union/append into one table without a schema mismatch
        n.cast("long").alias("n_feats"),
        (total / n).alias("avg_logw"),
    )
