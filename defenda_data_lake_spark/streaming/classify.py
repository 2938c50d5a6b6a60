"""Streaming document-quality scoring: apply a batch-trained Naive
Bayes model (``operators.classify.nb_train``) to a document STREAM.

The streaming twin deliberately changes the scoring plan shape: the
batch scorer explodes words and re-aggregates per doc (fine when the
corpus is at rest), but a per-doc aggregation on a stream would need
state or a watermark it has no natural event time for.  Scoring a
document only ever needs ITS OWN words, so the streaming form is
STATELESS: the model is folded into one row carrying a
``map<word, log_odds>`` plus the two scalars (prior, unseen-word
default), broadcast-joined to the stream on a literal key, and each
document row reduces its own word array with ``F.aggregate`` — pure
append mode, no state store, no watermark, no shuffle.

Scale notes: the map row is vocabulary-sized — the same Zipf-bounded
broadcast the batch scorer ships (``nb_score``'s broadcast hash join),
just materialized as one map cell instead of a table.  Per-event cost
is an O(words) JVM array reduce.  Model refresh = restart the query
with a re-fit map row (the row is computed once and cached, not per
micro-batch).

Float caveat: the batch scorer sums per-word log odds in hash-agg
order, this one in array order — identical inputs, potentially
different IEEE association, so parity holds at the catalog's 4-decimal
rounding (the q54/q103 determinism pattern), which the pinned
batch-parity test asserts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.dedup import normalized_text


def nb_model_row(model: DataFrame, totals: DataFrame) -> DataFrame:
    """Fold ``nb_train``'s (model, totals) tables into ONE row:
    ``(_nb_map, _nb_default, _nb_prior)`` — the word→log-odds map, the
    smoothed log-odds of an unseen word, and the class prior."""
    lo = F.log(
        (F.col("c_pos") + 1) / (F.col("t_pos") + F.col("vocab"))
    ) - F.log((F.col("c_neg") + 1) / (F.col("t_neg") + F.col("vocab")))
    entries = (
        model.crossJoin(F.broadcast(totals))
        .select(F.struct(F.col("word"), lo.alias("lo")).alias("e"))
        .agg(F.map_from_entries(F.collect_list("e")).alias("_nb_map"))
    )
    scalars = totals.select(
        (
            F.log(F.lit(1.0) / (F.col("t_pos") + F.col("vocab")))
            - F.log(F.lit(1.0) / (F.col("t_neg") + F.col("vocab")))
        ).alias("_nb_default"),
        F.log((F.col("n_pos") + 1) / (F.col("n_neg") + 1)).alias("_nb_prior"),
    )
    # cache the fold: Structured Streaming re-evaluates the STATIC side
    # of a stream-static join every micro-batch, so an uncached row
    # would re-run the corpus-wide training aggregations per batch
    return entries.crossJoin(F.broadcast(scalars)).cache()


def _word_array(text_col: Column) -> Column:
    return F.filter(
        F.split(normalized_text(text_col), " "), lambda w: F.length(w) > 0
    )


def nb_score_stream(
    stream_df: DataFrame,
    model_row: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every streamed document against a fitted model row
    (:func:`nb_model_row`): returns an append-mode-safe stream of
    ``(id_col, n_words, score, predicted)``.

    Contract edges mirror the batch scorer where they can: unseen
    words take the smoothed default odds.  One deliberate divergence:
    a document whose text normalizes to EMPTY — or is NULL — is absent
    from the batch output (nothing to explode) but scores ``prior``
    with ``n_words=0`` here — on a stream, silently dropping an input
    row is worse than scoring it on the prior alone."""
    # NULL text coalesces to '' so it takes the empty-doc path (prior,
    # n_words=0) instead of poisoning the row (size(NULL) = -1,
    # aggregate(NULL) = NULL score)
    words = _word_array(F.coalesce(F.col(text_col), F.lit("")))
    joined = stream_df.withColumn("_nb_k", F.lit(1)).join(
        F.broadcast(model_row.withColumn("_nb_k", F.lit(1))), "_nb_k"
    )
    score = F.col("_nb_prior") + F.aggregate(
        words,
        F.lit(0.0),
        lambda acc, w: acc
        + F.coalesce(
            F.element_at(F.col("_nb_map"), w), F.col("_nb_default")
        ),
    )
    return joined.select(
        F.col(id_col),
        F.size(words).alias("n_words"),
        score.alias("score"),
        (score > 0).cast("int").alias("predicted"),
    )
