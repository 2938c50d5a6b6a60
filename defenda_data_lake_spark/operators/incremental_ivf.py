"""Incremental IVF (ANN) index maintenance — the similarity-search
sibling of `incremental_dedup` / `incremental_boilerplate`: fold a
DELTA of new embedding rows into a persisted `build_ivf_index` layout
without rescanning the indexed corpus, and report the centroid-drift
signal that says when a full rebuild is due.

Why this exists: at 100 TB an embedding corpus grows continuously, and
rebuilding the inverted-file layout (a full corpus rewrite) per
arrival batch is exactly the O(corpus) cost an incremental pipeline
must not pay.  `append_ivf_index` is O(delta + |lists|) and exactly
TWO delta-sized Spark jobs:

* ONE aggregation computes, per assigned list, the member count, the
  misassignment count, the raw vector sums, and the unit-vector sums
  (all bounded: |lists| x dim doubles to the driver; the row norm is
  projected ONCE into a column first — inlining it into all 64 unit
  sums exploded the task binary to 17 MB);
* ONE write appends the delta to the partitioned ``corpus/`` dataset
  (new parquet files in existing ``__ivf_list=...`` directories —
  partition pruning for probes keeps working, untouched lists' files
  are never opened or rewritten).

The bounded centroid table is then rebuilt driver-side as an EXACT
fold — running means from ``(old_mean*old_n + delta_sum)`` — and
swapped in via the Hadoop FS API (`_tables.swap_directory`, the
streaming-tables durability contract).

Assignment modes:

* ``partition_col=`` (e.g. ``"label"``): the delta carries the list
  key, exactly like the build — the incremental index is
  MEMBERSHIP-IDENTICAL to a full rebuild on the union (parity-tested),
  and centroids match to running-mean FP reordering.
* ``partition_col=None``: classic IVF ingestion — each vector joins
  the list of its NEAREST current centroid by cosine (the probe's own
  ranking metric), computed by the module's vectorized numpy kernel
  over the broadcast centroid matrix.  No new lists can appear.

Drift signal — arrival-fit history, not member fit and not
nearest-disagreement: ``delta_fit`` is the mean cosine of this batch's
rows to the PRE-APPEND centroid they were filed under (computable from
the per-list unit-vector sums, no extra pass), and it is compared to
the mean of the SAME measurement over all previous arrival batches
(``{index_dir}/arrival_fit``, reset by a rebuild).
``rebuild_recommended`` trips when the new batch fits the existing
geometry worse than arrivals historically did by more than
``fit_drop_threshold`` (absolute cosine).  Two tempting baselines are
deliberately NOT used: the indexed members' own fit to their centroid
carries a ~1/sqrt(list_size) self-correlation bias (members define
the mean they are scored against — measured 0.155 member fit vs 0.007
fresh-sample fit on statistically IDENTICAL synthetic data), and
nearest-centroid disagreement has a high natural baseline on
overlapping corpora (0.63 on the same data) — either would fire
forever on healthy appends.  Comparing arrivals to arrivals is the
only like-for-like pair.  The first append after a build has no
history and returns ``baseline_fit=None`` without a verdict.
``misassigned_frac`` (carried key != nearest current centroid) is
still reported as context.

Durability: the corpus append lands before the centroid/arrival-fit
swaps, so a crash between them leaves a VALID index with slightly
stale centroids (a recall, not correctness, artifact — the next
append or rebuild heals it).  Appends are at-least-once, not
idempotent: redelivering the same delta duplicates rows (same
contract as `append_dedup_index`; dedupe by id upstream).

Legacy layouts: a centroid table predating the ``n`` column is still
appendable (counts are recovered with one column-pruned pass over the
corpus partition keys), and a missing ``arrival_fit`` table just means
no history yet — the append starts one.

No reference counterpart: the reference engine has no vector index;
this extends SURVEY.md §2's similarity-search family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.similarity import _stack
from defenda_data_lake_spark.streaming._tables import swap_directory
from defenda_data_lake_spark.utils.partitioning import bounded_local_df


def _nearest_list_col(vec_col: str, list_ids: list[str], cent: np.ndarray):
    """Column: the list_id of the nearest centroid by cosine — one
    matmul per Arrow batch against the broadcast (bounded) centroid
    matrix.  Ties and zero-norm vectors resolve to the FIRST list in
    ``list_ids`` order (callers pass a sorted list, so the tie-break
    is deterministic: lowest list_id)."""
    ids = pd.Series(list_ids)
    cn = np.linalg.norm(cent, axis=1)

    @F.pandas_udf("string")
    def _nearest(v: pd.Series) -> pd.Series:
        V = _stack(v)
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = (V @ cent.T) / (
                np.linalg.norm(V, axis=1)[:, None] * cn[None, :]
            )
        sims = np.nan_to_num(sims, nan=-np.inf)
        # argmax returns the first maximum — the documented tie-break
        return ids.iloc[np.argmax(sims, axis=1)].reset_index(drop=True)

    return _nearest(F.col(vec_col))


from contextlib import contextmanager


@contextmanager
def _raw_partition_strings(spark: SparkSession):
    """Read partition values as their RAW directory strings.  Type
    inference reads ``__ivf_list=007`` back as int 7, and
    ``cast("string")`` then yields ``'7'`` — which no longer matches
    the centroid table's ``list_id='007'`` (KeyError on append,
    silently orphaned lists on compact).  Inference is a session conf,
    not a reader option, so it is toggled around the read and
    restored."""
    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    old = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, old)


def _read_arrival_fit(spark: SparkSession, index_dir: str):
    """(arr_fit_sum, arr_n, table_exists) — a missing table (legacy
    index) reads as empty history and is created, not swapped, on the
    next append."""
    from pyspark.errors import AnalysisException

    try:
        row = spark.read.parquet(f"{index_dir}/arrival_fit").first()
    except AnalysisException:
        return 0.0, 0, False
    return (
        (row["arr_fit_sum"], row["arr_n"], True) if row else (0.0, 0, True)
    )


def append_ivf_index(
    spark: SparkSession,
    index_dir: str,
    new_rows: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partition_col: str | None = None,
    fit_drop_threshold: float = 0.1,
) -> dict:
    """Fold ``new_rows`` into the persisted IVF index at ``index_dir``
    (see the module docstring for modes, cost, drift semantics, and
    durability).  Returns ``{"appended", "lists_touched", "new_lists",
    "misassigned_frac", "delta_fit", "baseline_fit",
    "rebuild_recommended"}``."""
    cent_rows = sorted(
        spark.read.parquet(f"{index_dir}/centroids").collect(),
        key=lambda r: r["list_id"],
    )
    if not cent_rows:
        raise ValueError(f"empty centroid table at {index_dir}: build first")
    list_ids = [r["list_id"] for r in cent_rows]
    cent = np.array([list(r["centroid"]) for r in cent_rows])
    dim = cent.shape[1]
    if "n" in cent_rows[0].asDict():
        counts = {r["list_id"]: r["n"] for r in cent_rows}
    else:
        # pre-counts index layout: recover list sizes with ONE
        # column-pruned pass over the partition key (no vector bytes
        # are read; inference disabled so keys match the centroid
        # table's raw strings — see _raw_partition_strings)
        with _raw_partition_strings(spark):
            counts = {
                r["k"]: r["cnt"]
                for r in spark.read.parquet(f"{index_dir}/corpus")
                .groupBy(F.col("__ivf_list").alias("k"))
                .agg(F.count("*").alias("cnt"))
                .collect()
            }
    arr_fit_sum, arr_n, af_exists = _read_arrival_fit(spark, index_dir)

    carried = partition_col is not None
    comps = [F.col(vec_col)[i].cast("double") for i in range(dim)]
    delta = (
        new_rows.select(
            F.col(id_col),
            F.col(vec_col),
            *([F.col(partition_col)] if carried else []),
            _nearest_list_col(vec_col, list_ids, cent).alias("__nearest"),
        )
        .withColumn(
            "__ivf_list",
            F.col(partition_col).cast("string")
            if carried
            else F.col("__nearest"),
        )
        .select(id_col, vec_col, "__ivf_list", "__nearest")
        .persist()
    )
    try:
        # ONE aggregation job carries every bounded statistic the fold
        # needs; the append write is the only other delta-sized job.
        # The norm is a projected COLUMN so the 64 unit-sum aggregates
        # reference an attribute, not 64 copies of a 192-term tree.
        withn = delta.withColumn("_nrm", F.sqrt(sum(c * c for c in comps)))
        agg_rows = (
            withn.groupBy("__ivf_list")
            .agg(
                F.count("*").cast("long").alias("dn"),
                F.sum(
                    F.when(
                        F.col("__ivf_list").isin(list_ids)
                        & (F.col("__ivf_list") != F.col("__nearest")),
                        1,
                    ).otherwise(0)
                )
                .cast("long")
                .alias("mis"),
                # zero-norm vectors contribute 0 to the unit sums, so
                # they must not inflate the fit denominator either — a
                # batch of valid rows plus degenerate zeros would
                # otherwise look like a drifting batch and falsely
                # trip rebuild_recommended
                F.sum(F.when(F.col("_nrm") > 0, 1).otherwise(0))
                .cast("long")
                .alias("dnv"),
                *[F.sum(c).alias(f"s{i}") for i, c in enumerate(comps)],
                *[
                    F.sum(
                        F.when(
                            F.col("_nrm") > 0, c / F.col("_nrm")
                        ).otherwise(F.lit(0.0))
                    ).alias(f"u{i}")
                    for i, c in enumerate(comps)
                ],
            )
            .collect()
        )
        if any(r["__ivf_list"] is None for r in agg_rows):
            raise ValueError(
                f"NULL {partition_col} cannot key an IVF list partition"
            )
        appended = sum(r["dn"] for r in agg_rows)
        if appended == 0:
            return {
                "appended": 0,
                "lists_touched": [],
                "new_lists": [],
                "misassigned_frac": 0.0,
                "delta_fit": None,
                "baseline_fit": (arr_fit_sum / arr_n) if arr_n else None,
                "rebuild_recommended": False,
            }
        misassigned_frac = sum(r["mis"] for r in agg_rows) / appended

        (
            delta.drop("__nearest")
            .repartition("__ivf_list")
            .write.mode("append")
            .partitionBy("__ivf_list")
            .parquet(f"{index_dir}/corpus")
        )

        # exact driver-side fold over bounded state
        cent_unit = cent / np.maximum(
            np.linalg.norm(cent, axis=1)[:, None], 1e-300
        )
        pos = {lid: i for i, lid in enumerate(list_ids)}
        folded: dict[str, tuple[np.ndarray, int]] = {
            lid: (cent[i] * counts[lid], counts[lid])
            for i, lid in enumerate(list_ids)
        }
        delta_fit_num, delta_fit_den = 0.0, 0
        for r in agg_rows:
            lid = r["__ivf_list"]
            s = np.array([r[f"s{i}"] for i in range(dim)])
            if lid in pos:
                # this batch's fit to the PRE-APPEND geometry it was
                # filed under (unit sums make the mean cosine exact;
                # denominator = rows with a nonzero norm, matching the
                # numerator's contributors)
                u = np.array([r[f"u{i}"] for i in range(dim)])
                delta_fit_num += float(u @ cent_unit[pos[lid]])
                delta_fit_den += r["dnv"]
            old_sum, old_n = folded.get(lid, (np.zeros(dim), 0))
            folded[lid] = (old_sum + s, old_n + r["dn"])
        new_lists = sorted(set(folded) - set(list_ids))

        delta_fit = (
            delta_fit_num / delta_fit_den if delta_fit_den else None
        )
        baseline_fit = (arr_fit_sum / arr_n) if arr_n else None
        rebuild_recommended = (
            baseline_fit is not None
            and delta_fit is not None
            and delta_fit < baseline_fit - fit_drop_threshold
        )

        out_rows = [
            (lid, (vs / n).tolist(), int(n))
            for lid, (vs, n) in sorted(folded.items())
        ]
        tmp = f"{index_dir}/.centroids-tmp"
        (
            bounded_local_df(
                spark,
                out_rows,
                "list_id string, centroid array<double>, n long",
            )
            .write.mode("overwrite")
            .parquet(tmp)
        )
        swap_directory(spark, tmp, f"{index_dir}/centroids")
        af_df = bounded_local_df(
            spark,
            [(arr_fit_sum + delta_fit_num, arr_n + delta_fit_den)],
            "arr_fit_sum double, arr_n long",
        )
        if af_exists:
            tmp_af = f"{index_dir}/.arrival-fit-tmp"
            af_df.write.mode("overwrite").parquet(tmp_af)
            swap_directory(spark, tmp_af, f"{index_dir}/arrival_fit")
        else:
            af_df.write.mode("overwrite").parquet(f"{index_dir}/arrival_fit")
        return {
            "appended": appended,
            "lists_touched": sorted(r["__ivf_list"] for r in agg_rows),
            "new_lists": new_lists,
            "misassigned_frac": misassigned_frac,
            "delta_fit": delta_fit,
            "baseline_fit": baseline_fit,
            "rebuild_recommended": rebuild_recommended,
        }
    finally:
        delta.unpersist()


def compact_ivf_index(
    spark: SparkSession,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dedupe_ids: bool = False,
) -> dict:
    """Compact the index's ``corpus/`` dataset: every append leaves
    one more file per touched list, so a long-running maintenance
    stream accretes small files until scan setup dominates probes —
    the classic streaming-sink problem ``lake_maintenance.
    compact_partition`` solves for the events table.  Rewrites each
    list to ONE file (hash repartition on the list key: each list's
    rows land in a single shuffle partition) and swaps the dataset in
    via the Hadoop FS API.

    ``dedupe_ids=True`` additionally heals the at-least-once append
    contract: a crash in `start_ivf_maintenance`'s marker gap
    duplicates a batch's rows — duplicates are EXACT copies (same id,
    vector, list), so keeping one row per (list, id) restores the
    exactly-once corpus, and the centroid table is recomputed EXACTLY
    from the deduped corpus (the build's own aggregation —
    ``similarity.centroid_table``).  The arrival-fit history is
    PRESERVED: compaction restores what the folds meant to write, it
    does not change the geometry the history was measured against.

    Cost: O(corpus) — one shuffled rewrite (+ one aggregation when
    deduping).  This is the off-hot-path nightly op; appends stay
    O(delta).  Returns ``{"rows_before", "rows_after", "files_before",
    "files_after", "duplicates_removed"}``."""
    from defenda_data_lake_spark.operators.similarity import centroid_table

    def _stats(df):
        # rows + distinct files in ONE aggregation (two separate
        # count() jobs per side would double the stat scans); the
        # nondeterministic input_file_name() must be projected first —
        # directly inside the aggregate it is rejected
        r = (
            df.select(F.input_file_name().alias("_f"))
            .agg(
                F.count("*").alias("r"), F.countDistinct("_f").alias("f")
            )
            .first()
        )
        return r["r"], r["f"]

    corpus_path = f"{index_dir}/corpus"
    with _raw_partition_strings(spark):
        corpus = spark.read.parquet(corpus_path).select(
            F.col(id_col), F.col(vec_col), F.col("__ivf_list")
        )
        rows_before, files_before = _stats(corpus)
        out = corpus
        if dedupe_ids:
            # duplicates are exact row copies: any survivor is THE row
            out = out.dropDuplicates(["__ivf_list", id_col])
        # one shuffle partition per list hash -> one file per list dir
        tmp = f"{index_dir}/.corpus-compact-tmp"
        (
            out.repartition("__ivf_list")
            .write.mode("overwrite")
            .partitionBy("__ivf_list")
            .parquet(tmp)
        )
        swap_directory(spark, tmp, corpus_path)
        compacted = spark.read.parquet(corpus_path).select(
            F.col(id_col), F.col(vec_col), F.col("__ivf_list")
        )
        rows_after, files_after = _stats(compacted)
        if dedupe_ids and rows_after != rows_before:
            # the corpus changed: recompute the centroid table exactly
            # (same aggregation as the build) and swap it in
            dim = len(
                spark.read.parquet(f"{index_dir}/centroids").first()[
                    "centroid"
                ]
            )
            tmp_c = f"{index_dir}/.centroids-compact-tmp"
            centroid_table(
                compacted, F.col("__ivf_list"), vec_col, dim
            ).write.mode("overwrite").parquet(tmp_c)
            swap_directory(spark, tmp_c, f"{index_dir}/centroids")
    return {
        "rows_before": rows_before,
        "rows_after": rows_after,
        "files_before": files_before,
        "files_after": files_after,
        "duplicates_removed": rows_before - rows_after,
    }
