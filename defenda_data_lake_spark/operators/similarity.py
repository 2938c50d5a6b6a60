"""Similarity search over embedding columns (``array<float>``).

Kernel strategy: vector math is a *numpy batch kernel* hosted in
Arrow-batched ``mapInPandas`` / ``pandas_udf`` — one BLAS matmul per
(corpus-partition x query-block), norms precomputed once.  The earlier
higher-order-function formulation (``F.aggregate``/``F.zip_with``)
evaluated its lambdas on Spark's interpreted path per array element and
was ~70x slower than DuckDB on the same data; the matmul kernel is the
design a 100 TB deployment wants anyway.

Scale notes (100 TB / billions of vectors):

* ``cosine_topk`` broadcasts the (small, by contract) query matrix to
  every corpus partition — no shuffle of the corpus, no replication of
  corpus vectors into joined rows.  Each partition emits only its local
  top-k per query (correct global tie-breaks preserved), so the final
  ranking window sees at most partitions x |queries| x k tiny rows.
* ``lsh_cosine_topk`` is the sub-linear path: deterministic
  random-hyperplane buckets (md5-derived planes, reproducible across
  engines) restrict each query's candidates to its own bucket.
* ``ivf_topk`` is the FAISS-IVF layout expressed relationally:
  per-list mean centroids via per-component partial aggregation (64
  ``avg`` columns — map-side combine, no vector explode), probe the
  nearest ``n_probe`` lists, score only those lists.
* ``lsh_near_duplicates`` is the corpus-self-join near-dup path: an
  equi-join on the bucket signature instead of an O(n^2) cross join.

The exact all-pairs near-dup (``exact_near_duplicates``) is retained as
the small-scale reference implementation / oracle for tests.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _stack(series: pd.Series) -> np.ndarray:
    """(n, dim) float64 matrix from an Arrow list column."""
    return np.array(series.to_list(), dtype=np.float64)


def cosine_col(a_col: str, b_col: str):
    """Column expression: cosine similarity between two array columns,
    computed by a vectorized Arrow-batched numpy kernel (float64)."""

    @F.pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = _stack(a)
        B = _stack(b)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / den)

    return _cos(F.col(a_col), F.col(b_col))


def with_cosine(df: DataFrame, a_col: str, b_col: str, out: str = "cosine") -> DataFrame:
    """Append a cosine-similarity column between two array columns
    (computed in double precision)."""
    return df.withColumn(out, cosine_col(a_col, b_col))


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_vec: str = "q_embedding",
    out_scale: str = "q_scale",
) -> DataFrame:
    """Per-vector symmetric int8 quantization: ``q_i = floor(v_i * 127
    / maxabs(v) + 0.5)`` (zero vectors quantize to zeros with scale
    1/127), plus the per-vector ``scale = maxabs/127`` needed to
    dequantize.

    This is the 100 TB lever for the ANN family: int8 vectors are 4x
    smaller than float32 on disk, in shuffle, and in memory, and
    cosine similarity is *scale-invariant per vector*, so top-k on the
    quantized ints needs no dequantization at all — only operators that
    need absolute magnitudes (dot-product scoring, reconstruction)
    touch ``q_scale``.

    Arithmetic is plain double ops in a fixed order
    (``v*127 / maxabs + 0.5``), so any engine replays it bit-for-bit
    (Q48's DuckDB oracle does, via ``list_transform``)."""

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = _stack(pdf[vec_col])
            maxabs = np.abs(V).max(axis=1)
            safe = np.where(maxabs == 0.0, 1.0, maxabs)
            Qm = (
                np.floor(V * 127.0 / safe[:, None] + 0.5)
                .clip(-127, 127)
                .astype(np.int8)
            )
            out = pdf.copy()
            out[out_vec] = list(Qm)
            out[out_scale] = safe / 127.0
            yield out

    from pyspark.sql import types as T

    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField(out_vec, T.ArrayType(T.ByteType())),
            T.StructField(out_scale, T.DoubleType()),
        ]
    )
    return df.mapInPandas(kernel, schema=schema)


def quantized_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k over int8-quantized vectors: quantize
    both sides, then run the standard matmul kernel on the int8 arrays
    (scale cancels in cosine).  Integer dot products are exact in the
    float64 matmul (|q| <= 127, so dims into the thousands stay within
    exact-integer range), making the approximate scoring fully
    deterministic and oracle-checkable."""
    q_corpus = quantize_embeddings(corpus, vec_col).select(
        id_col, F.col("q_embedding").alias(vec_col)
    )
    q_queries = quantize_embeddings(queries, vec_col).select(
        id_col, F.col("q_embedding").alias(vec_col)
    )
    return cosine_topk(q_corpus, q_queries, k=k, id_col=id_col, vec_col=vec_col)


def _collect_queries(queries: DataFrame, id_col: str, vec_col: str):
    """Materialize the query block driver-side for broadcast.  Queries
    are small by contract (an ANN batch, not a table); this is the
    broadcast pattern, not a driver-side loop over the corpus."""
    pdf = queries.select(id_col, vec_col).toPandas()
    q_ids = pdf[id_col].to_numpy()
    Q = np.array(pdf[vec_col].to_list(), dtype=np.float64)
    return q_ids, Q


def _partial_topk_rows(cand_cos, cand_ids, k):
    """Indices of the local top-k by (cosine desc, id asc) — the same
    ordering the global ranking window applies, so partition-local
    pruning can never change the global result."""
    if len(cand_ids) > k:
        order = np.lexsort((cand_ids, -cand_cos))[:k]
    else:
        order = np.arange(len(cand_ids))
    return order


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: for every query vector, the k nearest
    corpus vectors (excluding itself).  Returns
    (query_id, neighbor_id, cosine, rank).

    One matmul per (corpus partition x query block); each partition
    emits only its local top-k per query.

    Kernel parallelism is bytes-proportional (house policy,
    ``kernel_parallelism``): a sub-MB corpus runs the kernel in one or
    two tasks instead of inheriting the cache's 32 partitions —
    measured ~0.25 s of pure Python-task dispatch on a 1 MB corpus at
    32 tasks, with the matmul itself microseconds.  A big corpus gets
    one task per ~bytes_per_task as before; ``coalesce`` merges
    without a shuffle, so the scan stays cache/file-local either
    way."""
    q_ids, Q = _collect_queries(queries, id_col, vec_col)
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, Q))
    id_t = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"query_id {id_t}, neighbor_id {id_t}, cosine double"

    def score(batches):
        b_ids, b_Q = bc.value
        nq = np.linalg.norm(b_Q, axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = _stack(pdf[vec_col])
            ids = pdf[id_col].to_numpy()
            nc = np.linalg.norm(C, axis=1)
            S = (C @ b_Q.T) / np.outer(nc, nq)
            outs = []
            for j in range(len(b_ids)):
                mask = ids != b_ids[j]
                cand_ids = ids[mask]
                cand_cos = S[mask, j]
                if len(cand_ids) == 0:
                    continue
                keep = _partial_topk_rows(cand_cos, cand_ids, k)
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": np.repeat(b_ids[j], len(keep)),
                            "neighbor_id": cand_ids[keep],
                            "cosine": cand_cos[keep],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    from defenda_data_lake_spark.utils.partitioning import kernel_parallelism

    scored = (
        corpus.select(id_col, vec_col)
        .coalesce(kernel_parallelism(corpus))
        .mapInPandas(score, schema=out_schema)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def semantic_contamination(
    corpus: DataFrame,
    eval_set: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-level decontamination — flag corpus documents whose
    embedding is suspiciously close to ANY benchmark/eval item
    (max cosine ≥ ``threshold``), the semantic complement of n-gram
    decontamination (q51): paraphrased or translated eval contamination
    shares no 8-gram but lands next to the eval item in embedding
    space.  Returns flagged rows only:
    ``(id, nearest_eval_id, max_eval_cosine)`` with ties on the max
    broken to the LOWEST eval id.

    Scale (100 TB): eval sets are bounded by contract (benchmarks, not
    corpora) — collected once and broadcast like ``cosine_topk``'s
    query block; the corpus is scanned ONCE with a matmul per
    (partition x eval block), no shuffle, no join, and only flagged
    rows leave the executors.  This is the production shape: the big
    side streams, the small side rides the closure."""
    e_ids, E = _collect_queries(eval_set, id_col, vec_col)
    spark = corpus.sparkSession
    id_t = corpus.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_t}, nearest_eval_id {id_t}, max_eval_cosine double"
    )
    if len(e_ids) == 0:
        # an empty eval set can contaminate nothing (and an empty
        # matrix has no axis-1 for the kernel's norms)
        return spark.createDataFrame([], out_schema)
    order = np.argsort(e_ids, kind="stable")
    e_ids, E = e_ids[order], E[order]  # argmax-first-max => lowest id
    bc = spark.sparkContext.broadcast((e_ids, E))

    def score(batches):
        b_ids, b_E = bc.value
        ne = np.linalg.norm(b_E, axis=1)
        for pdf in batches:
            if len(pdf) == 0 or len(b_ids) == 0:
                continue
            C = _stack(pdf[vec_col])
            nc = np.linalg.norm(C, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                S = (C @ b_E.T) / np.outer(nc, ne)
            S = np.nan_to_num(S, nan=-np.inf)
            mx = S.max(axis=1)
            keep = mx >= threshold
            if not keep.any():
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[keep],
                    "nearest_eval_id": b_ids[np.argmax(S[keep], axis=1)],
                    "max_eval_cosine": mx[keep],
                }
            )

    from defenda_data_lake_spark.utils.partitioning import kernel_parallelism

    return (
        corpus.select(id_col, vec_col)
        .coalesce(kernel_parallelism(corpus))
        .mapInPandas(score, schema=out_schema)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partition_col: str = "label",
    n_probe: int = 1,
) -> DataFrame:
    """IVF-style approximate top-k: the corpus is partitioned into
    inverted lists (here: an existing ``partition_col``; in a full
    pipeline, a k-means assignment), a centroid is computed per list
    as the element-wise mean vector, and each query probes only the
    ``n_probe`` lists whose centroids are nearest.

    Deterministic end-to-end (mean centroids, fixed tie-breaks), so the
    approximate result is still oracle-checkable.

    Scale: centroid aggregation is per-component ``avg`` columns —
    map-side partial agg, never an exploded shuffle of the vectors; the
    centroid table is |lists| rows (collected driver-side like any
    broadcast dim).  Scoring touches only the probed lists and emits
    partition-local top-k.  This is the standard billion-vector layout
    (FAISS IVF) expressed relationally."""
    q_ids, Q = _collect_queries(queries, id_col, vec_col)
    id_t = corpus.schema[id_col].dataType.simpleString()
    if len(q_ids) == 0:
        return corpus.sparkSession.createDataFrame(
            [], f"query_id {id_t}, neighbor_id {id_t}, cosine double, rank int"
        )
    # dim comes from the already-collected query block — no extra
    # head() job against the corpus (which would also crash on an
    # empty corpus)
    dim = Q.shape[1]
    # per-component means: one shuffle of (lists x dim) partial sums
    cent_rows = (
        corpus.groupBy(F.col(partition_col).alias("list_id"))
        .agg(
            *[
                F.avg(F.col(vec_col)[i].cast("double")).alias(f"m{i}")
                for i in range(dim)
            ]
        )
        .collect()
    )
    if not cent_rows:
        return corpus.sparkSession.createDataFrame(
            [], f"query_id {id_t}, neighbor_id {id_t}, cosine double, rank int"
        )
    list_ids = [r["list_id"] for r in cent_rows]
    Cent = np.array([[r[f"m{i}"] for i in range(dim)] for r in cent_rows])
    # probe ranking: queries x lists is tiny; same (desc cosine, list_id)
    # tie-break the relational formulation used
    sims = (Q @ Cent.T) / np.outer(
        np.linalg.norm(Q, axis=1), np.linalg.norm(Cent, axis=1)
    )
    allowed: dict = {}
    l_arr = np.array(list_ids)
    for j, qid in enumerate(q_ids):
        order = np.lexsort((l_arr, -sims[j]))[:n_probe]
        allowed[qid] = set(l_arr[order].tolist())
    probed_lists = sorted({l for s in allowed.values() for l in s})

    corpus_sel = corpus.filter(F.col(partition_col).isin(probed_lists)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col(partition_col).alias("__list_id"),
    )
    return _ivf_score_and_rank(
        corpus_sel, q_ids, Q, allowed, k, id_col, vec_col, id_t
    )


def _ivf_score_and_rank(
    corpus_sel: DataFrame,
    q_ids,
    Q,
    allowed: dict,
    k: int,
    id_col: str,
    vec_col: str,
    id_t: str,
) -> DataFrame:
    """Shared IVF scoring tail (used by :func:`ivf_topk` and
    :func:`ivf_probe`): partition-local exact cosine over the probed
    lists' rows, partial top-k per task, global top-k window finish.
    ``corpus_sel`` must expose ``id_col``, ``vec_col``, ``__list_id``."""
    spark = corpus_sel.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, Q, allowed))
    out_schema = f"query_id {id_t}, neighbor_id {id_t}, cosine double"

    def score(batches):
        b_ids, b_Q, b_allowed = bc.value
        nq = np.linalg.norm(b_Q, axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = _stack(pdf[vec_col])
            ids = pdf[id_col].to_numpy()
            lists = pdf["__list_id"].to_numpy()
            nc = np.linalg.norm(C, axis=1)
            outs = []
            for j in range(len(b_ids)):
                ok = np.fromiter(
                    (l in b_allowed[b_ids[j]] for l in lists), bool, len(lists)
                )
                mask = ok & (ids != b_ids[j])
                if not mask.any():
                    continue
                cand_cos = (C[mask] @ b_Q[j]) / (nc[mask] * nq[j])
                cand_ids = ids[mask]
                keep = _partial_topk_rows(cand_cos, cand_ids, k)
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": np.repeat(b_ids[j], len(keep)),
                            "neighbor_id": cand_ids[keep],
                            "cosine": cand_cos[keep],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    scored = corpus_sel.mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def centroid_table(
    corpus: DataFrame, list_key, vec_col: str, dim: int
) -> DataFrame:
    """``(list_id, centroid, n)`` aggregated from a corpus and its
    list-key column expression — per-component partial aggregation
    (map-side combine, no vector explode).  The list size rides along
    so incremental maintenance (``incremental_ivf.append_ivf_index``)
    can fold exact running means without rescanning the corpus.  ONE
    definition serves the build and ``compact_ivf_index``'s exact
    recompute."""
    return (
        corpus.groupBy(list_key.alias("list_id"))
        .agg(
            F.count("*").cast("long").alias("n"),
            *[
                F.avg(F.col(vec_col)[i].cast("double")).alias(f"m{i}")
                for i in range(dim)
            ],
        )
        .select(
            "list_id",
            F.array(*[F.col(f"m{i}") for i in range(dim)]).alias("centroid"),
            "n",
        )
    )


def build_ivf_index(
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partition_col: str = "label",
) -> None:
    """Persist an IVF index: the corpus REWRITTEN partitioned by its
    inverted-list key plus a centroid table — the "build once, probe
    many" layout :func:`ivf_topk` computes inline on every call.

    Two parquet datasets under ``index_dir``:

    * ``corpus/`` — (id, vec) partitioned BY LIST (``__ivf_list=...``
      directories), so a probe's ``isin(probed_lists)`` filter becomes
      PARTITION PRUNING: probing 1 of L lists reads ~1/L of the bytes.
      This is the property that makes IVF an index rather than a scan
      order — at 100 TB the probe never opens the unprobed files.
    * ``centroids/`` — (list_id string, centroid array<double>),
      |lists| rows; the probe reads + collects it like any broadcast
      dim.

    The list key is stored as STRING (directory-encoded partition
    values round-trip through paths; probing compares strings
    consistently on both sides).  Rebuild after significant corpus
    churn — like any IVF deployment, centroid drift degrades recall,
    not correctness; ``incremental_ivf.append_ivf_index`` folds
    arrival batches in between rebuilds and reports the drift."""
    dim_row = corpus.select(F.size(F.col(vec_col)).alias("d")).head()
    if dim_row is None:
        raise ValueError("cannot build an IVF index from an empty corpus")
    dim = dim_row["d"]
    lk = F.col(partition_col).cast("string")
    (
        corpus.select(
            F.col(id_col), F.col(vec_col), lk.alias("__ivf_list")
        )
        .repartition("__ivf_list")
        .write.mode("overwrite")
        .partitionBy("__ivf_list")
        .parquet(f"{index_dir}/corpus")
    )
    centroid_table(corpus, lk, vec_col, dim).write.mode(
        "overwrite"
    ).parquet(f"{index_dir}/centroids")
    # zeroed arrival-fit history: appends accumulate the fit of each
    # arrival batch to the centroids of ITS time, and compare new
    # batches against that history (see incremental_ivf's drift
    # section).  A rebuild resets the history — the geometry changed.
    from defenda_data_lake_spark.utils.partitioning import bounded_local_df

    spark = corpus.sparkSession
    (
        bounded_local_df(
            spark, [(0.0, 0)], "arr_fit_sum double, arr_n long"
        )
        .write.mode("overwrite")
        .parquet(f"{index_dir}/arrival_fit")
    )
    # ...and a rebuild also invalidates streaming-maintenance
    # bookkeeping: delete the fold marker `start_ivf_maintenance`
    # leaves here — the documented rebuild-and-restart workflow uses a
    # FRESH checkpoint whose batches renumber from 0, and a stale
    # high-water marker would make every one of them look like a
    # redelivery and silently skip it
    jvm = spark.sparkContext._jvm
    marker = jvm.org.apache.hadoop.fs.Path(f"{index_dir}/_last_batch_id")
    fs = marker.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(marker):
        fs.delete(marker, False)


def ivf_probe(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a persisted :func:`build_ivf_index` index: rank the
    centroid table per query (driver-side — it is |lists| rows), then
    scan ONLY the probed list partitions (partition-pruned read) and
    score with the same kernel as :func:`ivf_topk`.  Identical
    results to the inline form on the same corpus (parity-tested);
    the difference is the read: inline scans the whole corpus to
    filter it, the index scans ~n_probe/L of the files."""
    cent_rows = spark.read.parquet(f"{index_dir}/centroids").collect()
    corpus = spark.read.parquet(f"{index_dir}/corpus")
    id_t = corpus.schema[id_col].dataType.simpleString()
    q_ids, Q = _collect_queries(queries, id_col, vec_col)
    if len(q_ids) == 0 or not cent_rows:
        return spark.createDataFrame(
            [], f"query_id {id_t}, neighbor_id {id_t}, cosine double, rank int"
        )
    list_ids = [r["list_id"] for r in cent_rows]
    Cent = np.array([list(r["centroid"]) for r in cent_rows])
    sims = (Q @ Cent.T) / np.outer(
        np.linalg.norm(Q, axis=1), np.linalg.norm(Cent, axis=1)
    )
    allowed: dict = {}
    l_arr = np.array(list_ids)
    for j, qid in enumerate(q_ids):
        order = np.lexsort((l_arr, -sims[j]))[:n_probe]
        allowed[qid] = set(l_arr[order].tolist())
    probed_lists = sorted({l for s in allowed.values() for l in s})

    corpus_sel = corpus.filter(
        F.col("__ivf_list").isin(probed_lists)
    ).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("__ivf_list").cast("string").alias("__list_id"),
    )
    return _ivf_score_and_rank(
        corpus_sel, q_ids, Q, allowed, k, id_col, vec_col, id_t
    )


def _hyperplanes(dim: int, num_planes: int, seed: str = "lsh") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) is a
    zero-centered value derived from md5(seed|p|d).  Reproducible
    everywhere, no RNG state."""
    planes = []
    for p in range(num_planes):
        plane = []
        for d in range(dim):
            digest = hashlib.md5(f"{seed}|{p}|{d}".encode()).digest()
            value = int.from_bytes(digest[:8], "big") / float(1 << 64) - 0.5
            plane.append(value)
        planes.append(plane)
    return planes


def lsh_bucket_col(vec_col: str, planes: list[list[float]]):
    """Bit-string bucket signature column (one sign bit per hyperplane),
    computed by a vectorized numpy kernel — one matmul per Arrow batch."""
    P = np.array(planes, dtype=np.float64)

    @F.pandas_udf("string")
    def _bucket(v: pd.Series) -> pd.Series:
        V = _stack(v)
        bits = (V @ P.T) >= 0.0
        return pd.Series(
            ["".join("1" if b else "0" for b in row) for row in bits]
        )

    return _bucket(F.col(vec_col))


def _bits_to_str(bits_row) -> str:
    return "".join("1" if b else "0" for b in bits_row)


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """LSH-bucketed approximate top-k: corpus and queries are hashed
    with the same deterministic hyperplanes; candidates come only from
    the query's bucket, then exact cosine ranks them.

    Recall < 1.0 by construction (bucket boundaries); increase recall
    with fewer planes (bigger buckets) or multi-probe.

    With a broadcast query block the bucket restriction happens inside
    the scoring kernel itself (a per-row bucket compare) — no join, no
    second pass over the corpus."""
    planes = np.array(_hyperplanes(dim, num_planes), dtype=np.float64)
    q_ids, Q = _collect_queries(queries, id_col, vec_col)
    q_buckets = [_bits_to_str(row) for row in (Q @ planes.T) >= 0.0]

    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, Q, q_buckets, planes))
    id_t = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"query_id {id_t}, neighbor_id {id_t}, cosine double"

    def score(batches):
        b_ids, b_Q, b_buckets, b_planes = bc.value
        nq = np.linalg.norm(b_Q, axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = _stack(pdf[vec_col])
            ids = pdf[id_col].to_numpy()
            nc = np.linalg.norm(C, axis=1)
            c_bits = (C @ b_planes.T) >= 0.0
            c_buckets = np.array([_bits_to_str(row) for row in c_bits])
            outs = []
            for j in range(len(b_ids)):
                mask = (c_buckets == b_buckets[j]) & (ids != b_ids[j])
                if not mask.any():
                    continue
                cand_cos = (C[mask] @ b_Q[j]) / (nc[mask] * nq[j])
                cand_ids = ids[mask]
                keep = _partial_topk_rows(cand_cos, cand_ids, k)
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": np.repeat(b_ids[j], len(keep)),
                            "neighbor_id": cand_ids[keep],
                            "cosine": cand_cos[keep],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    from defenda_data_lake_spark.utils.partitioning import kernel_parallelism

    scored = (
        corpus.select(id_col, vec_col)
        .coalesce(kernel_parallelism(corpus))
        .mapInPandas(score, schema=out_schema)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def exact_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine near-dup (O(n^2) — the small-scale
    reference implementation the bucketed path is validated against in
    tests; not the registered catalog plan)."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        with_cosine(pairs, "va", "vb", out="cosine")
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def lsh_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """LSH-bucketed embedding near-dup pairs: the corpus is hashed once
    with deterministic hyperplanes, pairs come from an *equi-join on the
    bucket signature* (shuffle keyed on bucket — never a cross join),
    then exact cosine verifies the threshold.

    Approximate by construction (pairs straddling a bucket boundary are
    missed) but fully deterministic, so the result is oracle-checkable
    by replaying the same hyperplanes in SQL."""
    planes = _hyperplanes(dim, num_planes)
    hashed = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        lsh_bucket_col(vec_col, planes).alias("bucket"),
    )
    a = hashed.select(
        F.col("vid").alias("id_a"), F.col("vec").alias("va"), "bucket"
    )
    b = hashed.select(
        F.col("vid").alias("id_b"), F.col("vec").alias("vb"), "bucket"
    )
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    return (
        with_cosine(pairs, "va", "vb", out="cosine")
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
