"""Similarity search over embedding columns (``array<float>``).

Spark-first: dot products and norms are built-in higher-order
expressions (``aggregate``/``zip_with``) executing JVM-side inside
codegen — no Python in the hot path.

Scale notes (100 TB / billions of vectors):

* ``cosine_topk`` broadcasts the (small) query set against the full
  corpus — a map-side nested loop per partition, no shuffle of the
  corpus, then a per-query top-k (``TakeOrderedAndProject``-style via
  window + filter).  Cost is O(|corpus| * |queries|); right whenever
  queries are a handful.
* ``lsh_cosine_topk`` is the scale path: random-hyperplane signatures
  bucket the corpus once (narrow projection), queries probe only their
  bucket — turning the scan into an equi-join on the signature.  Planes
  are derived deterministically from md5 so signatures are reproducible
  across runs and engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from defenda_data_lake_spark.utils.partitioning import ensure_min_parallelism


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def with_cosine(df: DataFrame, a_col: str, b_col: str, out: str = "cosine") -> DataFrame:
    """Append a cosine-similarity column between two array columns
    (computed in double precision)."""
    a = F.transform(F.col(a_col), lambda v: v.cast("double"))
    b = F.transform(F.col(b_col), lambda v: v.cast("double"))
    return df.withColumn(out, _dot(a, b) / (_norm(a) * _norm(b)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: for every query vector, the k nearest
    corpus vectors (excluding itself).  Returns
    (query_id, neighbor_id, cosine, rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = ensure_min_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(
                F.transform("q_vec", lambda v: v.cast("double")),
                F.transform("c_vec", lambda v: v.cast("double")),
            )
            / (
                _norm(F.transform("q_vec", lambda v: v.cast("double")))
                * _norm(F.transform("c_vec", lambda v: v.cast("double")))
            ),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
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
    ``n_probe`` lists whose centroids are nearest — turning the scan
    into a centroid ranking (tiny) plus an equi-join on list id.

    Deterministic end-to-end (mean centroids, fixed tie-breaks), so the
    approximate result is still oracle-checkable.

    Scale: centroids are |lists| rows (broadcast); the candidate join
    shuffles only on the list id.  This is the standard
    billion-vector layout (FAISS IVF) expressed relationally."""
    # element-wise mean per list: posexplode -> avg per (list, pos)
    exploded = corpus.select(
        F.col(partition_col).alias("list_id"),
        F.posexplode(F.col(vec_col)).alias("pos", "component"),
    )
    centroids = (
        exploded.groupBy("list_id", "pos")
        .agg(F.avg(F.col("component").cast("double")).alias("mean_c"))
        .groupBy("list_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mean_c"))).alias("pairs"))
        .select(
            "list_id",
            F.transform(F.col("pairs"), lambda s: s["mean_c"]).alias("centroid"),
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    # rank lists per query by centroid cosine; keep n_probe
    qc = q.crossJoin(F.broadcast(centroids)).withColumn(
        "c_cos",
        _dot(F.transform("q_vec", lambda v: v.cast("double")), F.col("centroid"))
        / (
            _norm(F.transform("q_vec", lambda v: v.cast("double")))
            * _norm(F.col("centroid"))
        ),
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("c_cos").desc(), F.col("list_id")
    )
    probed = (
        qc.withColumn("probe_rank", F.row_number().over(w_probe))
        .filter(F.col("probe_rank") <= n_probe)
        .select("query_id", "q_vec", "list_id")
    )
    c = ensure_min_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(partition_col).alias("list_id"),
    )
    scored = (
        c.join(F.broadcast(probed), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(
                F.transform("q_vec", lambda v: v.cast("double")),
                F.transform("c_vec", lambda v: v.cast("double")),
            )
            / (
                _norm(F.transform("q_vec", lambda v: v.cast("double")))
                * _norm(F.transform("c_vec", lambda v: v.cast("double")))
            ),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
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


def lsh_signature_col(vec_col: str, planes: list[list[float]]):
    """Bit-string signature column: one sign bit per hyperplane."""
    bits = []
    for plane in planes:
        arr = F.array(*[F.lit(v) for v in plane])
        dot = _dot(F.transform(F.col(vec_col), lambda v: v.cast("double")), arr)
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


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
    the query's bucket (equi-join), then exact cosine ranks them.

    Recall < 1.0 by construction (bucket boundaries); increase recall
    with fewer planes (bigger buckets) or multi-probe."""
    planes = _hyperplanes(dim, num_planes)
    c = ensure_min_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        lsh_signature_col(vec_col, planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_signature_col(vec_col, planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(
                F.transform("q_vec", lambda v: v.cast("double")),
                F.transform("c_vec", lambda v: v.cast("double")),
            )
            / (
                _norm(F.transform("q_vec", lambda v: v.cast("double")))
                * _norm(F.transform("c_vec", lambda v: v.cast("double")))
            ),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
