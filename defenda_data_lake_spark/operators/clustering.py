"""Iterative clustering over embedding columns — Lloyd's k-means as a
DataFrame loop.

This is the engine's representative of the *iterative-algorithm* class
(driver-side loop over declarative steps; each iteration is one Spark
job).  Used to build real IVF indexes (`similarity.ivf_topk` accepts
any partition column — feed it `kmeans_assign`'s output).

Determinism: init = the ``k`` lowest-id vectors; assignment ties break
on centroid id; iteration count is fixed (no convergence RNG).

Cross-engine reproducibility: after every mean update the centroid
components are *quantized* to ``quantize`` decimal places (the same
scale-round-unscale scheme as ``plans.catalog.R``).  Without this, the
engines' different summation orders leave each centroid off by an ULP
and the drift compounds through iterations; with it, any engine that
averages the same assignments lands on bit-identical centroids, so the
whole Lloyd loop — and therefore the final assignment — is
value-checkable against a SQL replay (``plans.catalog.Q47_SQL``).
Quantizing at 1e-9 perturbs a centroid by <1e-9 per component, far
below any meaningful cluster geometry.

Scale notes: per iteration — one broadcast of k centroids (tiny), one
narrow assignment projection, one shuffle keyed by cluster id for the
mean (k groups, map-side partial agg).  State between iterations lives
in the driver as k plain vectors, not a cached DataFrame — no lineage
growth with iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from defenda_data_lake_spark.utils.partitioning import (
    ensure_min_parallelism,
    kernel_parallelism,
)


def _sq_dist(vec_col, centroid_literal):
    return F.aggregate(
        F.zip_with(
            F.transform(vec_col, lambda v: v.cast("double")),
            centroid_literal,
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int | None = 9,
) -> DataFrame:
    """Assign every vector to one of ``k`` clusters after a fixed
    number of Lloyd iterations.  Returns (id, cluster, sq_dist)."""
    base = ensure_min_parallelism(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
        kernel_parallelism(df),
    ).cache()
    try:
        # deterministic init: the k lowest-id vectors
        init_rows = base.orderBy("id").limit(k).collect()
        centroids: list[list[float]] = [
            [float(x) for x in r["vec"]] for r in init_rows
        ]

        def assignment(cents: list[list[float]]):
            dist_cols = [
                _sq_dist(F.col("vec"), F.array(*[F.lit(v) for v in c])).alias(
                    f"d{i}"
                )
                for i, c in enumerate(cents)
            ]
            with_d = base.select("id", "vec", *dist_cols)
            best = F.least(*[F.col(f"d{i}") for i in range(len(cents))])
            cluster = F.lit(None).cast("int")
            # first centroid achieving the min wins (tie-break by id)
            for i in reversed(range(len(cents))):
                cluster = F.when(F.col(f"d{i}") == best, F.lit(i)).otherwise(
                    cluster
                )
            return with_d.select(
                "id", "vec", cluster.alias("cluster"), best.alias("sq_dist")
            )

        scale = 10 ** quantize if quantize is not None else None
        for _ in range(iterations):
            assigned = assignment(centroids)
            mean_col = F.avg(F.col("c").cast("double"))
            if scale is not None:
                # same scheme as plans.catalog.R: round in the scaled
                # domain so DuckDB's round(x, n) lands on the same double
                mean_col = F.round(mean_col * scale, 0) / scale
            means = (
                assigned.select("cluster", F.posexplode("vec").alias("pos", "c"))
                .groupBy("cluster", "pos")
                .agg(mean_col.alias("m"))
                .groupBy("cluster")
                .agg(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
                )
                .select(
                    "cluster",
                    F.transform("pm", lambda s: s["m"]).alias("centroid"),
                )
                .collect()
            )
            new_centroids = list(centroids)  # empty clusters keep position
            for row in means:
                new_centroids[row["cluster"]] = [float(x) for x in row["centroid"]]
            centroids = new_centroids

        return assignment(centroids).select("id", "cluster", "sq_dist")
    finally:
        base.unpersist()
