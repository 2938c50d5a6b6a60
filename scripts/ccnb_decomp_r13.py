#!/usr/bin/env python
"""Round-13 (VERDICT r12 item 4): per-stage decomposition of the
CC/NB composition consumers — q127 (r12 sweep 2.43 s), q107 (2.31),
q98 (1.99), q49 (1.82) — the most expensive untouched catalog paths.

Splits each entry's wall into (a) the MinHash-LSH candidate stage,
(b) the connected-components loop (with PER-ROUND walls and the
convergence-check job counted separately), (c) the NB scored-view
build vs reuse (q127), and (d) the per-entry tail.  Guide §1.1: name
the binding stage before touching anything.

Usage: python scripts/ccnb_decomp_r13.py  (sf dir from
$SPARK_GRAFT_SF_DIR, default sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TZ", "UTC")
time.tzset()

from pyspark.sql import functions as F  # noqa: E402


def wall(df, reps=2):
    df.write.format("noop").mode("overwrite").save()  # warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def timed_cc(pairs, all_ids, max_iterations=50):
    """connected_components with per-round instrumentation — the same
    dataflow as operators/dedup.py::connected_components (checkpoint
    per round, sum-convergence collect), timings split per phase."""
    t = {"rounds": []}
    t0 = time.perf_counter()
    e = pairs.select(
        F.col("id_a").cast("long").alias("src"),
        F.col("id_b").cast("long").alias("dst"),
    )
    edges = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    t["edges_checkpoint"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    nodes = edges.select(F.col("src").alias("id"))
    first = all_ids.columns[0]
    nodes = nodes.union(all_ids.select(F.col(first).cast("long").alias("id")))
    labels = (
        nodes.distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=True)
    )
    t["labels_init"] = round(time.perf_counter() - t0, 3)

    prev_sum = None
    for _ in range(max_iterations):
        r0 = time.perf_counter()
        lab = labels.alias("lab")
        nbr_min = (
            edges.alias("e")
            .join(lab, F.col("e.dst") == F.col("lab.id"))
            .groupBy(F.col("e.src").alias("nid"))
            .agg(F.min("lab.label").alias("nbr_label"))
        )
        stepped = (
            labels.alias("l")
            .join(nbr_min, F.col("l.id") == F.col("nid"), "left")
            .select(
                F.col("l.id").alias("id"),
                F.least(
                    F.col("l.label"),
                    F.coalesce(F.col("nbr_label"), F.col("l.label")),
                ).alias("label"),
            )
        )
        parent = stepped.select(
            F.col("id").alias("pid"), F.col("label").alias("plabel")
        )
        labels = (
            stepped.alias("s")
            .join(parent, F.col("s.label") == F.col("pid"), "left")
            .select(
                F.col("s.id").alias("id"),
                F.coalesce(F.col("plabel"), F.col("s.label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        t_ckpt = round(time.perf_counter() - r0, 3)
        c0 = time.perf_counter()
        cur = labels.agg(F.sum("label")).collect()[0][0]
        t_conv = round(time.perf_counter() - c0, 3)
        t["rounds"].append({"checkpoint": t_ckpt, "convergence": t_conv})
        if cur == prev_sum:
            break
        prev_sum = cur
    t["n_rounds"] = len(t["rounds"])
    t["loop_total"] = round(
        sum(r["checkpoint"] + r["convergence"] for r in t["rounds"]), 3
    )
    return t, labels


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from defenda_data_lake_spark.operators import dedup as D
    from defenda_data_lake_spark.plans.catalog import CATALOG, warm_table_cache
    from defenda_data_lake_spark.plans.catalog_shared import _t
    from defenda_data_lake_spark.session import get_spark, tune_for_input_scale

    spark = get_spark(app_name="ccnb-decomp-r13")
    tune_for_input_scale(spark, sf_dir)
    warm_table_cache(spark, sf_dir)
    import pandas as _pd

    spark.range(1000).repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    ).mapInPandas(
        lambda it: (_pd.DataFrame({"id": b["id"]}) for b in it), schema="id long"
    ).count()

    out = {}
    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_candidates(docs, num_hashes=8, bands=2, shingle_n=3)
    spark.sparkContext.setJobDescription("ccnb: pairs stage")
    out["pairs_stage"] = wall(pairs)

    spark.sparkContext.setJobDescription("ccnb: CC loop instrumented")
    cc_t, labels = timed_cc(pairs, docs.select("doc_id"))
    out["cc"] = cc_t

    spark.sparkContext.setJobDescription("ccnb: clusters tail")
    clus = D.duplicate_clusters(docs, pairs)
    out["q49_shape_full"] = wall(clus)

    # NB scored view: build (cold per session) vs reuse
    from defenda_data_lake_spark.plans.catalog_ml import _nb_scored_view

    spark.sparkContext.setJobDescription("ccnb: nb view build")
    t0 = time.perf_counter()
    sv = _nb_scored_view(spark, sf_dir)
    sv.write.format("noop").mode("overwrite").save()
    out["nb_view_build_first"] = round(time.perf_counter() - t0, 3)
    out["nb_view_reuse"] = wall(_nb_scored_view(spark, sf_dir))

    for name in (
        "q49_dup_clusters",
        "q98_leakage_safe_split",
        "q107_quality_survivors",
        "q127_preference_pairs",
    ):
        fn, _ = CATALOG[name]
        spark.sparkContext.setJobDescription(f"ccnb: {name}")
        out[name] = wall(fn(spark, sf_dir))
    spark.sparkContext.setJobDescription(None)
    out["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
