#!/usr/bin/env python
"""Round-13: A/B the connected-components loop variants at the 32x
replica (the scale where |E| stops being stage-floor noise):

  A. r12 incumbent — eager per-round localCheckpoint + separate
     convergence sum job; edges checkpointed as distinct() leaves them
     (hash(src, dst)).
  B. lazy checkpoints (sum job materializes each round — 1 job/round)
  C. B + edges dst-partitioned once at build (the per-round
     neighbor-min join probes on dst; r13's pagerank lesson)

Same session, same warmed replica, value equality asserted across
variants.  Usage: python scripts/cc32_probe_r13.py [factor] [dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/repo")
os.environ.setdefault("TZ", "UTC")
time.tzset()

from pyspark.sql import functions as F  # noqa: E402

from scale_pairing_r10 import build  # noqa: E402


def cc_variant(pairs, all_ids, lazy: bool, dst_partition: bool):
    t = {"rounds": []}
    eager = not lazy
    t0 = time.perf_counter()
    e = pairs.select(
        F.col("id_a").cast("long").alias("src"),
        F.col("id_b").cast("long").alias("dst"),
    )
    edges = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    if dst_partition:
        edges = edges.repartition("dst")
    edges = edges.localCheckpoint(eager=eager)
    t["edges"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    first = all_ids.columns[0]
    nodes = edges.select(F.col("src").alias("id")).union(
        all_ids.select(F.col(first).cast("long").alias("id"))
    )
    labels = (
        nodes.distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=eager)
    )
    t["labels_init"] = round(time.perf_counter() - t0, 2)

    prev_sum = None
    for _ in range(50):
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
            .localCheckpoint(eager=eager)
        )
        cur = labels.agg(F.sum("label")).collect()[0][0]
        t["rounds"].append(round(time.perf_counter() - r0, 2))
        if cur == prev_sum:
            break
        prev_sum = cur
    t["n_rounds"] = len(t["rounds"])
    t["total"] = round(
        t["edges"] + t["labels_init"] + sum(t["rounds"]), 2
    )
    return t, labels


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    tmp = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/scale{factor}_r13"

    from defenda_data_lake_spark.operators import dedup as D
    from defenda_data_lake_spark.plans.catalog import (
        clear_table_cache,
        warm_table_cache,
    )
    from defenda_data_lake_spark.plans.catalog_shared import _t
    from defenda_data_lake_spark.session import get_spark, tune_for_input_scale

    spark = get_spark(app_name="cc32-probe-r13")
    if not os.path.isdir(f"{tmp}/documents.parquet"):
        build(spark, "/root/testdata/sf0.1", tmp, factor)
    clear_table_cache()
    tune_for_input_scale(spark, tmp)
    warm_table_cache(spark, tmp)
    import pandas as _pd

    spark.range(1000).repartition(32).mapInPandas(
        lambda it: (_pd.DataFrame({"id": b["id"]}) for b in it), schema="id long"
    ).count()

    docs = _t(spark, tmp, "documents")
    pairs = D.minhash_lsh_candidates(docs, num_hashes=8, bands=2, shingle_n=3)

    results = {}
    labels_by_variant = {}
    for key, lazy, dstp in (
        ("A_eager_srcdst", False, False),
        ("B_lazy_srcdst", True, False),
        ("C_lazy_dstpart", True, True),
    ):
        spark.sparkContext.setJobDescription(f"cc32: {key}")
        t, labels = cc_variant(pairs, docs.select("doc_id"), lazy, dstp)
        results[key] = t
        labels_by_variant[key] = labels
        print(json.dumps({key: t}), flush=True)

    a = labels_by_variant["A_eager_srcdst"].alias("a")
    for key in ("B_lazy_srcdst", "C_lazy_dstpart"):
        b = labels_by_variant[key].alias("b")
        diff = (
            a.join(b, F.col("a.id") == F.col("b.id"), "full")
            .where("a.label IS DISTINCT FROM b.label")
            .count()
        )
        print(json.dumps({f"mismatch_{key}": diff}), flush=True)
        assert diff == 0
    print(json.dumps({"loadavg": [round(x, 2) for x in os.getloadavg()]}))
    spark.stop()


if __name__ == "__main__":
    main()
