#!/usr/bin/env python
"""Stage decomposition for the CC-composed catalog entries (q49/q98/
q107/q127): how much of the wall is (a) the minhash pair stage,
(b) the connected-components loop, (c) the per-query tail — and how
big is the loop's working set (|V| vs edge-participating nodes)?
Guide §1: measure before touching connected_components.
"""

from __future__ import annotations

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
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from defenda_data_lake_spark.operators import dedup as D
    from defenda_data_lake_spark.plans.catalog import warm_table_cache
    from defenda_data_lake_spark.plans.catalog_shared import _t
    from defenda_data_lake_spark.session import get_spark, tune_for_input_scale

    spark = get_spark(app_name="cc-decomp")
    tune_for_input_scale(spark, sf_dir)
    warm_table_cache(spark, sf_dir)

    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()
    pairs = D.minhash_lsh_candidates(docs, num_hashes=8, bands=2, shingle_n=3)
    spark.sparkContext.setJobDescription("cc-decomp: pairs stage")
    t_pairs = wall(pairs)
    n_pairs = pairs.count()
    e = pairs.select(
        F.col("id_a").cast("long").alias("src"),
        F.col("id_b").cast("long").alias("dst"),
    )
    n_edge_nodes = (
        e.select("src").union(e.select("dst").alias("src")).distinct().count()
    )
    print(
        f"docs={n_docs} pairs={n_pairs} edge_nodes={n_edge_nodes} "
        f"(loop working set today = {n_docs}, could be {n_edge_nodes})"
    )
    print(f"pairs stage wall: {t_pairs:.3f}s")

    spark.sparkContext.setJobDescription("cc-decomp: full CC")
    t0 = time.perf_counter()
    labels = D.connected_components(pairs, all_ids=docs.select("doc_id"))
    t_cc_build = time.perf_counter() - t0  # loop itself runs eagerly
    t_cc = wall(labels)
    print(f"CC loop (eager, incl pairs recompute): {t_cc_build:.3f}s; "
          f"label-scan wall after: {t_cc:.3f}s")

    spark.sparkContext.setJobDescription("cc-decomp: q49 tail")
    clus = D.duplicate_clusters(docs, pairs)
    t_q49 = wall(clus)
    print(f"q49 full wall: {t_q49:.3f}s")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
