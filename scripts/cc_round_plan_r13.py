#!/usr/bin/env python
"""Plan evidence for the round-13 connected-components loop change
(operators/dedup.py): dump the ROUND-1 loop-body physical plan for

  before — the r12 shape: edges = union.distinct().localCheckpoint()
           (LogicalRDD keeps the distinct's hash(src, dst)
           partitioning, which satisfies no per-round join
           distribution, so every round re-exchanges the |E| relation
           by ``dst``), labels checkpointed eagerly;
  after  — the r13 shape: edges = ....repartition("dst")
           .localCheckpoint(eager=False) (LogicalRDD keeps
           hash(dst) — the per-round probe side needs NO exchange).

The returned plan of the full operator is checkpoint-truncated (a
LogicalRDD scan), so the query-level before/after dumps cannot show
the loop internals; this captures them.  Inputs are q49's real pair
stage (MinHash+LSH over sf0.1 documents) so the dumped plans are the
bench's plans.

Writes plans/r13/cc_round_before.txt / cc_round_after.txt.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TZ", "UTC")
time.tzset()

from pyspark.sql import functions as F  # noqa: E402


def round1_labels(pairs, docs, variant: str):
    e = pairs.select(
        F.col("id_a").cast("long").alias("src"),
        F.col("id_b").cast("long").alias("dst"),
    )
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    if variant == "before":
        edges = sym.distinct().localCheckpoint()  # hash(src, dst) layout
        eager = True
    else:
        edges = sym.distinct().repartition("dst").localCheckpoint(eager=False)
        eager = False
    nodes = edges.select(F.col("src").alias("id")).union(
        docs.select(F.col("doc_id").cast("long").alias("id"))
    )
    labels = (
        nodes.distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=eager)
    )
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
    return (
        stepped.alias("s")
        .join(parent, F.col("s.label") == F.col("pid"), "left")
        .select(
            F.col("s.id").alias("id"),
            F.coalesce(F.col("plabel"), F.col("s.label")).alias("label"),
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from defenda_data_lake_spark.operators import dedup as D
    from defenda_data_lake_spark.plans.catalog import warm_table_cache
    from defenda_data_lake_spark.session import get_spark, tune_for_input_scale

    spark = get_spark(app_name="cc-round-plan")
    tune_for_input_scale(spark, sf_dir)
    warm_table_cache(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    for variant in ("before", "after"):
        pairs = D.minhash_lsh_candidates(
            docs, num_hashes=8, bands=2, shingle_n=3
        )
        lab1 = round1_labels(pairs, docs, variant)
        plan = lab1._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"cc_round_{variant}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(
            f"{variant}: {len(plan.splitlines())} lines, "
            f"Exchange x{plan.count('Exchange')} -> {path}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
