#!/usr/bin/env python
"""Round-13 q100 per-round decomposition (VERDICT r12 item 6): at the
32x replica, time the pagerank loop INVARIANT build vs the per-round
cost, for the r12 shuffle dataflow (broadcast_ranks=False) vs the
round-13 broadcast dataflow (dst-partitioned pinned edges + |V|
tables on broadcasts, zero per-round exchanges).  Asserts the final
fixed-point ranks are IDENTICAL between the two dataflows, and
captures one round's physical plan for each (the returned q100 plan
is just the checkpointed-result scan, so the per-round plan is the
evidence surface — committed to plans/r13/).

Usage: python scripts/q100_round_probe_r13.py [factor] [replica_dir]
"""
from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/repo")
os.environ.setdefault("TZ", "UTC")
time.tzset()

from scale_pairing_r10 import build  # noqa: E402


def timed_pagerank(spark, sf_dir: str, broadcast_ranks: bool, plan_path=None):
    """q100's exact graph, with per-phase timing around the pagerank
    internals (inlined structure of operators/graph.py::pagerank with
    symmetric_input=True, materialize=True)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from defenda_data_lake_spark.plans.catalog_shared import _t

    t = {}
    t0 = time.perf_counter()
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    raw = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        (F.col("o_custkey").cast("long") * 2).alias("src"),
        (F.col("l_suppkey").cast("long") * 2 + 1).alias("dst"),
    )
    from defenda_data_lake_spark.operators.graph import SCALE, symmetrize

    e = symmetrize(raw)
    if broadcast_ranks:
        # the round-13 invariant shape: bare (src, dst) pairs, ONE
        # dst exchange over the deduped set; outdeg rides on the
        # rank table
        contrib_edges = e.repartition("dst").localCheckpoint(eager=True)
    else:
        contrib_edges = e.withColumn(
            "outdeg", F.count(F.lit(1)).over(Window.partitionBy("src"))
        ).localCheckpoint(eager=True)
    t["invariant_edges"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    if broadcast_ranks:
        nodes = (
            contrib_edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("outdeg"))
            .select(F.col("src").alias("node_id"), "outdeg")
            .localCheckpoint(eager=True)
        )
    else:
        nodes = (
            contrib_edges.select(F.col("src").alias("node_id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
    n = nodes.count()
    t["invariant_nodes"] = round(time.perf_counter() - t0, 2)

    base = ((100 - 85) * SCALE) // (100 * n)
    keep = ["node_id", "outdeg"] if broadcast_ranks else ["node_id"]
    ranks = nodes.withColumn("rank_e12", F.lit(SCALE // n).cast("long"))
    rounds = []
    for i in range(5):
        t0 = time.perf_counter()
        rank_side = F.broadcast(ranks) if broadcast_ranks else ranks
        incoming = (
            contrib_edges.join(
                rank_side, contrib_edges["src"] == rank_side["node_id"]
            )
            .select(
                F.col("dst").alias("node_id"),
                F.expr("rank_e12 div outdeg").alias("c"),
            )
            .groupBy("node_id")
            .agg(F.sum("c").alias("insum"))
        )
        inc_side = F.broadcast(incoming) if broadcast_ranks else incoming
        new_ranks = nodes.join(inc_side, "node_id", "left").select(
            *keep,
            (
                F.lit(base).cast("long")
                + F.expr("(85 * coalesce(insum, 0L)) div 100")
            ).alias("rank_e12"),
        )
        if i == 0 and plan_path:
            buf = io.StringIO()
            with redirect_stdout(buf):
                new_ranks.explain("formatted")
            with open(plan_path, "w") as f:
                f.write(buf.getvalue())
        ranks = new_ranks.localCheckpoint(eager=True)
        rounds.append(round(time.perf_counter() - t0, 2))
    t["rounds"] = rounds
    t["rounds_total"] = round(sum(rounds), 2)
    t["total"] = round(
        t["invariant_edges"] + t["invariant_nodes"] + t["rounds_total"], 2
    )
    t["n_nodes"] = n
    return t, ranks


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    tmp = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/scale{factor}_r13"

    from defenda_data_lake_spark.plans.catalog import (
        clear_table_cache,
        warm_table_cache,
    )
    from defenda_data_lake_spark.session import get_spark, tune_for_input_scale

    spark = get_spark(app_name="q100-round-probe-r13")
    if not os.path.isdir(f"{tmp}/lineitem.parquet"):
        t0 = time.time()
        build(spark, "/root/testdata/sf0.1", tmp, factor)
        print(
            json.dumps(
                {"built": tmp, "factor": factor, "build_sec": round(time.time() - t0, 1)}
            ),
            flush=True,
        )
    clear_table_cache()
    tune_for_input_scale(spark, tmp)
    warm_table_cache(spark, tmp)
    os.makedirs("/root/repo/plans/r13", exist_ok=True)

    spark.sparkContext.setJobDescription("q100 probe: shuffle dataflow")
    t_old, ranks_old = timed_pagerank(
        spark, tmp, False, "/root/repo/plans/r13/q100_round_before.txt"
    )
    print(json.dumps({"dataflow": "shuffle(before)", **t_old}), flush=True)

    spark.sparkContext.setJobDescription("q100 probe: broadcast dataflow")
    t_new, ranks_new = timed_pagerank(
        spark, tmp, True, "/root/repo/plans/r13/q100_round_after.txt"
    )
    print(json.dumps({"dataflow": "broadcast(after)", **t_new}), flush=True)

    spark.sparkContext.setJobDescription("q100 probe: equality check")
    diff = (
        ranks_old.alias("a")
        .join(ranks_new.alias("b"), "node_id", "full")
        .where("a.rank_e12 IS DISTINCT FROM b.rank_e12")
        .count()
    )
    print(json.dumps({"rank_mismatches": diff}), flush=True)
    assert diff == 0, "broadcast dataflow changed ranks!"
    spark.stop()


if __name__ == "__main__":
    main()
