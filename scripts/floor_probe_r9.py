#!/usr/bin/env python
"""Round-9 floor-weak probe (VERDICT r8 item 2): one structurally
different plan attempt each for q40 and q20, measured under the bench
protocol (warm cache, untimed compile pass, consecutive best-of-4 x 2
sweeps) on a quiet box.

q40 alternative: cosine_topk_codegen — query block folded into literal
multiply-adds, no Python stage — tried in BOTH Column-API form
(REJECTED: ~1000 py4j round trips per call, 2.615 s best) and
generated-SQL prepared-statement form (REJECTED: the 320-term
expression exceeds codegen budgets and evaluates interpreted with a
1 MB task binary, 1.494 s best vs the 0.314 s Arrow/BLAS incumbent).
The rejected kernel lives HERE, not in the package — the measured
record of the attempt (BASELINE.md floor waiver cites these numbers).

q20 alternative: derived_view("events_k") — from_json projected once
per session into a pinned columnar view, so reps scan parsed ints.
ADOPTED into the catalog (0.073 -> 0.058 s best-of-8; the residue is
the bare 2-exchange agg floor).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TZ", "UTC")
time.tzset()

from pyspark.sql import functions as F


import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

from defenda_data_lake_spark.operators.similarity import _collect_queries


def cosine_topk_codegen(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k with the query block folded into
    LITERAL codegen expressions — the round-9 structural alternative
    to :func:`cosine_topk`'s Arrow/numpy kernel (VERDICT r8 item 2).

    The collected queries become, per query j, one projection column
    ``sum_i(e[i] * Q[j][i]) / (|e| * |Q[j]|)`` built from
    ``GetArrayItem`` multiply-adds (all whole-stage-codegen; unlike
    ``aggregate()``/``zip_with()`` higher-order functions, which Spark
    evaluates interpreted per row — the round-1 HOF form measured 1.8 s
    for exactly that reason).  One JVM job, no Python stage, no
    posexplode shuffle: corpus-scan → 5-struct explode → ranking
    window.  Left-fold summation in double matches the oracle's
    ``list_cosine_similarity`` at the 6 dp the catalog rounds to.

    Trade-off vs the kernel: expression size grows as dim × n_queries
    (64 × 5 = 320 terms here) — fine for a handful of probe queries,
    wrong for a big query batch (codegen blowup), and at 100 TB the
    BLAS kernel's bytes-proportional matmul wins; this shape exists
    for the interactive few-query case where the Python stage's fixed
    ~0.18 s floor dominates."""
    q_ids, Q = _collect_queries(queries, id_col, vec_col)
    dim = Q.shape[1]
    qn = np.linalg.norm(Q, axis=1)
    e = F.col(vec_col)
    elems = [e.getItem(i).cast("double") for i in range(dim)]
    norm_sq = elems[0] * elems[0]
    for el in elems[1:]:
        norm_sq = norm_sq + el * el
    structs = []
    for j in range(len(q_ids)):
        dot = elems[0] * float(Q[j, 0])
        for i in range(1, dim):
            dot = dot + elems[i] * float(Q[j, i])
        structs.append(
            F.struct(
                F.lit(q_ids[j].item()).alias("query_id"),
                (dot / (F.sqrt(norm_sq) * float(qn[j]))).alias("cosine"),
            )
        )
    scored = (
        corpus.select(F.col(id_col).alias("neighbor_id"), e)
        .select("neighbor_id", F.explode(F.array(*structs)).alias("s"))
        .select("s.query_id", "neighbor_id", "s.cosine")
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def best_of(fn, reps=4, sweeps=2, pause=0.0):
    best = float("inf")
    for _ in range(sweeps):
        for _ in range(reps):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        if pause:
            time.sleep(pause)
    return round(best, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_start = tuple(round(x, 2) for x in os.getloadavg())

    from defenda_data_lake_spark.plans.catalog import (
        CATALOG,
        warm_table_cache,
    )
    from defenda_data_lake_spark.plans.catalog_shared import (
        R,
        _sql_over,
        _t,
        derived_view,
    )
    from defenda_data_lake_spark.session import get_spark, tune_for_input_scale

    spark = get_spark(app_name="floor-probe-r9")
    tune_for_input_scale(spark, sf_dir)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    warm_table_cache(spark, sf_dir)
    import pandas as _pd

    spark.range(1000).repartition(32).mapInPandas(
        lambda it: (_pd.DataFrame({"id": b["id"]}) for b in it), schema="id long"
    ).count()

    # ---- q40 variants
    def q40_current():
        return CATALOG["q40_knn_brute"][0](spark, sf_dir)

    def q40_codegen():
        emb = _t(spark, sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") < 5)
        return cosine_topk_codegen(emb, queries, k=10).select(
            "query_id",
            "neighbor_id",
            R("cosine", 6).alias("cosine"),
            F.col("rank").cast("long").alias("rank"),
        )

    # SQL-string form of the codegen variant: ONE parse of a ~12 KB
    # statement, memoized by _sql_over (the prepared-statement path) —
    # the Column-API form above costs ~1000 py4j round trips PER CALL
    # to rebuild the 320-term tree (measured 2.7 s/rep, all driver)
    _q40_sql_memo = {}

    def q40_sqlgen():
        sql = _q40_sql_memo.get("sql")
        if sql is None:
            import numpy as np

            emb = _t(spark, sf_dir, "embeddings")
            pdf = (
                emb.filter(F.col("vec_id") < 5)
                .select("vec_id", "embedding")
                .toPandas()
            )
            q_ids = pdf["vec_id"].to_numpy()
            Q = np.array(pdf["embedding"].to_list(), dtype=np.float64)
            qn = np.linalg.norm(Q, axis=1)
            dim = Q.shape[1]
            es = [f"CAST(embedding[{i}] AS DOUBLE)" for i in range(dim)]
            nsq = " + ".join(f"{e}*{e}" for e in es)
            structs = []
            for j in range(len(q_ids)):
                # float() before !r: numpy>=2 reprs scalars as
                # 'np.float64(x)', which would be injected verbatim
                # into the SQL (the Column-API variant above already
                # converts)
                dot = " + ".join(
                    f"{es[i]}*{float(Q[j, i])!r}" for i in range(dim)
                )
                structs.append(
                    f"struct(CAST({int(q_ids[j])} AS BIGINT) AS query_id, "
                    f"(({dot})) / (sqrt({nsq}) * {float(qn[j])!r}) AS cosine)"
                )
            sql = f"""
SELECT query_id, neighbor_id,
       round(cosine * 1000000, 0) / 1000000 AS cosine,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM (
    SELECT vec_id AS neighbor_id,
           inline(array({', '.join(structs)}))
    FROM embeddings
  ) WHERE neighbor_id <> query_id
) WHERE rank <= 10
"""
            _q40_sql_memo["sql"] = sql
        return _sql_over(spark, sf_dir, sql, ["embeddings"])

    # ---- q20 variants
    def q20_current():
        return CATALOG["q20_events_json"][0](spark, sf_dir)

    def _build_events_k(s, d):
        return _t(s, d, "events").select(
            "event_type",
            "value",
            F.from_json("props", "k INT").getField("k").alias("k"),
        )

    def q20_derived():
        ev_k = derived_view(
            spark, sf_dir, "events_k", _build_events_k, source_table="events"
        )
        return _sql_over(
            spark,
            sf_dir,
            """
SELECT event_type, count(*) AS n, sum(k) AS sum_k,
       round(avg(value) * 10000, 0) / 10000 AS avg_value
FROM events_k WHERE k < 50 GROUP BY event_type
""",
            [],
            extra_views={"events_k": ev_k},
        )

    # value parity first (the variant is only admissible if identical)
    for name, a, b in (("q40", q40_current, q40_codegen),
                       ("q40sql", q40_current, q40_sqlgen),
                       ("q20", q20_current, q20_derived)):
        rows_a = sorted(map(tuple, a().collect()))
        rows_b = sorted(map(tuple, b().collect()))
        assert rows_a == rows_b, f"{name} variant diverges: {rows_a[:3]} vs {rows_b[:3]}"

    # untimed compile pass
    for fn in (q40_current, q40_codegen, q40_sqlgen, q20_current, q20_derived):
        fn().write.format("noop").mode("overwrite").save()

    out = {
        "q40_current": best_of(q40_current),
        "q40_codegen": best_of(q40_codegen),
        "q40_sqlgen": best_of(q40_sqlgen),
        "q20_current": best_of(q20_current),
        "q20_derived": best_of(q20_derived),
        "loadavg_start": load_start,
        "loadavg_end": tuple(round(x, 2) for x in os.getloadavg()),
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
