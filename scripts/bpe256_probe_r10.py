"""Round-10 probe (VERDICT r9 item 4): can the BPE family lift its
24-merge toy contract to a production-shaped merge count while staying
oracle-reproducible?

Measures, at sf0.01 (the driver's correctness scale):

1. LEARNING at n_merges in {64, 128, 256}: Spark (bounded top-2000
   collect + driver learn) vs the DuckDB unrolled-CTE oracle that
   re-learns the table from scratch — exact merge-table equality and
   both walls.  This is where the oracle's linear-in-merges cost
   shows up.
2. APPLICATION at 256 merges: the 256x5 chained-literal-replace
   projection (Spark, whole-stage codegen?) vs DuckDB's 256
   materialized app CTEs — value parity on total token count + walls.

Output: one JSON line per measurement; the round's SCALING.md entry
and the q123 catalog decision are based on these numbers.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("TZ", "UTC")
time.tzset()

import duckdb

from defenda_data_lake_spark import get_spark
from defenda_data_lake_spark.operators import bpe as B
from defenda_data_lake_spark.plans import catalog_bpe as CB

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con


def main():
    spark = get_spark()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    results = []

    for n_merges, learn_words in (
        (64, 2000), (128, 2000), (256, 2000), (256, 20000)
    ):
        t0 = time.time()
        merges = B.learn_bpe_spark(
            docs, n_merges=n_merges, learn_words=learn_words
        )
        spark_s = time.time() - t0
        sql = (
            f"WITH {CB._learn_ctes(n_merges, learn_words)}\n"
            f"SELECT CAST(rank AS BIGINT) AS rank, pair FROM ({CB._merge_union_sql(n_merges)}) ORDER BY rank"
        )
        con = duck()
        t0 = time.time()
        try:
            rows = con.execute(sql).fetchall()
            duck_s = time.time() - t0
            oracle_merges = [p for _, p in rows]
            match = oracle_merges == merges
        except Exception as exc:  # noqa: BLE001 - record the ceiling
            duck_s = time.time() - t0
            oracle_merges, match = None, f"DUCKDB-ERROR: {exc}"
        finally:
            con.close()
        rec = {
            "probe": "learn",
            "n_merges": n_merges,
            "learn_words": learn_words,
            "learned": len(merges),
            "spark_sec": round(spark_s, 3),
            "duckdb_sec": round(duck_s, 3),
            "match": match,
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)

    # application at 256 merges (Arrow kernel: the replace chain's
    # measured ceiling is ~256 nested calls): distinct-word totals
    merges = B.learn_bpe_spark(docs, n_merges=256, learn_words=20000)
    # the corpus saturates learning below 256 (every learning word
    # fully merged); the oracle's apply chain must stop AT the learned
    # depth — an empty m{i} past saturation scalar-subqueries to NULL
    # and replace(st, NULL, ...) NULL-poisons every later state (the
    # first 180 s probe run measured exactly that)
    n_apply = len(merges)
    t0 = time.time()
    acct = B.tokenize_corpus(docs, merges)
    total = acct.agg({"n_tokens": "sum"}).collect()[0][0]
    spark_s = time.time() - t0
    plan = acct._jdf.queryExecution().executedPlan().toString()
    has_codegen = "WholeStageCodegen" in plan
    sql = (
        f"WITH {CB._learn_ctes(256)},\n{CB._apply_ctes(256)},\n"
        "docw AS MATERIALIZED (\n"
        "  SELECT doc_id, w, count(*) AS n_occ FROM (\n"
        "    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS w FROM documents\n"
        f"  ) WHERE w <> '' AND length(w) <= {B.MAX_WORD_LEN} GROUP BY doc_id, w\n"
        ")\n"
        "SELECT CAST(sum(n_occ * n_tok) AS BIGINT) FROM docw JOIN app USING (w)"
    )
    con = duck()
    t0 = time.time()
    try:
        duck_total = con.execute(sql).fetchall()[0][0]
        duck_s = time.time() - t0
        match = duck_total == total
    except Exception as exc:  # noqa: BLE001
        duck_s = time.time() - t0
        duck_total, match = None, f"DUCKDB-ERROR: {exc}"
    finally:
        con.close()
    rec = {
        "probe": "apply",
        "n_merges": 256,
        "spark_sec": round(spark_s, 3),
        "duckdb_sec": round(duck_s, 3),
        "spark_total_tokens": int(total),
        "duckdb_total_tokens": duck_total if duck_total is None else int(duck_total),
        "n_learned": len(merges),
        "whole_stage_codegen": has_codegen,
        "match": match,
    }
    print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
