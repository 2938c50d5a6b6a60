"""q104 cross-source near-dup overlap matrix and q105 prototypicality
pruning scores: semantics, plan shape, and pinned DuckDB value parity
(both ship tail-first — the round-7 driver window was full — so the
local gate here is their driver-equivalent check)."""

import duckdb
from pyspark.sql import functions as F

from defenda_data_lake_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _duck(views):
    con = duckdb.connect()
    for t in views:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


# ------------------------------------------------------------------ q104


def test_source_overlap_counts_cross_source_pairs(spark):
    # two near-identical docs in different sources + an in-source pair;
    # text long enough to shingle (n=3 tokens)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            (1, base, "crawl_a"),
            (2, base + " extra", "crawl_b"),
            (3, base + " other", "crawl_a"),
            (4, "totally unrelated words nothing shared here at all none", "crawl_b"),
        ],
        ["doc_id", "text", "source"],
    )
    from defenda_data_lake_spark.operators import dedup as D

    pairs = D.minhash_lsh_candidates(df)
    src = df.select("doc_id", "source")
    labeled = (
        pairs.join(src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa")), "id_a")
        .join(src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb")), "id_b")
        .select(F.least("sa", "sb").alias("a"), F.greatest("sa", "sb").alias("b"))
        .groupBy("a", "b").count()
    )
    got = {(r.a, r.b): r["count"] for r in labeled.collect()}
    # every candidate pair involving doc 4 would be spurious; the near-dup
    # family {1,2,3} must produce both a cross-source and an in-source cell
    assert got.get(("crawl_a", "crawl_b"), 0) >= 1
    assert all("crawl" in a and "crawl" in b for (a, b) in got)
    assert not any(
        4 in (r.id_a, r.id_b) for r in pairs.collect()
    )


def test_q104_value_parity_vs_duckdb(spark):
    fn, sql = CATALOG["q104_source_overlap"]
    got = {
        (r.source_a, r.source_b): r.n_pairs for r in fn(spark, SF).collect()
    }
    want = {(a, b): n for a, b, n in _duck(["documents"]).execute(sql).fetchall()}
    assert got == want and len(got) > 0


def test_q104_plan_no_cartesian(spark):
    from tests.test_plan_quality import plan_of

    plan = plan_of(spark, "q104_source_overlap")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------------------ q107


def test_quality_survivor_keeps_best_not_first(spark):
    from defenda_data_lake_spark.operators.dedup import quality_survivor_dedupe

    df = spark.createDataFrame(
        [
            (1, "short", 5),
            (2, "the long clean original copy", 28),
            (3, "the long clean original cop", 27),
            (9, "unrelated singleton", 19),
        ],
        ["doc_id", "text", "n_chars"],
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    rows = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in quality_survivor_dedupe(df, pairs, "n_chars").collect()
    }
    # cluster {1,2,3}: min-id claimant would keep 1; quality keeps 2
    assert rows == {2: (1, 3), 9: (9, 1)}


def test_q107_plan_window_group_limit_no_cartesian(spark):
    from tests.test_plan_quality import plan_of

    plan = plan_of(spark, "q107_quality_survivors")
    # the top-1 survivor window plans as WindowGroupLimit: each
    # partition prunes to one candidate per cluster BEFORE the exchange
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q107_value_parity_vs_duckdb(spark):
    fn, sql = CATALOG["q107_quality_survivors"]
    got = {
        r.doc_id: (r.cluster_id, r.cluster_size, r.n_chars)
        for r in fn(spark, SF).collect()
    }
    want = {
        d: (c, s, n)
        for d, c, s, n in _duck(["documents"]).execute(sql).fetchall()
    }
    assert got == want and len(got) > 0


# ------------------------------------------------------------------ q105


def test_proto_rank_contiguous_and_ordered(spark):
    fn, _ = CATALOG["q105_prototypicality"]
    rows = fn(spark, SF).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    assert len(rows) == sum(len(v) for v in by_cluster.values())
    for cl, members in by_cluster.items():
        members.sort(key=lambda r: r.proto_rank)
        # ranks are 1..n contiguous and sq_dist is non-decreasing in rank
        assert [m.proto_rank for m in members] == list(range(1, len(members) + 1))
        ds = [m.sq_dist for m in members]
        assert all(a <= b + 1e-9 for a, b in zip(ds, ds[1:])), cl


def test_q105_value_parity_vs_duckdb(spark):
    fn, sql = CATALOG["q105_prototypicality"]
    got = {
        r.vec_id: (r.cluster, round(r.sq_dist, 4), r.proto_rank)
        for r in fn(spark, SF).collect()
    }
    want = {
        v: (c, round(d, 4), p)
        for v, c, d, p in _duck(["embeddings"]).execute(sql).fetchall()
    }
    assert got == want and len(got) > 0


def test_q105_plan_no_cartesian(spark):
    from tests.test_plan_quality import plan_of

    plan = plan_of(spark, "q105_prototypicality")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
