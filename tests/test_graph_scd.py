"""Unit + plan tests for the round-7 session-5 operators: fixed-point
PageRank (operators/graph.py), SCD-2 history build (operators/scd.py),
and the leakage-safe cluster split (q98 composition)."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.graph import SCALE, pagerank, symmetrize
from defenda_data_lake_spark.operators.scd import scd2_history

SF = "/root/testdata/sf0.001"


# ----------------------------------------------------------------- pagerank


def _pagerank_reference(edges, iterations=5, damping_pct=85):
    """Pure-Python replay of the EXACT integer arithmetic the operator
    contracts (floor division everywhere, 1e-12 fixed point)."""
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = ((100 - damping_pct) * SCALE) // (100 * n)
    rank = {v: SCALE // n for v in nodes}
    for _ in range(iterations):
        insum = {v: 0 for v in nodes}
        for s, d in edges:
            insum[d] += rank[s] // outdeg[s]
        rank = {v: base + (damping_pct * insum[v]) // 100 for v in nodes}
    return rank


def test_pagerank_matches_integer_reference(spark):
    # a small asymmetric graph: hub 'a' pointed at by everyone, plus a
    # chain — ranks must match the Python reference integer-for-integer
    edges = [
        ("b", "a"), ("c", "a"), ("d", "a"),
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "b"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node_id"]: r["rank_e12"] for r in pagerank(df).collect()}
    assert got == _pagerank_reference(edges)


def test_pagerank_mass_and_determinism(spark):
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(40)]
    edges = [(s, d) for s, d in edges if s != d]
    df = symmetrize(spark.createDataFrame(edges, ["src", "dst"]))
    a = sorted(pagerank(df).collect())
    b = sorted(pagerank(df.repartition(7)).collect())
    assert a == b  # partitioning-independent (integer arithmetic)
    total = sum(r["rank_e12"] for r in a)
    # floor division only ever loses mass; 5 rounds over |E| edges lose
    # well under 1e-6 of it
    assert 0.999 * SCALE <= total <= SCALE


def test_pagerank_zero_iterations_is_uniform(spark):
    df = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    rows = pagerank(df, iterations=0).collect()
    assert {r["rank_e12"] for r in rows} == {SCALE // 3}


def test_symmetrize_dedupes_and_drops_self_loops(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "b"), ("c", "c")], ["src", "dst"]
    )
    got = sorted((r["src"], r["dst"]) for r in symmetrize(df).collect())
    assert got == [("a", "b"), ("b", "a")]


def test_triangle_counts_known_graph(spark):
    from defenda_data_lake_spark.operators.graph import triangle_counts

    # K4 on {a,b,c,d} plus a pendant e-a: K4 nodes are each in C(3,2)=3
    # wedges -> 3 triangles each... wait, K4 has 4 triangles, each node
    # in exactly 3 of them; 'e' (degree 1) is in none.
    und = [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
        ("e", "a"),
    ]
    df = symmetrize(spark.createDataFrame(und, ["src", "dst"]))
    got = {
        r["node_id"]: (r["degree"], r["triangles"], r["clustering"])
        for r in triangle_counts(df).collect()
    }
    assert got["e"] == (1, 0, 0.0)
    assert got["a"] == (4, 3, 0.5)  # 3 triangles over C(4,2)=6 pairs
    for n in "bcd":
        assert got[n] == (3, 3, 1.0)
    # global triangle count: sum/3 == 4
    assert sum(t for _, t, _ in got.values()) == 12


def test_triangle_counts_partitioning_invariant(spark):
    from defenda_data_lake_spark.operators.graph import triangle_counts

    und = [(f"n{i}", f"n{(i * 3 + 1) % 15}") for i in range(30)]
    und = [(s, d) for s, d in und if s != d]
    df = symmetrize(spark.createDataFrame(und, ["src", "dst"]))
    a = sorted(triangle_counts(df).collect())
    b = sorted(triangle_counts(df.repartition(5)).collect())
    assert a == b


def test_q101_plan_all_equi_joins(spark):
    from defenda_data_lake_spark.plans.catalog import CATALOG

    fn, _ = CATALOG["q101_triangle_counts"]
    df = fn(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q100_plan_no_cartesian(spark):
    from defenda_data_lake_spark.plans.catalog import CATALOG

    fn, _ = CATALOG["q100_pagerank"]
    df = fn(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ----------------------------------------------------------------- scd2


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_scd2_history_versions(spark):
    rows = [
        # user 1: A A B A  -> three versions (A x2, B, A)
        Row(k=1, attr="A", ts=_ts("2024-01-01 00:00:00"), oid=1),
        Row(k=1, attr="A", ts=_ts("2024-01-01 00:01:00"), oid=2),
        Row(k=1, attr="B", ts=_ts("2024-01-01 00:02:00"), oid=3),
        Row(k=1, attr="A", ts=_ts("2024-01-01 00:03:00"), oid=4),
        # user 2: single observation -> one open version
        Row(k=2, attr="X", ts=_ts("2024-01-02 00:00:00"), oid=5),
    ]
    df = spark.createDataFrame(rows)
    out = scd2_history(df, ["k"], ["attr"], "ts", order_cols=["oid"])
    got = {
        (r["k"], r["version"]): (
            r["attr"], r["valid_from_s"], r["valid_to_s"], r["n_obs"]
        )
        for r in out.collect()
    }
    t0 = int(_ts("2024-01-01 00:00:00").replace(tzinfo=dt.timezone.utc).timestamp())
    assert got[(1, 1)] == ("A", t0, t0 + 120, 2)
    assert got[(1, 2)] == ("B", t0 + 120, t0 + 180, 1)
    assert got[(1, 3)] == ("A", t0 + 180, None, 1)
    assert got[(2, 1)][0] == "X" and got[(2, 1)][2] is None
    assert len(got) == 4


def test_scd2_null_attr_runs_are_null_safe(spark):
    rows = [
        Row(k=1, attr=None, ts=_ts("2024-01-01 00:00:00"), oid=1),
        Row(k=1, attr=None, ts=_ts("2024-01-01 00:01:00"), oid=2),
        Row(k=1, attr="A", ts=_ts("2024-01-01 00:02:00"), oid=3),
    ]
    schema = "k INT, attr STRING, ts TIMESTAMP, oid INT"
    df = spark.createDataFrame(rows, schema)
    out = scd2_history(df, ["k"], ["attr"], "ts", order_cols=["oid"]).collect()
    by_ver = {r["version"]: r for r in out}
    # the NULL run is ONE version (null-safe compare), n_obs = 2
    assert len(out) == 2
    assert by_ver[1]["attr"] is None and by_ver[1]["n_obs"] == 2
    assert by_ver[2]["attr"] == "A" and by_ver[2]["valid_to_s"] is None


def test_scd2_multi_attr_change_fires_on_any(spark):
    rows = [
        Row(k=1, a="x", b=1, ts=_ts("2024-01-01 00:00:00"), oid=1),
        Row(k=1, a="x", b=2, ts=_ts("2024-01-01 00:01:00"), oid=2),  # b changed
        Row(k=1, a="y", b=2, ts=_ts("2024-01-01 00:02:00"), oid=3),  # a changed
        Row(k=1, a="y", b=2, ts=_ts("2024-01-01 00:03:00"), oid=4),  # unchanged
    ]
    df = spark.createDataFrame(rows)
    out = scd2_history(df, ["k"], ["a", "b"], "ts", order_cols=["oid"]).collect()
    assert [r["version"] for r in sorted(out, key=lambda r: r["version"])] == [1, 2, 3]
    assert max(r["n_obs"] for r in out) == 2


def test_q99_plan_single_key_exchange(spark):
    """The whole SCD build rides ONE hash exchange on user_id: the
    (user_id, version) window and the closing lead reuse that layout
    (partitionBy on a superset of the hash keys costs a sort only)."""
    from defenda_data_lake_spark.plans.catalog import CATALOG

    fn, _ = CATALOG["q99_scd2_history"]
    df = fn(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan


# ----------------------------------------------------------------- q98


def test_q98_near_dup_pairs_never_straddle_splits(spark):
    """The invariant that IS the operator: every LSH near-dup pair
    lands in the same split."""
    from defenda_data_lake_spark.operators import dedup as D
    from defenda_data_lake_spark.plans.catalog import CATALOG, _t

    fn, _ = CATALOG["q98_leakage_safe_split"]
    assigned = fn(spark, SF).select("doc_id", "split")
    docs = _t(spark, SF, "documents")
    pairs = D.minhash_lsh_candidates(docs, num_hashes=8, bands=2, shingle_n=3)
    a = assigned.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
        "split", "split_a"
    )
    b = assigned.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
        "split", "split_b"
    )
    joined = pairs.join(a, "id_a").join(b, "id_b")
    assert joined.filter(F.col("split_a") != F.col("split_b")).count() == 0
    # and the split is non-degenerate on this corpus
    splits = {r["split"] for r in assigned.select("split").distinct().collect()}
    assert splits == {"train", "test"}


def test_scd2_lookup_point_in_time(spark):
    from defenda_data_lake_spark.operators.scd import scd2_lookup

    obs = spark.createDataFrame(
        [
            (1, "bronze", dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)),
            (1, "silver", dt.datetime(2024, 2, 1, tzinfo=dt.timezone.utc)),
            (1, "gold", dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)),
            (2, "bronze", dt.datetime(2024, 2, 15, tzinfo=dt.timezone.utc)),
        ],
        ["user_id", "tier", "ts"],
    )
    dim = scd2_history(obs, ["user_id"], ["tier"], "ts")
    facts = spark.createDataFrame(
        [
            # before user 1's first version -> NULL tier
            (10, 1, dt.datetime(2023, 12, 31, tzinfo=dt.timezone.utc)),
            # boundary: valid_from is INCLUSIVE
            (11, 1, dt.datetime(2024, 2, 1, tzinfo=dt.timezone.utc)),
            # one second before a version flip -> previous version
            (12, 1, dt.datetime(2024, 2, 29, 23, 59, 59, tzinfo=dt.timezone.utc)),
            # open current version
            (13, 1, dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)),
            (14, 2, dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)),
        ],
        ["fact_id", "user_id", "ts"],
    )
    got = {
        r.fact_id: r.tier
        for r in scd2_lookup(facts, dim, ["user_id"], "ts").collect()
    }
    assert got == {10: None, 11: "silver", 12: "silver", 13: "gold", 14: "bronze"}
    # disjoint intervals -> exactly one output row per fact
    assert scd2_lookup(facts, dim, ["user_id"], "ts").count() == facts.count()


def test_scd2_lookup_plan_is_keyed_join_not_cartesian(spark):
    from defenda_data_lake_spark.operators.scd import scd2_lookup

    obs = spark.createDataFrame(
        [(1, "a", dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc))],
        ["user_id", "tier", "ts"],
    )
    dim = scd2_history(obs, ["user_id"], ["tier"], "ts")
    facts = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc))],
        ["fact_id", "user_id", "ts"],
    )
    out = scd2_lookup(facts, dim, ["user_id"], "ts")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scd2_lookup_collision_guard_and_prefix(spark):
    from defenda_data_lake_spark.operators.scd import scd2_lookup

    obs = spark.createDataFrame(
        [(1, "a", dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc))],
        ["user_id", "tier", "ts"],
    )
    dim = scd2_history(obs, ["user_id"], ["tier"], "ts")
    facts = spark.createDataFrame(
        [(1, 1, "x", dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc))],
        ["fact_id", "user_id", "tier", "ts"],  # 'tier' collides
    )
    with pytest.raises(ValueError, match="tier"):
        scd2_lookup(facts, dim, ["user_id"], "ts")
    row = scd2_lookup(facts, dim, ["user_id"], "ts", dim_prefix="dim_").collect()[0]
    assert row.tier == "x" and row.dim_tier == "a"
