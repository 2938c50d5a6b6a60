"""As-of join operator (operators/asof.py): boundary semantics (<=),
no-match NULLs, NULL payload values still matching, tiebreaks, and the
one-shuffle/no-pair-expansion plan shape."""

from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.asof import asof_join


def _dfs(spark):
    left = spark.createDataFrame(
        [
            ("u1", 10, "L1"),
            ("u1", 20, "L2"),
            ("u1", 5, "L0"),   # before any right row
            ("u2", 10, "L3"),  # key with no right rows at all
        ],
        ["user", "t", "lid"],
    )
    right = spark.createDataFrame(
        [
            ("u1", 10, "R10", 1.0),   # tie with L1: <= matches
            ("u1", 15, "R15", None),  # NULL payload value still a match
            ("u1", 18, "R18a", 3.0),
            ("u1", 18, "R18b", 4.0),  # same time: tiebreak picks greatest rid
        ],
        ["user", "t", "rid", "val"],
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _dfs(spark)
    out = {
        r["lid"]: (r["asof_rid"], r["asof_val"])
        for r in asof_join(
            left, right, keys=["user"], time_col="t",
            payload_cols=["rid", "val"], tiebreak_col="rid",
        ).collect()
    }
    assert out["L0"] == (None, None)        # nothing at-or-before t=5
    assert out["L1"] == ("R10", 1.0)        # equal time matches (<=)
    assert out["L3"] == (None, None)        # no right rows for u2
    # t=20: latest right is the t=18 pair; greatest tiebreak wins
    assert out["L2"] == ("R18b", 4.0)


def test_asof_null_payload_is_still_a_match(spark):
    left, right = _dfs(spark)
    out = {
        r["lid"]: (r["asof_rid"], r["asof_val"])
        for r in asof_join(
            left.filter(F.col("lid") == "L2"),
            right.filter(F.col("t") <= 15),
            keys=["user"], time_col="t",
            payload_cols=["rid", "val"], tiebreak_col="rid",
        ).collect()
    }
    # latest right at t=15 has a NULL val — it must win over t=10,
    # not be skipped for an older non-NULL row
    assert out["L2"] == ("R15", None)


def test_asof_null_time_and_null_key_never_match(spark):
    """SQL semantics: r.time <= l.time is never true for NULL time, and
    NULL keys never equi-match — neither may leak payload."""
    left = spark.createDataFrame(
        [("u1", 10, "L1"), (None, 10, "Lnull"), ("u1", None, "Lnt")],
        "key string, t int, lid string",
    )
    right = spark.createDataFrame(
        [("u1", None, "Rnull-t", 1.0), (None, 5, "Rnull-k", 2.0),
         ("u1", 5, "R5", 3.0)],
        "key string, t int, rid string, val double",
    )
    out = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(
            left, right, keys=["key"], time_col="t",
            payload_cols=["rid"], tiebreak_col="rid",
        ).collect()
    }
    assert out["L1"] == "R5"        # real match unaffected
    assert out["Lnull"] is None     # NULL key: no equi-match
    assert out["Lnt"] is None       # NULL left time: r.t <= NULL never true


def test_asof_matches_bruteforce_on_random_data(spark):
    """Seeded random corpus vs a per-row brute-force reference: the
    union+window implementation must agree exactly, including ties and
    unmatched keys."""
    import random

    rng = random.Random(42)
    left_rows = [
        (f"k{rng.randrange(6)}", rng.randrange(100), i) for i in range(300)
    ]
    right_rows = [
        (f"k{rng.randrange(8)}", rng.randrange(100), i, rng.randrange(1000))
        for i in range(300)
    ]
    left = spark.createDataFrame(left_rows, ["key", "t", "lid"])
    right = spark.createDataFrame(right_rows, ["key", "t", "rid", "payload"])

    got = {
        r["lid"]: (r["asof_rid"], r["asof_payload"])
        for r in asof_join(
            left, right, keys=["key"], time_col="t",
            payload_cols=["rid", "payload"], tiebreak_col="rid",
        ).collect()
    }

    for key, t, lid in left_rows:
        matches = [r for r in right_rows if r[0] == key and r[1] <= t]
        if matches:
            best = max(matches, key=lambda r: (r[1], r[2]))
            assert got[lid] == (best[2], best[3]), lid
        else:
            assert got[lid] == (None, None), lid
    assert len(got) == len(left_rows)


def test_asof_plan_has_no_join(spark):
    """The operator must stay union+window: no join node, ONE exchange
    on the key — pair expansion never appears at any skew."""
    left, right = _dfs(spark)
    df = asof_join(
        left, right, keys=["user"], time_col="t",
        payload_cols=["rid"], tiebreak_col="rid",
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert node not in plan
    assert plan.count("Exchange hashpartitioning") == 1
