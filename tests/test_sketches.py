"""Deterministic HLL sketch (operators/sketches.py)."""

import pytest
from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.sketches import hll_distinct


def test_hll_accuracy_bands(spark):
    # standard error for m=256 is ~6.5%/sqrt-free ≈ 6.5%; assert a
    # loose 15% band across three cardinality regimes
    for true_card, n in [(50, 5000), (3777, 50000), (60000, 120000)]:
        df = spark.range(n).select(
            (F.col("id") % true_card).cast("string").alias("v")
        )
        est = hll_distinct(df, "v").collect()[0]["hll_estimate"]
        assert abs(est - true_card) / true_card < 0.15, (true_card, est)


def test_hll_p12_small_cardinality_no_overflow(spark):
    # ADVICE r7: at p=12 (m=4096) the scaled register sum is bounded by
    # m * 2^55 = 2^67, past int64 — with a BIGINT sum, any cardinality
    # small enough to leave most registers absent wrapped the sum and
    # produced a garbage estimate (the linear-counting branch never
    # fired because `raw` came out huge).  The DECIMAL sum must make
    # the small-cardinality regime accurate again, and agree with a
    # pure-Python exact-integer replay of the same formula.
    import hashlib
    import math

    true_card = 500
    df = spark.range(5000).select(
        (F.col("id") % true_card).cast("string").alias("v")
    )
    est = hll_distinct(df, "v", p=12).collect()[0]["hll_estimate"]
    assert abs(est - true_card) / true_card < 0.15, est

    # python replay (arbitrary-precision ints: the ground truth)
    regs: dict[str, int] = {}
    for i in range(true_card):
        h = hashlib.md5(str(i).encode()).hexdigest()
        idx, whex = h[:3], h[3:17]
        bits = bin(int(whex, 16))[2:].zfill(56)
        rho = min(bits.index("1") + 1 if "1" in bits else 56, 55)
        regs[idx] = max(regs.get(idx, 0), rho)
    m = 4096
    alpha = 0.7213 / (1.0 + 1.079 / m)
    zeros = m - len(regs)
    isum = sum(1 << (55 - r) for r in regs.values()) + zeros * (1 << 55)
    raw = alpha * m * m * float(1 << 55) / float(isum)
    expect = (
        float(m) * math.log(float(m) / zeros)
        if raw <= 2.5 * m and zeros > 0
        else raw
    )
    assert est == pytest.approx(expect, rel=1e-12), (est, expect)


def test_hll_deterministic_and_grouped(spark):
    df = spark.range(20000).select(
        (F.col("id") % 4).alias("g"), (F.col("id") % 997).cast("string").alias("v")
    )
    a = sorted(map(tuple, hll_distinct(df, "v", ["g"]).collect()))
    b = sorted(map(tuple, hll_distinct(df, "v", ["g"]).collect()))
    assert a == b and len(a) == 4


def test_hll_rejects_unaligned_p(spark):
    df = spark.range(10).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError):
        hll_distinct(df, "v", p=7)


def test_hll_ignores_nulls(spark):
    # count(DISTINCT) semantics: NULL values contribute nothing.  An
    # all-NULL-plus-k-values column must estimate ~k, not pick up a
    # phantom max-rho register from md5(NULL).
    df = spark.range(1000).select(
        F.when(F.col("id") % 2 == 0, (F.col("id") % 20).cast("string")).alias("v")
    )
    # even ids mod 20 -> the 10 even residues; odd rows are NULL
    est = hll_distinct(df, "v").collect()[0]["hll_estimate"]
    assert abs(est - 10) / 10 < 0.15, est

    all_null = spark.range(100).select(F.lit(None).cast("string").alias("v"))
    rows = hll_distinct(all_null, "v").collect()
    assert len(rows) == 1 and rows[0]["hll_estimate"] == 0.0


def test_bloom_accuracy_bands(spark):
    from defenda_data_lake_spark.operators.sketches import bloom_cardinality

    for true_card, n in [(50, 5000), (3777, 50000), (30000, 90000)]:
        df = spark.range(n).select(
            (F.col("id") % true_card).cast("string").alias("v")
        )
        est = bloom_cardinality(df, "v").collect()[0]["bloom_estimate"]
        assert abs(est - true_card) / true_card < 0.1, (true_card, est)


def test_bloom_nulls_empty_and_validation(spark):
    from defenda_data_lake_spark.operators.sketches import bloom_cardinality

    # NULLs ignored like count(DISTINCT)
    df = spark.range(1000).select(
        F.when(F.col("id") % 2 == 0, (F.col("id") % 20).cast("string")).alias("v")
    )
    est = bloom_cardinality(df, "v").collect()[0]["bloom_estimate"]
    assert abs(est - 10) / 10 < 0.2, est

    all_null = spark.range(50).select(F.lit(None).cast("string").alias("v"))
    rows = bloom_cardinality(all_null, "v").collect()
    assert len(rows) == 1 and rows[0]["bloom_estimate"] == 0.0

    # grouped determinism
    g = spark.range(20000).select(
        (F.col("id") % 4).alias("g"), (F.col("id") % 997).cast("string").alias("v")
    )
    a = sorted(map(tuple, bloom_cardinality(g, "v", ["g"]).collect()))
    b = sorted(map(tuple, bloom_cardinality(g, "v", ["g"]).collect()))
    assert a == b and len(a) == 4

    import pytest as _pytest
    with _pytest.raises(ValueError):
        bloom_cardinality(g, "v", m_hex_digits=0)
    with _pytest.raises(ValueError):
        bloom_cardinality(g, "v", m_hex_digits=8, k=5)  # 40 hex > 32


def test_count_min_one_sided_and_bounded(spark):
    from defenda_data_lake_spark.operators.sketches import (
        count_min_lookup,
        count_min_table,
    )

    # Zipf-ish frequencies: value v appears (2000 // (v+1)) times
    rows = [(str(v),) for v in range(500) for _ in range(2000 // (v + 1))]
    df = spark.createDataFrame(rows, ["v"])
    n = len(rows)
    cells = count_min_table(df, "v", d=3, w_hex_digits=3)
    exact = df.groupBy("v").agg(F.count("*").alias("cnt"))
    est = count_min_lookup(cells, exact, "v", d=3, w_hex_digits=3)
    w = 16 ** 3
    for r in est.collect():
        # CMS error is one-sided: estimate >= truth, over by at most
        # ~e*N/w with overwhelming probability (loose 10x slack here)
        assert r["cm_estimate"] >= r["cnt"], r
        assert r["cm_estimate"] - r["cnt"] <= 10 * n / w + 5, r


def test_count_min_grouped_nulls_absent_and_validation(spark):
    import pytest as _pytest

    from defenda_data_lake_spark.operators.sketches import (
        count_min_lookup,
        count_min_table,
    )

    df = spark.range(4000).select(
        (F.col("id") % 2).alias("g"),
        F.when(F.col("id") % 5 != 0, (F.col("id") % 7).cast("string")).alias("v"),
    )
    cells = count_min_table(df, "v", ["g"])
    # NULLs contribute to no cell: total mass = non-null count
    total = cells.agg(F.sum("_cm_count")).collect()[0][0]
    nn = df.filter(F.col("v").isNotNull()).count()
    assert total == 3 * nn  # d=3 probes per value

    # absent candidate estimates small (0 unless it collides in all rows)
    probe = spark.createDataFrame([(0, "no-such-value"),], ["g", "v"])
    est = count_min_lookup(cells, probe, "v", ["g"]).collect()[0]["cm_estimate"]
    assert est <= nn  # sanity: bounded by the stream mass
    # exact per-group estimate for a present value
    present = spark.createDataFrame([(1, "3")], ["g", "v"])
    true_cnt = df.filter((F.col("g") == 1) & (F.col("v") == "3")).count()
    est2 = count_min_lookup(cells, present, "v", ["g"]).collect()[0]["cm_estimate"]
    assert est2 >= true_cnt

    with _pytest.raises(ValueError):
        count_min_table(df, "v", d=0)
    with _pytest.raises(ValueError):
        count_min_table(df, "v", d=5, w_hex_digits=7)  # 35 hex > 32


def test_count_min_null_group_key_matches(spark):
    # a NULL GROUP key is a real group (groupBy keeps it); the lookup
    # join must be null-safe or its estimates come back 0, breaking
    # the one-sided guarantee
    from defenda_data_lake_spark.operators.sketches import (
        count_min_lookup,
        count_min_table,
    )

    df = spark.createDataFrame(
        [(None, "x")] * 7 + [("en", "x")] * 3,
        "g string, v string",
    )
    cells = count_min_table(df, "v", ["g"])
    probe = spark.createDataFrame([(None, "x"), ("en", "x")], "g string, v string")
    got = {
        r["g"]: r["cm_estimate"]
        for r in count_min_lookup(cells, probe, "v", ["g"]).collect()
    }
    assert got[None] >= 7 and got["en"] >= 3, got


def test_bloom_saturation_returns_null(spark):
    from defenda_data_lake_spark.operators.sketches import bloom_cardinality

    # m=16 bits, k=2: 200 distinct values saturate every position
    df = spark.range(200).select(F.col("id").cast("string").alias("v"))
    rows = bloom_cardinality(df, "v", m_hex_digits=1, k=2).collect()
    assert len(rows) == 1 and rows[0]["bloom_estimate"] is None


def test_histogram_quantiles_error_bound(spark):
    from defenda_data_lake_spark.operators.sketches import (
        histogram_quantiles,
    )

    # uniform-ish values in [0, 100): every estimate must land within
    # one bin width of the exact quantile
    df = spark.range(10000).select(
        ((F.col("id") * 37) % 1000 / 10.0).alias("v")
    )
    est = {
        r["quantile"]: r["quantile_estimate"]
        for r in histogram_quantiles(
            df, "v", width=1.0, quantiles=(0.25, 0.5, 0.9, 0.99, 1.0)
        ).collect()
    }
    exact = df.selectExpr(
        "percentile(v, array(0.25D, 0.5D, 0.9D, 0.99D, 1.0D)) AS p"
    ).collect()[0]["p"]
    for q, ex in zip((0.25, 0.5, 0.9, 0.99, 1.0), exact):
        assert abs(est[q] - ex) <= 1.0 + 1e-9, (q, est[q], ex)


def test_histogram_quantiles_grouped_nulls_and_clamp(spark):
    from defenda_data_lake_spark.operators.sketches import (
        histogram_quantiles,
    )

    df = spark.range(2000).select(
        (F.col("id") % 2).alias("g"),
        F.when(F.col("id") % 10 != 0, (F.col("id") % 500).cast("double")).alias("v"),
    )
    rows = histogram_quantiles(df, "v", ["g"], width=5.0).collect()
    # 2 groups x 3 default quantiles; NULL v rows ignored
    assert len(rows) == 6
    # clamped run: mass outside [100, 200] lands in the boundary bins,
    # so every estimate stays inside [100, 200 + width]
    clamped = histogram_quantiles(
        df, "v", ["g"], width=5.0, lo=100.0, hi=200.0
    ).collect()
    for r in clamped:
        assert 100.0 <= r["quantile_estimate"] <= 205.0, r

    # all-NULL group absent entirely
    nn = spark.range(100).select(
        F.lit(0).alias("g"), F.lit(None).cast("double").alias("v")
    )
    assert histogram_quantiles(nn, "v", ["g"]).collect() == []


def test_histogram_quantiles_validation(spark):
    from defenda_data_lake_spark.operators.sketches import (
        histogram_quantiles,
    )

    df = spark.range(10).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError):
        histogram_quantiles(df, "v", width=0.0)
    with pytest.raises(ValueError):
        histogram_quantiles(df, "v", lo=1.0)
    with pytest.raises(ValueError):
        histogram_quantiles(df, "v", lo=5.0, hi=1.0)
    with pytest.raises(ValueError):
        histogram_quantiles(df, "v", quantiles=(0.0, 0.5))


def test_ann_recall_self_is_one(spark, sf_dir):
    # recall of the brute-force kernel against itself is exactly 1.0
    # for every query; and q89 (LSH vs brute) stays within [0, 1] with
    # n_truth = 10
    from defenda_data_lake_spark.plans.catalog import q89_ann_recall

    rows = q89_ann_recall(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_truth"] == 10
        assert 0 <= r["n_hits"] <= 10
        assert abs(r["recall_at_10"] - r["n_hits"] / 10.0) < 1e-9


def test_hll_merge_register_identical(spark):
    # the mergeability law: register tables built on disjoint (or
    # overlapping) slices, max-merged, must equal a direct build over
    # the union REGISTER-FOR-REGISTER — not approximately
    from defenda_data_lake_spark.operators.sketches import (
        hll_merge,
        hll_register_table,
    )

    df = spark.range(3000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 700).cast("string").alias("v"),
    )
    a = df.filter(F.col("id") < 1000)
    b = df.filter(F.col("id") >= 800)  # overlap on purpose
    merged = hll_merge(
        hll_register_table(a, "v", ["g"]).unionAll(
            hll_register_table(b, "v", ["g"])
        ),
        ["g"],
    )
    direct = hll_register_table(df, "v", ["g"])
    key = lambda r: (r["g"], r["_hll_idx"], r["_hll_max"])
    assert sorted(map(key, merged.collect())) == sorted(
        map(key, direct.collect())
    )


def test_hash_sample_estimate_accuracy(spark):
    from defenda_data_lake_spark.operators.sketches import (
        hash_sample_estimate,
        hash_sample_sketch,
    )

    # 20k distinct at p=1/16 -> ~1250 sampled, stderr ~3%; assert 10%
    df = spark.range(60000).select((F.col("id") % 20000).cast("string").alias("v"))
    sk = hash_sample_sketch(df, "v", prefix_hex=1)
    est = hash_sample_estimate(sk, prefix_hex=1).collect()[0]["distinct_estimate"]
    assert abs(est - 20000) / 20000 < 0.10, est


def test_hash_sample_merge_law_exact(spark):
    from defenda_data_lake_spark.operators.sketches import (
        hash_sample_merge,
        hash_sample_sketch,
    )

    # merged per-part sketches must equal the direct sketch of the
    # union ROW-FOR-ROW (not approximately) — the property that makes
    # the sample a persistable incremental structure
    a = spark.range(0, 8000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(4000, 12000).select(F.col("id").cast("string").alias("v"))
    direct = hash_sample_sketch(a.unionByName(b), "v", prefix_hex=1)
    merged = hash_sample_merge(
        hash_sample_sketch(a, "v", prefix_hex=1),
        hash_sample_sketch(b, "v", prefix_hex=1),
    )
    assert sorted(r["_hs_hash"] for r in direct.collect()) == sorted(
        r["_hs_hash"] for r in merged.collect()
    )


def test_hash_sample_overlap_estimates(spark):
    from defenda_data_lake_spark.operators.sketches import (
        hash_sample_overlap,
        hash_sample_sketch,
    )

    # |A| = 12000 (0..12000), |B| = 12000 (6000..18000), |A∩B| = 6000
    a = spark.range(0, 12000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(6000, 18000).select(F.col("id").cast("string").alias("v"))
    row = hash_sample_overlap(
        hash_sample_sketch(a, "v", prefix_hex=1),
        hash_sample_sketch(b, "v", prefix_hex=1),
        prefix_hex=1,
    ).collect()[0]
    assert abs(row["est_a"] - 12000) / 12000 < 0.15
    assert abs(row["est_b"] - 12000) / 12000 < 0.15
    assert abs(row["est_union"] - 18000) / 18000 < 0.15
    assert abs(row["est_intersection"] - 6000) / 6000 < 0.25
    assert abs(row["jaccard_estimate"] - 6000 / 18000) < 0.1
    # internal consistency: inclusion-exclusion holds EXACTLY on the
    # coordinated samples (union = a + b - intersection)
    assert row["est_union"] == row["est_a"] + row["est_b"] - row["est_intersection"]


def test_hash_sample_empty_and_nulls(spark):
    from defenda_data_lake_spark.operators.sketches import (
        hash_sample_estimate,
        hash_sample_overlap,
        hash_sample_sketch,
    )

    empty = spark.range(0).select(F.col("id").cast("string").alias("v"))
    nulls = spark.range(100).select(F.lit(None).cast("string").alias("v"))
    for df in (empty, nulls):
        sk = hash_sample_sketch(df, "v", prefix_hex=1)
        assert (
            hash_sample_estimate(sk, prefix_hex=1).collect()[0]["distinct_estimate"]
            == 0
        )
    row = hash_sample_overlap(
        hash_sample_sketch(empty, "v", prefix_hex=1),
        hash_sample_sketch(nulls, "v", prefix_hex=1),
        prefix_hex=1,
    ).collect()[0]
    assert row["est_union"] == 0 and row["jaccard_estimate"] is None


def test_hash_sample_grouped_overlap_null_group(spark):
    from defenda_data_lake_spark.operators.sketches import (
        hash_sample_overlap,
        hash_sample_sketch,
    )

    # groupBy keeps a NULL group key; the overlap join must match it
    # NULL-safely so the NULL group's sketches still pair up
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.when(F.col("id") % 2 == 0, "g").alias("g"),
        F.col("id").cast("string").alias("v"),
    )
    out = hash_sample_overlap(
        hash_sample_sketch(mk(0, 12000), "v", ["g"], prefix_hex=1),
        hash_sample_sketch(mk(6000, 18000), "v", ["g"], prefix_hex=1),
        ["g"],
        prefix_hex=1,
    ).collect()
    by_g = {r["g"]: r for r in out}
    assert set(by_g) == {"g", None}
    for r in by_g.values():
        assert r["est_intersection"] > 0


def test_hash_sample_rejects_bad_prefix(spark):
    from defenda_data_lake_spark.operators.sketches import hash_sample_sketch

    df = spark.range(10).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError):
        hash_sample_sketch(df, "v", prefix_hex=0)
