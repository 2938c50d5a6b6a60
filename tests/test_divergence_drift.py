"""Round-12 catalog entries: q125 source JS-divergence matrix and
q126 embedding drift — semantics on hand corpora, consistency with
their sibling entries, and plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.text import source_unigram_js

SF = "/root/testdata/sf0.001"
LN2_4DP = round(math.log(2.0), 4)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def _js_map(df):
    return {
        (r.src_a, r.src_b): (r.n_words_a, r.n_words_b, round(r.js, 4))
        for r in df.collect()
    }


def test_js_identical_sources_zero(spark):
    df = _docs(spark, [
        (1, "a", "the quick brown fox"),
        (2, "b", "the quick brown fox"),
    ])
    got = _js_map(source_unigram_js(df))
    assert got == {("a", "b"): (4, 4, 0.0)}


def test_js_disjoint_sources_ln2(spark):
    """No shared word: the closed-form remainder must produce the JS
    maximum ln 2 exactly — this is the inner-join-missing-pair path."""
    df = _docs(spark, [
        (1, "a", "alpha beta gamma"),
        (2, "b", "delta epsilon zeta"),
    ])
    got = _js_map(source_unigram_js(df))
    assert got == {("a", "b"): (3, 3, LN2_4DP)}


def test_js_hand_computed_mixed_case(spark):
    """P = {x: 1/2, y: 1/2}, Q = {x: 1/2, z: 1/2} — shared mass on x
    only.  JS = 0.5*(p_x ln(2p_x/(p_x+q_x)) + (1-p_x) ln2)*2 sides;
    with p_x = q_x = 1/2 the shared terms vanish and JS = 0.5*ln2."""
    df = _docs(spark, [
        (1, "a", "x y"),
        (2, "b", "x z"),
    ])
    got = _js_map(source_unigram_js(df))
    assert got == {("a", "b"): (2, 2, round(0.5 * math.log(2.0), 4))}


def test_js_symmetric_in_input_order(spark):
    """src_a < src_b regardless of which rows arrive first, and the
    value is symmetric by construction."""
    df = _docs(spark, [
        (1, "zz", "common words here plus extra"),
        (2, "aa", "common words here"),
    ])
    got = _js_map(source_unigram_js(df))
    assert list(got) == [("aa", "zz")]
    js = got[("aa", "zz")][2]
    assert 0.0 < js < LN2_4DP


def test_q125_pair_count_and_bounds(spark):
    """Full matrix over the generator corpus: C(|sources|, 2) rows,
    every js within [0, ln 2] after rounding."""
    from defenda_data_lake_spark.plans.catalog import CATALOG

    fn, _ = CATALOG["q125_source_divergence"]
    rows = fn(spark, SF).collect()
    n_src = 20
    assert len(rows) == n_src * (n_src - 1) // 2
    assert all(0.0 <= r.js <= LN2_4DP for r in rows)
    assert all(r.src_a < r.src_b for r in rows)


def test_q125_plan_vocab_join_reuses_exchange(spark):
    """The word self-join's two sides are the same subplan: the
    exchange on word must be built once (ReusedExchange), and the
    only nested-loop build is the tiny totals cross."""
    from tests.test_plan_quality import plan_of

    plan = plan_of(spark, "q125_source_divergence")
    assert "CartesianProduct" not in plan
    assert "ReusedExchange" in plan


def test_q126_consistent_with_q47(spark):
    """Same Lloyd chain: per-cluster n_old + n_new must equal q47's
    n_vectors, and the split-halves' weighted dispersion must
    reconstruct q47's avg_sq_dist within rounding noise."""
    from defenda_data_lake_spark.plans.catalog import CATALOG

    fn126, _ = CATALOG["q126_embedding_drift"]
    fn47, _ = CATALOG["q47_kmeans_clusters"]
    drift = {r.cluster: r for r in fn126(spark, SF).collect()}
    base = {r.cluster: r for r in fn47(spark, SF).collect()}
    assert set(drift) == set(base)
    for cl, b in base.items():
        d = drift[cl]
        assert d.n_old + d.n_new == b.n_vectors, cl
        num = 0.0
        if d.n_old:
            num += d.n_old * d.avg_sq_old
        if d.n_new:
            num += d.n_new * d.avg_sq_new
        # avg of per-side 4dp-rounded means vs the global 4dp mean:
        # agreement within the rounding quantum
        assert abs(num / b.n_vectors - b.avg_sq_dist) < 2e-4, cl
        if d.n_old and d.n_new:
            assert d.drift == pytest.approx(
                round((d.avg_sq_new - d.avg_sq_old) * 10000) / 10000,
                abs=1e-9,
            )


def test_q126_split_is_deterministic(spark):
    """Two runs produce identical rows (md5 split, quantized Lloyd)."""
    from defenda_data_lake_spark.plans.catalog import CATALOG

    fn, _ = CATALOG["q126_embedding_drift"]
    a = sorted(map(tuple, fn(spark, SF).collect()))
    b = sorted(map(tuple, fn(spark, SF).collect()))
    assert a == b


def test_q127_preference_pair_semantics(spark):
    """Chosen = highest rounded score (ties -> LOWEST id), rejected =
    lowest (ties -> HIGHEST id), margin from the rounded pair, only
    clusters of size >= 2, and consistency with q49's clustering and
    the q103 scores."""
    from defenda_data_lake_spark.plans.catalog import CATALOG

    fn, _ = CATALOG["q127_preference_pairs"]
    rows = {r.cluster_id: r for r in fn(spark, SF).collect()}
    fn49, _ = CATALOG["q49_dup_clusters"]
    clus = fn49(spark, SF).collect()
    fn103, _ = CATALOG["q103_nb_quality_classifier"]
    scores = {r.doc_id: r.score for r in fn103(spark, SF).collect()}

    from collections import defaultdict
    members = defaultdict(list)
    for r in clus:
        members[r.cluster_id].append(r.doc_id)
    expect = {}
    for cid, docs in members.items():
        if len(docs) < 2:
            continue
        scored = [(scores[d], d) for d in docs]  # all members scoreable
        best = max(scored, key=lambda t: (t[0], -t[1]))
        worst = min(scored, key=lambda t: (t[0], -t[1]))
        expect[cid] = (len(docs), best[1], worst[1],
                       round((best[0] - worst[0]) * 10000) / 10000)
    got = {
        cid: (r.cluster_size, r.chosen_id, r.rejected_id, r.margin)
        for cid, r in rows.items()
    }
    assert got == expect
    assert all(r.chosen_id != r.rejected_id for r in rows.values())
    assert all(r.margin >= 0 for r in rows.values())


def test_q127_plan_no_window_no_cartesian(spark):
    """The pair construction is a struct-ordered min/max hash
    aggregation, NOT a window — and nothing in the composed plan is a
    cartesian."""
    from tests.test_plan_quality import plan_of

    plan = plan_of(spark, "q127_preference_pairs")
    assert "CartesianProduct" not in plan
    assert "WindowExec" not in plan and "Window " not in plan
