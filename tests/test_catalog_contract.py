"""Catalog contract guards: cheap structural checks over ALL entries
that catch drift long before the (slower) full value sweep does."""

import duckdb
import pytest

from defenda_data_lake_spark.plans.catalog import CATALOG

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def test_every_entry_has_fn_and_docstring():
    for name, (fn, _sql) in CATALOG.items():
        assert callable(fn), name
        assert fn.__doc__ and fn.__doc__.strip(), f"{name} needs a docstring"


def test_every_oracle_sql_parses_and_plans(con):
    """EXPLAIN every oracle against the real views: catches SQL typos,
    bad column refs, and dialect slips in seconds instead of waiting
    for the value sweep."""
    bad = []
    for name, (_fn, sql) in CATALOG.items():
        if sql is None:
            continue
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001 - collect all failures
            bad.append((name, str(exc).splitlines()[0]))
    assert not bad, bad


def test_window_covers_round9_changed_and_new():
    """The driver checks only the FIRST 50 entries: everything new or
    behavior-changed in round 9 must sit inside that window, the four
    entries pinned at tail slots 50-53 by the round-8 contract must
    LEAD it, and the eleven round-7 entries displaced this round are
    pinned at tail slots 50-60 to lead round 10."""
    window = list(CATALOG)[:50]
    # q115-q121 are the new BPE family; q20 now aggregates over the
    # derived_view-parsed projection (behavior-equivalent but a new
    # physical plan — re-verify)
    changed = [
        "q115_bpe_merges", "q116_bpe_tokenize", "q117_token_budget_bpe",
        "q118_group_token_budget_bpe", "q119_bpe_byte_fallback",
        "q120_sequence_packing_bpe", "q121_fertility_by_lang",
        "q122_semantic_decontamination",
        "q20_events_json",
    ]
    missing = [n for n in changed if n not in window]
    assert not missing, missing
    # the round-8 tail pin, honored first (3 rounds driver-stale)
    assert list(CATALOG)[:4] == [
        "q73_semdedup", "q77_bucket_dedupe", "q70_pivot_daily",
        "q69_rolling_anomaly",
    ]
    # the twelve r7-window entries displaced by q115-q122/q20 and the
    # four leads: each has an in-window kernel sibling (see the
    # catalog.py policy comment) and MUST lead round 10's window
    assert list(CATALOG)[50:62] == [
        "q103_nb_quality_classifier", "q104_source_overlap",
        "q105_prototypicality", "q107_quality_survivors",
        "q108_unicode_normalize",
        "q47_kmeans_clusters", "q95_sampled_diff", "q90_hll_rollup",
        "q82_dup_span_removal", "q93_group_token_budget",
        "q75_group_weighted_sample", "q106_classifier_eval",
    ]
    # staleness audit for the rest of the tail: everything after the
    # ten pins must be r8-driver-verified (the round-8 window) or a
    # headline-bench query (value-exercised every bench run)
    r8_window = {
        "q24_presto_text", "q25_percentile_stats", "q26_regexp_count",
        "q33_text_tokens", "q38_dataset_split", "q44_multimodal_decode",
        "q42_simhash_pairs", "q109_image_dhash", "q110_domain_curation",
        "q111_boilerplate_removal", "q112_dsir_weights", "q113_cdc_apply",
        "q114_audio_fingerprint", "q40_knn_brute", "q16_event_pairs",
        "q32_dedup_jaccard", "q07_top_customers", "q09_rollup_orders",
        "q11_window_running", "q12_distinct_agg", "q13_semi_join",
        "q14_anti_join", "q15_setops", "q17_above_customer_avg",
        "q18_full_outer", "q19_cube_customers", "q21_events_sessions",
        "q22_events_hourly", "q23_string_funcs", "q27_grouping_sets",
        "q28_exists_sql", "q29_asof_join", "q41_knn_lsh",
        "q48_knn_quantized", "q50_tfidf", "q51_decontamination",
        "q52_stratified_sample", "q53_repetition_signals",
        "q54_unigram_logprob", "q55_group_sample",
        "q56_contrastive_pairs", "q57_gopher_filter",
        "q59_temperature_mix", "q61_length_buckets",
        "q64_bigram_logprob", "q65_oov_rate", "q66_funnel",
        "q67_retention_cohorts", "q68_doc_chunks",
    }
    headline = {
        "q01_pricing_summary", "q03_shipping_priority",
        "q05_regional_revenue", "q10_window_rank", "q30_dedup_exact",
        "q31_dedup_minhash", "q36_text_fingerprint",
    }
    for n in list(CATALOG)[62:]:
        assert n in r8_window or n in headline, n
