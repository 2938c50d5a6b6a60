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


def test_window_covers_round13_rotation():
    """The driver checks only the FIRST 50 entries: round 13 executes
    the contract-pinned rotation (VERDICT r12 item 3) — q73/q100/q101
    LEAD (the r12 behavioral-plan rewrites that shipped without a
    driver slot); then the four entries round 13 CHANGED (the CC loop
    consumers q49/q98/q107/q127 — lazy checkpoints, dst-partitioned
    edges; values identical, plans restructured); then the TWENTY-FOUR
    r10-window spills pinned at tail slots 50-73 last round, in their
    pinned order (the r12 contract's MUST); then the stalest
    remainder — the r11-green tail in its r11 order."""
    window = list(CATALOG)[:50]
    assert window[:3] == [
        "q73_semdedup", "q100_pagerank", "q101_triangle_counts",
    ]
    # changed-this-round rule: the CC-loop consumers
    assert window[3:7] == [
        "q49_dup_clusters", "q98_leakage_safe_split",
        "q107_quality_survivors", "q127_preference_pairs",
    ]
    # the twenty-four r10 spills, exactly as pinned at r12 tail 50-73
    r10_spills = [
        "q09_rollup_orders", "q11_window_running", "q12_distinct_agg",
        "q13_semi_join", "q15_setops", "q17_above_customer_avg",
        "q18_full_outer", "q21_events_sessions", "q22_events_hourly",
        "q23_string_funcs", "q27_grouping_sets", "q29_asof_join",
        "q41_knn_lsh", "q50_tfidf", "q51_decontamination",
        "q52_stratified_sample", "q53_repetition_signals",
        "q54_unigram_logprob", "q56_contrastive_pairs",
        "q57_gopher_filter", "q61_length_buckets", "q65_oov_rate",
        "q66_funnel", "q68_doc_chunks",
    ]
    assert window[7:31] == r10_spills
    # slots 31-49: the stalest remainder — r11-green entries in their
    # r11 order (2 rounds driver-stale)
    assert window[31:50] == [
        "q26_regexp_count", "q40_knn_brute", "q32_dedup_jaccard",
        "q14_anti_join", "q19_cube_customers", "q28_exists_sql",
        "q48_knn_quantized", "q55_group_sample", "q59_temperature_mix",
        "q64_bigram_logprob", "q67_retention_cohorts", "q124_hybrid_rrf",
        "q77_bucket_dedupe", "q70_pivot_daily", "q69_rolling_anomaly",
        "q115_bpe_merges", "q117_token_budget_bpe",
        "q118_group_token_budget_bpe", "q119_bpe_byte_fallback",
    ]
    # tail 50-76: the rest of the r11-green block, in its r11 order
    assert list(CATALOG)[50:77] == [
        "q121_fertility_by_lang", "q122_semantic_decontamination",
        "q20_events_json", "q34_text_quality", "q35_text_langid",
        "q37_vocab_topk", "q39_sequence_packing", "q43_multimodal_meta",
        "q45_embedding_dedup", "q46_knn_ivf", "q62_audio_chunks",
        "q71_pii_redaction", "q72_weighted_sample", "q74_resize_plumbing",
        "q63_candidate_verify", "q60_containment_pairs",
        "q58_ngram_novelty", "q79_hll_distinct", "q81_dup_span_coverage",
        "q83_count_min_words", "q84_char_entropy", "q85_profile_events",
        "q86_referential_integrity", "q87_bm25_topk",
        "q88_quantile_sketch", "q97_corpus_datasheet",
        "q102_edit_distance_pairs",
    ]
    # tail 77+: the ENTIRE r12 window (driver-green LAST round —
    # freshest) in its r12 order, minus the four entries that moved
    # up as changed-this-round
    r12_window_green = {
        "q120_sequence_packing_bpe", "q76_perplexity_buckets",
        "q116_bpe_tokenize", "q78_chunk_dedupe", "q80_bloom_distinct",
        "q89_ann_recall", "q91_overlap_sketch", "q92_token_budget",
        "q94_snapshot_diff", "q96_knn_pq", "q99_scd2_history",
        "q103_nb_quality_classifier", "q106_classifier_eval",
        "q123_classifier_calibration", "q125_source_divergence",
        "q126_embedding_drift", "q01_pricing_summary",
        "q03_shipping_priority", "q05_regional_revenue",
        "q10_window_rank", "q30_dedup_exact", "q31_dedup_minhash",
        "q36_text_fingerprint", "q104_source_overlap",
        "q105_prototypicality", "q108_unicode_normalize",
        "q47_kmeans_clusters", "q95_sampled_diff", "q90_hll_rollup",
        "q82_dup_span_removal", "q93_group_token_budget",
        "q75_group_weighted_sample", "q24_presto_text",
        "q25_percentile_stats", "q33_text_tokens", "q38_dataset_split",
        "q44_multimodal_decode", "q42_simhash_pairs", "q109_image_dhash",
        "q110_domain_curation", "q111_boilerplate_removal",
        "q112_dsir_weights", "q113_cdc_apply", "q114_audio_fingerprint",
        "q16_event_pairs", "q07_top_customers",
    }
    assert set(list(CATALOG)[77:]) == r12_window_green
    assert len(CATALOG) == 123
