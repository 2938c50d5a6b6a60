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


def test_window_covers_round8_changed_and_new():
    """The driver checks only the FIRST 50 entries: everything new or
    behavior-changed in round 8 must sit inside that window, and the
    six entries that went two rounds driver-stale (pinned at tail
    slots 50-55 by the round-7 contract) must LEAD it."""
    window = list(CATALOG)[:50]
    # q42: simhash_near_duplicates now delegates to the extracted
    # hamming_block_pairs; q109-q112 are new in round 8
    changed = [
        "q42_simhash_pairs", "q109_image_dhash", "q110_domain_curation",
        "q111_boilerplate_removal", "q112_dsir_weights", "q113_cdc_apply",
        "q114_audio_fingerprint",
    ]
    missing = [n for n in changed if n not in window]
    assert not missing, missing
    assert list(CATALOG)[:6] == [
        "q24_presto_text", "q25_percentile_stats", "q26_regexp_count",
        "q33_text_tokens", "q38_dataset_split", "q44_multimodal_decode",
    ]
    # q73/q77/q70/q69 were displaced from the r6 block by q111-q114:
    # they are r6-driver-green but will be 3 rounds stale by round 9,
    # so they MUST lead round 9's window — pinned at tail slots 50-53
    # exactly like the round-7 q24-q26 precedent.
    assert list(CATALOG)[50:54] == [
        "q73_semdedup", "q77_bucket_dedupe", "q70_pivot_daily",
        "q69_rolling_anomaly",
    ]
    # no entry may go >2 rounds without a driver check: everything
    # outside the round-8 window must have been driver-verified in r6
    # (the seven headline spills, bench-exercised every round, plus
    # the q73/q77 pinned above) or r7 (the whole r7 window)
    r6_verified_tail = {
        "q01_pricing_summary", "q03_shipping_priority",
        "q05_regional_revenue", "q10_window_rank", "q30_dedup_exact",
        "q31_dedup_minhash", "q36_text_fingerprint",
        "q73_semdedup", "q77_bucket_dedupe", "q70_pivot_daily",
        "q69_rolling_anomaly",
    }
    for n in list(CATALOG)[50:]:
        if n in r6_verified_tail:
            continue  # exactly 2 rounds stale; accounted for above
        # numeric proxy for membership in the round-7 driver window
        num = int(n[1:].split("_", 1)[0])
        assert 34 <= num <= 108, n
