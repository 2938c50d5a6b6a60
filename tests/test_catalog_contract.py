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


def test_window_covers_round7_changed_and_new():
    """The driver checks only the FIRST 50 entries: everything new or
    behavior-changed in round 7 must sit inside that window."""
    window = list(CATALOG)[:50]
    changed = [
        "q78_chunk_dedupe", "q79_hll_distinct",
        *[
            n for n in CATALOG
            if 80 <= int(n[1:].split("_", 1)[0]) <= 102
        ],
    ]
    missing = [n for n in changed if n not in window]
    assert not missing, missing
    # q103 is new-in-r7 but the window is FULL (25 r5-stale + 24
    # r7-new/changed + q102): it ships tail-first with the local gate
    # instead (test_q103_value_parity_vs_duckdb + check_oracle green at
    # 3 SFs) and must LEAD the round-8 window — see the CATALOG
    # ordering comment.
    # ...tail-first = the first entry PAST the 50-slot window
    assert list(CATALOG).index("q103_nb_quality_classifier") == 50
