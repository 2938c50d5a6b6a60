"""Streaming group-budget admission (streaming/sampling.py): batch
parity, cross-batch counter carry, first-fit (not prefix) semantics,
strict-mix and default-budget routing, NULL auditability, budget
never exceeded, and restart continuation."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from defenda_data_lake_spark.streaming.sampling import (
    group_budget_admission,
)

ROWS = [
    # (id, grp, tokens, ord)
    ("a1", "en", 40, 1),
    ("a2", "en", 50, 2),
    ("a3", "en", 30, 3),   # rejected at budget 100 (40+50+30 > 100)
    ("a4", "en", 10, 4),   # first-fit: still admitted (90+10 = 100)
    ("b1", "de", 80, 1),
    ("b2", "de", 30, 2),   # rejected (80+30 > 100)
    ("c1", "fr", 5, 1),    # unlisted group
    ("n1", None, 5, 1),    # NULL group: never admitted
    ("n2", "en", None, 5), # NULL tokens: never admitted, no budget burn
]
SCHEMA = "id string, grp string, tokens long, ord long"
BUDGETS = {"en": 100, "de": 100}


def _run_stream(spark, tmp_path, batches, name, **kw):
    src = tmp_path / f"src_{name}"
    src.mkdir()
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        group_budget_admission(
            stream, "id", "tokens", "grp", "ord", **kw
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .start()
    )
    try:
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))
            q.processAllAvailable()
    finally:
        q.stop()
    return {
        r["id"]: (r["admitted"], r["cum_tokens"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def test_single_batch_stream_equals_batch_twin(spark, tmp_path):
    got = _run_stream(
        spark, tmp_path, [ROWS], "adm_one", budgets=BUDGETS
    )
    batch = {
        r["id"]: (r["admitted"], r["cum_tokens"])
        for r in group_budget_admission(
            spark.createDataFrame(ROWS, SCHEMA),
            "id", "tokens", "grp", "ord", budgets=BUDGETS,
        ).collect()
    }
    assert got == batch
    assert len(got) == len(ROWS)  # no row lost
    # the semantics themselves
    assert got["a1"] == (True, 40)
    assert got["a2"] == (True, 90)
    assert got["a3"] == (False, 90)   # would overflow
    assert got["a4"] == (True, 100)   # first-fit: later smaller doc fits
    assert got["b2"] == (False, 80)
    assert got["c1"][0] is False      # strict mix: unlisted group
    assert got["n1"][0] is False      # NULL group auditable reject
    assert got["n2"] == (False, 100)  # NULL tokens: no budget burn


def test_counter_carries_across_micro_batches(spark, tmp_path):
    """Admission at batch N+1 starts from batch N's counter: feeding
    the rows one batch each must equal the single-batch run (arrival
    order == ord order here)."""
    ordered = sorted(ROWS, key=lambda r: (r[1] or "", r[3]))
    batches = [[r] for r in ordered]
    got = _run_stream(
        spark, tmp_path, batches, "adm_multi", budgets=BUDGETS
    )
    one = _run_stream(
        spark, tmp_path, [ROWS], "adm_single", budgets=BUDGETS
    )
    assert got == one


def test_default_budget_and_validation(spark, tmp_path):
    got = _run_stream(
        spark, tmp_path, [ROWS], "adm_dflt",
        budgets=BUDGETS, default_budget=10,
    )
    assert got["c1"] == (True, 5)  # unlisted group now metered at 10
    with pytest.raises(ValueError, match="budgets and/or default_budget"):
        group_budget_admission(
            spark.createDataFrame(ROWS, SCHEMA),
            "id", "tokens", "grp", "ord",
        )
    with pytest.raises(ValueError, match=">= 0"):
        group_budget_admission(
            spark.createDataFrame(ROWS, SCHEMA),
            "id", "tokens", "grp", "ord", budgets={"en": -1},
        )


def test_budget_never_exceeded_random_corpus(spark, tmp_path):
    import random

    rnd = random.Random(7)
    rows = [
        (f"d{i}", rnd.choice(["en", "de", "fr"]), rnd.randint(1, 50), i)
        for i in range(300)
    ]
    batches = [rows[:100], rows[100:200], rows[200:]]
    budgets = {"en": 300, "de": 150, "fr": 0}
    got = _run_stream(
        spark, tmp_path, batches, "adm_rand", budgets=budgets
    )
    assert len(got) == len(rows)
    by_grp: dict[str, int] = {}
    for rid, grp, tok, _ in rows:
        if got[rid][0]:
            by_grp[grp] = by_grp.get(grp, 0) + tok
    for g, total in by_grp.items():
        assert total <= budgets[g], (g, total)
    assert "fr" not in by_grp  # zero budget admits nothing


def test_no_state_for_budgetless_groups(spark, tmp_path):
    """Strict mix + high-cardinality unlisted groups must not grow a
    counter per rejected group: state rows == listed groups observed."""
    rows = [(f"x{i}", f"g{i}", 5, i) for i in range(50)] + [
        ("e1", "en", 5, 99)
    ]
    src = tmp_path / "src_state"
    src.mkdir()
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        group_budget_admission(
            stream, "id", "tokens", "grp", "ord", budgets={"en": 100}
        )
        .writeStream.format("memory")
        .queryName("adm_state")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .start()
    )
    try:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        q.processAllAvailable()
        state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    finally:
        q.stop()
    assert state_rows == 1  # only "en" holds a counter
    got = {
        r["id"]: r["admitted"]
        for r in spark.sql("SELECT * FROM adm_state").collect()
    }
    assert got["e1"] is True and not any(
        v for k, v in got.items() if k != "e1"
    )


def test_budget_keys_coerced_to_group_domain(spark):
    """An int-keyed spec must meter an int group column (both sides
    land in the projected string domain)."""
    df = spark.createDataFrame(
        [("a", 7, 10, 1), ("b", 7, 10, 2), ("c", 8, 10, 1)],
        "id string, grp long, tokens long, ord long",
    )
    got = {
        r["id"]: r["admitted"]
        for r in group_budget_admission(
            df, "id", "tokens", "grp", "ord", budgets={7: 15}
        ).collect()
    }
    assert got == {"a": True, "b": False, "c": False}


def test_composes_with_streaming_token_meter(spark, tmp_path):
    """The streaming curation pipeline in ONE query: byte-fallback
    token meter (stateless, lang rides through via passthrough — no
    stream-stream join-back) feeding budget admission (stateful).
    Every document is decided exactly once, token values equal the
    batch accountant's, and per-lang admitted totals respect the
    budgets."""
    from defenda_data_lake_spark.operators import bpe as B
    from defenda_data_lake_spark.streaming.bpe import bpe_full_token_stream

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = B.learn_bpe_spark(corpus)
    docs = corpus.select("doc_id", "text", "lang").limit(120)
    src = tmp_path / "src_comp"
    src.mkdir()
    docs.coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(
        "doc_id long, text string, lang string"
    ).parquet(str(src))
    budgets = {"en": 4000, "de": 2000}
    metered = bpe_full_token_stream(stream, merges, passthrough=["lang"])
    adm = group_budget_admission(
        metered, "id", "n_tokens_total", "lang", "id", budgets=budgets
    )
    q = (
        adm.writeStream.format("memory")
        .queryName("comp_pipe")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_comp"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM comp_pipe").collect()
    assert len(rows) == docs.count()  # one decision per doc, none lost
    want_tok = {
        str(r["doc_id"]): r["n_tokens_total"]
        for r in B.full_token_accounting(docs, merges).collect()
    }
    spent: dict[str, int] = {}
    for r in rows:
        assert r["tokens"] == want_tok[r["id"]], r["id"]
        if r["admitted"]:
            spent[r["grp"]] = spent.get(r["grp"], 0) + r["tokens"]
    assert spent  # something was admitted
    for g, total in spent.items():
        assert total <= budgets[g], (g, total)


def test_restart_continues_from_checkpointed_counter(spark, tmp_path):
    """Stop the query between batches and restart on the same
    checkpoint: the counter must continue, not reset (no
    double-admission of the budget)."""
    src = tmp_path / "src_restart"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_restart")
    out = str(tmp_path / "out_restart")

    def start():
        # parquet sink: the memory sink does not support checkpoint
        # recovery (same pattern as the streaming-NB restart test)
        stream = spark.readStream.schema(SCHEMA).parquet(str(src))
        return (
            group_budget_admission(
                stream, "id", "tokens", "grp", "ord", budgets={"en": 100}
            )
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        spark.createDataFrame(
            [("r1", "en", 60, 1)], SCHEMA
        ).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()
    q = start()
    try:
        spark.createDataFrame(
            [("r2", "en", 60, 2), ("r3", "en", 40, 3)], SCHEMA
        ).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["id"]: (r["admitted"], r["cum_tokens"])
        for r in spark.read.parquet(out).collect()
    }
    assert got["r1"] == (True, 60)
    assert got["r2"] == (False, 60)  # 60+60 > 100 — counter survived
    assert got["r3"] == (True, 100)
