"""Drift-triggered auto-relearn policy (`bpe.tokenizer_refresh`): the
decision loop that gates re-tokenization — bootstrap, keep-identical,
adopt-on-measured-gain, keep-on-churn-without-gain — plus the shared
single-pass fertility measurement (`corpus_fertility`).

No reference counterpart (the reference engine has no tokenizer); this
closes the BPE lifecycle: learn → persist → drift-report →
POLICY-GATED adoption.
"""

import os

import pytest
from pyspark.sql import functions as F

from defenda_data_lake_spark.operators import bpe as B


def _corpus(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


BASE_ROWS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox runs past the sleeping dog",
    "pack my box with five dozen liquor jugs",
    "how vexingly quick daft zebras jump",
    "the five boxing wizards jump quickly",
] * 8


# a word the base vocabulary has never seen, frequent enough that a
# relearned table spends merges on it — candidate fertility improves
SHIFT_ROWS = BASE_ROWS + ["xylophone xylophone xylophone xylophone"] * 60


def test_bootstrap_learns_and_persists(spark, tmp_path):
    path = os.path.join(str(tmp_path), "model")
    docs = _corpus(spark, BASE_ROWS)
    rep = B.tokenizer_refresh(spark, docs, path)
    assert rep["decision"] == "bootstrap"
    assert rep["merges"] == rep["candidate"]
    assert rep["drift"] is None
    assert B.load_bpe_model(spark, path) == rep["merges"]


def test_keep_identical_on_unchanged_corpus(spark, tmp_path):
    path = os.path.join(str(tmp_path), "model")
    docs = _corpus(spark, BASE_ROWS)
    first = B.tokenizer_refresh(spark, docs, path)
    rep = B.tokenizer_refresh(spark, docs, path)
    assert rep["decision"] == "keep-identical"
    # identical tables tokenize identically — fertility is NOT measured
    assert rep["fertility_old"] is None and rep["fertility_new"] is None
    assert rep["merges"] == first["merges"]
    assert B.load_bpe_model(spark, path) == first["merges"]


def test_adopt_on_corpus_shift_with_gain(spark, tmp_path):
    path = os.path.join(str(tmp_path), "model")
    B.tokenizer_refresh(spark, _corpus(spark, BASE_ROWS), path)
    old = B.load_bpe_model(spark, path)
    rep = B.tokenizer_refresh(spark, _corpus(spark, SHIFT_ROWS), path)
    assert rep["decision"] == "adopt"
    assert rep["drift"]["drifted"]
    # the adopted table measurably serves the shifted corpus better
    assert rep["fertility_new"] < rep["fertility_old"]
    assert rep["relative_gain"] >= 0.002
    assert rep["merges"] == rep["candidate"] != old
    assert B.load_bpe_model(spark, path) == rep["candidate"]


def test_keep_when_gain_below_bar(spark, tmp_path):
    path = os.path.join(str(tmp_path), "model")
    B.tokenizer_refresh(spark, _corpus(spark, BASE_ROWS), path)
    old = B.load_bpe_model(spark, path)
    rep = B.tokenizer_refresh(
        spark, _corpus(spark, SHIFT_ROWS), path, min_fertility_gain=1.0
    )
    assert rep["decision"] == "keep-insufficient-gain"
    assert rep["drift"]["drifted"]  # churn detected, adoption refused
    assert rep["merges"] == old
    assert B.load_bpe_model(spark, path) == old  # disk untouched


def test_dry_run_never_writes(spark, tmp_path):
    path = os.path.join(str(tmp_path), "model")
    rep = B.tokenizer_refresh(
        spark, _corpus(spark, BASE_ROWS), path, dry_run=True
    )
    assert rep["decision"] == "would-bootstrap"
    assert not os.path.exists(path)
    B.tokenizer_refresh(spark, _corpus(spark, BASE_ROWS), path)
    old = B.load_bpe_model(spark, path)
    rep = B.tokenizer_refresh(
        spark, _corpus(spark, SHIFT_ROWS), path, dry_run=True
    )
    assert rep["decision"] == "would-adopt"
    assert B.load_bpe_model(spark, path) == old  # disk untouched


def test_keep_no_words_on_unusable_corpus(spark, tmp_path):
    path = os.path.join(str(tmp_path), "model")
    B.tokenizer_refresh(spark, _corpus(spark, BASE_ROWS), path)
    old = B.load_bpe_model(spark, path)
    # digits only: zero qualifying words, fertility undefined — a blind
    # adoption here would install an EMPTY merge table over a good one
    rep = B.tokenizer_refresh(spark, _corpus(spark, ["123 456"] * 5), path)
    assert rep["decision"] == "keep-no-words"
    assert rep["merges"] == old
    assert B.load_bpe_model(spark, path) == old


def test_corpus_fertility_matches_per_doc_accounting(spark):
    """The policy's single-pass measurement equals the ratio of the
    audited per-doc accounting sums — the two fertility definitions
    cannot drift."""
    docs = _corpus(spark, SHIFT_ROWS)
    merges = B.learn_bpe_spark(docs)
    wc = B.word_counts(docs)
    fert = B.corpus_fertility(wc, {"m": merges})["m"]
    agg = B.full_token_accounting(docs, merges).agg(
        F.sum("n_tokens_bpe").alias("t"), F.sum("n_words").alias("w")
    ).first()
    assert fert == pytest.approx(agg["t"] / agg["w"], abs=1e-12)


def test_corpus_fertility_two_tables_one_pass_values(spark):
    """Measuring two tables together equals measuring each alone (the
    shared projection doesn't cross-contaminate), and a longer merge
    table never has higher fertility on its own training corpus."""
    docs = _corpus(spark, BASE_ROWS)
    merges = B.learn_bpe_spark(docs)
    wc = B.word_counts(docs).cache()
    try:
        both = B.corpus_fertility(wc, {"full": merges, "half": merges[:12]})
        assert both["full"] == B.corpus_fertility(wc, {"full": merges})["full"]
        assert both["half"] == B.corpus_fertility(wc, {"half": merges[:12]})["half"]
        assert both["full"] <= both["half"]
    finally:
        wc.unpersist()
