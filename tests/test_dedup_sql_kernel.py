"""Parity pins for the pure-JVM minhash signature kernel
(``minhash_signatures(kernel="sql")``, VERDICT r9 item 5).

The sql kernel must replay the pandas kernel BIT-FOR-BIT: same hex
signatures, same row set (incl. the unshingleable contract), same
passthrough behavior — on the real documents corpus AND on the
adversarial unicode-whitespace inputs the docstring calls out
(Python's split set = Unicode White_Space + U+001C-U+001F).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.dedup import minhash_signatures


def _rows(df):
    return sorted(
        tuple(r) for r in df.collect()
    )


ADVERSARIAL = [
    (0, "The quick brown fox jumps over the lazy dog"),
    (1, "  leading and   trailing   whitespace  "),
    (2, ""),  # empty -> unshingleable
    (3, " \t\n\r\x0b\x0c "),  # ASCII whitespace only -> unshingleable
    (4, "\x1c\x1d\x1e\x1f"),  # Python-only whitespace -> unshingleable
    (5, "      　"),  # Zs/Zl/Zp
    (6, "word"),  # fewer words than shingle_n
    (7, "two words"),
    (8, "a b　c d e"),  # unicode separators BETWEEN words
    (9, "UPPER Case MiXeD ÄÖÜ ß Σ ΑΣ İstanbul"),  # case mapping
    (10, None),  # NULL text -> str(None) == 'None' -> one word
    (11, "dup dup dup dup dup dup"),  # repeated shingles collapse
    (12, "x\x1cy\x1fz"),  # U+001C/U+001F split words in Python
    (13, "tab\tsep\nnew\rline mix  of\fall"),
]


@pytest.mark.parametrize("keep", [False, True])
def test_sql_kernel_adversarial_parity(spark, keep):
    df = spark.createDataFrame(
        ADVERSARIAL, schema="doc_id long, text string"
    )
    kw = dict(num_hashes=8, shingle_n=3, keep_unshingleable=keep)
    pd_rows = _rows(minhash_signatures(df, kernel="pandas", **kw))
    sql_rows = _rows(minhash_signatures(df, kernel="sql", **kw))
    assert sql_rows == pd_rows
    # the unshingleable contract actually exercised both ways
    n_unshingleable = 4  # ids 2, 3, 4, 5 (all whitespace-only)
    assert len(pd_rows) == (len(ADVERSARIAL) if keep
                            else len(ADVERSARIAL) - n_unshingleable)


def test_sql_kernel_corpus_parity(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pd_rows = _rows(minhash_signatures(docs, "text", "doc_id", kernel="pandas"))
    sql_rows = _rows(minhash_signatures(docs, "text", "doc_id", kernel="sql"))
    assert sql_rows == pd_rows and len(pd_rows) > 0


def test_sql_kernel_passthrough_and_shapes(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta", "k1"), (2, " ", "k2")],
        schema="doc_id long, text string, tag string",
    )
    out = minhash_signatures(
        df, num_hashes=4, shingle_n=2, passthrough=["tag"],
        keep_unshingleable=True, kernel="sql",
    )
    assert out.columns == ["id", "h0", "h1", "h2", "h3", "tag"]
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["tag"] == "k1" and rows[1]["h0"] is not None
    assert rows[2]["tag"] == "k2" and all(
        rows[2][f"h{i}"] is None for i in range(4)
    )


def test_sql_kernel_plan_has_no_python_stage(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    plan = (
        minhash_signatures(df, kernel="sql")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_sql_kernel_rejects_unknown_kernel(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="kernel"):
        minhash_signatures(df, kernel="rust")


def test_sql_kernel_matches_q31_oracle_hex_scheme(spark):
    """One hand-computed signature: family i of doc 'a b c' (single
    shingle) must equal hex chunk i of md5('x'*(i//4) || 'a b c')."""
    import hashlib

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    row = minhash_signatures(df, kernel="sql").collect()[0]
    d0 = hashlib.md5(b"a b c").hexdigest()
    d1 = hashlib.md5(b"xa b c").hexdigest()
    for i in range(8):
        src = d0 if i < 4 else d1
        assert row[f"h{i}"] == src[(i % 4) * 8: (i % 4) * 8 + 8]


def test_sql_kernel_gets_min_parallelism(spark):
    """ADVICE r10 item 1: a one-partition input of unknown byte size
    must not run the whole sql-kernel signature stage as one task —
    the kernel wraps its input in ensure_min_parallelism exactly like
    the pandas path (unknown size -> full default parallelism)."""
    from pyspark.sql import functions as F

    df = (
        spark.range(1000)
        .coalesce(1)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("w"), F.col("id"), F.lit(" a b c d")).alias("text"),
        )
    )
    sig = minhash_signatures(df, kernel="sql")
    par = spark.sparkContext.defaultParallelism
    assert sig.rdd.getNumPartitions() >= min(par, 8)
