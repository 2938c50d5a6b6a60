"""Streaming BPE token accounting (streaming/bpe.py): exact-integer
batch parity, statelessness, and the zero-row no-row-lost contract
for wordless documents."""

from pyspark.sql import functions as F

from defenda_data_lake_spark.operators import bpe as B
from defenda_data_lake_spark.streaming.bpe import bpe_token_stream

SF = "/root/testdata/sf0.001"


def test_stream_counts_match_batch_exactly_and_stateless(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    merges = B.learn_bpe_spark(docs)

    src = tmp_path / "docs_src"
    docs.select("doc_id", "text").write.parquet(str(src))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )
    query = (
        bpe_token_stream(stream, merges)
        .writeStream.format("memory")
        .queryName("bpe_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        progress = query.lastProgress
        assert progress is None or progress["stateOperators"] == []
    finally:
        query.stop()

    got = {
        r.id: (r.n_words, r.n_chars_az, r.n_tokens)
        for r in spark.sql("SELECT * FROM bpe_counts").collect()
    }
    want = {
        r.doc_id: (r.n_words, r.n_chars_az, r.n_tokens)
        for r in B.tokenize_corpus(docs, merges).collect()
    }
    # exact integers on the common set; stream-only extras are the
    # wordless documents the batch inner-join drops, emitted as zeros
    for doc_id, vals in want.items():
        assert got[doc_id] == vals, doc_id
    extras = set(got) - set(want)
    assert all(got[d] == (0, 0, 0) for d in extras)
    assert len(got) == docs.count()  # no row lost


def test_full_stream_matches_batch_byte_fallback(spark, tmp_path):
    """bpe_full_token_stream == batch full_token_accounting column-
    for-column (exact integers, EVERY doc appears on both sides —
    unlike tokenize_corpus the batch twin keeps wordless docs), and
    the stream stays stateless."""
    from defenda_data_lake_spark.streaming.bpe import bpe_full_token_stream

    corpus = spark.read.parquet(f"{SF}/documents.parquet")
    merges = B.learn_bpe_spark(corpus)
    docs = corpus.select("doc_id", "text").limit(60).unionByName(
        spark.createDataFrame(
            [
                (900001, "Héllo wörld! café 世界 the the"),
                (900002, "x" * 40 + " the end " + "y" * 33),
                (900003, "1234 !!! ??? $$$"),
                (900004, None),
            ],
            "doc_id long, text string",
        )
    )
    src = tmp_path / "src_full"
    docs.write.parquet(str(src))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )
    query = (
        bpe_full_token_stream(stream, merges)
        .writeStream.format("memory")
        .queryName("bpe_full")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_full"))
        .start()
    )
    try:
        query.processAllAvailable()
        progress = query.lastProgress
        assert progress is None or progress["stateOperators"] == []
    finally:
        query.stop()
    cols = [
        "n_words", "n_vocab_words", "n_tokens_bpe", "n_long_chars",
        "n_bytes_other", "n_tokens_total",
    ]
    got = {
        r["id"]: tuple(r[c] for c in cols)
        for r in spark.sql("SELECT * FROM bpe_full").collect()
    }
    want = {
        r["doc_id"]: tuple(r[c] for c in cols)
        for r in B.full_token_accounting(
            spark.read.parquet(str(src)), merges
        ).collect()
    }
    assert got == want
    assert len(got) == docs.count()
    # the 120-replace chain must expand ONCE (inside the _tc
    # transform), not once per consuming aggregate: CollapseProject
    # must not re-inline the multiply-referenced alias
    plan = (
        bpe_full_token_stream(
            spark.read.parquet(str(src)), merges
        )._jdf.queryExecution().executedPlan().toString()
    )
    n_repl = plan.count("replace(")
    assert n_repl < 2 * B.N_MERGES * B.N_PASSES, n_repl


def test_wordless_document_emits_zero_row(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "1234 !!! 5678"), (3, None)],
        "doc_id long, text string",
    )
    corpus = spark.read.parquet(f"{SF}/documents.parquet")
    merges = B.learn_bpe_spark(corpus)
    src = tmp_path / "src"
    docs.write.parquet(str(src))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )
    query = (
        bpe_token_stream(stream, merges)
        .writeStream.format("memory")
        .queryName("bpe_zero")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    got = {
        r.id: (r.n_words, r.n_tokens)
        for r in spark.sql("SELECT * FROM bpe_zero").collect()
    }
    assert got[2] == (0, 0)
    assert got[1][0] == 4 and got[1][1] >= 4
    assert got[3] == (0, 0)  # NULL text -> auditable zero row
