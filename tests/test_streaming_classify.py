"""Streaming NB scoring (streaming/classify.py): batch parity at the
catalog's 4-decimal rounding, statelessness, and the empty-doc edge."""

from pyspark.sql import functions as F

from defenda_data_lake_spark.operators.classify import nb_train
from defenda_data_lake_spark.streaming.classify import (
    nb_model_row,
    nb_score_stream,
)

SF = "/root/testdata/sf0.001"


def _fit(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "_y", (F.col("n_chars") >= 300).cast("long")
    )
    model, totals = nb_train(docs, "_y")
    return docs, nb_model_row(model, totals), model, totals


def test_stream_scores_match_batch_at_4dp(spark, tmp_path):
    docs, model_row, model, totals = _fit(spark)
    src = tmp_path / "docs_src"
    docs.select("doc_id", "text").write.parquet(str(src))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(src))
    )
    query = (
        nb_score_stream(stream, model_row)
        .writeStream.format("memory")
        .queryName("nb_scored")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        # stateless by design: no state store operator in the plan
        progress = query.lastProgress
        assert progress is None or progress["stateOperators"] == []
    finally:
        query.stop()

    got = {
        r.doc_id: (r.n_words, round(r.score, 4), r.predicted)
        for r in spark.sql("SELECT * FROM nb_scored").collect()
    }
    from defenda_data_lake_spark.operators.classify import nb_score

    want = {
        r.doc_id: (r.n_words, round(r.score, 4), int(r.score > 0))
        for r in nb_score(docs, model, totals).collect()
    }
    # sf0.001 has no empty-text docs, so the outputs align 1:1
    assert got == want and len(got) == docs.count()


def test_restart_resumes_without_dupes_or_gaps(spark, tmp_path):
    """Stateless stream, but the exactly-once contract still rests on
    the checkpoint: stop after batch 1, add files, restart from the
    same checkpoint — every doc scored exactly once."""
    docs, model_row, _, _ = _fit(spark)
    # deterministic split (an unordered limit() can evaluate to a
    # DIFFERENT row set per job, breaking the no-dupes/no-gaps claim)
    first = docs.filter(F.col("doc_id") < 100)
    second = docs.filter(F.col("doc_id") >= 100)
    src = tmp_path / "restart_src"
    ckpt = str(tmp_path / "restart_ckpt")
    first.select("doc_id", "text").write.parquet(str(src))

    out = str(tmp_path / "restart_out")

    def start():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(str(src))
        )
        return (
            nb_score_stream(stream, model_row)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    second.select("doc_id", "text").write.mode("append").parquet(str(src))
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = [r.doc_id for r in spark.read.parquet(out).collect()]
    # file sink + checkpoint = exactly-once: no dupes, no gaps
    assert len(got) == len(set(got)) == docs.count()


def test_empty_doc_scores_prior_not_dropped(spark, tmp_path):
    docs, model_row, _, totals = _fit(spark)
    src = tmp_path / "edge_src"
    spark.createDataFrame(
        [(9001, "   "), (9002, ""), (9003, None)], "doc_id long, text string"
    ).write.parquet(str(src))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(src))
    )
    query = (
        nb_score_stream(stream, model_row)
        .writeStream.format("memory")
        .queryName("nb_edge")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()

    rows = {r.doc_id: r for r in spark.sql("SELECT * FROM nb_edge").collect()}
    prior = totals.select(
        F.log((F.col("n_pos") + 1) / (F.col("n_neg") + 1)).alias("p")
    ).collect()[0].p
    # NULL text takes the same prior path — never (-1, NULL, NULL)
    assert set(rows) == {9001, 9002, 9003}
    for r in rows.values():
        assert r.n_words == 0
        assert abs(r.score - prior) < 1e-12
        assert r.predicted is not None
