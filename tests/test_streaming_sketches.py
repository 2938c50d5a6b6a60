"""Streaming count-min sketch (streaming/sketches.py): cumulative
cells must match the batch count_min_table cell-for-cell."""

import pytest
from pyspark.sql import functions as F

from defenda_data_lake_spark.streaming.sketches import count_min_stream


def _write_words(path, words):
    with open(path, "w") as f:
        for w in words:
            f.write(w + "\n")


def _stream(spark, landing):
    return (
        spark.readStream.format("text")
        .schema("value string")
        .load(str(landing))
        .select(F.col("value").alias("word"))
    )


def test_count_min_stream_matches_batch(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    b1 = ["alpha", "beta", "alpha", "gamma", "beta", "alpha"]
    b2 = ["beta", "delta", "alpha", "delta", "epsilon"]
    _write_words(landing / "b1.txt", b1)

    query = (
        count_min_stream(_stream(spark, landing), "word", d=3, w_hex_digits=3)
        .writeStream.format("memory")
        .queryName("cm_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        _write_words(landing / "b2.txt", b2)
        query.processAllAvailable()
    finally:
        query.stop()

    # live sketch = latest (= max, counts are cumulative and monotone)
    # count per touched cell
    streamed = {
        (r["_cm_row"], r["_cm_pos"]): r["mx"]
        for r in spark.sql(
            "SELECT _cm_row, _cm_pos, max(_cm_count) AS mx "
            "FROM cm_out GROUP BY 1, 2"
        ).collect()
    }
    from defenda_data_lake_spark.operators.sketches import count_min_table

    batch_df = spark.createDataFrame(
        [(w,) for w in b1 + b2], "word string"
    )
    batch = {
        (r["_cm_row"], r["_cm_pos"]): r["_cm_count"]
        for r in count_min_table(
            batch_df, "word", d=3, w_hex_digits=3
        ).collect()
    }
    assert streamed == batch
    # one-sided guarantee holds on the streamed cells too: the min
    # over a value's d probe cells is >= its true count
    assert len(batch) > 0


def test_count_min_stream_ignores_nulls_and_batch_passthrough(spark, tmp_path):
    # batch DataFrame falls through to count_min_table (identical
    # output, no streaming machinery)
    batch_df = spark.createDataFrame(
        [("x",), (None,), ("x",)], "word string"
    )
    rows = count_min_stream(batch_df, "word", d=2, w_hex_digits=2).collect()
    assert all(r["_cm_count"] == 2 for r in rows)
    assert len(rows) == 2  # d cells for the one non-null value

    with pytest.raises(ValueError):
        count_min_stream(batch_df, "word", shards=0)


def test_count_min_stream_state_survives_restart(spark, tmp_path):
    # counts must be CUMULATIVE across a query restart from the same
    # checkpoint (the state is the sketch; losing it silently would
    # under-count forever)
    landing = tmp_path / "landing"
    landing.mkdir()
    _write_words(landing / "b1.txt", ["w"] * 5)

    seen = []

    def start():
        # memory sink can't recover from a checkpoint; foreachBatch can
        return (
            count_min_stream(
                _stream(spark, landing), "word", d=2, w_hex_digits=2
            )
            .writeStream.foreachBatch(
                lambda df, _id: seen.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    _write_words(landing / "b2.txt", ["w"] * 7)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    counts = {}
    for r in seen:
        counts[r["_cm_pos"]] = max(
            counts.get(r["_cm_pos"], 0), r["_cm_count"]
        )
    assert set(counts.values()) == {12}


def test_hll_stream_matches_batch_registers(spark, tmp_path):
    from defenda_data_lake_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_register_table,
    )
    from defenda_data_lake_spark.streaming.sketches import hll_stream

    landing = tmp_path / "landing"
    landing.mkdir()
    b1 = [f"user{i}" for i in range(200)]
    b2 = [f"user{i}" for i in range(150, 400)]  # overlap re-sends
    _write_words(landing / "b1.txt", b1)

    query = (
        hll_stream(_stream(spark, landing), "word", p=8)
        .writeStream.format("memory")
        .queryName("hll_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        _write_words(landing / "b2.txt", b2)
        query.processAllAvailable()
    finally:
        query.stop()

    # live register = max per idx (rhos only ratchet upward)
    live = spark.sql(
        "SELECT _hll_idx, max(_hll_max) AS _hll_max "
        "FROM hll_out GROUP BY 1"
    )
    batch_df = spark.createDataFrame(
        [(w,) for w in b1 + b2], "word string"
    )
    batch = {
        (r["_hll_idx"], r["_hll_max"])
        for r in hll_register_table(batch_df, "word", p=8).collect()
    }
    streamed = {(r["_hll_idx"], r["_hll_max"]) for r in live.collect()}
    assert streamed == batch
    # and the estimator over the streamed registers equals the batch
    # estimate exactly (registers are the whole sketch)
    est_s = hll_estimate_from_registers(live, p=8).collect()[0][0]
    from defenda_data_lake_spark.operators.sketches import hll_distinct

    est_b = hll_distinct(batch_df, "word", p=8).collect()[0][0]
    assert est_s == est_b
    assert abs(est_s - 400) / 400 < 0.15  # sanity: near true 400


def test_hll_stream_batch_passthrough(spark):
    from defenda_data_lake_spark.streaming.sketches import hll_stream

    batch_df = spark.createDataFrame(
        [("a",), ("b",), (None,), ("a",)], "word string"
    )
    rows = hll_stream(batch_df, "word", p=8).collect()
    assert 1 <= len(rows) <= 2  # 2 distinct values, possible idx share
    with pytest.raises(ValueError):
        hll_stream(batch_df, "word", p=7)


def test_histogram_bins_stream_matches_batch(spark, tmp_path):
    from defenda_data_lake_spark.operators.sketches import (
        histogram_bin_table,
        histogram_quantiles,
        histogram_quantiles_from_bins,
    )
    from defenda_data_lake_spark.streaming.sketches import (
        histogram_bins_stream,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    b1 = [str(v) for v in range(0, 300, 3)]
    b2 = [str(v) for v in range(150, 450, 2)]
    _write_words(landing / "b1.txt", b1)

    src = (
        spark.readStream.format("text")
        .schema("value string")
        .load(str(landing))
        .select(F.col("value").cast("double").alias("v"))
    )
    query = (
        histogram_bins_stream(src, "v", width=10.0, lo=0.0, hi=500.0)
        .writeStream.format("memory")
        .queryName("hq_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        _write_words(landing / "b2.txt", b2)
        query.processAllAvailable()
    finally:
        query.stop()

    live = spark.sql(
        "SELECT _hq_bin, max(_hq_cnt) AS _hq_cnt FROM hq_out GROUP BY 1"
    )
    batch_df = spark.createDataFrame(
        [(float(v),) for v in b1 + b2], "v double"
    )
    batch = {
        (r["_hq_bin"], r["_hq_cnt"])
        for r in histogram_bin_table(
            batch_df, "v", width=10.0, lo=0.0, hi=500.0
        ).collect()
    }
    streamed = {(r["_hq_bin"], r["_hq_cnt"]) for r in live.collect()}
    assert streamed == batch
    # estimator over live bins == the one-shot batch sketch
    est_s = sorted(
        map(
            tuple,
            histogram_quantiles_from_bins(live, width=10.0).collect(),
        )
    )
    est_b = sorted(
        map(
            tuple,
            histogram_quantiles(
                batch_df, "v", width=10.0, lo=0.0, hi=500.0
            ).collect(),
        )
    )
    assert est_s == est_b


def test_histogram_bins_stream_requires_clamp(spark, tmp_path):
    from defenda_data_lake_spark.streaming.sketches import (
        histogram_bins_stream,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    src = (
        spark.readStream.format("text")
        .schema("value string")
        .load(str(landing))
        .select(F.col("value").cast("double").alias("v"))
    )
    with pytest.raises(ValueError):
        histogram_bins_stream(src, "v", width=1.0)
    # batch passthrough keeps the clamp optional
    batch_df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    assert histogram_bins_stream(batch_df, "v", width=1.0).count() == 2
