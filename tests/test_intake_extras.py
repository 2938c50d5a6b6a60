"""Firehose base64 intake, Variant projection, lake helpers."""

import base64
import json

from pyspark.sql import functions as F

from defenda_data_lake_spark.functions.variant import (
    variant_get_string,
    with_variant_details,
)
from defenda_data_lake_spark.lake import query_pandas
from defenda_data_lake_spark.operators.intake import decode_firehose_records
from defenda_data_lake_spark.operators.pipeline import STATUS_OK, normalize_df


def test_decode_firehose_records(spark):
    """The Firehose transform path: base64 payloads -> plugin pipeline
    (reference processor.py:25-28)."""
    events = [
        {"srcaddr": "198.51.100.1", "start": "2014-12-14T04:06:50"},
        {"kind": "not-gsuite", "x": 1},
    ]
    rows = [(base64.b64encode(json.dumps(e).encode()).decode(),) for e in events]
    rows.append(("bm90IGpzb24=",))  # base64("not json") -> quarantine
    df = spark.createDataFrame(rows, ["data"])
    out = normalize_df(decode_firehose_records(df), raw_col="raw").collect()
    by_status = {}
    for r in out:
        by_status.setdefault(r["_status"], []).append(r)
    assert len(by_status[STATUS_OK]) == 2
    assert len(by_status["ProcessingFailed"]) == 1
    good = by_status[STATUS_OK][0]
    assert good["utctimestamp"] == "2014-12-14T04:06:50+00:00"


def test_variant_projection(spark):
    df = spark.createDataFrame(
        [('{"sourceipaddress": "1.2.3.4", "nested": {"k": "v"}}',)], ["details"]
    )
    v = with_variant_details(df)
    row = v.select(
        variant_get_string("details_v", "$.sourceipaddress").alias("ip"),
        variant_get_string("details_v", "$.nested.k").alias("k"),
        variant_get_string("details_v", "$.missing").alias("m"),
    ).first()
    assert row["ip"] == "1.2.3.4"
    assert row["k"] == "v"
    assert row["m"] is None


def test_query_pandas(spark):
    pdf = query_pandas(spark, "SELECT 1 AS one, 'x' AS s")
    assert list(pdf.columns) == ["one", "s"]
    assert pdf["one"][0] == 1


def test_decode_firehose_malformed_base64_quarantined(spark):
    """Malformed base64 must become a per-record NULL (quarantined as
    ProcessingFailed), never an ANSI-mode job abort."""
    rows = [
        (base64.b64encode(json.dumps({"k": 1}).encode()).decode(),),
        ("!!!not-base64!!!",),
    ]
    df = spark.createDataFrame(rows, ["data"])
    out = normalize_df(decode_firehose_records(df), raw_col="raw").collect()
    statuses = sorted(r["_status"] for r in out)
    assert statuses == [STATUS_OK, "ProcessingFailed"]


def test_decode_firehose_invalid_utf8_quarantined(spark):
    """VALID base64 of INVALID UTF-8 must also become a per-record NULL
    (ANSI decode would raise MALFORMED_CHARACTER_CODING and abort the
    whole batch)."""
    rows = [
        (base64.b64encode(json.dumps({"k": 1}).encode()).decode(),),
        (base64.b64encode(b"\xff\xfe{bad}").decode(),),
    ]
    df = spark.createDataFrame(rows, ["data"])
    out = normalize_df(decode_firehose_records(df), raw_col="raw").collect()
    statuses = sorted(r["_status"] for r in out)
    assert statuses == [STATUS_OK, "ProcessingFailed"]


def test_normalize_df_passthrough_preserves_values_and_metadata(spark):
    """normalize_df passthrough (round 12): columns ride the kernel
    verbatim — values aligned per input row even for failed records —
    and the input StructField's METADATA survives into the output
    schema (what lets a watermark-tagged arrival column reach the
    stateful dedup stage through this mapInPandas)."""
    import json as _json

    from pyspark.sql import functions as F

    rows = [
        (_json.dumps({"summary": "alpha", "utctimestamp": "2026-01-01T00:01:00+00:00"}), 11),
        ("not json at all", 22),
        (_json.dumps({"summary": "beta", "utctimestamp": "2026-01-01T00:02:00+00:00"}), 33),
    ]
    df = spark.createDataFrame(rows, "raw string, tag long").withMetadata(
        "tag", {"probe": "kept"}
    )
    out = normalize_df(df, raw_col="raw", passthrough=["tag"])
    assert out.schema["tag"].metadata.get("probe") == "kept"
    got = {r["_raw"]: (r["_status"], r["tag"]) for r in out.collect()}
    assert got[rows[0][0]] == (STATUS_OK, 11)
    assert got["not json at all"] == ("ProcessingFailed", 22)
    assert got[rows[2][0]] == (STATUS_OK, 33)


def test_normalize_df_passthrough_rejects_schema_shadow(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("{}", "x")], "raw string, _status string")
    with _pytest.raises(ValueError, match="shadow"):
        normalize_df(df, raw_col="raw", passthrough=["_status"])
