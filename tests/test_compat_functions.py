"""Presto-compat SQL function surface (functions/compat.py)."""

import pytest


def one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").first()["v"]


def test_json_extract_scalar(spark):
    assert one(spark, "json_extract_scalar('{\"a\": {\"b\": 5}}', '$.a.b')") == "5"
    # Presto semantics: non-scalar results are NULL
    assert one(spark, "json_extract_scalar('{\"a\": {\"b\": 5}}', '$.a')") is None


def test_json_extract_returns_json_text(spark):
    assert one(spark, "json_extract('{\"a\": {\"b\": 5}}', '$.a')") == '{"b":5}'


def test_json_array_contains_and_length(spark):
    assert one(spark, "json_array_contains('[\"x\",\"y\"]', 'x')") is True
    assert one(spark, "json_array_contains('[\"x\",\"y\"]', 'z')") is False
    assert one(spark, "json_array_length('[\"x\",\"y\"]')") == 2


def test_timestamp_functions(spark):
    assert (
        str(one(spark, "from_iso8601_timestamp('2019-09-04T17:54:59Z')"))
        == "2019-09-04 17:54:59"
    )
    assert one(spark, "to_unixtime(TIMESTAMP '1970-01-01 00:01:00')") == 60.0
    assert (
        str(one(spark, "from_unixtime_presto(60.0)")) == "1970-01-01 00:01:00"
    )


def test_url_functions(spark):
    url = "'https://example.org/wp-login.php?redirect=1'"
    assert one(spark, f"url_extract_host({url})") == "example.org"
    assert one(spark, f"url_extract_path({url})") == "/wp-login.php"
    assert one(spark, f"url_extract_query({url})") == "redirect=1"


def test_string_functions(spark):
    assert one(spark, "regexp_like('abc123', '\\\\d+')") is True
    assert one(spark, "strpos('hello', 'll')") == 3
    assert one(spark, "codepoint('A')") == 65


def test_is_json_scalar(spark):
    assert one(spark, "is_json_scalar('5')") is True
    assert one(spark, "is_json_scalar('\"s\"')") is True
    assert one(spark, "is_json_scalar('{\"a\":1}')") is False
    assert one(spark, "is_json_scalar('[1]')") is False


def test_json_extract_scalar_bracket_string(spark):
    """A string scalar that *looks* like JSON structure must survive:
    Presto returns the string; only true objects/arrays are NULL."""
    js = '{"msg": "[tag] hello", "obj": {"a": 1}, "arr": [1, 2]}'
    assert one(spark, f"json_extract_scalar('{js}', '$.msg')") == "[tag] hello"
    assert one(spark, f"json_extract_scalar('{js}', '$.obj')") is None
    assert one(spark, f"json_extract_scalar('{js}', '$.arr')") is None
    assert one(spark, f"json_extract_scalar('{js}', '$.missing')") is None


def test_json_array_contains_typed_values(spark):
    """Presto accepts varchar/bigint/double/boolean values."""
    assert one(spark, "json_array_contains('[1, 2, 3]', 2)") is True
    assert one(spark, "json_array_contains('[1, 2, 3]', 5)") is False
    assert one(spark, "json_array_contains('[true, false]', true)") is True
    assert one(spark, "json_array_contains('[\"a\", \"b\"]', 'a')") is True
    assert one(spark, "json_array_contains('[\"a\"]', 'z')") is False
    # non-array input -> NULL, as in Presto
    assert one(spark, "json_array_contains('8', '8')") is None


def test_approx_count_distinct_surface(spark):
    """Presto's approx_distinct maps to Spark's approx_count_distinct
    (both HLL-family).  Pin the surface and its accuracy contract
    (default rsd 5%) against the exact count on a 10k-value column."""
    df = spark.range(10_000).selectExpr("CAST(id % 3847 AS STRING) AS v")
    from pyspark.sql import functions as F

    exact = df.select(F.countDistinct("v")).first()[0]
    # rsd is a standard deviation, not a bound: ask for 1% and accept 5%
    approx = df.select(F.approx_count_distinct("v", rsd=0.01)).first()[0]
    assert exact == 3847
    assert abs(approx - exact) / exact < 0.05


def test_day_week_year_functions(spark):
    # Presto day_of_week is ISO: Monday=1 .. Sunday=7
    assert one(spark, "day_of_week(TIMESTAMP '2026-08-10 00:00:00')") == 1  # Mon
    assert one(spark, "day_of_week(TIMESTAMP '2026-08-16 00:00:00')") == 7  # Sun
    assert one(spark, "day_of_year(TIMESTAMP '2026-02-01 00:00:00')") == 32
    assert one(spark, "week_of_year(TIMESTAMP '2026-01-08 00:00:00')") == 2


def test_to_iso8601(spark):
    assert (
        one(spark, "to_iso8601(TIMESTAMP '2019-09-04 17:54:59.123')")
        == "2019-09-04T17:54:59.123"
    )


def test_date_diff_presto_signature(spark):
    assert one(
        spark,
        "date_diff_presto('hour', TIMESTAMP '2020-03-01 00:00:00',"
        " TIMESTAMP '2020-03-02 12:00:00')",
    ) == 36
    assert one(
        spark,
        "date_diff_presto('day', TIMESTAMP '2020-03-01 00:00:00',"
        " TIMESTAMP '2020-03-09 00:00:00')",
    ) == 8
    assert one(
        spark,
        "date_diff_presto('second', TIMESTAMP '2020-06-01 12:30:45.000',"
        " TIMESTAMP '2020-06-02 12:30:45.000')",
    ) == 86400


def test_binary_codecs(spark):
    assert one(spark, "to_base64(from_hex('68656C6C6F'))") == "aGVsbG8="
    assert one(spark, "CAST(from_base64('aGVsbG8=') AS STRING)") == "hello"
    assert one(spark, "to_hex(CAST('ad' AS BINARY))") == "6164"


def test_bitwise_functions(spark):
    assert one(spark, "bitwise_and(19, 25)") == 17
    assert one(spark, "bitwise_or(19, 25)") == 27
    assert one(spark, "bitwise_xor(19, 25)") == 10


def test_hamming_distance(spark):
    assert one(spark, "hamming_distance('cat', 'car')") == 1
    assert one(spark, "hamming_distance('abcd', 'abcd')") == 0
    assert one(spark, "hamming_distance('0110', '1001')") == 4
    # Presto raises on unequal lengths; this surface returns NULL
    assert one(spark, "hamming_distance('ab', 'abc')") is None


def test_array_average_and_sum(spark):
    assert one(spark, "array_average(array(1D, 2D, 3D))") == 2.0
    # NULL elements are skipped, not counted
    assert one(spark, "array_average(array(1D, NULL, 3D))") == 2.0
    assert one(spark, "array_average(array(CAST(NULL AS DOUBLE)))") is None
    assert one(spark, "array_sum(array(1D, NULL, 3D))") == 4.0
    assert one(spark, "array_sum(array(CAST(NULL AS DOUBLE)))") is None


def test_truncate_nan_infinity(spark):
    assert one(spark, "truncate(17.18)") == 17.0
    assert one(spark, "truncate(-17.18)") == -17.0
    assert one(spark, "is_nan(nan())") is True
    assert one(spark, "is_nan(1.0D)") is False
    assert one(spark, "infinity() > 1e308") is True


def test_date_add_presto(spark):
    assert (
        str(one(spark, "date_add_presto('hour', 3, TIMESTAMP '2020-01-01 00:30:00')"))
        == "2020-01-01 03:30:00"
    )
    assert (
        str(one(spark, "date_add_presto('month', -1, TIMESTAMP '2020-03-31 12:00:00')"))
        == "2020-02-29 12:00:00"
    )
    assert (
        str(one(spark, "date_add_presto('millisecond', 1500, TIMESTAMP '2020-01-01 00:00:00')"))
        == "2020-01-01 00:00:01.500000"
    )
    # round-trip with the existing diff complement
    assert (
        one(
            spark,
            "date_diff_presto('day', TIMESTAMP '2020-01-01 00:00:00', "
            "date_add_presto('day', 40, TIMESTAMP '2020-01-01 00:00:00'))",
        )
        == 40
    )
    assert one(spark, "date_add_presto('fortnight', 1, TIMESTAMP '2020-01-01 00:00:00')") is None
