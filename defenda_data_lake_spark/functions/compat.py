"""Presto/Athena SQL compatibility aliases.

The reference delegates all query execution to Athena and documents its
query surface as "any valid Presto SQL" (reference README.md:116); the
sample queries use ``json_extract_scalar``, ``json_extract`` and
``json_array_contains`` (reference README.md:97,112,131,139,164).  Spark
SQL covers the relational surface natively; these three JSON functions
are registered as *SQL scalar functions* (Spark 4 ``CREATE FUNCTION …
RETURN <expr>``) so that

* the reference's documented query text runs verbatim, and
* execution stays JVM-side inside whole-stage codegen — a SQL function
  is inlined into the plan by Catalyst; there is no Python round-trip
  and no codegen break (unlike ``spark.udf.register`` Python UDFs).

Semantics notes vs Presto:

* ``json_extract_scalar`` detects object/array results by *parsed type*
  (Spark 4 variant + ``schema_of_variant``), not by sniffing the
  extracted text — a legitimate string scalar that happens to start
  with ``{`` or ``[`` (e.g. ``"[tag] msg"``) is correctly returned,
  and true objects/arrays are NULL (Presto behavior).  Numbers render
  in canonical form (``1.50`` → ``'1.5'``), matching Presto's
  parse-then-print pipeline rather than raw-text extraction.
* ``json_array_contains(json, value)`` accepts string, numeric and
  boolean values: elements compare by canonical scalar string form, so
  ``json_array_contains('[1,2]', 1)`` and ``('[true]', true)`` work.
  One documented divergence: Presto compares typed values, so
  ``json_array_contains('["true"]', true)`` is false there but true
  here (string form collides); the reference's documented uses
  (README.md:131,139) are all string-vs-string, where semantics agree.
* ``json_extract`` returns the addressed JSON as text via
  ``get_json_object``, which largely preserves the *input's* spelling;
  Presto re-serializes canonically (key order kept, whitespace
  dropped).  Whitespace-insensitive consumers see no difference.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_COMPAT_FUNCTIONS: dict[str, str] = {
    # Presto: scalar-only extraction; NULL for object/array results.
    # Type-detected via variant (see module docstring) so string scalars
    # beginning with '{'/'[' survive.
    # one LEFT(schema) membership test instead of two LIKEs keeps the
    # document parse count at 2 per call (predicate + extraction);
    # Catalyst does not CSE across CASE branches in a SQL function body
    "json_extract_scalar": """
        CREATE OR REPLACE TEMPORARY FUNCTION json_extract_scalar(js STRING, p STRING)
        RETURNS STRING
        RETURN CASE
            WHEN left(schema_of_variant(try_variant_get(try_parse_json(js), p)), 6)
                 IN ('OBJECT', 'ARRAY<')
            THEN CAST(NULL AS STRING)
            ELSE try_variant_get(try_parse_json(js), p, 'string')
        END
    """,
    # Presto: returns the addressed JSON (as JSON text).
    "json_extract": """
        CREATE OR REPLACE TEMPORARY FUNCTION json_extract(js STRING, p STRING)
        RETURNS STRING
        RETURN get_json_object(js, p)
    """,
    # Presto: membership test on a JSON array literal; string, numeric
    # and boolean values all compare via canonical scalar string form.
    "json_array_contains": """
        CREATE OR REPLACE TEMPORARY FUNCTION json_array_contains(js STRING, v STRING)
        RETURNS BOOLEAN
        RETURN exists(from_json(js, 'array<variant>'), x -> CAST(x AS STRING) == v)
    """,
    # --- wider Presto function surface commonly used against security
    # --- lakes (each a thin JVM-side rewrite of a Spark builtin).
    # NOTE: json_array_length, regexp_like, cardinality, position are
    # already Spark builtins with Presto-compatible semantics — no
    # registration needed (and Spark refuses to shadow them).
    "from_iso8601_timestamp": """
        CREATE OR REPLACE TEMPORARY FUNCTION from_iso8601_timestamp(s STRING)
        RETURNS TIMESTAMP
        RETURN to_timestamp(s)
    """,
    "to_unixtime": """
        CREATE OR REPLACE TEMPORARY FUNCTION to_unixtime(t TIMESTAMP)
        RETURNS DOUBLE
        RETURN CAST(unix_micros(t) AS DOUBLE) / 1000000.0
    """,
    "from_unixtime_presto": """
        CREATE OR REPLACE TEMPORARY FUNCTION from_unixtime_presto(e DOUBLE)
        RETURNS TIMESTAMP
        RETURN timestamp_seconds(e)
    """,
    "url_extract_host": """
        CREATE OR REPLACE TEMPORARY FUNCTION url_extract_host(u STRING)
        RETURNS STRING
        RETURN parse_url(u, 'HOST')
    """,
    "url_extract_path": """
        CREATE OR REPLACE TEMPORARY FUNCTION url_extract_path(u STRING)
        RETURNS STRING
        RETURN parse_url(u, 'PATH')
    """,
    "url_extract_query": """
        CREATE OR REPLACE TEMPORARY FUNCTION url_extract_query(u STRING)
        RETURNS STRING
        RETURN parse_url(u, 'QUERY')
    """,
    "strpos": """
        CREATE OR REPLACE TEMPORARY FUNCTION strpos(s STRING, sub STRING)
        RETURNS INT
        RETURN instr(s, sub)
    """,
    "codepoint": """
        CREATE OR REPLACE TEMPORARY FUNCTION codepoint(s STRING)
        RETURNS INT
        RETURN ascii(s)
    """,
    "is_json_scalar": """
        CREATE OR REPLACE TEMPORARY FUNCTION is_json_scalar(js STRING)
        RETURNS BOOLEAN
        RETURN js IS NOT NULL
           AND NOT startswith(ltrim(js), '{')
           AND NOT startswith(ltrim(js), '[')
           AND get_json_object(js, '$') IS NOT NULL
    """,
    # Presto day_of_week is ISO (Monday=1..Sunday=7); Spark's dayofweek
    # is Sunday=1, so shift.  day_of_year/week_of_year map directly.
    "day_of_week": """
        CREATE OR REPLACE TEMPORARY FUNCTION day_of_week(t TIMESTAMP)
        RETURNS INT
        RETURN ((dayofweek(t) + 5) % 7) + 1
    """,
    "day_of_year": """
        CREATE OR REPLACE TEMPORARY FUNCTION day_of_year(t TIMESTAMP)
        RETURNS INT
        RETURN dayofyear(t)
    """,
    "week_of_year": """
        CREATE OR REPLACE TEMPORARY FUNCTION week_of_year(t TIMESTAMP)
        RETURNS INT
        RETURN weekofyear(t)
    """,
    # Presto prints plain timestamps as ISO-8601 with millisecond
    # precision and no zone suffix.
    "to_iso8601": """
        CREATE OR REPLACE TEMPORARY FUNCTION to_iso8601(t TIMESTAMP)
        RETURNS STRING
        RETURN date_format(t, 'yyyy-MM-dd''T''HH:mm:ss.SSS')
    """,
    # Presto date_diff(unit, from, to): unit as a string argument.
    # Spark's timestampdiff takes the unit as an identifier, so the
    # function body dispatches with a CASE per documented unit.  Named
    # date_diff_presto because Spark's 2-arg date_diff is a builtin
    # that cannot be replaced by a SQL UDF (same convention as
    # from_unixtime_presto).
    "date_diff_presto": """
        CREATE OR REPLACE TEMPORARY FUNCTION date_diff_presto(
            unit STRING, t1 TIMESTAMP, t2 TIMESTAMP)
        RETURNS BIGINT
        RETURN CASE lower(unit)
            WHEN 'millisecond' THEN timestampdiff(MILLISECOND, t1, t2)
            WHEN 'second'      THEN timestampdiff(SECOND, t1, t2)
            WHEN 'minute'      THEN timestampdiff(MINUTE, t1, t2)
            WHEN 'hour'        THEN timestampdiff(HOUR, t1, t2)
            WHEN 'day'         THEN timestampdiff(DAY, t1, t2)
            WHEN 'week'        THEN timestampdiff(WEEK, t1, t2)
            WHEN 'month'       THEN timestampdiff(MONTH, t1, t2)
            WHEN 'quarter'     THEN timestampdiff(QUARTER, t1, t2)
            WHEN 'year'        THEN timestampdiff(YEAR, t1, t2)
            ELSE CAST(raise_error(concat('date_diff_presto: invalid unit ',
                                         unit)) AS BIGINT)
        END
    """,
    # binary <-> text codecs (CloudTrail/VPC-flow payload forensics)
    "from_base64": """
        CREATE OR REPLACE TEMPORARY FUNCTION from_base64(s STRING)
        RETURNS BINARY
        RETURN unbase64(s)
    """,
    "to_base64": """
        CREATE OR REPLACE TEMPORARY FUNCTION to_base64(b BINARY)
        RETURNS STRING
        RETURN base64(b)
    """,
    # Presto to_hex prints uppercase; Spark hex is already uppercase
    "to_hex": """
        CREATE OR REPLACE TEMPORARY FUNCTION to_hex(b BINARY)
        RETURNS STRING
        RETURN hex(b)
    """,
    "from_hex": """
        CREATE OR REPLACE TEMPORARY FUNCTION from_hex(s STRING)
        RETURNS BINARY
        RETURN unhex(s)
    """,
    # Presto exposes bitwise ops as functions, not operators
    "bitwise_and": """
        CREATE OR REPLACE TEMPORARY FUNCTION bitwise_and(a BIGINT, b BIGINT)
        RETURNS BIGINT
        RETURN a & b
    """,
    "bitwise_or": """
        CREATE OR REPLACE TEMPORARY FUNCTION bitwise_or(a BIGINT, b BIGINT)
        RETURNS BIGINT
        RETURN a | b
    """,
    "bitwise_xor": """
        CREATE OR REPLACE TEMPORARY FUNCTION bitwise_xor(a BIGINT, b BIGINT)
        RETURNS BIGINT
        RETURN a ^ b
    """,
    # Presto raises on unequal lengths; this surface returns NULL
    # (SQL-function bodies cannot raise).  Codegen higher-order funcs
    # over per-char arrays — fine for the short strings (ids, hashes)
    # the function exists for.
    "hamming_distance": """
        CREATE OR REPLACE TEMPORARY FUNCTION hamming_distance(a STRING, b STRING)
        RETURNS BIGINT
        RETURN CASE
            WHEN length(a) != length(b) THEN CAST(NULL AS BIGINT)
            ELSE CAST(size(filter(zip_with(split(a, ''), split(b, ''),
                                           (x, y) -> x = y),
                                  m -> NOT m)) AS BIGINT)
        END
    """,
    # Presto array_average / array_sum skip NULL elements and return
    # NULL when no non-null element exists
    "array_average": """
        CREATE OR REPLACE TEMPORARY FUNCTION array_average(arr ARRAY<DOUBLE>)
        RETURNS DOUBLE
        RETURN CASE
            WHEN size(filter(arr, v -> v IS NOT NULL)) = 0 THEN CAST(NULL AS DOUBLE)
            ELSE aggregate(filter(arr, v -> v IS NOT NULL), CAST(0 AS DOUBLE),
                           (acc, v) -> acc + v)
                 / size(filter(arr, v -> v IS NOT NULL))
        END
    """,
    "array_sum": """
        CREATE OR REPLACE TEMPORARY FUNCTION array_sum(arr ARRAY<DOUBLE>)
        RETURNS DOUBLE
        RETURN CASE
            WHEN size(filter(arr, v -> v IS NOT NULL)) = 0 THEN CAST(NULL AS DOUBLE)
            ELSE aggregate(filter(arr, v -> v IS NOT NULL), CAST(0 AS DOUBLE),
                           (acc, v) -> acc + v)
        END
    """,
    # Presto truncate(x): round toward zero
    "truncate": """
        CREATE OR REPLACE TEMPORARY FUNCTION truncate(x DOUBLE)
        RETURNS DOUBLE
        RETURN sign(x) * floor(abs(x))
    """,
    "infinity": """
        CREATE OR REPLACE TEMPORARY FUNCTION infinity()
        RETURNS DOUBLE
        RETURN CAST('Infinity' AS DOUBLE)
    """,
    "nan": """
        CREATE OR REPLACE TEMPORARY FUNCTION nan()
        RETURNS DOUBLE
        RETURN CAST('NaN' AS DOUBLE)
    """,
    "is_nan": """
        CREATE OR REPLACE TEMPORARY FUNCTION is_nan(x DOUBLE)
        RETURNS BOOLEAN
        RETURN isnan(x)
    """,
    # Presto date_add(unit, value, ts) — the interval-typed complement
    # of date_diff_presto.  Unknown units return NULL (body can't
    # raise); millisecond keeps sub-second precision via DECIMAL secs.
    "date_add_presto": """
        CREATE OR REPLACE TEMPORARY FUNCTION date_add_presto(
            unit STRING, value BIGINT, ts TIMESTAMP)
        RETURNS TIMESTAMP
        RETURN CASE lower(unit)
            WHEN 'millisecond' THEN
                ts + make_interval(0, 0, 0, 0, 0, 0,
                                   CAST(value AS DECIMAL(24, 3)) / 1000)
            WHEN 'second' THEN ts + make_interval(0, 0, 0, 0, 0, 0, value)
            WHEN 'minute' THEN ts + make_interval(0, 0, 0, 0, 0, value, 0)
            WHEN 'hour' THEN ts + make_interval(0, 0, 0, 0, value, 0, 0)
            WHEN 'day' THEN ts + make_interval(0, 0, 0, value, 0, 0, 0)
            WHEN 'week' THEN ts + make_interval(0, 0, value, 0, 0, 0, 0)
            WHEN 'month' THEN ts + make_interval(0, value, 0, 0, 0, 0, 0)
            WHEN 'quarter' THEN ts + make_interval(0, 3 * value, 0, 0, 0, 0, 0)
            WHEN 'year' THEN ts + make_interval(value, 0, 0, 0, 0, 0, 0)
            ELSE CAST(NULL AS TIMESTAMP)
        END
    """,
}


def register_compat_functions(spark: SparkSession) -> None:
    """Register the Presto-compat JSON functions on the session."""
    for ddl in _COMPAT_FUNCTIONS.values():
        spark.sql(ddl)
