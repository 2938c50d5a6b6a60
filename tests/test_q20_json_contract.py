"""q20 JSON-extraction parity contract (the r9-carried latent item,
closed in round 11): Spark's from_json('k INT') admits only BARE JSON
integer tokens; the DuckDB oracle must replay exactly that — quoted
numerics, floats, and INT-overflow values are NULL on BOTH engines,
never parsed by one and nulled by the other."""

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


ADVERSARIAL_PROPS = [
    ('{"k": 7}', 7),          # bare int — the generator contract
    ('{"k": -3}', -3),        # bare negative int
    ('{"k": "7"}', None),     # quoted numeric: Jackson does not coerce
    ('{"k": 7.5}', None),     # float token
    ('{"k": "x"}', None),     # non-numeric string
    ('{"k": null}', None),    # explicit null
    ('{}', None),             # absent key
    ('{"k": 99999999999}', None),  # overflows INT on both engines
]


def test_spark_from_json_bare_int_only(spark):
    df = spark.createDataFrame(
        [(p,) for p, _ in ADVERSARIAL_PROPS], "props string"
    ).withColumn(
        "k", F.from_json("props", T.StructType([T.StructField("k", T.IntegerType())]))["k"]
    )
    got = [r["k"] for r in df.collect()]
    assert got == [want for _, want in ADVERSARIAL_PROPS]


def test_oracle_k_expression_matches_spark(spark):
    """The exact k-expression from Q20_SQL, evaluated by DuckDB on the
    adversarial props, must equal Spark's from_json result row-for-row."""
    con = duckdb.connect()
    vals = ", ".join(f"('{p}')" for p, _ in ADVERSARIAL_PROPS)
    got = [
        r[0]
        for r in con.execute(f"""
            SELECT CASE WHEN regexp_full_match(CAST(json_extract(props, '$.k') AS VARCHAR), '-?[0-9]+')
                        THEN TRY_CAST(json_extract_string(props, '$.k') AS INT) END AS k
            FROM (VALUES {vals}) t(props)
        """).fetchall()
    ]
    assert got == [want for _, want in ADVERSARIAL_PROPS]


def test_q20_oracle_still_green_on_generator_data(spark, sf_dir):
    """The hardened oracle is value-identical to the old form on the
    generator's bare-int data: full q20 compare at the test SF."""
    from defenda_data_lake_spark.plans.catalog import CATALOG

    fn, sql = CATALOG["q20_events_json"]
    s = sorted(map(tuple, fn(spark, sf_dir).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    o = sorted(map(tuple, con.execute(sql).fetchall()))
    assert [tuple(map(str, r)) for r in s] == [tuple(map(str, r)) for r in o]
