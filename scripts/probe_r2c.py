"""Scratch probe: q20 parallel-parse variants."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TZ", "UTC")
time.tzset()

import pandas as pd
from pyspark.sql import functions as F

from defenda_data_lake_spark.session import get_spark, tune_for_input_scale

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="probe")
tune_for_input_scale(spark, SF)


def t(name, fn, n=5):
    fn().write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best:.3f}")
    return best


def ev():
    return spark.read.parquet(f"{SF}/events.parquet")


def agg(df):
    return (
        df.filter(F.col("k") < 50)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


def q20_cur():
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return agg(ev().withColumn("k", k))


def q20_repart():
    base = ev().select("event_type", "value", "props").repartition(8)
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return agg(base.withColumn("k", k))


def q20_orjson():
    try:
        import orjson
    except ImportError:
        orjson = None

    def kernel(batches):
        import orjson as oj

        for b in batches:
            ks = []
            for p in b["props"]:
                try:
                    v = oj.loads(p).get("k")
                except Exception:
                    v = None
                ks.append(v if isinstance(v, (int, float)) else None)
            yield pd.DataFrame(
                {
                    "event_type": b["event_type"],
                    "value": b["value"],
                    "k": pd.array(ks, dtype="Int32"),
                }
            )

    base = ev().select("event_type", "value", "props").mapInPandas(
        kernel, schema="event_type string, value double, k int"
    )
    return agg(base)


def q20_orjson_repart():
    def kernel(batches):
        import orjson as oj

        for b in batches:
            ks = []
            for p in b["props"]:
                try:
                    v = oj.loads(p).get("k")
                except Exception:
                    v = None
                ks.append(v if isinstance(v, (int, float)) else None)
            yield pd.DataFrame(
                {
                    "event_type": b["event_type"],
                    "value": b["value"],
                    "k": pd.array(ks, dtype="Int32"),
                }
            )

    base = (
        ev().select("event_type", "value", "props").repartition(8).mapInPandas(
            kernel, schema="event_type string, value double, k int"
        )
    )
    return agg(base)


spark.read.parquet(f"{SF}/events.parquet").count()
import pandas as _pd

spark.range(1000).repartition(32).mapInPandas(
    lambda it: (_pd.DataFrame({"id": b["id"]}) for b in it), schema="id long"
).count()

t("q20_cur", q20_cur)
t("q20_repart", q20_repart)
t("q20_orjson", q20_orjson)
t("q20_orjson_repart", q20_orjson_repart)

c = q20_cur().orderBy("event_type").toPandas()
for name, fn in [("repart", q20_repart), ("orjson", q20_orjson), ("orjson_repart", q20_orjson_repart)]:
    v = fn().orderBy("event_type").toPandas()
    print(name, "match:", c.equals(v))
spark.stop()
