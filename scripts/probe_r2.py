"""Scratch probe: time q16/q20/q40 variants at sf0.1 (best-of-5, warm)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TZ", "UTC")
time.tzset()

from pyspark.sql import functions as F

from defenda_data_lake_spark.session import get_spark, tune_for_input_scale

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="probe")
tune_for_input_scale(spark, SF)


def t(name, fn, n=5):
    fn().write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best:.3f}")
    return best


def ev():
    return spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "ts", F.expr("timestamp_micros(ts div 1000)")
    )


# --- q16 current: plain equi self-join + range predicate
def q16_cur():
    a = ev().alias("a")
    b = ev().alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.user_id") == F.col("b.user_id"),
                F.col("b.ts") > F.col("a.ts"),
                F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 300 SECONDS"),
            ],
        )
        .groupBy(F.col("a.event_type").alias("type_a"), F.col("b.event_type").alias("type_b"))
        .agg(F.count("*").alias("pair_count"))
    )


# --- q16 bucketed interval join
def q16_bucket():
    base = ev().select("user_id", "ts", "event_type")
    bk = F.floor(F.unix_micros(F.col("ts")) / (300 * 1_000_000))
    a = base.select(
        "user_id", "ts", "event_type", F.explode(F.array(bk, bk + 1)).alias("bk")
    ).alias("a")
    b = base.select("user_id", "ts", "event_type", bk.alias("bk")).alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.user_id") == F.col("b.user_id"),
                F.col("a.bk") == F.col("b.bk"),
                F.col("b.ts") > F.col("a.ts"),
                F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 300 SECONDS"),
            ],
        )
        .groupBy(F.col("a.event_type").alias("type_a"), F.col("b.event_type").alias("type_b"))
        .agg(F.count("*").alias("pair_count"))
    )


# --- q20 variants
def q20_cur():
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev()
        .withColumn("k", k)
        .filter(F.col("k") < 50)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("k").alias("sum_k"),
             F.round(F.avg("value"), 4).alias("avg_value"))
    )


def q20_variant():
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        ev()
        .withColumn("k", k)
        .filter(F.col("k") < 50)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("k").alias("sum_k"),
             F.round(F.avg("value"), 4).alias("avg_value"))
    )


def q20_from_json():
    k = F.from_json(F.col("props"), "k int").getField("k")
    return (
        ev()
        .withColumn("k", k)
        .filter(F.col("k") < 50)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("k").alias("sum_k"),
             F.round(F.avg("value"), 4).alias("avg_value"))
    )


spark.read.parquet(f"{SF}/events.parquet").count()
t("q16_cur", q16_cur)
t("q16_bucket", q16_bucket)
t("q20_cur(get_json_object)", q20_cur)
t("q20_variant(parse_json)", q20_variant)
t("q20_from_json", q20_from_json)

# sanity: same q16 results
import pandas as pd

c = q16_cur().orderBy("type_a", "type_b").toPandas()
bkt = q16_bucket().orderBy("type_a", "type_b").toPandas()
print("q16 match:", c.equals(bkt))
c20 = q20_cur().orderBy("event_type").toPandas()
v20 = q20_variant().orderBy("event_type").toPandas()
f20 = q20_from_json().orderBy("event_type").toPandas()
print("q20 variant match:", c20.equals(v20), "from_json match:", c20.equals(f20))
spark.stop()
