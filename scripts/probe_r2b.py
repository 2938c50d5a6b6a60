"""Scratch probe: q03/q05 plan + variants, shuffle compression."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TZ", "UTC")
time.tzset()

from pyspark.sql import functions as F

from defenda_data_lake_spark.plans.catalog import CATALOG
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


q03 = CATALOG["q03_shipping_priority"][0]
q05 = CATALOG["q05_regional_revenue"][0]
q01 = CATALOG["q01_pricing_summary"][0]
q16 = CATALOG["q16_event_pairs"][0]

print("=== q05 plan ===")
q05(spark, SF).explain(mode="formatted")

spark.read.parquet(f"{SF}/lineitem.parquet").count()
t("q01", lambda: q01(spark, SF))
t("q03", lambda: q03(spark, SF))
t("q05", lambda: q05(spark, SF))
t("q16_new", lambda: q16(spark, SF))

# compression off for tiny shuffles
for k in ["spark.shuffle.compress", "spark.shuffle.spill.compress"]:
    spark.conf.set(k, "false")
t("q03 nocompress", lambda: q03(spark, SF))
t("q05 nocompress", lambda: q05(spark, SF))
spark.stop()
