"""Round-10 structural attempt at q16 (VERDICT r9 item 3): the
bucketed range self-join hovers at ~2.2x DuckDB.  Candidate
reformulation: ONE window pass — collect_list(event_type) over a
RANGE frame (1 us .. 300 s following) per user, explode, aggregate.
Removes the join entirely: the fact shuffles ONCE (on user_id) into
the window sort instead of twice into the join's two sides, and the
explode emits exactly the surviving pairs (hundreds), not candidate
pairs (100k+).

Measures both Spark forms + DuckDB, best-of-N same-process, and
checks value parity between the two Spark forms.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("TZ", "UTC")
time.tzset()

import duckdb

from defenda_data_lake_spark import get_spark
from defenda_data_lake_spark.plans.catalog import CATALOG

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("N", "4"))

WINDOW_SQL = """
SELECT type_a, type_b, count(*) AS pair_count
FROM (
  SELECT type_a, explode(arr) AS type_b FROM (
    SELECT event_type AS type_a,
           collect_list(event_type) OVER (
             PARTITION BY user_id ORDER BY unix_micros(ts)
             RANGE BETWEEN 1 FOLLOWING AND 300000000 FOLLOWING) AS arr
    FROM events
  )
)
GROUP BY type_a, type_b
"""


def best(f):
    walls = []
    for _ in range(N):
        t0 = time.time()
        f()
        walls.append(time.time() - t0)
    return min(walls)


def main():
    spark = get_spark()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev.createOrReplaceTempView("events")

    fn, _ = CATALOG["q16_event_pairs"]
    old_rows = sorted(map(tuple, fn(spark, SF).collect()))
    new_df = spark.sql(WINDOW_SQL)
    new_rows = sorted(map(tuple, new_df.collect()))
    print(json.dumps({"parity": old_rows == new_rows, "rows": len(new_rows)}))

    old_wall = best(lambda: fn(spark, SF).collect())
    new_wall = best(lambda: spark.sql(WINDOW_SQL).collect())

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    dsql = """
SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS pair_count
FROM events a JOIN events b
  ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 300 SECOND
GROUP BY a.event_type, b.event_type
"""
    duck_wall = best(lambda: con.execute(dsql).fetchall())
    print(
        json.dumps(
            {
                "sf": SF,
                "spark_bucketed_join_sec": round(old_wall, 3),
                "spark_window_sec": round(new_wall, 3),
                "duckdb_sec": round(duck_wall, 3),
                "old_ratio": round(old_wall / duck_wall, 2),
                "new_ratio": round(new_wall / duck_wall, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
