"""Relational query family: TPC-H-style aggregations, joins, windows,
set ops, subqueries, Presto string/percentile/regexp surfaces (q01-q29)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window
from defenda_data_lake_spark.plans.catalog_shared import (
    R,
    _rs,
    _sql_over,
    _t,
)


# =============================================================== relational


def q01_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-heavy filtered aggregation.
    Scale: single shuffle on a 6-value grouping key; partial aggregation
    map-side; filter + column pruning reach the parquet scan.
    Money avgs as round(sum,2)/n: engine float-sum order can differ by
    1 ULP, and money data lands avg*1e4 exactly on .5 boundaries; a
    2dp-rounded sum is boundary-stable."""
    return _sql_over(spark, sf_dir, f"""
SELECT l_returnflag, l_linestatus,
       {_rs('sum(l_quantity)', 2)}                                       AS sum_qty,
       {_rs('sum(l_extendedprice)', 2)}                                  AS sum_base_price,
       {_rs('sum(l_extendedprice * (1 - l_discount))', 2)}               AS sum_disc_price,
       {_rs('sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))', 2)} AS sum_charge,
       {_rs('avg(l_quantity)', 4)}                                       AS avg_qty,
       {_rs(_rs('sum(l_extendedprice)', 2) + ' / count(*)', 4)}          AS avg_price,
       {_rs(_rs('sum(l_discount)', 2) + ' / count(*)', 4)}               AS avg_disc,
       count(*)                                                          AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-06-01'
GROUP BY l_returnflag, l_linestatus
""", ["lineitem"])


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(round(sum(l_extendedprice), 2) / count(*), 4)              AS avg_price,
       round(round(sum(l_discount), 2) / count(*), 4)                   AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-06-01'
GROUP BY l_returnflag, l_linestatus
"""


def q03_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + agg + top-k.
    Scale: customer filter first (selectivity), broadcast the filtered
    customer keys into the orders join, shuffle only on o_orderkey for
    the lineitem join; top-k is TakeOrderedAndProject (no full sort)."""
    return _sql_over(spark, sf_dir, f"""
SELECT /*+ BROADCAST(customer) */
       l_orderkey, o_orderpriority,
       {_rs('sum(l_extendedprice * (1 - l_discount))', 2)} AS revenue,
       date_format(min(o_orderdate), 'yyyy-MM-dd')         AS o_orderdate
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""", ["lineitem", "orders", "customer"])


Q03_SQL = """
SELECT l_orderkey, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(min(o_orderdate), '%Y-%m-%d')            AS o_orderdate
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q05_regional_revenue(spark, sf_dir):
    """TPC-H Q5 shape: star join over the full dimension chain.
    Scale: region/nation/customer are broadcast (small dims); the only
    big shuffle is lineitem⋈orders on orderkey; agg key is 25 nations."""
    return _sql_over(spark, sf_dir, f"""
SELECT /*+ BROADCAST(customer), BROADCAST(nation), BROADCAST(region) */
       n_name,
       {_rs('sum(l_extendedprice * (1 - l_discount))', 2)} AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""", ["lineitem", "orders", "customer", "nation", "region"])


Q05_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def q07_top_customers(spark, sf_dir):
    """Join + agg + deterministic top-k."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            R(F.sum("o_totalprice"), 2).alias("total_spent"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.col("total_spent").desc(), F.col("c_custkey"))
        .limit(10)
    )


Q07_SQL = """
SELECT c_custkey, c_name,
       round(sum(o_totalprice), 2) AS total_spent,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spent DESC, c_custkey
LIMIT 10
"""


def q09_rollup_orders(spark, sf_dir):
    """ROLLUP aggregation (grouping-sets family)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            R(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            "n_orders",
            "total",
        )
    )


Q09_SQL = """
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL')   AS status,
       count(*)                         AS n_orders,
       round(sum(o_totalprice), 2)      AS total
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


def q10_window_rank(spark, sf_dir):
    """Ranking window: top-3 orders per customer.
    Scale: one shuffle on the partition key; no global sort."""
    return _sql_over(spark, sf_dir, f"""
SELECT o_custkey, o_orderkey, {_rs('o_totalprice', 2)} AS price,
       CAST(rn AS BIGINT) AS rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t WHERE rn <= 3
""", ["orders"])


Q10_SQL = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t WHERE rn <= 3
"""


def q11_window_running(spark, sf_dir):
    """Frame window (running sum) + analytic lag."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lag = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        R(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        R(F.lag("o_totalprice").over(w_lag), 2).alias("prev_price"),
    )


Q11_SQL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       round(lag(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey), 2) AS prev_price
FROM orders
"""


def q12_distinct_agg(spark, sf_dir):
    """DISTINCT + conditional aggregation."""
    cust = _t(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count("*").alias("n_customers"),
        R(R(F.sum("c_acctbal"), 2) / F.count("*"), 4).alias("avg_bal"),
        F.sum(F.when(F.col("c_acctbal") > 0, 1).otherwise(0)).alias("n_positive"),
    )


Q12_SQL = """
SELECT c_mktsegment,
       count(DISTINCT c_nationkey) AS n_nations,
       count(*) AS n_customers,
       round(round(sum(c_acctbal), 2) / count(*), 4) AS avg_bal,
       CAST(sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_positive
FROM customer
GROUP BY c_mktsegment
"""


def q13_semi_join(spark, sf_dir):
    """Left-semi join: customers having a partially-filled order."""
    cust = _t(spark, sf_dir, "customer")
    p_orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return cust.join(
        p_orders, cust.c_custkey == p_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


Q13_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
"""


def q14_anti_join(spark, sf_dir):
    """Left-anti join: customers with no partially-filled order."""
    cust = _t(spark, sf_dir, "customer")
    p_orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return cust.join(
        p_orders, cust.c_custkey == p_orders.o_custkey, "left_anti"
    ).select("c_custkey")


Q14_SQL = """
SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
"""


def q15_setops(spark, sf_dir):
    """Set operation: INTERSECT of two key sets."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return building.intersect(urgent)


Q15_SQL = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def q16_event_pairs(spark, sf_dir):
    """Theta/range self-join on the event stream: event pairs per user
    within 300 s.

    Interval-bucketed join: joining on ``user_id`` alone makes every
    same-user pair a candidate (measured 6.77M candidates at sf0.1 for
    771 surviving pairs).  Bucketing ``ts`` into 300 s windows and
    adding the bucket to the equi key prunes candidates to same-or-
    adjacent-bucket pairs (101k at sf0.1 — 66x fewer; measured 1.9x
    wall-clock).  The left side explodes to (bk, bk+1) so every
    in-range pair lands in exactly one shared bucket; the range
    predicate then filters exactly as before — output-identical, and
    the oracle keeps the declarative form.  At scale this also fixes
    the worst-key skew: per-task work is bounded by events per
    (user, 10-minute window), not events per user."""
    return _sql_over(spark, sf_dir, """
SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS pair_count
FROM (
  SELECT user_id, ts, event_type, explode(array(bk, bk + 1)) AS bk
  FROM (SELECT user_id, ts, event_type,
               floor(unix_micros(ts) / 300000000) AS bk FROM events)
) a
JOIN (SELECT user_id, ts, event_type,
             floor(unix_micros(ts) / 300000000) AS bk FROM events) b
  ON a.user_id = b.user_id AND a.bk = b.bk
 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 300 SECONDS
GROUP BY a.event_type, b.event_type
""", ["events"])


Q16_SQL = """
SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS pair_count
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 300 SECOND
GROUP BY a.event_type, b.event_type
"""


def q17_above_customer_avg(spark, sf_dir):
    """Decorrelated-subquery shape: orders above their customer's
    average price (expressed as a window — the plan Catalyst
    decorrelates the subquery into anyway)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            R(R(F.sum("o_totalprice"), 2) / F.count("*"), 4).alias("avg_price"),
        )
    )


Q17_SQL = """
SELECT o_orderpriority, count(*) AS n_orders,
       round(round(sum(o_totalprice), 2) / count(*), 4) AS avg_price
FROM (
  SELECT *, avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
  FROM orders
) t
WHERE o_totalprice > cust_avg
GROUP BY o_orderpriority
"""


def q18_full_outer(spark, sf_dir):
    """Full-outer join of two aggregates over different fact sides."""
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    c = cust.groupBy("c_nationkey").agg(F.count("*").alias("n_cust"))
    s = supp.groupBy("s_nationkey").agg(F.count("*").alias("n_supp"))
    return c.join(s, c.c_nationkey == s.s_nationkey, "full_outer").select(
        F.coalesce(F.col("c_nationkey"), F.col("s_nationkey")).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


Q18_SQL = """
SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
       coalesce(c.n_cust, 0) AS n_cust,
       coalesce(s.n_supp, 0) AS n_supp
FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey) c
FULL OUTER JOIN
     (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
  ON c.c_nationkey = s.s_nationkey
"""


def q19_cube_customers(spark, sf_dir):
    """CUBE aggregation (all grouping-set combinations)."""
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.cube("c_mktsegment", "c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            # money avg via boundary-stable sum (see q01 note)
            R(R(F.sum("c_acctbal"), 2) / F.count("*"), 4).alias("avg_bal"),
        )
        .select(
            F.coalesce(F.col("c_mktsegment"), F.lit("ALL")).alias("segment"),
            F.coalesce(F.col("c_nationkey").cast("string"), F.lit("ALL")).alias(
                "nation"
            ),
            "n_customers",
            "avg_bal",
        )
    )


Q19_SQL = """
SELECT coalesce(c_mktsegment, 'ALL') AS segment,
       coalesce(CAST(c_nationkey AS VARCHAR), 'ALL') AS nation,
       count(*) AS n_customers,
       round(round(sum(c_acctbal), 2) / count(*), 4) AS avg_bal
FROM customer
GROUP BY CUBE (c_mktsegment, c_nationkey)
"""


def q23_string_funcs(spark, sf_dir):
    """String-function surface: case, substring, concat, length,
    regexp extraction — all JVM built-ins inside codegen."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.substring(F.col("p_name"), 1, 6).alias("name_prefix"),
        F.concat_ws("/", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.length(F.col("p_name")).cast("long").alias("name_len"),
        F.regexp_extract(F.col("p_name"), r"(\d+)", 1).alias("name_digits"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
    )


Q23_SQL = r"""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substring(p_name, 1, 6) AS name_prefix,
       concat_ws('/', p_brand, p_type) AS brand_type,
       length(p_name) AS name_len,
       coalesce(regexp_extract(p_name, '(\d+)', 1), '') AS name_digits,
       replace(p_type, ' ', '_') AS type_snake
FROM part
"""


def q24_presto_text(spark, sf_dir):
    """The reference's query surface is raw Presto SQL *text*
    (README.md:116) — this entry runs such text through ``spark.sql``
    with the compat functions (``json_extract_scalar``) registered, over
    a view of the synthetic events table."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_sql_view")
    return spark.sql(
        """
        SELECT event_type,
               count(*) AS n,
               sum(CAST(json_extract_scalar(props, '$.k') AS INT)) AS sum_k
        FROM events_sql_view
        WHERE CAST(json_extract_scalar(props, '$.k') AS INT) > 80
        GROUP BY event_type
        """
    )


Q24_SQL = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INT) > 80
GROUP BY event_type
"""


def q25_percentile_stats(spark, sf_dir):
    """Exact interpolated percentiles per group (Presto's
    ``approx_percentile`` use case, served exactly: Spark
    ``percentile`` = sort + linear interpolation, the same definition
    as SQL ``percentile_cont``).
    Scale: percentile is a full-sort-per-group aggregate; the grouping
    key (returnflag) is low-cardinality so each group's sort is a
    single-pass partial → merge; for high-cardinality groups at 100 TB
    switch to approx_percentile (t-digest, mergeable sketches)."""
    li = _t(spark, sf_dir, "lineitem")
    # one array-percentile per column: each percentile aggregate keeps
    # its OWN value buffer per group, so two percentiles of
    # l_extendedprice used to buffer (and merge) the column twice —
    # the fused form is the same sort+interpolate over one buffer
    # (measured 0.645 → 0.518 s at sf0.1, values exactly equal)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, array(0.5D, 0.95D))").alias("pp"),
            F.expr("percentile(l_quantity, 0.5)").alias("pq"),
            F.count("*").alias("n"),
        )
        .select(
            "l_returnflag",
            R(F.col("pp")[0], 2).alias("p50_price"),
            R(F.col("pp")[1], 2).alias("p95_price"),
            R(F.col("pq"), 2).alias("p50_qty"),
            "n",
        )
    )


Q25_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 2)  AS p50_price,
       round(quantile_cont(l_extendedprice, 0.95), 2) AS p95_price,
       round(quantile_cont(l_quantity, 0.5), 2)       AS p50_qty,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


def q26_regexp_count(spark, sf_dir):
    """Regex occurrence counting over document text (pattern-frequency
    profiling): per source, documents whose text contains 'table', and
    total occurrences.  ``regexp_count`` is a JVM builtin inside
    codegen — scan-speed, no shuffle beyond the final 3-group agg."""
    docs = _t(spark, sf_dir, "documents")
    occurrences = F.regexp_count(F.col("text"), F.lit(r"\btable\b"))
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum((occurrences > 0).cast("long")).alias("docs_with_term"),
        F.sum(occurrences).cast("long").alias("total_occurrences"),
    )


Q26_SQL = r"""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN len(regexp_extract_all(text, '\btable\b')) > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_term,
       CAST(sum(len(regexp_extract_all(text, '\btable\b'))) AS BIGINT)
           AS total_occurrences
FROM documents
GROUP BY source
"""


def q27_grouping_sets(spark, sf_dir):
    """GROUPING SETS (the general form behind ROLLUP/CUBE, both already
    covered by q09/q19): per (priority, status), per priority, and the
    grand total in ONE pass — Spark expands the sets into a single
    Expand + hash aggregate, one shuffle."""
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_sql_view")
    return spark.sql(
        """
        SELECT coalesce(o_orderpriority, 'ALL') AS priority,
               coalesce(o_orderstatus, 'ALL') AS status,
               count(*) AS n_orders,
               -- scale-round-unscale = the R() convention (boundary-
               -- stable against DuckDB's round, see R's docstring)
               round(sum(o_totalprice) * 100, 0) / 100 AS total_price
        FROM orders_sql_view
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), ())
        """
    )


Q27_SQL = """
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL') AS status,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderpriority), ())
"""


def q28_exists_sql(spark, sf_dir):
    """Correlated EXISTS subquery as raw SQL text (the Presto surface
    form; q13/q14 cover the DataFrame semi/anti equivalents).  Catalyst
    decorrelates it into a left-semi hash join — no per-row subquery
    execution at any scale."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_sql_view")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_sql_view")
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               round(c_acctbal * 100, 0) / 100 AS acctbal
        FROM customer_sql_view c
        WHERE EXISTS (
            SELECT 1 FROM orders_sql_view o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > 400000
        )
        """
    )


Q28_SQL = """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_totalprice > 400000
)
"""


def q29_asof_join(spark, sf_dir):
    """Point-in-time join (the join family Presto lacks, SURVEY §2B(b)):
    for every click event, the latest purchase by the same user at or
    before it.  Runs the union+window as-of operator — one shuffle on
    user_id, no per-key pair expansion (operators/asof.py)."""
    from defenda_data_lake_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        clicks,
        purchases,
        keys=["user_id"],
        time_col="ts",
        payload_cols=["value", "event_id"],
        tiebreak_col="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        R("asof_value", 4).alias("last_purchase_value"),
        F.col("asof_event_id").alias("last_purchase_event"),
    )


Q29_SQL = """
WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
purchases AS (SELECT * FROM events WHERE event_type = 'purchase')
SELECT a.event_id,
       a.user_id,
       round((SELECT b.value FROM purchases b
              WHERE b.user_id = a.user_id AND b.ts <= a.ts
              ORDER BY b.ts DESC, b.event_id DESC LIMIT 1) * 10000, 0) / 10000
           AS last_purchase_value,
       (SELECT b.event_id FROM purchases b
        WHERE b.user_id = a.user_id AND b.ts <= a.ts
        ORDER BY b.ts DESC, b.event_id DESC LIMIT 1) AS last_purchase_event
FROM clicks a
"""
