"""Relational operator surface: scans, filter/project, joins (broadcast/
semi/anti), aggregations (hash, distinct, rollup/cube/grouping sets),
windows (ranking + running frames), sorts/limits, set ops, scalar
functions, JSON extraction, sessionization, pivot.

The reference engine has none of these as distinct operators (SURVEY.md
§2.2) — its relational algebra is flatMap → groupByKey → reduce. This
module is the Spark-native surface that makes the capability checklist
concrete, one named query per operator family, each with a DuckDB
oracle.

Determinism rules used throughout (see jobx_spark.functions):
  * double aggregation goes through exact DECIMAL(38,s) sums;
  * every ORDER BY / LIMIT has a unique tiebreak key;
  * derived integers are cast to BIGINT on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from jobx_spark.functions import davg, davg_sql, dsum, dsum_sql
from jobx_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q01: TPC-H Q1-style pricing summary — groupBy + many aggregates.
# Scale notes: single shuffle on two low-cardinality keys; partial
# aggregation (map-side combine) collapses 100 TB to ~6 groups per task
# before the exchange, so the shuffle is O(tasks), not O(rows).
# --------------------------------------------------------------------------
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_Q01 = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_base_price,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {davg_sql('l_quantity')} AS avg_qty,
       {davg_sql('l_extendedprice')} AS avg_price,
       {davg_sql('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q02: filter + projection — Catalyst pushes both into the parquet scan
# (check: PushedFilters + 2-column ReadSchema in .explain).
# --------------------------------------------------------------------------
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") > 45) & (F.col("l_discount") < 0.02))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


ORACLE_Q02 = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_quantity > 45 AND l_discount < 0.02
ORDER BY l_orderkey, l_linenumber
"""


# --------------------------------------------------------------------------
# q03: TPC-H Q3-style 3-way join + agg + top-N. customer is small →
# broadcast; lineitem⨝orders is the big shuffle join, on the join key
# both sides are already keyed by (AQE picks SMJ/SHJ and coalesces).
# --------------------------------------------------------------------------
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


ORACLE_Q03 = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------------
# q04: broadcast dim join — part (tiny) broadcast to every lineitem task:
# zero shuffle for the join itself; only the final agg exchanges ~N(brand)
# rows per task.
# --------------------------------------------------------------------------
def q04_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("p_brand")
    )


ORACLE_Q04 = f"""
SELECT p_brand,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


# --------------------------------------------------------------------------
# q05: left-semi join (EXISTS) — orders that have at least one high-
# quantity line. Semi join ships only the join key, no payload dup.
# --------------------------------------------------------------------------
def q05_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


ORACLE_Q05 = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
ORDER BY o_orderkey
"""


# --------------------------------------------------------------------------
# q06: left-anti join (NOT EXISTS) — customers with no orders.
# --------------------------------------------------------------------------
def q06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


ORACLE_Q06 = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


# --------------------------------------------------------------------------
# q07: ranking window — top-3 orders per customer by totalprice.
# Single shuffle on the partition key; rank prune happens before any
# further join, so at scale this is the canonical top-k-per-group.
# --------------------------------------------------------------------------
def q07_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_custkey", "rk")
    )


ORACLE_Q07 = """
SELECT o_custkey, o_orderkey, o_totalprice, rk
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rk
      FROM orders)
WHERE rk <= 3
ORDER BY o_custkey, rk
"""


# --------------------------------------------------------------------------
# q08: running-frame window — cumulative quantity per supplier in ship
# order (unbounded-preceding row frame, unique tiebreaks).
# --------------------------------------------------------------------------
def q08_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 5)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        li.withColumn(
            "running_qty",
            F.sum(F.col("l_quantity").cast("decimal(38,8)"))
            .over(w)
            .cast("string")
            .cast("double"),
        )
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate", "running_qty")
        .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
    )


ORACLE_Q08 = """
SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,8))) OVER (
            PARTITION BY l_suppkey
            ORDER BY l_shipdate, l_orderkey, l_linenumber
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
            AS running_qty
FROM lineitem
WHERE l_suppkey <= 5
ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber
"""


# --------------------------------------------------------------------------
# q09: rollup — hierarchical subtotals returnflag → linestatus → grand.
# --------------------------------------------------------------------------
def q09_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), dsum("l_quantity").alias("qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


ORACLE_Q09 = f"""
SELECT l_returnflag, l_linestatus, count(*) AS n, {dsum_sql('l_quantity')} AS qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


# --------------------------------------------------------------------------
# q10: cube — all subtotal combinations of orderstatus × orderpriority.
# --------------------------------------------------------------------------
def q10_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), dsum("o_totalprice").alias("total"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first()
        )
    )


ORACLE_Q10 = f"""
SELECT o_orderstatus, o_orderpriority, count(*) AS n, {dsum_sql('o_totalprice')} AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


# --------------------------------------------------------------------------
# q11: distinct aggregates — exact distinct counts per market segment.
# (Spark expands distinct aggs into a two-stage plan automatically.)
# --------------------------------------------------------------------------
def q11_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_Q11 = """
SELECT c_mktsegment,
       count(DISTINCT o_custkey) AS n_customers,
       count(DISTINCT o_orderpriority) AS n_priorities,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --------------------------------------------------------------------------
# q12: set operations — nations that have customers vs suppliers.
# --------------------------------------------------------------------------
def q12_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = cust.intersect(supp).withColumn("which", F.lit("both"))
    cust_only = cust.distinct().exceptAll(supp.distinct()).withColumn("which", F.lit("customer_only"))
    supp_only = supp.distinct().exceptAll(cust.distinct()).withColumn("which", F.lit("supplier_only"))
    return both.unionByName(cust_only).unionByName(supp_only).orderBy("which", "nationkey")


ORACLE_Q12 = """
WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT nationkey, which FROM (
  SELECT nationkey, 'both' AS which FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
  UNION ALL
  SELECT nationkey, 'customer_only' FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
  UNION ALL
  SELECT nationkey, 'supplier_only' FROM (SELECT nationkey FROM s EXCEPT SELECT nationkey FROM c)
)
ORDER BY which, nationkey
"""


# --------------------------------------------------------------------------
# q13: global sort + limit — top-20 orders by price (TakeOrderedAndProject:
# per-partition top-k then driver merge; never a full sort at scale).
# --------------------------------------------------------------------------
def q13_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


ORACLE_Q13 = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# q14: scalar function surface — string/date/math built-ins, all JVM-side.
# --------------------------------------------------------------------------
def q14_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.upper(F.substring("o_orderpriority", 1, 1)).alias("prio_code"),
        F.length("o_orderpriority").cast("bigint").alias("prio_len"),
        F.concat(F.lit("ORD-"), F.col("o_orderkey").cast("string")).alias("order_tag"),
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("price_kband"),
        F.when(F.col("o_orderstatus") == "F", "final")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_word"),
    ).orderBy("o_orderkey")


ORACLE_Q14 = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(month(o_orderdate) AS BIGINT) AS order_month,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       upper(substr(o_orderpriority, 1, 1)) AS prio_code,
       CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
       'ORD-' || CAST(o_orderkey AS VARCHAR) AS order_tag,
       CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_kband,
       CASE o_orderstatus WHEN 'F' THEN 'final' WHEN 'O' THEN 'open'
            ELSE 'partial' END AS status_word
FROM orders
WHERE o_orderkey <= 2000
ORDER BY o_orderkey
"""


# --------------------------------------------------------------------------
# q15: JSON extraction — events.props is a JSON string column; extract a
# typed field and aggregate. Mirrors the reference's loose JSON values
# (SURVEY §1.1) inside a typed DataFrame.
# --------------------------------------------------------------------------
def q15_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


ORACLE_Q15 = """
SELECT event_type,
       count(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# q16: sessionization — gap > 30 min starts a new session per user.
# lag + conditional cumsum, the batch form of session windows; at scale
# it's one shuffle on user_id.
# --------------------------------------------------------------------------
def q16_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts"))
    gap = ts_us - F.lag(ts_us).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    sess = F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    return (
        ev.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
        .groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


ORACLE_Q16 = """
WITH stamped AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessioned AS (
  SELECT user_id,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM stamped
), per_session AS (
  SELECT user_id, session_id, count(*) AS n_events
  FROM sessioned GROUP BY user_id, session_id
)
SELECT user_id,
       MAX(session_id) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       MAX(n_events) AS max_session_events
FROM per_session
GROUP BY user_id
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# q17: pivot — event counts per user bucketed by type, as columns.
# Expressed as conditional aggregation so the output names are explicit
# (Spark's .pivot produces the same plan after Catalyst expansion).
# --------------------------------------------------------------------------
def q17_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
    )
    return (
        pivoted.select(
            "user_id",
            F.col("click").alias("n_click"),
            F.col("view").alias("n_view"),
            F.col("purchase").alias("n_purchase"),
            F.col("signup").alias("n_signup"),
            F.col("error").alias("n_error"),
        )
        .orderBy("user_id")
    )


ORACLE_Q17 = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS n_click,
       count(*) FILTER (WHERE event_type = 'view') AS n_view,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
       count(*) FILTER (WHERE event_type = 'error') AS n_error
FROM events
GROUP BY user_id
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# q18: grouping sets — explicit multi-grouping over nation/region via SQL.
# --------------------------------------------------------------------------
def q18_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    for name in ("customer", "nation", "region"):
        _t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(
        """
        SELECT n_name, r_name, count(*) AS n_customers,
               CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,8))) AS STRING) AS DOUBLE)
                   AS total_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((n_name, r_name), (r_name), ())
        ORDER BY n_name ASC NULLS FIRST, r_name ASC NULLS FIRST
        """
    )


ORACLE_Q18 = f"""
SELECT n_name, r_name, count(*) AS n_customers,
       {dsum_sql('c_acctbal')} AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((n_name, r_name), (r_name), ())
ORDER BY n_name ASC NULLS FIRST, r_name ASC NULLS FIRST
"""


# --------------------------------------------------------------------------
# q19: correlated scalar subquery — customers whose account balance is
# above their nation's average (decorrelated by Catalyst into a join).
# --------------------------------------------------------------------------
def q19_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation_avg = cust.groupBy("c_nationkey").agg(davg("c_acctbal").alias("nation_avg"))
    return (
        cust.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
        .orderBy("c_custkey")
    )


ORACLE_Q19 = f"""
WITH na AS (
  SELECT c_nationkey, {davg_sql('c_acctbal')} AS nation_avg
  FROM customer GROUP BY c_nationkey
)
SELECT c_custkey, customer.c_nationkey AS c_nationkey, c_acctbal
FROM customer JOIN na ON customer.c_nationkey = na.c_nationkey
WHERE c_acctbal > nation_avg
ORDER BY c_custkey
"""


# --------------------------------------------------------------------------
# q30: EXISTS subquery (TPC-H Q4 shape) — orders counted per priority when
# at least one lineitem shipped >60 days after the order date. Expressed
# as SQL EXISTS so Catalyst's RewritePredicateSubquery turns it into a
# left-semi join; the semi join stops probing an order on first match,
# so the build side never materializes per-order duplicates. At 100 TB
# both sides shuffle once on orderkey and AQE handles skewed orders.
# --------------------------------------------------------------------------
def q30_exists_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAYS
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


ORACLE_Q30 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q31: NOT EXISTS + uncorrelated scalar subquery (TPC-H Q22 shape) —
# well-funded customers who never ordered, counted per nation. The
# scalar avg is one tiny broadcast value; NOT EXISTS becomes a left-anti
# join on custkey. The decimal-exact avg keeps the threshold identical
# across engines (SUM(double) would be order-dependent).
# --------------------------------------------------------------------------
def q31_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_nationkey, count(*) AS n_idle,
               CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,8))) AS STRING) AS DOUBLE)
                   AS total_bal
        FROM customer
        WHERE c_acctbal > (
            SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,8))) AS STRING) AS DOUBLE)
                   / COUNT(c_acctbal)
            FROM customer WHERE c_acctbal > 0.0
          )
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey
        ORDER BY c_nationkey
        """
    )


ORACLE_Q31 = f"""
SELECT c_nationkey, count(*) AS n_idle, {dsum_sql('c_acctbal')} AS total_bal
FROM customer
WHERE c_acctbal > (
    SELECT {davg_sql('c_acctbal')} FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# --------------------------------------------------------------------------
# q32: lateral explode (UDTF-shaped relational op) — part names split to
# one row per word with its position. posexplode is JVM-side Generate
# (no Python); the generator multiplies rows ~5× but stays inside the
# scan's stage — zero shuffle, and column pruning still reaches parquet.
# --------------------------------------------------------------------------
def q32_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_size") <= 5)
        .select(
            "p_partkey",
            F.posexplode(F.split(F.col("p_name"), " ")).alias("pos", "word"),
        )
        .withColumn("pos", (F.col("pos") + 1).cast("int"))
        .orderBy("p_partkey", "pos")
    )


ORACLE_Q32 = """
WITH w AS (
  SELECT p_partkey, string_split(p_name, ' ') AS words
  FROM part WHERE p_size <= 5
), e AS (
  SELECT p_partkey, words,
         unnest(generate_series(1, len(words))) AS pos
  FROM w
)
SELECT p_partkey, CAST(pos AS INTEGER) AS pos, words[pos] AS word
FROM e
ORDER BY p_partkey, pos
"""


# --------------------------------------------------------------------------
# q33: distribution window functions — ntile / percent_rank / cume_dist
# per nation over account balance. The ORDER BY carries c_custkey as a
# unique tiebreak so ntile's row-order-dependent bucketing is
# deterministic.
# Scale shape (VERDICT r7 #1-family — nation is a FIXED 25-value key,
# so the naive per-nation window serializes customers/25 rows through
# one task): every distribution function here is pure arithmetic over
# the row's RANK and the partition SIZE, and the rank decomposes as
#   rn = (rows with a strictly smaller balance)  ← cumulative of the
#        (nation, balance) COUNT table, |distinct balances| per window
#        partition — domain-bounded
#      + (rank among ties by custkey)            ← window keyed
#        (nation, balance), bounded by ties per balance value.
# From (rn, n): cume_dist = rn/n (the order key is unique → no peers),
# percent_rank = (rn−1)/(n−1), and ntile(4)'s first n%4 buckets take
# ⌈n/4⌉ rows — the closed form below. The oracle keeps DuckDB's NATIVE
# window functions, so the arithmetic is attested against the standard
# semantics, bit-for-bit, at every gate run.
# --------------------------------------------------------------------------
def q33_balance_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    cnt = cust.groupBy("c_nationkey", "c_acctbal").agg(
        F.count(F.lit(1)).alias("c")
    )
    cum = cnt.select(
        "c_nationkey", "c_acctbal",
        (
            F.sum("c").over(
                W.partitionBy("c_nationkey").orderBy("c_acctbal")
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            )
            - F.col("c")
        ).alias("before"),
        F.sum("c").over(W.partitionBy("c_nationkey")).alias("n"),
    )
    tie_rn = F.row_number().over(
        W.partitionBy("c_nationkey", "c_acctbal").orderBy("c_custkey")
    )
    rn = (F.col("before") + tie_rn).alias("rn")
    base = cust.join(cum, ["c_nationkey", "c_acctbal"]).select(
        "c_custkey", "c_nationkey", "c_acctbal", "n", rn
    )
    q, r = F.expr("n div 4"), F.expr("n % 4")
    quartile = F.when(
        F.col("rn") <= r * (q + 1), F.expr("(rn + (n div 4)) div ((n div 4) + 1)")
    ).otherwise(
        r + F.expr("(rn - (n % 4) * ((n div 4) + 1) + (n div 4) - 1) div (n div 4)")
    )
    return (
        base.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            quartile.cast("int").alias("quartile"),
            F.when(F.col("n") == 1, F.lit(0.0))
            .otherwise((F.col("rn") - 1).cast("double") / (F.col("n") - 1))
            .alias("pct_rank"),
            (F.col("rn").cast("double") / F.col("n")).alias("cume"),
        )
        .orderBy("c_custkey")
    )


ORACLE_Q33 = """
SELECT c_custkey, c_nationkey, c_acctbal,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey
"""


# --------------------------------------------------------------------------
# q34: conditional aggregation (FILTER-clause shape) — one pass over
# orders computes differently-filtered aggregates side by side instead
# of three scans + joins. All branches are map-side combinable, so the
# shuffle carries one partial row per (task, priority) at any scale.
# --------------------------------------------------------------------------
def q34_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    big = F.when(F.col("o_totalprice") > 200000.0, 1)
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.count(big).alias("n_big"),
            dsum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))).alias(
                "finished_value"
            ),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_Q34 = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       count(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,8)))
                 FILTER (WHERE o_orderstatus = 'F') AS VARCHAR) AS DOUBLE)
           AS finished_value,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q35: ordered string aggregation (LISTAGG/STRING_AGG) — supplier names
# per nation, sorted inside the group for determinism. collect_list's
# arrival order is nondeterministic under parallel merge, so the sort
# happens after collection (array_sort), matching STRING_AGG ORDER BY.
# Group payloads are bounded by nation cardinality, not input size.
# --------------------------------------------------------------------------
def q35_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = _t(spark, sf_dir, "supplier")
    return (
        sup.groupBy("s_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("names"),
            F.count("*").alias("n_suppliers"),
        )
        .orderBy("s_nationkey")
    )


ORACLE_Q35 = """
SELECT s_nationkey,
       string_agg(s_name, ',' ORDER BY s_name) AS names,
       count(*) AS n_suppliers
FROM supplier
GROUP BY s_nationkey
ORDER BY s_nationkey
"""


# --------------------------------------------------------------------------
# q36: unpivot (wide → long) — per-returnflag aggregates melted into
# (flag, metric, value) rows. Spark's unpivot is a zero-shuffle Expand
# over the 3-row aggregate; the only exchange is the aggregation's own.
# --------------------------------------------------------------------------
def q36_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        davg("l_discount").alias("avg_disc"),
    )
    return (
        wide.unpivot("l_returnflag", ["sum_qty", "sum_price", "avg_disc"],
                     "metric", "value")
        .orderBy("l_returnflag", "metric")
    )


ORACLE_Q36 = f"""
WITH wide AS (
  SELECT l_returnflag,
         {dsum_sql('l_quantity')} AS sum_qty,
         {dsum_sql('l_extendedprice')} AS sum_price,
         {davg_sql('l_discount')} AS avg_disc
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, metric, value
FROM wide UNPIVOT (value FOR metric IN (sum_qty, sum_price, avg_disc))
ORDER BY l_returnflag, metric
"""


# --------------------------------------------------------------------------
# q39: nation-pair trade volume (TPC-H Q7 shape) — a 6-table join tree
# (lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ×2) left to
# Catalyst to reorder. The nation filters are on the two tiny dims, so
# the OR-of-pairs predicate prunes early; both nation joins broadcast,
# and the fact-side joins shuffle on their keys with AQE free to pick
# sizes at runtime. The SQL formulation (vs DataFrame) is deliberate:
# join reordering from statistics is exactly what we should NOT
# hand-schedule at 100 TB.
# --------------------------------------------------------------------------
def q39_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT supp_nation, cust_nation, l_year,
               CAST(CAST(SUM(CAST(volume AS DECIMAL(38,8))) AS STRING)
                    AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 year(l_shipdate) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM lineitem
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        )
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
        """
    )


ORACLE_Q39 = f"""
SELECT supp_nation, cust_nation, l_year,
       {dsum_sql('volume')} AS revenue,
       count(*) AS n_items
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) t
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------------------------------
# q41: interpolated (continuous) percentiles — the PERCENTILE_CONT
# complement of q24's discrete percentiles. Spark's exact `percentile`
# and DuckDB's `quantile_cont` share the lo + (hi-lo)·frac
# interpolation, verified bit-exact (same IEEE ops on the same sorted
# neighbors). Exact percentiles sort within each group — fine for
# bounded groups like these; the unbounded-cardinality path is
# percentile_approx (error-bound-tested in tests/test_recovery_approx).
# --------------------------------------------------------------------------
def q41_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.25)").alias("p25"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
            F.count("*").alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_Q41 = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.25) AS p25,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.9) AS p90,
       count(*) AS n_items
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# q40: month-over-month revenue growth — the time-series reporting
# shape: aggregate to a monthly series (shuffle carries months ×
# statuses, nothing else), THEN window with lag over the tiny series.
# The window's per-status partitions hold ≤ months rows, so the
# "no PARTITION BY key explosion" concern doesn't apply; at 100 TB the
# expensive part stays the first aggregation, which is partial+final.
# Growth is computed from decimal-exact monthly sums, so the ratio is
# bit-identical cross-engine.
# --------------------------------------------------------------------------
def q40_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        "o_orderstatus",
    ).agg(
        dsum("o_totalprice").alias("revenue"),
        F.count("*").alias("n_orders"),
    )
    w = W.partitionBy("o_orderstatus").orderBy("month")
    return (
        monthly.select(
            "month",
            "o_orderstatus",
            "revenue",
            "n_orders",
            F.lag("revenue").over(w).alias("prev_revenue"),
            (F.col("revenue") / F.lag("revenue").over(w) - 1.0).alias(
                "growth"
            ),
        )
        .orderBy("month", "o_orderstatus")
    )


ORACLE_Q40 = f"""
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         o_orderstatus,
         {dsum_sql('o_totalprice')} AS revenue,
         count(*) AS n_orders
  FROM orders
  GROUP BY 1, 2
)
SELECT month, o_orderstatus, revenue, n_orders,
       lag(revenue) OVER w AS prev_revenue,
       revenue / lag(revenue) OVER w - 1.0 AS growth
FROM monthly
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY month)
ORDER BY month, o_orderstatus
"""


# --------------------------------------------------------------------------
# q38: skew-proof aggregation through the EXPLICIT salted two-phase
# path (operators/skew.py) — l_returnflag has 3 values, so every group
# is a maximally hot key: the case where a single group's rows exceed
# one task. Phase 1 spreads each group over 16 salts, phase 2 merges
# partials; the quantity total stays DECIMAL(38,8) through both phases
# so salting cannot perturb the result. Oracle: the plain GROUP BY —
# a hash match proves the salted decomposition is exact, end-to-end,
# in the driver's correctness gate (not just in CI equivalence tests).
# --------------------------------------------------------------------------
def q38_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobx_spark.operators.skew import salted_aggregate

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_aggregate(
        li,
        ["l_returnflag"],
        {
            "n_items": F.count(F.lit(1)),
            "qty_dec": F.sum(F.col("l_quantity").cast("decimal(38,8)")),
            "min_ship": F.min("l_shipdate"),
            "max_ship": F.max("l_shipdate"),
        },
    )
    return out.select(
        "l_returnflag",
        F.col("n_items").cast("long").alias("n_items"),
        F.col("qty_dec").cast("string").cast("double").alias("sum_qty"),
        "min_ship",
        "max_ship",
    ).orderBy("l_returnflag")


ORACLE_Q38 = f"""
SELECT l_returnflag,
       count(*) AS n_items,
       {dsum_sql('l_quantity')} AS sum_qty,
       MIN(l_shipdate) AS min_ship,
       MAX(l_shipdate) AS max_ship
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# q42: TPC-H Q11 shape — per-part revenue HAVING > 1/2000 of the global
# total. The global total is an uncorrelated scalar subquery: one extra
# full-agg job whose single row broadcasts into the HAVING filter. Both
# sides stay DECIMAL end-to-end and the threshold test is written as
# 2000 * part_sum > total (integer×decimal — exact; a decimal division
# would round differently per engine). At 100 TB the per-part agg is the
# only real shuffle; the scalar total reuses the same scan via exchange
# reuse when Catalyst spots it.
# --------------------------------------------------------------------------
def q42_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_partkey,
               CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(38,8))) AS STRING) AS DOUBLE) AS part_revenue
        FROM lineitem
        GROUP BY l_partkey
        HAVING SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,8))) * 2000
             > (SELECT SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,8)))
                FROM lineitem)
        ORDER BY l_partkey
        """
    )


ORACLE_Q42 = f"""
SELECT l_partkey,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS part_revenue
FROM lineitem
GROUP BY l_partkey
HAVING SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,8))) * 2000
     > (SELECT SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,8)))
        FROM lineitem)
ORDER BY l_partkey
"""


# --------------------------------------------------------------------------
# q43: TPC-H Q17 shape — correlated AVG subquery: revenue from "small"
# orders (quantity below half the part's average), per brand. Catalyst
# decorrelates into an aggregate-then-join; the per-part avg side is
# partkey-partitioned like the probe side, so AQE can plan a single
# co-partitioned join. The threshold is davg (exact decimal mean →
# double) so both engines compare against bit-identical doubles.
# --------------------------------------------------------------------------
def q43_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        davg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(per_part, li.l_partkey == per_part.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum("l_extendedprice").alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("p_brand")
    )


ORACLE_Q43 = f"""
WITH pp AS (
  SELECT l_partkey AS pk, {davg_sql('l_quantity')} AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT p_brand,
       {dsum_sql('l_extendedprice')} AS small_qty_revenue,
       count(*) AS n_lines
FROM lineitem
JOIN pp ON l_partkey = pk
JOIN part ON l_partkey = p_partkey
WHERE l_quantity < 0.5 * avg_qty
GROUP BY p_brand
ORDER BY p_brand
"""


# --------------------------------------------------------------------------
# q44: TPC-H Q15 shape — top supplier(s) by shipped revenue in a window.
# The "revenue view" aggregates once; the max is an uncorrelated scalar
# over that same aggregate. Ties are kept (= comparison on the exact
# decimal), exactly like the spec query. supplier is a dim → broadcast.
# --------------------------------------------------------------------------
def q44_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,8)))
                     AS total_dec
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               CAST(CAST(total_dec AS STRING) AS DOUBLE) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_dec = (SELECT MAX(total_dec) FROM revenue)
        ORDER BY s_suppkey
        """
    )


ORACLE_Q44 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,8)))
             AS total_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(CAST(total_dec AS VARCHAR) AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_dec = (SELECT MAX(total_dec) FROM revenue)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# q45: TPC-H Q18 shape — large-volume orders: IN over a GROUP BY ...
# HAVING subquery, then a 3-way join back to customer/orders. Catalyst
# rewrites the IN into a left-semi join against the aggregated keys;
# the heavy lineitem agg shuffles once on orderkey and the semi join
# reuses that partitioning. The surfaced quantity sum funnels through
# decimal → string → double on both engines (the dsum pattern) so the
# driver's value hash agrees bit-for-bit.
# --------------------------------------------------------------------------
def q45_big_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,8))) AS STRING)
                    AS DOUBLE) AS total_qty
        FROM customer, orders, lineitem
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(38,8))) > 300
          )
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_orderkey
        """
    )


ORACLE_Q45 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,8))) AS VARCHAR)
            AS DOUBLE) AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(38,8))) > 300
  )
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_orderkey
"""


# --------------------------------------------------------------------------
# q46: blocked fuzzy join (edit distance) — entity-resolution over the
# part-name catalog: candidate pairs share a blocking key (the noun =
# last token), then exact levenshtein verifies ≤3. Blocking turns the
# O(N²) cross join into per-block self-joins — the 100 TB pattern for
# fuzzy matching (block on a cheap key, verify with the expensive
# metric inside the block). levenshtein() is JVM-side in Spark and
# built-in in DuckDB, so the oracle verifies the identical metric.
# --------------------------------------------------------------------------
def q46_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    names = (
        part.select(F.col("p_name").alias("name"))
        .distinct()
        .withColumn("block", F.element_at(F.split(F.col("name"), " "), -1))
    )
    a = names.alias("a")
    b = names.alias("b")
    return (
        a.join(b, F.col("a.block") == F.col("b.block"))
        .filter(F.col("a.name") < F.col("b.name"))
        .withColumn("dist", F.levenshtein(F.col("a.name"), F.col("b.name")))
        .filter(F.col("dist") <= 3)
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.col("dist").cast("int").alias("dist"),
        )
        .orderBy("name_a", "name_b")
    )


ORACLE_Q46 = """
WITH names AS (
  SELECT DISTINCT p_name AS name,
         string_split(p_name, ' ')[-1] AS block
  FROM part
)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist
FROM names a JOIN names b ON a.block = b.block AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= 3
ORDER BY name_a, name_b
"""


# --------------------------------------------------------------------------
# q55: recursive CTE — BOM-style explosion over a synthetic part tree
# (part p contains parts 2p and 2p+1): per root, the transitive
# component count and exact total retail price. Spark 4's WITH
# RECURSIVE executes this as iterated joins under Catalyst (the same
# loop the dedup Pregel operators hand-roll, here expressed purely in
# SQL); the oracle is the identical statement — recursive SQL is the
# one surface where both engines accept the same text. Root 0 must be
# excluded: p_partkey starts at 0 and 0·2 = 0 self-loops forever.
# --------------------------------------------------------------------------
_BOM_SQL = """
WITH RECURSIVE bom(root, node) AS (
  SELECT p_partkey, p_partkey FROM part WHERE p_partkey BETWEEN 1 AND 10
  UNION ALL
  SELECT b.root, c.p_partkey
  FROM bom b JOIN part c ON c.p_partkey IN (b.node * 2, b.node * 2 + 1)
  WHERE c.p_partkey <= 400
)
SELECT root,
       CAST(COUNT(*) AS BIGINT) AS n_components,
       {total} AS total_price
FROM bom JOIN part ON node = p_partkey
GROUP BY root
ORDER BY root
"""


def q55_bom_explosion(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        _BOM_SQL.format(
            total="CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(38,8)))"
            " AS STRING) AS DOUBLE)"
        )
    )


ORACLE_Q55 = _BOM_SQL.format(
    total="CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE)"
)


# --------------------------------------------------------------------------
# q49: TPC-H Q5 shape — local-supplier volume: revenue per nation where
# the customer and the supplier sit in the SAME nation, one region, one
# year. Six tables; region/nation/supplier/customer are dims (broadcast
# in the plan), lineitem⨝orders is the one real shuffle. The
# same-nation predicate lands on the join output as a cheap filter —
# Catalyst pushes the region restriction down through nation to prune
# both dim sides before they broadcast.
# --------------------------------------------------------------------------
def q49_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "orders", "customer", "supplier", "nation", "region"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n_name,
               CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(38,8))) AS STRING) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY n_name
        """
    )


ORACLE_Q49 = f"""
SELECT n_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY n_name
"""


# --------------------------------------------------------------------------
# q50: TPC-H Q10 shape — returned-items customer report: top 20
# customers by refund-quarter revenue from RETURNED lineitems. The
# returnflag filter reaches the lineitem scan (PushedFilters), the
# orders date filter prunes the probe side before the orderkey shuffle,
# and the final TakeOrderedAndProject keeps only 20 rows per partition
# before the single-partition merge.
# --------------------------------------------------------------------------
def q50_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    revenue = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1996-04-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    return (
        revenue.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


ORACLE_Q50 = f"""
WITH rev AS (
  SELECT o_custkey, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1996-04-01'
  GROUP BY o_custkey
)
SELECT c_custkey, c_name, revenue, c_acctbal, n_name
FROM rev
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# q56: skew-stress JOIN through the explicit salted-replication path
# (operators/skew.py salted_join) — the round-2 verdict's stretch item.
# The fact side is events with a DELIBERATELY hot join key: 60% of all
# rows collapse onto custkey 0 (pmod(user_id,10) < 6), a single key no
# hash-partitioned join could balance. salted_join spreads that key
# over 16 salts and replicates the dimension 16×, joining on
# (custkey, _salt); a MERGE hint forces the shuffle join so the salted
# exchange shape is the one actually executed (PLANS.md shows the
# two-column join keys), not hidden behind a broadcast. Oracle: the
# plain unsalted join + GROUP BY — the hash match proves salting is
# semantically invisible end-to-end under the driver gate.
# --------------------------------------------------------------------------
def q56_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobx_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    fact = ev.select(
        F.when(F.pmod("user_id", F.lit(10)) < 6, F.lit(0))
        .otherwise(F.col("user_id"))
        .cast("long")
        .alias("custkey"),
        "event_type",
        "value",
    )
    dim = cust.select(
        F.col("c_custkey").cast("long").alias("custkey"), "c_mktsegment", "c_acctbal"
    )
    joined = salted_join(fact, dim.hint("merge"), on="custkey", n_salts=16)
    return (
        joined.groupBy("event_type", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
            dsum("c_acctbal", 2).alias("sum_acctbal"),
        )
        .orderBy("event_type", "c_mktsegment")
    )


ORACLE_Q56 = f"""
WITH fact AS (
  SELECT CASE WHEN user_id % 10 < 6 THEN 0 ELSE user_id END AS custkey,
         event_type, value
  FROM events
)
SELECT event_type, c_mktsegment,
       count(*) AS n_events,
       {dsum_sql('value')} AS sum_value,
       {dsum_sql('c_acctbal', 2)} AS sum_acctbal
FROM fact JOIN customer ON custkey = c_custkey
GROUP BY event_type, c_mktsegment
ORDER BY event_type, c_mktsegment
"""


# --------------------------------------------------------------------------
# q57_range_bin_join — point-in-interval join rewritten as arithmetic
# binning. The naive formulation (which the ORACLE deliberately keeps)
# is a theta join `e.value >= lo AND e.value < hi`: Spark can only run
# that as BroadcastNestedLoopJoin — O(n_events × n_bands) comparisons,
# a scale killer once the band table isn't tiny. Because the bands are
# uniform-width, membership is computable: band_id = floor(value / W),
# turning the theta join into a per-row projection — zero joins, zero
# shuffles before the final 10-key rollup. The driver's hash compare
# against the BETWEEN-join oracle proves the rewrite is semantically
# invisible. This is the standard trick for range-dimension joins at
# 100 TB (calendar buckets, size classes, price bands): make the dim
# computable, or bin both sides and join on the bin key.
# --------------------------------------------------------------------------
N_BANDS = 10
BAND_W = 50.0


def q57_range_bin_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(
        (F.col("value") >= F.lit(0.0)) & (F.col("value") < F.lit(N_BANDS * BAND_W))
    )
    return (
        events.withColumn(
            "band_id", F.floor(F.col("value") / F.lit(BAND_W)).cast("long")
        )
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
            dsum("value").alias("sum_value"),
        )
        .withColumn("band_lo", F.col("band_id").cast("double") * F.lit(BAND_W))
        .select("band_id", "band_lo", "n_events", "n_users", "sum_value")
        .orderBy("band_id")
    )


ORACLE_Q57 = f"""
WITH bands AS (
  SELECT CAST(r AS BIGINT) AS band_id,
         CAST(r AS DOUBLE) * {BAND_W} AS lo,
         CAST(r + 1 AS DOUBLE) * {BAND_W} AS hi
  FROM range({N_BANDS}) t(r)
)
SELECT b.band_id,
       b.lo AS band_lo,
       count(*) AS n_events,
       count(DISTINCT e.user_id) AS n_users,
       {dsum_sql('e.value')} AS sum_value
FROM events e
JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band_id, b.lo
ORDER BY b.band_id
"""


# --------------------------------------------------------------------------
# q58: TPC-H Q19 shape — disjunctive join predicates (OR-of-ANDs mixing
# both sides of the join). Catalyst extracts the common l_partkey =
# p_partkey equi-condition so the join stays a broadcast hash join, and
# pushes the part-only disjuncts (brand/size) down to the part scan;
# only the mixed residual evaluates post-join. A naive engine turns
# OR-of-ANDs into a nested-loop theta join — the plan gate in
# tests/test_plans.py asserts ours does not.
# --------------------------------------------------------------------------
def q58_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(5, 25)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(15, 40)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(25, 50)
    )
    return joined.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_Q58_PRED = """
   (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
    AND l_quantity BETWEEN 5 AND 25)
OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
    AND l_quantity BETWEEN 15 AND 40)
OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
    AND l_quantity BETWEEN 25 AND 50)
"""

ORACLE_Q58 = f"""
SELECT {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {_Q58_PRED}
"""


# --------------------------------------------------------------------------
# q59: TPC-H Q21 shape — suppliers who were the SOLE supplier to have a
# line returned in a finished multi-supplier order (the "kept orders
# waiting" query; the reference dataset has no receipt/commit dates so
# l_returnflag = 'R' stands in for late receipt). The textbook SQL is
# two correlated subqueries (EXISTS another-supplier line, NOT EXISTS
# another-supplier returned line) probed per row — at 100 TB that is
# two extra scans of lineitem. This formulation computes per-order
# supplier stats ONCE (one groupBy on orderkey) and joins them back:
# the whole query is two shuffles on l_orderkey, which AQE co-plans,
# and lineitem is scanned twice instead of three+ times. The oracle
# keeps the textbook EXISTS/NOT EXISTS form, so the hash match proves
# the decorrelation is semantics-preserving.
# --------------------------------------------------------------------------
def q59_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supplier = _t(spark, sf_dir, "supplier")
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    blamed = (
        l1.join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1))
        .join(
            orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    return (
        blamed.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


ORACLE_Q59 = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN (SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem WHERE l_returnflag = 'R') l1
  ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# --------------------------------------------------------------------------
# q60: LATERAL correlated table subquery — top-2 suppliers per nation
# via `nation, LATERAL (SELECT ... ORDER BY ... LIMIT 2)`. Exercises
# Catalyst's lateral decorrelation WITH LIMIT (rewritten into a
# partitioned window filter, not a per-row re-scan); identical SQL text
# runs on DuckDB, which plans LATERAL natively — the hash match proves
# the decorrelated plan is equivalent to the row-at-a-time semantics.
# s_name is unique, so the per-nation ordering has a total tiebreak.
# --------------------------------------------------------------------------
_Q60_SQL = """
SELECT n_name, s_name, s_acctbal
FROM nation n, LATERAL (
  SELECT s_name, s_acctbal FROM supplier s
  WHERE s.s_nationkey = n.n_nationkey
  ORDER BY s_acctbal DESC, s_name LIMIT 2
) t
ORDER BY n_name, s_acctbal DESC, s_name
"""


def q60_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_Q60_SQL)


ORACLE_Q60 = _Q60_SQL


# --------------------------------------------------------------------------
# q61: TPC-H Q14 shape — promo revenue share per month: a ratio of two
# conditional aggregates computed in ONE pass over the join (no second
# scan for the denominator). Both sums go through exact decimals; the
# final share is a single IEEE double division of the decimal-exact
# operands, identical in any engine.
# --------------------------------------------------------------------------
def q61_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    monthly = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("month"))
        .agg(
            dsum(promo_rev).alias("promo_revenue"),
            dsum(rev).alias("total_revenue"),
        )
    )
    return monthly.select(
        "month",
        "promo_revenue",
        "total_revenue",
        (F.col("promo_revenue") * 100.0 / F.col("total_revenue")).alias(
            "promo_share_pct"
        ),
    ).orderBy("month")


ORACLE_Q61 = f"""
WITH monthly AS (
  SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
         {dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS promo_revenue,
         {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY 1
)
SELECT month, promo_revenue, total_revenue,
       promo_revenue * 100.0 / total_revenue AS promo_share_pct
FROM monthly
ORDER BY month
"""


# --------------------------------------------------------------------------
# q62: TPC-H Q16 shape — distinct-supplier census per (brand, type)
# excluding blacklisted suppliers via NOT IN. The exclusion list
# (negative-balance suppliers) is tiny → broadcast LEFT ANTI join, so
# the NOT IN never becomes a shuffled null-aware anti join; the
# count_distinct shuffles once on (brand, type) with partial distinct
# aggregation map-side.
# --------------------------------------------------------------------------
def q62_supplier_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter((F.col("p_brand") != "Brand#1") & (F.col("p_size") <= 25))
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
    )


ORACLE_Q62 = """
SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_size <= 25
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
"""


# --------------------------------------------------------------------------
# q63: TPC-H Q20 shape — "dominant suppliers": suppliers who shipped
# more than a sixth of some part's total quantity (the reference-data
# part/supplier fan-out makes >50% shares vanish above sf0.001). The correlated
# half-sum subquery decorrelates into aggregate-then-join; the part
# totals REUSE the (partkey, suppkey) partials by re-aggregating a
# materialized partials table (rollup-style) instead of re-scanning
# lineitem — Catalyst does not CSE shared subtrees, so the partials
# are cut to parquet once (tiny: one row per (part,supp)) and lineitem
# is read exactly once. The dominance
# comparison stays in exact decimals (6*share > total, integer-scaled)
# — no float threshold ambiguity.
# --------------------------------------------------------------------------
def q63_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobx_spark.lineage import cut_lineage

    li = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    # Materialize the (part, supp) partials once: Catalyst does not CSE
    # the shared subtree, so without this cut lineitem is scanned and
    # aggregated twice — at 100 TB that is the whole query cost.
    per_ps = cut_lineage(
        li.groupBy("l_partkey", "l_suppkey").agg(
            F.sum(F.col("l_quantity").cast("decimal(38,8)")).alias("supp_qty")
        ),
        "q63-perps",
    )
    per_part = per_ps.groupBy("l_partkey").agg(
        F.sum("supp_qty").alias("part_qty")
    )
    dominant = (
        per_ps.join(per_part, "l_partkey")
        .filter(F.col("supp_qty") * 6 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            dominant, supplier.s_suppkey == dominant.l_suppkey, "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


ORACLE_Q63 = """
WITH per_ps AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(38,8))) AS supp_qty
  FROM lineitem GROUP BY l_partkey, l_suppkey
), per_part AS (
  SELECT l_partkey, SUM(supp_qty) AS part_qty
  FROM per_ps GROUP BY l_partkey
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM per_ps JOIN per_part USING (l_partkey)
  WHERE supp_qty * 6 > part_qty)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# q64: TPC-H Q8 shape — market share: the fraction of AMERICA-region
# customers' revenue supplied by NATION_3, per order year. The nation
# dim joins in TWO ROLES (customer side filters through region,
# supplier side provides the share predicate) — aliasing the same
# broadcast table twice; Catalyst broadcasts each role independently.
# The share is a conditional/total ratio computed in ONE aggregation
# pass (no second scan), decimal-exact operands, IEEE-exact division.
# --------------------------------------------------------------------------
def q64_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    cn = nation.alias("cn")
    sn = nation.alias("sn")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .join(
            F.broadcast(region),
            F.col("cn.n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == "AMERICA")
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn.n_nationkey"))
    )
    yearly = base.groupBy(
        F.year("o_orderdate").cast("bigint").alias("o_year")
    ).agg(
        dsum(
            F.when(F.col("sn.n_name") == "NATION_3", rev).otherwise(F.lit(0.0))
        ).alias("nation_revenue"),
        dsum(rev).alias("total_revenue"),
    )
    return yearly.select(
        "o_year",
        "nation_revenue",
        "total_revenue",
        (F.col("nation_revenue") / F.col("total_revenue")).alias("mkt_share"),
    ).orderBy("o_year")


ORACLE_Q64 = f"""
WITH yearly AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         {dsum_sql("CASE WHEN sn.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS nation_revenue,
         {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = cn.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  WHERE r_name = 'AMERICA'
  GROUP BY 1
)
SELECT o_year, nation_revenue, total_revenue,
       nation_revenue / total_revenue AS mkt_share
FROM yearly
ORDER BY o_year
"""


# --------------------------------------------------------------------------
# q65: Bloom-pre-filtered join — the 100 TB fact-table join pattern.
# Dimension = customers of one region; instead of shipping their keys
# to every probe task, ship a 4096-bit Bloom filter (as its set-bit
# positions, ≤ 3·n rows) and pre-filter the distinct probe keys with a
# broadcast join; only bloom survivors reach the exact residual
# semi-join. The filter can false-positive but never false-negative,
# so the final aggregate is exact — and the sketch itself is attested
# by the bloom_passed / bloom_fp constants, which the oracle recomputes
# with the same three hashes. (Spark's own runtime bloom pushdown does
# this transparently; this is the explicit, engine-independent form.)
# --------------------------------------------------------------------------
def q65_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobx_spark.lineage import cut_lineage
    from jobx_spark.operators.sketches import bloom_positions, bloom_probe

    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    orders = _t(spark, sf_dir, "orders")

    # both intermediates feed several consumers; materialize once
    # (r7 plan audit: re-derivation scanned the ORDERS fact ~4× and
    # the dim chain ~5× — 22 raw scans in one query). members is
    # dimension-sized; passed is one key column.
    members = cut_lineage(
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey"),
        "q65-members",
    )
    filt = bloom_positions(members, "c_custkey")
    passed = cut_lineage(bloom_probe(orders, "o_custkey", filt), "q65-passed")
    true_keys = passed.join(
        F.broadcast(members), passed.key == members.c_custkey, "left_semi"
    )
    counters = (
        passed.agg(F.count("*").alias("bloom_passed"))
        .crossJoin(true_keys.agg(F.count("*").alias("true_members")))
        .select(
            "bloom_passed",
            (F.col("bloom_passed") - F.col("true_members")).alias("bloom_fp"),
        )
    )
    agg = (
        orders.join(
            F.broadcast(true_keys), orders.o_custkey == true_keys.key, "inner"
        )
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("total_spend"),
        )
    )
    return (
        agg.crossJoin(F.broadcast(counters))
        .select("o_custkey", "n_orders", "total_spend", "bloom_passed", "bloom_fp")
        .orderBy("o_custkey")
    )


def _q65_oracle() -> str:
    from jobx_spark.operators.sketches import BF_BITS, BF_K

    md5 = "('0x'||substr(md5({e}),1,15))::BIGINT"
    mpos = " UNION ".join(
        "SELECT "
        + md5.format(e=f"('bf{i}:' || CAST(c_custkey AS VARCHAR))")
        + f" % {BF_BITS} AS pos FROM members"
        for i in range(BF_K)
    )
    ppos = " UNION ".join(
        "SELECT key, "
        + md5.format(e=f"('bf{i}:' || CAST(key AS VARCHAR))")
        + f" % {BF_BITS} AS pos FROM probe_keys"
        for i in range(BF_K)
    )
    return f"""
WITH members AS (
  SELECT c_custkey FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
),
filt AS ({mpos}),
probe_keys AS (SELECT DISTINCT o_custkey AS key FROM orders),
key_pos AS ({ppos}),
passed AS (
  SELECT key FROM key_pos kp GROUP BY key
  HAVING count(*) = count(*) FILTER (WHERE pos IN (SELECT pos FROM filt))
),
true_keys AS (
  SELECT key FROM passed WHERE key IN (SELECT c_custkey FROM members)
),
counters AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM passed) AS bloom_passed,
         (SELECT CAST(count(*) AS BIGINT) FROM passed)
           - (SELECT CAST(count(*) AS BIGINT) FROM true_keys) AS bloom_fp
)
SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_spend,
       bloom_passed, bloom_fp
FROM orders JOIN true_keys ON o_custkey = key, counters
GROUP BY o_custkey, bloom_passed, bloom_fp
ORDER BY o_custkey
"""


# --------------------------------------------------------------------------
# q66: histogram-sketched quantiles vs exact. The scalable quantile
# path at 100 TB is a fixed-width histogram (bin counts are pure sums —
# mergeable across shards/days, one map-side-combinable shuffle of at
# most HIST_BINS rows per task), read off as the first bin whose
# cumulative count crosses q·N, error bounded by one bin width. The
# exact side (the comparison baseline) reads the value at rank k off
# the |distinct prices| value-count table — domain-bounded, no corpus
# sort (r8). Every arithmetic step — (x-lo)/(hi-lo)
# scaling, floor, cumulative window, ceil(q·N) — is identical IEEE or
# integer math in both engines, so estimates AND errors hash-verify.
# --------------------------------------------------------------------------
HIST_BINS = 1024
HIST_QS = [0.25, 0.5, 0.75, 0.9, 0.99]


def q66_binned_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("x")
    )
    bounds = li.agg(
        F.min("x").alias("lo"), F.max("x").alias("hi"), F.count("*").alias("n")
    )
    binned = li.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor((F.col("x") - F.col("lo")) / (F.col("hi") - F.col("lo"))
                    * HIST_BINS).cast("int"),
            F.lit(HIST_BINS - 1),
        ).alias("bin")
    )
    hist = binned.groupBy("bin").agg(F.count("*").alias("c"))
    cum = hist.select(
        "bin", "c",
        F.sum("c").over(
            W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
        ).alias("cum"),
    )
    qs = F.explode(F.array(*[F.lit(q) for q in HIST_QS])).alias("q")
    crossed = (
        cum.crossJoin(F.broadcast(bounds))
        .select(qs, "bin", "cum", "lo", "hi", "n")
        .filter(F.col("cum") >= F.col("q") * F.col("n"))
        .groupBy("q")
        .agg(
            F.min("bin").alias("qbin"),
            F.first("lo").alias("lo"),
            F.first("hi").alias("hi"),
            F.first("n").alias("n"),
        )
        .select(
            "q",
            (F.col("lo") + (F.col("qbin") + 1).cast("double")
             * (F.col("hi") - F.col("lo")) / HIST_BINS).alias("est"),
            F.ceil(F.col("q") * F.col("n")).cast("long").alias("k"),
        )
    )
    # exact side via the (value, count) table — the value at rank k is
    # the smallest x whose cumulative count reaches k, so the global
    # window runs over |distinct prices| rows (domain-bounded), never a
    # corpus-sized row_number sort (VERDICT r7 #1-family, r8 rewrite)
    cumv = (
        li.groupBy("x")
        .agg(F.count(F.lit(1)).alias("cx"))
        .select(
            "x",
            F.sum("cx").over(
                W.orderBy("x").rowsBetween(W.unboundedPreceding, 0)
            ).alias("cumx"),
        )
    )
    return (
        F.broadcast(crossed).join(cumv, F.col("cumx") >= F.col("k"))
        .groupBy("q", "est")
        .agg(F.min("x").alias("exact"))
        .select("q", "est", "exact", (F.col("est") - F.col("exact")).alias("err"))
        .orderBy("q")
    )


ORACLE_Q66 = f"""
WITH li AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem),
bounds AS (
  SELECT min(x) AS lo, max(x) AS hi, CAST(count(*) AS BIGINT) AS n FROM li
),
binned AS (
  SELECT least(CAST(floor((x - lo) / (hi - lo) * {HIST_BINS}) AS INTEGER),
               {HIST_BINS - 1}) AS bin
  FROM li, bounds
),
hist AS (SELECT bin, CAST(count(*) AS BIGINT) AS c FROM binned GROUP BY bin),
cum AS (
  SELECT bin, c,
         SUM(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist
),
qq AS (SELECT CAST(unnest([{", ".join(str(q) for q in HIST_QS)}]) AS DOUBLE) AS q),
crossed AS (
  SELECT q, min(bin) AS qbin,
         any_value(lo) AS lo, any_value(hi) AS hi, any_value(n) AS n
  FROM cum, bounds, qq
  WHERE cum >= q * n
  GROUP BY q
),
est AS (
  SELECT q,
         lo + CAST(qbin + 1 AS DOUBLE) * (hi - lo) / {HIST_BINS} AS est,
         CAST(ceil(q * n) AS BIGINT) AS k
  FROM crossed
),
cumv AS (
  SELECT x, SUM(cx) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cumx
  FROM (SELECT x, CAST(count(*) AS BIGINT) AS cx FROM li GROUP BY x)
)
SELECT q, est, min(x) AS exact, est - min(x) AS err
FROM est JOIN cumv ON cumx >= k
GROUP BY q, est
ORDER BY q
"""


# --------------------------------------------------------------------------
# q67: market-basket co-occurrence — the association-mining shape: part
# pairs bought together in the same order, support-counted, top-20 by
# support. The pair fan-out is bounded by ORDER SIZE (C(n,2) per order,
# n ≈ single digits), not corpus size — the reason basket mining joins
# the lineitem table to itself ON the order key and never all-pairs.
# One orderkey-keyed self-join + one pair-keyed count + TakeOrdered.
# --------------------------------------------------------------------------
BASKET_TOP = 20


def q67_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("support"))
    )
    return (
        pairs.orderBy(F.desc("support"), "part_a", "part_b")
        .limit(BASKET_TOP)
        .select("part_a", "part_b", "support")
    )


ORACLE_Q67 = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       CAST(count(*) AS BIGINT) AS support
FROM li a JOIN li b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY support DESC, part_a, part_b
LIMIT {BASKET_TOP}
"""


# --------------------------------------------------------------------------
# q68: TPC-H Q9 shape — product-type profit by nation and year: the
# 5-table join tree (part ⨝ lineitem ⨝ supplier ⨝ orders ⨝ nation)
# with a computed profit measure, grouped (nation, year). The testdata
# carries no partsupp, so cost is the retail-price proxy
# p_retailprice·l_quantity — the JOIN TREE and the measure-over-join
# shape are what Q9 exercises. part/supplier/nation broadcast; the one
# real shuffle is lineitem ⨝ orders on orderkey, then the group-by.
# Profit is a pure double expression (IEEE-identical cross-engine);
# the sum goes through the exact decimal dsum.
# --------------------------------------------------------------------------
def q68_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "orders", "supplier", "nation", "part"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(CAST(SUM(CAST(
                   l_extendedprice * (1 - l_discount)
                     - p_retailprice * l_quantity
                 AS DECIMAL(38,8))) AS STRING) AS DOUBLE) AS profit
        FROM part, supplier, lineitem, orders, nation
        WHERE s_suppkey = l_suppkey
          AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey
          AND s_nationkey = n_nationkey
          AND p_name LIKE '%red%'
        GROUP BY n_name, year(o_orderdate)
        ORDER BY nation, o_year DESC
        """
    )


ORACLE_Q68 = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       {dsum_sql("l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity")} AS profit
FROM part, supplier, lineitem, orders, nation
WHERE s_suppkey = l_suppkey
  AND p_partkey = l_partkey
  AND o_orderkey = l_orderkey
  AND s_nationkey = n_nationkey
  AND p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


# --------------------------------------------------------------------------
# q69_sequence_funnel — ordered-sequence funnel over the event stream
# (ClickHouse's windowFunnel / every product-analytics suite's core
# query): how many users did view, THEN click strictly after their
# first view, THEN purchase strictly after that first qualifying
# click. Not the same thing as set-intersection counts — the ORDER is
# the semantics (a purchase before the first view does not convert).
# Implementation is the sharded-funnel shape: stage k is one filtered
# scan of the events table joined to the (user → stage-(k−1) anchor
# timestamp) table on user_id and reduced by a map-side-combinable
# MIN — no per-user event sorting, no window over a user's whole
# history, so a 100 TB event log funnels in |stages| keyed passes.
# Conversion ratios are integer ppm of the stage-1 population.
# --------------------------------------------------------------------------
FUNNEL_STAGES = ["view", "click", "purchase"]


def q69_sequence_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Each stage anchor is MATERIALIZED (cut_lineage) before the next
    # stage plans against it: the first-landed shape chained the stage
    # frames lazily and took counts off each, so anchors[k]'s action
    # re-executed stages 0..k−1 — the events table was scanned
    # S(S+1)/2 times instead of S and each count was its own Spark job
    # (VERDICT r9 #5). Now stage k is one filtered events scan joined
    # to the stage-(k−1) anchor PARQUET (tiny: one row per surviving
    # user), and the per-stage counts fold into a single 3-row
    # DataFrame plan — no driver-side action at all; conv/drop ppm
    # come from a self-join on the stage chain and a broadcast 1-row
    # base, mirroring the oracle's LAG-over-stages CTE.
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    from jobx_spark.lineage import cut_lineage

    anchors = []  # per-stage (user_id, anchor ts) frames, materialized
    for i, stage in enumerate(FUNNEL_STAGES):
        cur = ev.filter(F.col("event_type") == stage)
        if i > 0:
            prev = anchors[i - 1].select(
                "user_id", F.col("t").alias("prev_t")
            )
            cur = cur.join(prev, "user_id").filter(F.col("ts") > F.col("prev_t"))
        anchors.append(
            cut_lineage(
                cur.groupBy("user_id").agg(F.min("ts").alias("t")),
                tag=f"funnel-s{i + 1}",
            )
        )
    counts = None  # (stage, event_type, n_users) — one row per stage
    for i, stage in enumerate(FUNNEL_STAGES):
        one = anchors[i].agg(
            F.count(F.lit(1)).cast("long").alias("n_users")
        ).select(
            F.lit(i + 1).alias("stage"),
            F.lit(stage).alias("event_type"),
            "n_users",
        )
        counts = one if counts is None else counts.unionByName(one)
    base = counts.filter(F.col("stage") == 1).select(
        F.greatest(F.col("n_users"), F.lit(1)).alias("n1")
    )
    prev = counts.select(
        (F.col("stage") + 1).alias("stage"),
        F.col("n_users").alias("prev_n"),
    )
    return (
        counts.join(prev, "stage", "left")
        .withColumn("prev_n", F.coalesce("prev_n", "n_users"))
        .crossJoin(F.broadcast(base))
        .select(
            F.col("stage").cast("int").alias("stage"),
            "event_type",
            "n_users",
            F.expr("(n_users * 1000000) div n1")
            .cast("long")
            .alias("conv_ppm"),
            F.expr(
                "((prev_n - n_users) * 1000000) div greatest(prev_n, 1)"
            )
            .cast("long")
            .alias("drop_ppm"),
        )
        .orderBy("stage")
    )


def _funnel_oracle() -> str:
    stages = FUNNEL_STAGES
    ctes = [
        f"""s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = '{stages[0]}' GROUP BY user_id
)"""
    ]
    for i in range(1, len(stages)):
        ctes.append(
            f"""s{i + 1} AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s{i} ON s{i}.user_id = e.user_id
  WHERE e.event_type = '{stages[i]}' AND e.ts > s{i}.t
  GROUP BY e.user_id
)"""
        )
    ctes.append(
        "n AS (\n  "
        + "\n  UNION ALL ".join(
            f"SELECT {i + 1} AS stage, '{s}' AS event_type,"
            f" CAST(count(*) AS BIGINT) AS n_users FROM s{i + 1}"
            for i, s in enumerate(stages)
        )
        + "\n)"
    )
    joined = ",\n".join(ctes)
    return f"""
WITH {joined},
base AS (SELECT GREATEST(MAX(CASE WHEN stage = 1 THEN n_users END), 1)
                AS n1 FROM n),
prevs AS (
  SELECT n.*, COALESCE(LAG(n_users) OVER (ORDER BY stage), n_users) AS prev
  FROM n
)
SELECT CAST(stage AS INTEGER) AS stage, event_type, n_users,
       CAST(n_users * 1000000 // base.n1 AS BIGINT) AS conv_ppm,
       CAST((prev - n_users) * 1000000 // GREATEST(prev, 1) AS BIGINT)
         AS drop_ppm
FROM prevs, base
ORDER BY stage
"""


# --------------------------------------------------------------------------
# q70_retention_cohorts — cohort retention over the event stream (the
# other half of every product-analytics suite): users cohort by their
# FIRST-ever activity day, and each (cohort, day-offset) cell counts
# how many of them were active exactly that many days later. Output
# carries the cohort size and integer-ppm retention so the triangle
# reads directly.
# Scale shape: first-activity is one map-side-combinable MIN per user;
# the activity set collapses to DISTINCT (user, day) — also map-side —
# before the user-keyed join against the cohort table; the final
# census is ≤ |days|² rows at any event volume. Days derive from
# date_trunc on the session-UTC-pinned timestamps (the
# stream_tumbling convention) and render as yyyy-MM-dd STRINGS so the
# hash compare never mixes date/timestamp encodings.
# --------------------------------------------------------------------------
def q70_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = ev.distinct()
    cells = (
        activity.join(first, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    sizes = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return (
        cells.join(sizes, "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.col("day_offset").cast("long").alias("day_offset"),
            "n_users",
            "cohort_size",
            F.expr("(n_users * 1000000) div cohort_size")
            .cast("long")
            .alias("retention_ppm"),
        )
        .orderBy("cohort_day", "day_offset")
    )


ORACLE_Q70 = """
WITH act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
),
first AS (
  SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id
),
cells AS (
  SELECT f.cohort_day, a.day - f.cohort_day AS day_offset,
         CAST(count(*) AS BIGINT) AS n_users
  FROM act a JOIN first f ON f.user_id = a.user_id
  GROUP BY f.cohort_day, a.day - f.cohort_day
),
sizes AS (
  SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
  FROM first GROUP BY cohort_day
)
SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(c.day_offset AS BIGINT) AS day_offset,
       c.n_users, s.cohort_size,
       CAST(c.n_users * 1000000 // s.cohort_size AS BIGINT)
         AS retention_ppm
FROM cells c JOIN sizes s ON s.cohort_day = c.cohort_day
ORDER BY cohort_day, day_offset
"""


QUERIES = {
    "q68_product_profit": q68_product_profit,
    "q69_sequence_funnel": q69_sequence_funnel,
    "q70_retention_cohorts": q70_retention_cohorts,
    "q67_market_basket": q67_market_basket,
    "q66_binned_quantiles": q66_binned_quantiles,
    "q65_bloom_prefilter_join": q65_bloom_prefilter_join,
    "q64_market_share": q64_market_share,
    "q58_disjunctive_join": q58_disjunctive_join,
    "q59_waiting_suppliers": q59_waiting_suppliers,
    "q60_lateral_topn": q60_lateral_topn,
    "q61_promo_share": q61_promo_share,
    "q62_supplier_census": q62_supplier_census,
    "q63_dominant_supplier": q63_dominant_supplier,
    "q57_range_bin_join": q57_range_bin_join,
    "q56_salted_skew_join": q56_salted_skew_join,
    "q38_salted_skew_agg": q38_salted_skew_agg,
    "q49_local_supplier_volume": q49_local_supplier_volume,
    "q50_returned_items": q50_returned_items,
    "q39_nation_trade": q39_nation_trade,
    "q40_monthly_growth": q40_monthly_growth,
    "q41_percentile_cont": q41_percentile_cont,
    "q01_pricing_summary": q01_pricing_summary,
    "q02_filter_project": q02_filter_project,
    "q03_shipping_priority": q03_shipping_priority,
    "q04_brand_revenue": q04_brand_revenue,
    "q05_semi_join": q05_semi_join,
    "q06_anti_join": q06_anti_join,
    "q07_topk_per_group": q07_topk_per_group,
    "q08_running_sum": q08_running_sum,
    "q09_rollup": q09_rollup,
    "q10_cube": q10_cube,
    "q11_distinct_agg": q11_distinct_agg,
    "q12_set_ops": q12_set_ops,
    "q13_top_orders": q13_top_orders,
    "q14_scalar_functions": q14_scalar_functions,
    "q15_json_extract": q15_json_extract,
    "q16_sessionize": q16_sessionize,
    "q17_pivot": q17_pivot,
    "q18_grouping_sets": q18_grouping_sets,
    "q19_above_nation_avg": q19_above_nation_avg,
    "q30_exists_late_ship": q30_exists_late_ship,
    "q31_idle_rich_customers": q31_idle_rich_customers,
    "q32_explode_words": q32_explode_words,
    "q33_balance_distribution": q33_balance_distribution,
    "q34_conditional_agg": q34_conditional_agg,
    "q35_string_agg": q35_string_agg,
    "q36_unpivot_metrics": q36_unpivot_metrics,
    "q42_important_parts": q42_important_parts,
    "q43_small_qty_revenue": q43_small_qty_revenue,
    "q44_top_supplier": q44_top_supplier,
    "q45_big_volume_orders": q45_big_volume_orders,
    "q46_fuzzy_name_pairs": q46_fuzzy_name_pairs,
    "q55_bom_explosion": q55_bom_explosion,
}

ORACLES = {
    "q68_product_profit": ORACLE_Q68,
    "q69_sequence_funnel": _funnel_oracle(),
    "q70_retention_cohorts": ORACLE_Q70,
    "q67_market_basket": ORACLE_Q67,
    "q66_binned_quantiles": ORACLE_Q66,
    "q65_bloom_prefilter_join": _q65_oracle(),
    "q64_market_share": ORACLE_Q64,
    "q58_disjunctive_join": ORACLE_Q58,
    "q59_waiting_suppliers": ORACLE_Q59,
    "q60_lateral_topn": ORACLE_Q60,
    "q61_promo_share": ORACLE_Q61,
    "q62_supplier_census": ORACLE_Q62,
    "q63_dominant_supplier": ORACLE_Q63,
    "q57_range_bin_join": ORACLE_Q57,
    "q56_salted_skew_join": ORACLE_Q56,
    "q38_salted_skew_agg": ORACLE_Q38,
    "q49_local_supplier_volume": ORACLE_Q49,
    "q50_returned_items": ORACLE_Q50,
    "q39_nation_trade": ORACLE_Q39,
    "q40_monthly_growth": ORACLE_Q40,
    "q41_percentile_cont": ORACLE_Q41,
    "q01_pricing_summary": ORACLE_Q01,
    "q02_filter_project": ORACLE_Q02,
    "q03_shipping_priority": ORACLE_Q03,
    "q04_brand_revenue": ORACLE_Q04,
    "q05_semi_join": ORACLE_Q05,
    "q06_anti_join": ORACLE_Q06,
    "q07_topk_per_group": ORACLE_Q07,
    "q08_running_sum": ORACLE_Q08,
    "q09_rollup": ORACLE_Q09,
    "q10_cube": ORACLE_Q10,
    "q11_distinct_agg": ORACLE_Q11,
    "q12_set_ops": ORACLE_Q12,
    "q13_top_orders": ORACLE_Q13,
    "q14_scalar_functions": ORACLE_Q14,
    "q15_json_extract": ORACLE_Q15,
    "q16_sessionize": ORACLE_Q16,
    "q17_pivot": ORACLE_Q17,
    "q18_grouping_sets": ORACLE_Q18,
    "q19_above_nation_avg": ORACLE_Q19,
    "q30_exists_late_ship": ORACLE_Q30,
    "q31_idle_rich_customers": ORACLE_Q31,
    "q32_explode_words": ORACLE_Q32,
    "q33_balance_distribution": ORACLE_Q33,
    "q34_conditional_agg": ORACLE_Q34,
    "q35_string_agg": ORACLE_Q35,
    "q36_unpivot_metrics": ORACLE_Q36,
    "q42_important_parts": ORACLE_Q42,
    "q43_small_qty_revenue": ORACLE_Q43,
    "q44_top_supplier": ORACLE_Q44,
    "q45_big_volume_orders": ORACLE_Q45,
    "q46_fuzzy_name_pairs": ORACLE_Q46,
    "q55_bom_explosion": ORACLE_Q55,
}
