"""SQL surface — the scheduled-query / rule-promotion / historical-search
feature floor of the reference (SURVEY.md §2.6).

The reference generates Presto/Athena SQL strings and delegates execution
(reference: streamalert/scheduled_queries/query_packs/configuration.py:19-61,
streamalert/rule_promotion/statistic.py:23-63, sample query at
scheduled_queries/sample/athena.py:18-48). Here Spark SQL *is* the engine;
these queries exercise every SQL feature the reference's shipped queries use
— projection, map/JSON access, equality/IN filters, string functions,
GROUP BY + count, ORDER BY DESC, partition-pruning-style date predicates —
plus the star-schema joins the historical store supports.

Scale notes (100 TB): every query here is expressed declaratively so
Catalyst pushes filters/projections into the parquet scan; dimension joins
are broadcast (nation/region/part are tiny relative to fact tables); the
only shuffles are the aggregation exchanges on the grouping keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamalert_spark.ops.hints import gated_broadcast
from streamalert_spark.queries import query
from streamalert_spark.session import load_tables


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from streamalert_spark.session import read_table

    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary over lineitem.
# Decimal-exact aggregation: double sums are order-dependent across engines,
# decimal sums are exact, so both sides produce bit-identical values.
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) * 100 AS BIGINT) AS DOUBLE) / 100 AS sum_qty,
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) * 100 AS BIGINT) AS DOUBLE) / 100 AS sum_base_price,
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) * 100 AS BIGINT) AS DOUBLE) / 100 AS sum_disc_price,
  CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) * 100 AS BIGINT) AS DOUBLE) / 100 AS sum_charge,
  CAST(ROUND(AVG(CAST(l_quantity AS DECIMAL(18,2))), 6) AS DOUBLE) AS avg_qty,
  CAST(ROUND(AVG(CAST(l_extendedprice AS DECIMAL(18,2))), 6) AS DOUBLE) AS avg_price,
  CAST(ROUND(AVG(CAST(l_discount AS DECIMAL(18,2))), 6) AS DOUBLE) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", oracle=_Q1_ORACLE,
       doc="TPC-H Q1 pricing summary; the flagship batch aggregate. Money "
           "sums render as exact integer CENTS (round the exact DECIMAL "
           "sum to 2 places — integral after *100 — cast through BIGINT) "
           "then ONE int64→double conversion and ONE IEEE divide, both "
           "correctly rounded in both engines. A direct decimal→double "
           "cast of the scale-6 sum_charge diverged by 1 ulp at sf1: "
           "Spark converts via BigDecimal (one rounding), DuckDB divides "
           "the int128 payload in floating point (two roundings).")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    cents = lambda col: (F.round(col, 2) * 100).cast("bigint").cast("double") / 100  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.to_date(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            cents(F.sum(dec("l_quantity"))).alias("sum_qty"),
            cents(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
            cents(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))).alias("sum_disc_price"),
            cents(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")) * (F.lit(1) + dec("l_tax")))).alias("sum_charge"),
            F.round(F.avg(dec("l_quantity")), 6).cast("double").alias("avg_qty"),
            F.round(F.avg(dec("l_extendedprice")), 6).cast("double").alias("avg_price"),
            F.round(F.avg(dec("l_discount")), 6).cast("double").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .repartition(1).sortWithinPartitions("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Star-schema join: revenue by nation (historical-search style query over the
# store). Dimensions are broadcast; fact-side filter is pushed to the scan.
# ---------------------------------------------------------------------------

_REV_ORACLE = """
SELECT
  n.n_name AS nation,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  COUNT(*) AS line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderstatus = 'F'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
"""


@query("revenue_by_nation", oracle=_REV_ORACLE,
       doc="5-way star join with broadcast dimensions and decimal-exact revenue.")
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(gated_broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .repartition(1).sortWithinPartitions(F.col("revenue").desc(), "nation")
    )


_Q3_ORACLE = """
SELECT
  l.l_orderkey AS orderkey,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  o.o_orderdate AS orderdate,
  o.o_orderpriority AS orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1995-03-15'
  AND l.l_shipdate > DATE '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, orderkey
LIMIT 10
"""


@query("q3_shipping_priority", oracle=_Q3_ORACLE,
       doc="TPC-H Q3 shape: selective filters pushed to all three scans, "
           "broadcast customer, AQE-planned fact joins, decimal-exact "
           "revenue, top-10.")
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    out = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(gated_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
             .cast("double").alias("revenue"))
        .select("orderkey", "revenue", "orderdate", "orderpriority")
    )
    # deterministic top-10: sort needs ALL groups, so this tiny global sort
    # is inherent to the query (LIMIT pushes into the sort as TakeOrdered)
    return out.orderBy(F.col("revenue").desc(), "orderkey").limit(10)


# ---------------------------------------------------------------------------
# Scheduled-query style: hourly counts with a date predicate (the reference's
# packs always carry a dt partition filter — athena.py:36). date_trunc is the
# portable stand-in for the dt=YYYY-MM-DD-HH partition column.
# ---------------------------------------------------------------------------

_HOURLY_ORACLE = """
SELECT
  CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
  event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
WHERE event_type IN ('error', 'click') AND ts >= TIMESTAMP '2024-01-01 00:00:00'
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("scheduled_hourly_counts", oracle=_HOURLY_ORACLE,
       doc="Scheduled-query pack shape: time-bucketed counts with a time-range predicate.")
def scheduled_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("error", "click")
                  & (F.col("ts") >= F.lit("2024-01-01 00:00:00").cast("timestamp")))
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .repartition(1).sortWithinPartitions("hour", "event_type")
    )


# ---------------------------------------------------------------------------
# Rule-promotion count query: SELECT rule_name, count(*) ... GROUP BY ...
# ORDER BY count DESC (reference: rule_promotion/statistic.py:23-31).
# event_type stands in for rule_name over the events stream table.
# ---------------------------------------------------------------------------

_PROMO_ORACLE = """
SELECT event_type AS rule_name, COUNT(*) AS alert_count
FROM events
GROUP BY event_type
ORDER BY alert_count DESC, rule_name
"""


@query("rule_promotion_counts", oracle=_PROMO_ORACLE,
       doc="Rule-promotion statistic query: per-rule alert counts, descending.")
def rule_promotion_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("event_type").alias("rule_name"))
        .agg(F.count(F.lit(1)).alias("alert_count"))
        .repartition(1).sortWithinPartitions(F.col("alert_count").desc(), "rule_name")
    )


# ---------------------------------------------------------------------------
# JSON access: the reference's sample pack reads map subscripts and
# json_extract (athena.py:25-48). events.props is a JSON string column.
# ---------------------------------------------------------------------------

_JSON_ORACLE = """
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
FROM events
WHERE event_type = 'error' AND CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
ORDER BY event_id
"""


@query("json_extract_props", oracle=_JSON_ORACLE,
       doc="json_extract over a JSON string column with a derived-value filter.")
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    prop_k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.filter(F.col("event_type") == "error")
        .select("event_id", prop_k.alias("prop_k"))
        .filter(F.col("prop_k") > 50)
        .repartition(1).sortWithinPartitions("event_id")
    )


# ---------------------------------------------------------------------------
# String/filter surface: upper, substr, IN / NOT IN (athena.py:36-48).
# ---------------------------------------------------------------------------

_STR_ORACLE = """
SELECT
  o_orderkey,
  UPPER(o_orderpriority) AS priority_uc,
  SUBSTR(o_orderpriority, 1, 1) AS priority_code
FROM orders
WHERE o_orderstatus NOT IN ('P') AND SUBSTR(o_orderpriority, 1, 1) IN ('1', '2')
ORDER BY o_orderkey
"""


@query("string_filter_surface", oracle=_STR_ORACLE,
       doc="upper/substr/IN/NOT IN filter surface from the sample scheduled query.")
def string_filter_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(~F.col("o_orderstatus").isin("P")
                      & F.substring("o_orderpriority", 1, 1).isin("1", "2"))
        .select(
            "o_orderkey",
            F.upper("o_orderpriority").alias("priority_uc"),
            F.substring("o_orderpriority", 1, 1).alias("priority_code"),
        )
        .repartition(1).sortWithinPartitions("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Window/ranking: top-N per group. Not in the reference's shipped SQL but part
# of the Spark SQL floor the historical store exposes; deterministic via
# unique tie-break.
# ---------------------------------------------------------------------------

_TOPN_ORACLE = """
SELECT user_id, event_id, value, rn FROM (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events
) t
WHERE rn <= 3
ORDER BY user_id, rn
"""


@query("topn_per_user", oracle=_TOPN_ORACLE,
       doc="Window ranking: top-3 events per user by value.")
def topn_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.select("user_id", "event_id", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .repartition(1).sortWithinPartitions("user_id", "rn")
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery (TPC-H Q17 shape): parts whose order quantity
# falls below 20% of that part's average — Catalyst decorrelates the
# per-part average into an aggregate + join; no per-row re-scan.
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
SELECT CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 4) AS DOUBLE)
       AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * AVG(CAST(l2.l_quantity AS DOUBLE))
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
"""


@query("q17_small_qty_revenue", oracle=_Q17_ORACLE,
       doc="TPC-H Q17 shape: correlated scalar subquery (per-part average "
           "quantity threshold) — the identical correlated SQL runs on both "
           "engines; Catalyst decorrelates it into an aggregate + join.")
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q17_ORACLE)


# ---------------------------------------------------------------------------
# GROUP BY + HAVING feeding a semi join (TPC-H Q18 shape): customers with
# any large-volume order.
# ---------------------------------------------------------------------------

_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
)
SELECT c.c_custkey, c.c_name, COUNT(*) AS n_big_orders
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN big b ON b.l_orderkey = o.o_orderkey
GROUP BY c.c_custkey, c.c_name
ORDER BY n_big_orders DESC, c.c_custkey
LIMIT 20
"""


@query("q18_large_volume_customers", oracle=_Q18_ORACLE,
       doc="TPC-H Q18 shape: HAVING-filtered aggregate driving a join "
           "back to customers.")
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
        .select("l_orderkey")
    )
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .join(big, big.l_orderkey == orders.o_orderkey, "left_semi")
        .groupBy("c_custkey", "c_name")
        .agg(F.count(F.lit(1)).alias("n_big_orders"))
        .repartition(1)
        .sortWithinPartitions(F.col("n_big_orders").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# EXISTS decorrelation (TPC-H Q4 shape): order-priority counts over orders
# having at least one returned lineitem in a date window. The EXISTS
# becomes a left-semi join on o_orderkey — one shuffle on the join key,
# partial-aggregated count after.
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q4_priority_with_returns", oracle=_Q4_ORACLE,
       doc="TPC-H Q4 shape: EXISTS subquery as a native left-semi join, "
           "date-window filter pushed to the orders scan.")
def q4_priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01"))
    returned = _t(spark, sf_dir, "lineitem") \
        .filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey,
                    "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .repartition(1).sortWithinPartitions("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# NOT IN anti join + distinct aggregate (TPC-H Q16 shape, reshaped onto
# the lineitem bridge since the synthetic schema has no partsupp):
# supplier variety per part family, excluding one brand and a
# "complaint" supplier set.
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p.p_brand, p.p_type,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#23'
  AND p.p_size IN (5, 11, 17, 23, 29)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type
"""


@query("q16_supplier_variety", oracle=_Q16_ORACLE,
       doc="TPC-H Q16 shape: NOT-IN exclusion as a null-safe anti join "
           "(the complaint set has no NULL keys, so plain left_anti is "
           "equivalent), broadcast part dim, distinct-count aggregate.")
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#23")
        & F.col("p_size").isin(5, 11, 17, 23, 29))
    complaints = _t(spark, sf_dir, "supplier") \
        .filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(gated_broadcast(complaints),
                li.l_suppkey == complaints.s_suppkey, "left_anti")
        .join(gated_broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .repartition(1)
        .sortWithinPartitions(F.col("supplier_cnt").desc(), "p_brand", "p_type")
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    load_tables(spark, sf_dir)
