"""SQL surface round 3 — the remaining TPC-H join/predicate shapes the
historical-search store should serve (SURVEY.md §2.6): multi-way
co-partitioned fact joins (Q5), returned-item reporting (Q10), a
conditional-aggregate ratio (Q14), and OR-of-ANDs disjunctive predicate
pushdown (Q19).

Scale notes: dimensions (nation/region/part/supplier) broadcast; the only
shuffles are fact-fact joins on orderkey and the grouping exchanges.
Q19's disjunction stays a single scan-side predicate — Catalyst extracts
the common `l_partkey = p_partkey` conjunct so the join is planned
normally and the OR tree is evaluated post-join in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamalert_spark.ops.hints import gated_broadcast
from streamalert_spark.queries import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from streamalert_spark.session import read_table

    return read_table(spark, sf_dir, name)


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


_Q5_ORACLE = """
SELECT n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
                AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
"""


@query("q5_local_supplier_volume", oracle=_Q5_ORACLE,
       doc="TPC-H Q5 shape: 6-way join where the supplier join carries the "
           "extra local-supplier equality (c_nationkey = s_nationkey); "
           "region filter prunes through two broadcast dims.")
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01"))
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(gated_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(gated_broadcast(supp),
              (li.l_suppkey == supp.s_suppkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
             .cast("double").alias("revenue"))
        .repartition(1).sortWithinPartitions(F.col("revenue").desc(), "nation")
    )


_Q10_ORACLE = """
SELECT c.c_custkey, c.c_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       c.c_acctbal, n.n_name AS nation
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@query("q10_returned_items", oracle=_Q10_ORACLE,
       doc="TPC-H Q10 shape: returned-item revenue ranking — quarter "
           "window + returnflag filters pushed to both fact scans, "
           "broadcast customer/nation, top-20.")
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(gated_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal",
                 F.col("n_name").alias("nation"))
        .agg(F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
             .cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


_Q14_ORACLE = """
SELECT CAST(ROUND(
         100.00 * SUM(CASE WHEN p.p_type = 'PROMO'
                           THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                           ELSE CAST(0 AS DECIMAL(18,2)) END)
         / SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 6) AS DOUBLE)
         AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1996-02-01'
"""


@query("q14_promo_revenue", oracle=_Q14_ORACLE,
       doc="TPC-H Q14 shape: conditional-aggregate ratio (promo revenue "
           "share) over a one-month window — broadcast part, single scalar "
           "result, decimal-exact division before the final round.")
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-02-01"))
    part = _t(spark, sf_dir, "part")
    disc = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc) \
             .otherwise(F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(gated_broadcast(part), li.l_partkey == part.p_partkey)
        .agg(F.round(F.lit(100.00) * F.sum(promo) / F.sum(disc), 6)
             .cast("double").alias("promo_revenue_pct"))
    )


_Q19_ORACLE = """
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS line_count
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@query("q19_disjunctive_predicates", oracle=_Q19_ORACLE,
       doc="TPC-H Q19 shape: OR-of-ANDs across both join sides — the "
           "equi-join conjunct is extracted so the join plans normally and "
           "the disjunction evaluates in codegen post-join; per-side "
           "prefilters (brand/size set, quantity range) are pushed to the "
           "scans.")
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scan-side prefilters: necessary conditions implied by the OR tree
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1, 30))
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & F.col("p_size").between(1, 15))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(gated_broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
             .cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Hypertable-style multi-granularity time rollup (GROUPING SETS)
# ---------------------------------------------------------------------------

_TIME_ROLLUP_SQL = """
SELECT
  CASE WHEN h IS NOT NULL THEN 'hour'
       WHEN d IS NOT NULL THEN 'day'
       ELSE 'week' END AS grain,
  COALESCE(h, d, w) AS bucket_start,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM (
  SELECT value,
         date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
         date_trunc('week', CAST(ts AS TIMESTAMP)) AS w
  FROM events
)
GROUP BY GROUPING SETS ((h), (d), (w))
ORDER BY grain, bucket_start
"""


@query("time_rollup_multi", oracle=_TIME_ROLLUP_SQL,
       doc="Hypertable-style continuous-aggregate shape: hour/day/week "
           "rollups in ONE scan via GROUPING SETS (identical SQL text "
           "modulo the final ORDER BY, which becomes a single-partition "
           "local sort — same order, no RangePartitioning sampling pass) "
           "— the Expand operator replicates rows 3x into one "
           "partial-aggregated exchange instead of three scans.")
def time_rollup_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.queries.sql_surface import register_views

    register_views(spark, sf_dir)
    body = _TIME_ROLLUP_SQL.rsplit("ORDER BY", 1)[0]
    return spark.sql(body).repartition(1).sortWithinPartitions("grain", "bucket_start")


# ---------------------------------------------------------------------------
# Set operations + ranking-function surface
# ---------------------------------------------------------------------------

_SETOPS_SQL = """
SELECT 'active_no_purchase' AS cohort, COUNT(*) AS n_users FROM (
  SELECT user_id FROM events WHERE event_type = 'click'
  INTERSECT
  SELECT user_id FROM events WHERE event_type = 'view'
  EXCEPT
  SELECT user_id FROM events WHERE event_type = 'purchase'
)
UNION ALL
SELECT 'signup_or_error', COUNT(*) FROM (
  SELECT user_id FROM events WHERE event_type = 'signup'
  UNION
  SELECT user_id FROM events WHERE event_type = 'error'
)
ORDER BY cohort
"""


@query("set_operations_cohorts", oracle=_SETOPS_SQL,
       doc="INTERSECT / EXCEPT / UNION cohort algebra (identical SQL text "
           "both engines) — Catalyst plans the set ops as semi/anti hash "
           "joins over pre-aggregated distinct keys.")
def set_operations_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.queries.sql_surface import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SETOPS_SQL)


_RANKING_SQL = """
SELECT user_id, total_value,
       CAST(RANK() OVER (ORDER BY total_value DESC, user_id) AS BIGINT)
         AS rnk,
       CAST(DENSE_RANK() OVER (ORDER BY total_value DESC, user_id)
            AS BIGINT) AS drnk,
       CAST(NTILE(4) OVER (ORDER BY total_value DESC, user_id) AS BIGINT)
         AS quartile,
       ROUND(PERCENT_RANK() OVER (ORDER BY total_value DESC, user_id), 6)
         AS pct_rank,
       ROUND(CUME_DIST() OVER (ORDER BY total_value DESC, user_id), 6)
         AS cume
FROM (
  SELECT user_id,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM events GROUP BY user_id
)
ORDER BY rnk
"""


@query("ranking_functions_surface", oracle=_RANKING_SQL,
       doc="Window ranking surface: RANK / DENSE_RANK / NTILE / "
           "PERCENT_RANK / CUME_DIST over per-user spend (identical SQL "
           "text both engines). The global window runs over the AGGREGATED "
           "per-user rows (users-scale, one partition is fine), never the "
           "raw event table.")
def ranking_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.queries.sql_surface import register_views

    register_views(spark, sf_dir)
    return spark.sql(_RANKING_SQL)
