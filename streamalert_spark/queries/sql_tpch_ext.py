"""SQL surface round 4 — the remaining TPC-H query shapes, completing all
22 on the historical-search store (SURVEY.md §2.6 went well past the
reference floor in r3; this closes the canonical suite).

The driver schema has no partsupp table and lineitem lacks
shipmode/commitdate/receiptdate, so Q2/Q9/Q11/Q12/Q20/Q21 substitute the
nearest available relation (distinct (l_partkey, l_suppkey) pairs stand in
for partsupp; returnflag/orderpriority stand in for shipmode/late-ness) —
each query keeps the SHAPE that matters (correlated min, scalar-total
HAVING, conditional counts, nested IN, EXISTS+NOT-EXISTS self-joins).

Scale notes (100 TB): scale-free dims (nation=25 rows, region=5 at every
SF) broadcast unconditionally; SF-scaling sides (customer/supplier/part
and fact-derived aggregates) go through ``gated_broadcast`` — hinted only
while Catalyst's plan-time size estimate fits the byte budget, otherwise
left to AQE (at 100 TB a forced customer broadcast is an OOM); fact-fact
joins shuffle on orderkey only; scalar totals ride a 1-row broadcast
crossJoin, never a driver collect; correlated forms keep identical SQL
text on both engines
and let Catalyst decorrelate (aggregate + join, no per-row re-scan).
Determinism: money math in DECIMAL (order-independent sums) cast back to
DOUBLE; ratios round(x, 6) of correctly-rounded IEEE divisions; every
ORDER BY carries a unique tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamalert_spark.ops.hints import gated_broadcast
from streamalert_spark.queries import query
from streamalert_spark.queries.sql_surface import register_views


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from streamalert_spark.session import read_table

    return read_table(spark, sf_dir, name)


def _dec(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# Q2 shape: correlated MIN over the part-supplier relation — supplier(s)
# with the minimum account balance among a region's suppliers of each part.
# partsupp stands in as SELECT DISTINCT l_partkey, l_suppkey FROM lineitem.
# ---------------------------------------------------------------------------

_Q2_ORACLE = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
),
cand AS (
  SELECT p.p_partkey, p.p_name, eu.s_suppkey, eu.s_name, eu.s_acctbal, eu.n_name
  FROM part p
  JOIN ps ON ps.l_partkey = p.p_partkey
  JOIN eu ON eu.s_suppkey = ps.l_suppkey
  WHERE p.p_size <= 10 AND p.p_type = 'LARGE'
)
SELECT c.s_acctbal, c.s_name, c.n_name AS nation, c.p_partkey, c.p_name
FROM cand c
JOIN (
  SELECT p_partkey, MIN(s_acctbal) AS min_bal FROM cand GROUP BY p_partkey
) m ON m.p_partkey = c.p_partkey AND c.s_acctbal = m.min_bal
ORDER BY c.s_acctbal DESC, c.p_partkey, c.s_name
"""


@query("q2_min_cost_supplier", oracle=_Q2_ORACLE,
       doc="TPC-H Q2 shape: per-part MIN over the region's part-supplier "
           "relation, matched back by equality (correlated-min "
           "decorrelation). distinct lineitem pairs stand in for partsupp.")
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (_t(spark, sf_dir, "lineitem")
          .select("l_partkey", "l_suppkey").distinct())
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE"))
    eu = (supp.join(F.broadcast(nation),
                    supp.s_nationkey == nation.n_nationkey)
          .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
          .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    cand = (
        ps.join(gated_broadcast(part), ps.l_partkey == part.p_partkey)
        .join(gated_broadcast(eu), ps.l_suppkey == eu.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    min_bal = cand.groupBy(F.col("p_partkey").alias("mk")) \
        .agg(F.min("s_acctbal").alias("min_bal"))
    return (
        cand.join(gated_broadcast(min_bal),
                  (cand.p_partkey == min_bal.mk)
                  & (cand.s_acctbal == min_bal.min_bal))
        .select("s_acctbal", "s_name", F.col("n_name").alias("nation"),
                "p_partkey", "p_name")
        .repartition(1)
        .sortWithinPartitions(F.col("s_acctbal").desc(), "p_partkey", "s_name")
    )


# ---------------------------------------------------------------------------
# Q6 shape: the forecast-revenue single-scan aggregate — every predicate
# pushes into the parquet scan, zero joins, one partial-aggregated sum.
# ---------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", oracle=_Q6_ORACLE,
       doc="TPC-H Q6: single-scan filtered aggregate; all four predicates "
           "push down to the parquet scan (PushedFilters), zero joins.")
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24))
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
             .cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q7 shape: volume shipping between two nations — bidirectional nation-pair
# filter, year bucketing, revenue by (supp_nation, cust_nation, year).
# ---------------------------------------------------------------------------

_Q7_ORACLE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER)
ORDER BY supp_nation, cust_nation, l_year
"""


@query("q7_volume_shipping", oracle=_Q7_ORACLE,
       doc="TPC-H Q7 shape: bidirectional nation-pair flows with year "
           "bucketing; both nation dims broadcast, disjunctive pair filter "
           "evaluated post-join in codegen.")
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"),
                       F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(gated_broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(gated_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
             .cast("double").alias("revenue"))
        .repartition(1)
        .sortWithinPartitions("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 shape: national market share — one nation's share of a region's
# volume for a part type, by order year. Share = ratio of two decimal-exact
# sums (conditional numerator), divided as IEEE doubles and rounded.
# ---------------------------------------------------------------------------

_Q8_ORACLE = """
SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
       CAST(ROUND(
         CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                       THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE),
         6) AS DOUBLE) AS mkt_share
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n1.n_regionkey
WHERE r.r_name = 'AMERICA'
  AND p.p_type = 'PROMO'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER)
ORDER BY o_year
"""


@query("q8_market_share", oracle=_Q8_ORACLE,
       doc="TPC-H Q8 shape: market-share ratio of conditional to total "
           "decimal-exact revenue by order year; 8-way join, scale-free "
           "dims broadcast, SF-scaling sides size-gated.")
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01"))
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"),
                       F.col("n_regionkey").alias("n1_region"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"),
                       F.col("n_name").alias("supp_nation"))
    vol = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    cond = F.when(F.col("supp_nation") == "NATION_3", vol) \
        .otherwise(F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(gated_broadcast(part), li.l_partkey == part.p_partkey)
        .join(gated_broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(gated_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(
            F.sum(cond).cast("double") / F.sum(vol).cast("double"), 6
        ).cast("double").alias("mkt_share"))
        .repartition(1).sortWithinPartitions("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 shape: product-type profit by supplier nation and year. No partsupp
# supplycost column, so profit = revenue - 5% of retail price x quantity
# (decimal-exact both engines).
# ---------------------------------------------------------------------------

_Q9_ORACLE = """
SELECT n.n_name AS nation,
       CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                - CAST(l.l_quantity AS DECIMAL(18,2))
                  * CAST(p.p_retailprice AS DECIMAL(18,2))
                  * CAST(0.05 AS DECIMAL(18,2))) AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%gear%'
GROUP BY n.n_name, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER)
ORDER BY nation, o_year DESC
"""


@query("q9_product_profit", oracle=_Q9_ORACLE,
       doc="TPC-H Q9 shape: profit by supplier nation and order year over "
           "LIKE-filtered parts; cost substitutes 5% of retailprice x qty "
           "(no partsupp in the driver schema).")
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    profit = (
        _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
        - _dec("l_quantity") * _dec("p_retailprice")
          * F.lit("0.05").cast("decimal(18,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(gated_broadcast(part), li.l_partkey == part.p_partkey)
        .join(gated_broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
        .repartition(1)
        .sortWithinPartitions("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q11 shape: important parts — per-part value with a HAVING threshold
# against a scalar fraction of the total. The scalar total rides a 1-row
# broadcast crossJoin (never a driver collect); the oracle uses the
# equivalent scalar subquery.
# ---------------------------------------------------------------------------

_Q11_ORACLE = """
WITH pv AS (
  SELECT l.l_partkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS value_dec
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_5'
  GROUP BY l.l_partkey
)
SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM pv
WHERE CAST(value_dec AS DOUBLE) > (SELECT CAST(SUM(value_dec) AS DOUBLE) * 0.002 FROM pv)
ORDER BY part_value DESC, l_partkey
"""


@query("q11_important_parts", oracle=_Q11_ORACLE,
       doc="TPC-H Q11 shape: per-part value HAVING > scalar fraction of "
           "the grand total; total joins back as a 1-row broadcast.")
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    pv = (
        li.join(gated_broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("value_dec"))
    )
    total = pv.agg((F.sum("value_dec").cast("double") * F.lit(0.002)).alias("threshold"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec").cast("double") > F.col("threshold"))
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
        .repartition(1)
        .sortWithinPartitions(F.col("part_value").desc(), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Q12 shape: shipping-priority counts — conditional CASE counts by category
# (l_linestatus stands in for the missing l_shipmode column).
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'N'
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
"""


@query("q12_shipping_priority_counts", oracle=_Q12_ORACLE,
       doc="TPC-H Q12 shape: per-category conditional priority counts "
           "(linestatus stands in for shipmode); filters pushed to the "
           "lineitem scan.")
def q12_shipping_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_returnflag") == "N")
        & (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01"))
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint")
             .alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint")
             .alias("low_line_count"),
        )
        .repartition(1).sortWithinPartitions("l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q13 shape: customer order-count distribution — LEFT OUTER join (customers
# with zero orders count at 0) followed by a second aggregation over the
# first's results.
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                     AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("q13_customer_distribution", oracle=_Q13_ORACLE,
       doc="TPC-H Q13 shape: double aggregation — orders per customer via "
           "LEFT OUTER join (zero-order customers kept), then the "
           "distribution of those counts.")
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .repartition(1)
        .sortWithinPartitions(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q15 shape: top supplier — quarterly revenue per supplier, then the
# supplier(s) achieving the maximum (decimal-exact, so the equality match
# is safe on both engines). The max rides a 1-row broadcast crossJoin.
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(r.total_dec AS DOUBLE) AS total_revenue
FROM supplier s
JOIN rev r ON r.l_suppkey = s.s_suppkey
WHERE r.total_dec = (SELECT MAX(total_dec) FROM rev)
ORDER BY s.s_suppkey
"""


@query("q15_top_supplier", oracle=_Q15_ORACLE,
       doc="TPC-H Q15 shape: per-supplier quarter revenue matched against "
           "the scalar max (decimal-exact equality); max broadcast as one "
           "row.")
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01"))
    supp = _t(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
             .alias("total_dec"))
    )
    mx = rev.agg(F.max("total_dec").alias("max_dec"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_dec") == F.col("max_dec"))
        .join(gated_broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name",
                F.col("total_dec").cast("double").alias("total_revenue"))
        .repartition(1).sortWithinPartitions("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q20 shape: nested-IN supplier promotion — suppliers whose shipped volume
# of a part family in a year exceeds a threshold, via two levels of IN
# (semi joins after decorrelation).
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
SELECT s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  WHERE l.l_partkey IN (
    SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
  )
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l.l_suppkey
  HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 400
)
ORDER BY s.s_name
"""


@query("q20_excess_volume_suppliers", oracle=_Q20_ORACLE,
       doc="TPC-H Q20 shape: two nested INs (part family -> qualifying "
           "suppliers) decorrelating to semi joins, HAVING over a "
           "decimal-exact quantity sum.")
def q20_excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01"))
    qualifying = (
        li.join(gated_broadcast(part.select("p_partkey")),
                li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 400)
        .select("l_suppkey")
    )
    return (
        supp.join(gated_broadcast(qualifying),
                  supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
        .repartition(1).sortWithinPartitions("s_name")
    )


# ---------------------------------------------------------------------------
# Q21 shape: suppliers who alone returned lines on multi-supplier finished
# orders — EXISTS + NOT EXISTS self-joins on lineitem. Identical SQL text
# runs on both engines; Catalyst plans the EXISTS pair as left-semi +
# left-anti joins on orderkey.
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n.n_name = 'NATION_7'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
"""


@query("q21_waiting_suppliers", oracle=_Q21_ORACLE,
       doc="TPC-H Q21 shape: EXISTS + NOT EXISTS lineitem self-joins "
           "(sole-returner detection) — identical correlated SQL on both "
           "engines modulo the final ORDER BY (single-partition local "
           "sort, no RangePartitioning); Catalyst emits semi + anti "
           "joins on orderkey.")
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    body = _Q21_ORACLE.rsplit("ORDER BY", 1)[0]
    return (spark.sql(body).repartition(1)
            .sortWithinPartitions(F.col("numwait").desc(), "s_name"))


# ---------------------------------------------------------------------------
# Q22 shape: global sales opportunity — customers above the average
# positive balance with no orders at all (scalar subquery + anti join).
# Identical SQL text on both engines.
# ---------------------------------------------------------------------------

_Q22_ORACLE = """
WITH pool AS (
  SELECT c.c_custkey, c.c_acctbal, n.n_name
  FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  WHERE n.n_name IN ('NATION_1', 'NATION_3', 'NATION_5', 'NATION_7')
)
SELECT n_name AS nation, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM pool p
WHERE p.c_acctbal > (
    SELECT AVG(c_acctbal) FROM pool WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = p.c_custkey
      AND o.o_orderdate >= TIMESTAMP '1999-01-01'
  )
GROUP BY n_name
ORDER BY nation
"""


@query("q22_sales_opportunity", oracle=_Q22_ORACLE,
       doc="TPC-H Q22 shape: above-average-balance customers dormant "
           "since 1999 — scalar AVG subquery + NOT EXISTS anti join, "
           "identical SQL text on both engines modulo the final ORDER BY "
           "(single-partition local sort, no RangePartitioning).")
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    body = _Q22_ORACLE.rsplit("ORDER BY", 1)[0]
    return spark.sql(body).repartition(1).sortWithinPartitions("nation")
