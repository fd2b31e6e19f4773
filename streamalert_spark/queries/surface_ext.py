"""Reference-surface extension queries: CIDR exclusion, log_patterns
routing, optional-key backfill with boolean coercion, and nested
CSV-in-CSV columns — each through the real engine modules, oracle-checked.

Reference citations: CIDR exclusion threat_intel.py:272-291 +
shared/utils.py:32-54; log_patterns parsers.py:173-221; optional backfill
parsers.py:138-171; boolean semantics parsers.py:349-350; nested CSV
parsers.py:732-740.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamalert_spark.classify.classifier import Classifier
from streamalert_spark.enrich.threat_intel import in_any_cidr, ipv4_to_long
from streamalert_spark.queries import query
from streamalert_spark.schema.registry import LogSchema, SchemaRegistry
from streamalert_spark.session import read_table


def _classify(df: DataFrame, schema: LogSchema, keep: list[str]):
    reg = SchemaRegistry()
    reg.register(schema)
    return Classifier(reg).classify(df, raw_col="payload", keep_cols=keep)


# ---------------------------------------------------------------- CIDR exclusion

_CIDR_ORACLE = """
SELECT c_custkey,
       '10.' || CAST(c_custkey % 256 AS VARCHAR) || '.0.' || CAST(c_custkey % 100 AS VARCHAR) AS ip,
       CAST(10 * 16777216 + (c_custkey % 256) * 65536 + (c_custkey % 100) AS BIGINT) AS ip_long
FROM customer
WHERE (c_custkey % 256) NOT IN (5, 17)
ORDER BY c_custkey
"""


@query("cidr_exclusion_filter", oracle=_CIDR_ORACLE,
       doc="IPv4->int64 + CIDR allowlist exclusion as native range predicates "
           "(threat_intel.py:272-291, utils.py:32-54).")
def cidr_exclusion_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    ip = F.concat_ws(
        ".",
        F.lit("10"), (F.col("c_custkey") % 256).cast("string"),
        F.lit("0"), (F.col("c_custkey") % 100).cast("string"),
    )
    df = cust.select("c_custkey", ip.alias("ip"))
    ip_long = ipv4_to_long(F.col("ip"))
    return (
        df.select("c_custkey", "ip", ip_long.alias("ip_long"))
        .filter(~in_any_cidr(F.col("ip_long"), ["10.5.0.0/16", "10.17.0.0/16"]))
        .repartition(1).sortWithinPartitions("c_custkey")
    )


# ---------------------------------------------------------------- log_patterns

_PATTERNS_ORACLE = """
SELECT p_partkey, p_name AS name, p_type AS type
FROM part
WHERE (p_type LIKE 'ECON%' OR p_type LIKE '%ALL') AND p_name LIKE '%a%'
ORDER BY p_partkey
"""


@query("log_patterns_route", oracle=_PATTERNS_ORACLE,
       doc="fnmatch log_patterns filter translated to native LIKE "
           "(ANY-of per field, parsers.py:173-221).")
def log_patterns_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    payload = F.to_json(F.struct(F.col("p_name").alias("name"), F.col("p_type").alias("type")))
    df = part.select(F.col("p_partkey").alias("src_key"), payload.alias("payload"))
    schema = LogSchema(
        name="parts:typed",
        schema={"name": "string", "type": "string"},
        configuration={"log_patterns": {"type": ["ECON*", "*ALL"], "name": ["*a*"]}},
    )
    batch = _classify(df, schema, keep=["src_key"])
    return batch.by_log_type["parts:typed"].select(
        F.col("src_key").alias("p_partkey"),
        F.col("record.name").alias("name"),
        F.col("record.type").alias("type"),
    ).repartition(1).sortWithinPartitions("p_partkey")


# ------------------------------------------- optional backfill + boolean coercion

_BACKFILL_ORACLE = """
SELECT o_orderkey AS src_key,
       CAST(o_orderkey AS VARCHAR) AS k,
       (o_orderkey % 3 = 0 AND o_orderkey % 2 = 0) AS active,
       '' AS note
FROM orders
ORDER BY src_key
"""


@query("optional_backfill_bool", oracle=_BACKFILL_ORACLE,
       doc="Optional-key backfill defaults + lenient boolean coercion "
           "str(v).lower()=='true' (parsers.py:138-171,349-350).")
def optional_backfill_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey").cast("string").alias("k")
    active = F.when(F.col("o_orderkey") % 2 == 0, "True").otherwise("no").alias("active")
    payload = F.when(
        F.col("o_orderkey") % 3 == 0, F.to_json(F.struct(k, active))
    ).otherwise(F.to_json(F.struct(k)))
    df = orders.select(F.col("o_orderkey").alias("src_key"), payload.alias("payload"))
    schema = LogSchema(
        name="orders:flagged",
        schema={"k": "string", "active": "boolean", "note": "string"},
        configuration={"optional_top_level_keys": ["active", "note"]},
    )
    batch = _classify(df, schema, keep=["src_key"])
    return batch.by_log_type["orders:flagged"].select(
        "src_key",
        F.col("record.k").alias("k"),
        F.col("record.active").alias("active"),
        F.col("record.note").alias("note"),
    ).repartition(1).sortWithinPartitions("src_key")


# ---------------------------------------------------------------- nested CSV

_NESTED_CSV_ORACLE = """
SELECT l_orderkey AS okey,
       CAST(l_linenumber AS BIGINT) AS lnum,
       l_returnflag AS flag,
       CAST(CAST(l_quantity AS INT) AS BIGINT) AS qty
FROM lineitem
ORDER BY okey, lnum
"""


@query("nested_csv_column", oracle=_NESTED_CSV_ORACLE,
       doc="CSV schema with a nested CSV column: quoted sub-record re-parsed "
           "into typed sub-fields (parsers.py:732-740).")
def nested_csv_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    payload = F.concat(
        F.col("l_orderkey").cast("string"), F.lit(","),
        F.col("l_linenumber").cast("string"), F.lit(',"'),
        F.col("l_returnflag"), F.lit(","),
        F.col("l_quantity").cast("int").cast("string"), F.lit('"'),
    )
    df = li.select(F.col("l_orderkey").alias("src_key"), payload.alias("payload"))
    schema = LogSchema(
        name="csv:nested",
        schema={"okey": "integer", "lnum": "integer",
                "sub": {"flag": "string", "qty": "integer"}},
        parser="csv",
    )
    batch = _classify(df, schema, keep=["src_key"])
    return batch.by_log_type["csv:nested"].select(
        F.col("record.okey").alias("okey"),
        F.col("record.lnum").alias("lnum"),
        F.col("record.sub.flag").alias("flag"),
        F.col("record.sub.qty").alias("qty"),
    ).repartition(1).sortWithinPartitions("okey", "lnum")


# ------------------------------------------------ longest-prefix-match enrich

_LPM_ORACLE = """
WITH rt AS (
  SELECT CAST(10 * 16777216 + t * 65536 AS BIGINT) AS net,
         CAST(16 AS BIGINT) AS len,
         'pop-' || CAST(t AS VARCHAR) || '-16' AS next_hop
  FROM range(0, 16) s(t)
  UNION ALL
  SELECT CAST(10 * 16777216 + t * 65536 + t * 256 AS BIGINT), 24,
         'pop-' || CAST(t AS VARCHAR) || '-24'
  FROM range(0, 16) s(t)
  UNION ALL
  SELECT CAST(10 * 16777216 AS BIGINT), 8, 'core'
),
ips AS (
  SELECT c_custkey,
         CAST(10 * 16777216 + (c_custkey % 32) * 65536
              + (c_custkey % 20) * 256 + (c_custkey % 100) AS BIGINT)
           AS ip_long
  FROM customer
),
cand AS (
  SELECT i.c_custkey, i.ip_long, l.len,
         (i.ip_long // CAST(power(2, 32 - l.len) AS BIGINT))
           * CAST(power(2, 32 - l.len) AS BIGINT) AS net
  FROM ips i, (VALUES (CAST(8 AS BIGINT)), (16), (24)) l(len)
),
hits AS (
  SELECT c.c_custkey, c.ip_long, c.len, rt.next_hop,
         ROW_NUMBER() OVER (PARTITION BY c.c_custkey, c.ip_long
                            ORDER BY c.len DESC) AS rn
  FROM cand c JOIN rt ON rt.net = c.net AND rt.len = c.len
)
SELECT c_custkey, ip_long, CAST(len AS BIGINT) AS prefix_len, next_hop
FROM hits WHERE rn = 1
ORDER BY c_custkey
"""


@query("lpm_route_enrich", oracle=_LPM_ORACLE,
       doc="Longest-prefix-match IP routing enrich — the classic "
           "netflow/firewall attribution join SQL engines lack a native "
           "operator for. Scale shape: instead of a range join against "
           "the routing table (O(rows x prefixes) nested loop), every "
           "IP expands to its CANDIDATE network per table prefix "
           "LENGTH (here /8, /16, /24 — real tables have <= 25 distinct "
           "lengths) and equi-joins the broadcast table on (net, len); "
           "the winner is a per-key top-1 window on descending length. "
           "Masking is pure integer divide-multiply, no bit ops with "
           "engine-specific sign behavior. IPs that match only the /8 "
           "default route resolve to 'core', proving fall-through.")
def lpm_route_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = spark.range(0, 16).select(F.col("id").alias("t"))
    rt16 = t.select(
        (F.lit(10 * 16777216) + F.col("t") * 65536).cast("bigint")
        .alias("net"),
        F.lit(16).cast("bigint").alias("len"),
        F.concat(F.lit("pop-"), F.col("t").cast("string"), F.lit("-16"))
        .alias("next_hop"))
    rt24 = t.select(
        (F.lit(10 * 16777216) + F.col("t") * 65536 + F.col("t") * 256)
        .cast("bigint").alias("net"),
        F.lit(24).cast("bigint").alias("len"),
        F.concat(F.lit("pop-"), F.col("t").cast("string"), F.lit("-24"))
        .alias("next_hop"))
    rt8 = spark.range(1).select(
        F.lit(10 * 16777216).cast("bigint").alias("net"),
        F.lit(8).cast("bigint").alias("len"),
        F.lit("core").alias("next_hop"))
    rt = rt16.unionByName(rt24).unionByName(rt8)

    ips = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.lit(10 * 16777216) + (F.col("c_custkey") % 32) * 65536
         + (F.col("c_custkey") % 20) * 256 + (F.col("c_custkey") % 100))
        .cast("bigint").alias("ip_long"))
    cand = (ips
            .crossJoin(F.broadcast(
                spark.range(1).select(F.expr(
                    "CAST(array(8, 16, 24) AS array<bigint>)")
                    .alias("lens"))))
            .select("c_custkey", "ip_long",
                    F.explode("lens").alias("len"))
            .withColumn(
                "net",
                F.expr("(ip_long DIV CAST(pow(2, 32 - len) AS BIGINT)) "
                       "* CAST(pow(2, 32 - len) AS BIGINT)")))
    hits = cand.join(F.broadcast(rt), ["net", "len"])
    w = W.partitionBy("c_custkey", "ip_long").orderBy(F.col("len").desc())
    return (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "ip_long",
                F.col("len").alias("prefix_len"), "next_hop")
        .repartition(1).sortWithinPartitions("c_custkey")
    )
