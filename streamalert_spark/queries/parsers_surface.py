"""Parser-surface queries: CSV / KV / syslog / JSON-envelope classification
run through the REAL parser + classifier machinery, oracle-checked.

Each query synthesizes raw payload strings from a driver table's columns
inside the plan (so the whole thing stays deterministic), classifies them
with the engine, and projects the typed records. The oracle computes the
expected typed output directly from the source columns — if parsing,
strict validation, or coercion drifts, the hashes diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamalert_spark.classify.classifier import Classifier
from streamalert_spark.queries import query
from streamalert_spark.schema.registry import LogSchema, SchemaRegistry
from streamalert_spark.session import read_table


def _classify(df: DataFrame, schema: LogSchema, keep: list[str]):
    reg = SchemaRegistry()
    reg.register(schema)
    return Classifier(reg).classify(df, raw_col="payload", keep_cols=keep)


# ---------------------------------------------------------------- CSV

_CSV_ORACLE = """
SELECT
  l_orderkey AS src_key,
  CAST(l_orderkey AS BIGINT) AS orderkey,
  CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS quantity,
  l_returnflag AS returnflag,
  CAST(l_linenumber AS BIGINT) AS linenumber
FROM lineitem
ORDER BY src_key, linenumber
"""


@query("parse_csv_strict", oracle=_CSV_ORACLE,
       doc="CSV parse with strict column count + integer/float coercion (parsers.py:625-745).")
def parse_csv_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    payload = F.concat_ws(
        ",",
        F.col("l_orderkey").cast("string"),
        F.col("l_quantity").cast("string"),
        F.col("l_returnflag"),
        F.col("l_linenumber").cast("string"),
    )
    df = li.select(F.col("l_orderkey").alias("src_key"), payload.alias("payload"))
    schema = LogSchema(
        name="csv:lineitem",
        schema={"orderkey": "integer", "quantity": "float",
                "returnflag": "string", "linenumber": "integer"},
        parser="csv",
    )
    batch = _classify(df, schema, keep=["src_key"])
    out = batch.by_log_type["csv:lineitem"]
    return out.select(
        "src_key",
        F.col("record.orderkey").alias("orderkey"),
        F.col("record.quantity").alias("quantity"),
        F.col("record.returnflag").alias("returnflag"),
        F.col("record.linenumber").alias("linenumber"),
    ).repartition(1).sortWithinPartitions("src_key", "linenumber")


_CSV_MULTILINE_ORACLE = """
SELECT
  CAST(o_orderkey AS BIGINT) AS orderkey,
  o_orderstatus AS status,
  CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE) AS price
FROM orders
ORDER BY orderkey
"""


@query("parse_csv_multiline", oracle=_CSV_MULTILINE_ORACLE,
       doc="Multi-line CSV payloads: one payload per customer holding one "
           "CSV line per order; the parser yields one record per line "
           "(parsers.py:705-712).")
def parse_csv_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    line = F.concat_ws(
        ",",
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("string"),
    )
    payloads = (
        orders.select(F.col("o_custkey").alias("cust"), line.alias("line"))
        .groupBy("cust")
        .agg(F.array_join(F.collect_list("line"), "\n").alias("payload"))
    )
    schema = LogSchema(
        name="csv:orders",
        schema={"orderkey": "integer", "status": "string", "price": "float"},
        parser="csv",
    )
    batch = _classify(payloads, schema, keep=[])
    return (
        batch.by_log_type["csv:orders"]
        .select(
            F.col("record.orderkey").alias("orderkey"),
            F.col("record.status").alias("status"),
            F.col("record.price").alias("price"),
        )
        .repartition(1).sortWithinPartitions("orderkey")
    )


# ---------------------------------------------------------------- KV

_KV_ORACLE = """
SELECT
  o_orderkey AS src_key,
  CAST(o_orderkey AS BIGINT) AS orderkey,
  o_orderstatus AS status,
  CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE) AS price
FROM orders
ORDER BY src_key
"""


@query("parse_kv", oracle=_KV_ORACLE,
       doc="Key-value parse via str_to_map with strict field count (parsers.py:748-812).")
def parse_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    payload = F.concat_ws(
        " ",
        F.concat(F.lit("orderkey="), F.col("o_orderkey").cast("string")),
        F.concat(F.lit("status="), F.col("o_orderstatus")),
        F.concat(F.lit("price="), F.col("o_totalprice").cast("string")),
    )
    df = orders.select(F.col("o_orderkey").alias("src_key"), payload.alias("payload"))
    schema = LogSchema(
        name="kv:orders",
        schema={"orderkey": "integer", "status": "string", "price": "float"},
        parser="kv",
        configuration={"delimiter": " ", "separator": "="},
    )
    batch = _classify(df, schema, keep=["src_key"])
    return batch.by_log_type["kv:orders"].select(
        "src_key",
        F.col("record.orderkey").alias("orderkey"),
        F.col("record.status").alias("status"),
        F.col("record.price").alias("price"),
    ).repartition(1).sortWithinPartitions("src_key")


# ---------------------------------------------------------------- syslog

_SYSLOG_ORACLE = """
SELECT
  n_nationkey AS src_key,
  'Jan 10 19:35:33' AS timestamp,
  'host-' || CAST(n_nationkey AS VARCHAR) AS host,
  'natsvc' AS application,
  'nation ' || n_name || ' checked in' AS message
FROM nation
ORDER BY src_key
"""


@query("parse_syslog", oracle=_SYSLOG_ORACLE,
       doc="Syslog regex parse into timestamp/host/application/message (parsers.py:815-844).")
def parse_syslog(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_table(spark, sf_dir, "nation")
    payload = F.concat(
        F.lit("Jan 10 19:35:33 host-"), F.col("n_nationkey").cast("string"),
        F.lit(" natsvc[42]: nation "), F.col("n_name"), F.lit(" checked in"),
    )
    df = nation.select(F.col("n_nationkey").alias("src_key"), payload.alias("payload"))
    schema = LogSchema(
        name="syslog:nation",
        schema={"timestamp": "string", "host": "string",
                "application": "string", "message": "string"},
        parser="syslog",
    )
    batch = _classify(df, schema, keep=["src_key"])
    return batch.by_log_type["syslog:nation"].select(
        "src_key",
        F.col("record.timestamp").alias("timestamp"),
        F.col("record.host").alias("host"),
        F.col("record.application").alias("application"),
        F.col("record.message").alias("message"),
    ).repartition(1).sortWithinPartitions("src_key")


# ---------------------------------------------------------------- JSON envelope + json_path explode

_ENVELOPE_ORACLE = """
SELECT src_key, event_id, event_type, log_group FROM (
  SELECT event_id AS src_key, CAST(event_id AS BIGINT) AS event_id,
         event_type, 'grp-' || CAST(user_id AS VARCHAR) AS log_group
  FROM events
  UNION ALL
  SELECT event_id AS src_key, CAST(event_id + 1000000000 AS BIGINT) AS event_id,
         event_type, 'grp-' || CAST(user_id AS VARCHAR) AS log_group
  FROM events
) t
ORDER BY src_key, event_id
"""


# ------------------------------------------------------- json_regex_key

_REGEX_KEY_ORACLE = """
SELECT
  event_id AS src_key,
  CAST(event_id AS BIGINT) AS event_id,
  event_type
FROM events
ORDER BY src_key
"""


@query("json_regex_key_extract", oracle=_REGEX_KEY_ORACLE,
       doc="json_regex_key: regex-extract a JSON blob embedded in a free-text "
           "field, then strict-parse it (parsers.py:520,565-593).")
def json_regex_key_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    inner = F.to_json(F.struct(
        F.col("event_id").cast("string").alias("event_id"),
        F.col("event_type"),
    ))
    payload = F.to_json(F.struct(
        F.concat(
            F.lit("user activity for host "), F.col("user_id").cast("string"),
            F.lit(" detected: "), inner, F.lit(" end of line"),
        ).alias("message"),
        F.lit("INFO").alias("level"),
    ))
    df = ev.select(F.col("event_id").alias("src_key"), payload.alias("payload"))
    schema = LogSchema(
        name="app:embedded",
        schema={"event_id": "integer", "event_type": "string"},
        configuration={"json_regex_key": "message"},
    )
    batch = _classify(df, schema, keep=["src_key"])
    return batch.by_log_type["app:embedded"].select(
        "src_key",
        F.col("record.event_id").alias("event_id"),
        F.col("record.event_type").alias("event_type"),
    ).repartition(1).sortWithinPartitions("src_key")


@query("parse_json_envelope_explode", oracle=_ENVELOPE_ORACLE,
       doc="CloudWatch-style envelope: json_path logEvents[*].message explode "
           "+ embedded JSON + envelope keys (parsers.py:410-448,565-593).")
def parse_json_envelope_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    inner1 = F.to_json(F.struct(
        F.col("event_id").cast("string").alias("event_id"),
        F.col("event_type"),
    ))
    inner2 = F.to_json(F.struct(
        (F.col("event_id") + 1000000000).cast("string").alias("event_id"),
        F.col("event_type"),
    ))
    payload = F.to_json(F.struct(
        F.concat(F.lit("grp-"), F.col("user_id").cast("string")).alias("logGroup"),
        F.array(
            F.struct(inner1.alias("message")),
            F.struct(inner2.alias("message")),
        ).alias("logEvents"),
    ))
    df = ev.select(F.col("event_id").alias("src_key"), payload.alias("payload"))
    schema = LogSchema(
        name="cloudwatch:inner",
        schema={"event_id": "integer", "event_type": "string"},
        configuration={
            "json_path": "logEvents[*].message",
            "embedded_json": True,
            "envelope_keys": {"logGroup": "string"},
        },
    )
    batch = _classify(df, schema, keep=["src_key"])
    return batch.by_log_type["cloudwatch:inner"].select(
        "src_key",
        F.col("record.event_id").alias("event_id"),
        F.col("record.event_type").alias("event_type"),
        F.col("streamalert_envelope_keys.logGroup").alias("log_group"),
    ).repartition(1).sortWithinPartitions("src_key", "event_id")


# ------------------------------------------- jmespath filter / slice paths

_JP_FILTER_ORACLE = """
SELECT src_key, event_id, event_type
FROM (
  SELECT event_id AS src_key, CAST(event_id AS BIGINT) AS event_id, event_type
  FROM events
  UNION ALL
  SELECT event_id AS src_key, CAST(event_id + 1000000000 AS BIGINT) AS event_id,
         event_type
  FROM events
) t
ORDER BY src_key, event_id
"""


@query("parse_json_path_filter", oracle=_JP_FILTER_ORACLE,
       doc="json_path with a jmespath FILTER projection "
           "(items[?level == 'error'].payload): the subset compiler "
           "(parsers/jmespath_subset.py) turns the filter into an "
           "explode + native predicate, so only matching elements reach "
           "strict classification — mirrors jmespath.search in the "
           "reference's record extraction (classifier/parsers.py:429-448) "
           "without leaving the JVM.")
def parse_json_path_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")

    def item(level: str, offset: int):
        return F.struct(
            F.lit(level).alias("level"),
            F.struct(
                (F.col("event_id") + offset).cast("string").alias("event_id"),
                F.col("event_type"),
            ).alias("payload"),
        )

    payload = F.to_json(F.struct(F.array(
        item("error", 0),
        item("info", 500000000),
        item("error", 1000000000),
    ).alias("items")))
    df = ev.select(F.col("event_id").alias("src_key"), payload.alias("payload"))
    schema = LogSchema(
        name="app:error_items",
        schema={"event_id": "integer", "event_type": "string"},
        configuration={"json_path": "items[?level == 'error'].payload"},
    )
    batch = _classify(df, schema, keep=["src_key"])
    return batch.by_log_type["app:error_items"].select(
        "src_key",
        F.col("record.event_id").alias("event_id"),
        F.col("record.event_type").alias("event_type"),
    ).repartition(1).sortWithinPartitions("src_key", "event_id")


_JP_SLICE_ORACLE = """
SELECT src_key, event_id, event_type
FROM (
  SELECT event_id AS src_key, CAST(event_id + 1000000000 AS BIGINT) AS event_id,
         event_type
  FROM events
  UNION ALL
  SELECT event_id AS src_key, CAST(event_id + 2000000000 AS BIGINT) AS event_id,
         event_type
  FROM events
) t
ORDER BY src_key, event_id
"""


@query("parse_json_path_slice", oracle=_JP_SLICE_ORACLE,
       doc="json_path chaining an INDEX and a SLICE projection "
           "(batches[-1].items[1:3].payload): negative index via "
           "try_element_at, slice bounds resolved against the runtime "
           "array size, each surviving element classified strictly — "
           "the jmespath grammar beyond [*] compiled to native "
           "posexplode + bound predicates.")
def parse_json_path_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")

    def item(offset: int):
        return F.struct(F.struct(
            (F.col("event_id") + offset).cast("string").alias("event_id"),
            F.col("event_type"),
        ).alias("payload"))

    batch_items = F.struct(F.array(
        item(0), item(1000000000), item(2000000000), item(3000000000),
    ).alias("items"))
    decoy = F.struct(F.array(item(7000000000)).alias("items"))
    payload = F.to_json(F.struct(
        F.array(decoy, batch_items).alias("batches")))
    df = ev.select(F.col("event_id").alias("src_key"), payload.alias("payload"))
    schema = LogSchema(
        name="app:sliced_items",
        schema={"event_id": "integer", "event_type": "string"},
        configuration={"json_path": "batches[-1].items[1:3].payload"},
    )
    batch = _classify(df, schema, keep=["src_key"])
    return batch.by_log_type["app:sliced_items"].select(
        "src_key",
        F.col("record.event_id").alias("event_id"),
        F.col("record.event_type").alias("event_type"),
    ).repartition(1).sortWithinPartitions("src_key", "event_id")
