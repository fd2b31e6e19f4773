"""Source-decode queries (SURVEY.md §2.1): Kinesis base64+gzip, SNS
envelope extraction, S3 object record-splitting. Each synthesizes raw
source payloads from driver-table columns inside the plan, decodes them
with the real sources layer, and projects typed records; the oracle
computes the expected output directly from the source columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamalert_spark.queries import query
from streamalert_spark.session import read_table
from streamalert_spark.sources.decode import kinesis_decode, s3_records, sns_extract


# ---------------------------------------------------------------- Kinesis

_KINESIS_ORACLE = """
SELECT event_id, event_type, (event_id % 2 = 1) AS was_compressed
FROM events
ORDER BY event_id
"""


@query("source_kinesis_decode", oracle=_KINESIS_ORACLE,
       doc="Kinesis record decode: unbase64 + transparent gzip fallback "
           "(kinesis.py:33-59); only gzip rows leave the JVM.")
def source_kinesis_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import base64
    import gzip

    import pandas as pd

    ev = read_table(spark, sf_dir, "events").select("event_id", "event_type")

    # synthesize the wire format: odd ids gzip-compressed, even ids plain
    def synth(batches):
        for pdf in batches:
            datas = []
            for eid, etype in zip(pdf["event_id"], pdf["event_type"]):
                body = f'{{"event_id": "{eid}", "event_type": "{etype}"}}'.encode()
                if eid % 2 == 1:
                    body = gzip.compress(body, mtime=0)
                datas.append(base64.b64encode(body).decode("ascii"))
            yield pd.DataFrame({"event_id": pdf["event_id"], "data": datas})

    wire = ev.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        synth, schema="event_id bigint, data string")
    decoded = kinesis_decode(wire, data_col="data", out_col="value")
    rec = F.from_json("value", "event_id string, event_type string")
    return decoded.select(
        rec["event_id"].cast("bigint").alias("event_id"),
        rec["event_type"].alias("event_type"),
        "was_compressed",
    ).repartition(1).sortWithinPartitions("event_id")


# ---------------------------------------------------------------- SNS

_SNS_ORACLE = """
SELECT event_id, event_type
FROM events
ORDER BY event_id
"""


@query("source_sns_extract", oracle=_SNS_ORACLE,
       doc="SNS notification unwrap: Sns.Message extraction (sns.py:31-51).")
def source_sns_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    inner = F.to_json(F.struct(
        F.col("event_id").cast("string").alias("event_id"),
        F.col("event_type"),
    ))
    notif = ev.select(F.to_json(F.struct(
        F.struct(inner.alias("Message")).alias("Sns"),
    )).alias("value"))
    out = sns_extract(notif, record_col="value", out_col="message")
    rec = F.from_json("message", "event_id string, event_type string")
    return out.select(
        rec["event_id"].cast("bigint").alias("event_id"),
        rec["event_type"].alias("event_type"),
    ).repartition(1).sortWithinPartitions("event_id")


# ---------------------------------------------------------------- S3 objects

_S3_ORACLE = """
SELECT c_custkey, c_name
FROM customer
ORDER BY c_custkey
"""


@query("source_s3_records", oracle=_S3_ORACLE,
       doc="S3 object record-splitting: whole-file JSON array vs JSON-lines "
           "fallback, one native explode (s3.py:139-174).")
def source_s3_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    line = F.to_json(F.struct(
        F.col("c_custkey").cast("string").alias("k"),
        F.col("c_name").alias("name"),
    ))
    # one synthetic S3 object per nation: even nations store a whole-file
    # JSON array, odd nations store JSON-lines
    files = (
        cust.groupBy("c_nationkey")
        .agg(F.sort_array(F.collect_list(line)).alias("lines"))
        .select(
            F.when(
                F.col("c_nationkey") % 2 == 0,
                F.concat(F.lit("["), F.array_join("lines", ","), F.lit("]")),
            ).otherwise(F.array_join("lines", "\n")).alias("content")
        )
    )
    recs = s3_records(files, content_col="content", out_col="value")
    rec = F.from_json("value", "k string, name string")
    return recs.select(
        rec["k"].cast("bigint").alias("c_custkey"),
        rec["name"].alias("c_name"),
    ).repartition(1).sortWithinPartitions("c_custkey")


_APP_BACKFILL_ORACLE = """
SELECT '{"event_id": "ev-' || i || '", "result": "SUCCESS", "timestamp": '
         || i || '}' AS record,
       'synthetic:synthetic' AS log_type,
       CAST(i AS BIGINT) AS event_timestamp
FROM range(1, 251) t(i)
ORDER BY event_timestamp
"""


@query("app_source_backfill", oracle=_APP_BACKFILL_ORACLE,
       doc="App-source poller batch backfill through the Spark Python "
           "DataSource (format streamalert_app): the reference's "
           "successive-invocation gather chain (apps/app_base.py:236-258) "
           "run to exhaustion in one bounded loop; the deterministic "
           "synthetic app makes the records oracle-checkable.")
def app_source_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.sources.app_source import register_app_source

    register_app_source(spark)
    df = (
        spark.read.format("streamalert_app")
        .option("app", "synthetic").option("end_timestamp", "250")
        .load()
    )
    return df.repartition(1).sortWithinPartitions("event_timestamp")
