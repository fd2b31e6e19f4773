"""Alert model — the public schema of the alerts table.

Field parity with the reference Alert's dynamo/output record
(streamalert/shared/alert.py:27-242; output_dict at alert.py:212-242;
Athena alerts table DDL from a synthetic alert at
streamalert_cli/athena/helpers.py:178-189). Timestamps use the reference's
'%Y-%m-%dT%H:%M:%S.%fZ' format (alert.py:35); the dt partition column is
'YYYY-MM-DD-HH' (athena_partitioner/main.py:41-59).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

ALERT_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"   # alert.py:35 strftime %fZ
DT_PARTITION_FMT = "yyyy-MM-dd-HH"                  # athena_partitioner/main.py:41-59

ALERT_SCHEMA = T.StructType([
    T.StructField("id", T.StringType(), False),
    T.StructField("rule_name", T.StringType(), False),
    T.StructField("rule_description", T.StringType(), True),
    T.StructField("record", T.StringType(), True),          # JSON text of the triggering record
    T.StructField("outputs", T.ArrayType(T.StringType()), True),
    T.StructField("created", T.StringType(), True),
    T.StructField("cluster", T.StringType(), True),
    T.StructField("context", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("log_source", T.StringType(), True),
    T.StructField("log_type", T.StringType(), True),
    T.StructField("publishers", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("source_entity", T.StringType(), True),
    T.StructField("source_service", T.StringType(), True),
    T.StructField("staged", T.BooleanType(), True),
    T.StructField("merge_by_keys", T.ArrayType(T.StringType()), True),
    T.StructField("merge_window_mins", T.LongType(), True),
    T.StructField("dt", T.StringType(), True),
])


def alert_columns(
    rule,
    record_json: Column,
    event_time: Column,
    cluster: str = "",
    source_service: str = "",
    source_entity: str = "",
    log_type: str = "",
    alert_id: Column | None = None,
    staged: bool = False,
    outputs_override: Column | None = None,
) -> list[Column]:
    """Projection list building one alert row from a triggering record
    (reference _rule_analysis -> Alert(...), rules_engine.py:183-217).
    outputs_override replaces the rule's static outputs (staging gate /
    dynamic outputs)."""
    aid = alert_id if alert_id is not None else F.uuid()
    created = F.date_format(event_time, ALERT_TS_FMT)
    ctx = (
        F.create_map(*[x for k, v in (rule.context or {}).items()
                       for x in (F.lit(k), F.lit(str(v)))])
        if rule.context else F.lit(None).cast("map<string,string>")
    )
    outputs = (
        outputs_override
        if outputs_override is not None
        else F.array(*[F.lit(o) for o in rule.outputs]).cast("array<string>")
    )
    return [
        aid.cast("string").alias("id"),
        F.lit(rule.name).alias("rule_name"),
        F.lit(rule.description).alias("rule_description"),
        record_json.alias("record"),
        outputs.alias("outputs"),
        created.alias("created"),
        F.lit(cluster).alias("cluster"),
        ctx.alias("context"),
        F.lit(source_entity).alias("log_source"),
        F.lit(log_type).alias("log_type"),
        F.lit(None).cast("map<string,string>").alias("publishers"),
        F.lit(source_entity).alias("source_entity"),
        F.lit(source_service).alias("source_service"),
        F.lit(staged).alias("staged"),
        F.array(*[F.lit(k) for k in rule.merge_by_keys]).cast("array<string>").alias("merge_by_keys"),
        F.lit(rule.merge_window_mins).cast("bigint").alias("merge_window_mins"),
        F.date_format(event_time, DT_PARTITION_FMT).alias("dt"),
    ]
