"""Pipeline-surface queries: classification, normalization, artifacts,
rules, threat-intel, lookup enrichment, alert merge — each run through the
real engine modules over the driver's tables, with a DuckDB oracle.

The streaming forms of these operators are exercised in tests/; these batch
queries prove the operator *semantics* against an independent engine.
Determinism: record/alert ids are md5 of the event id (the reference uses
uuid4 — normalize.py:178, alert.py:125 — which can't be oracle-checked);
timestamps format through the reference's '%Y-%m-%dT%H:%M:%S.%fZ'.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamalert_spark.classify.classifier import Classifier
from streamalert_spark.enrich.lookup_tables import LookupTables
from streamalert_spark.enrich.threat_intel import ThreatIntel
from streamalert_spark.normalize.artifacts import extract_artifacts
from streamalert_spark.normalize.normalizer import NormalizationSpec, Normalizer, PathSpec
from streamalert_spark.queries import query
from streamalert_spark.rules.engine import RulesEngine
from streamalert_spark.rules.registry import Rule, RuleRegistry
from streamalert_spark.schema.registry import LogSchema, SchemaRegistry
from streamalert_spark.session import local_rows_df


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.session import read_table

    return read_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# Classification: events.props is a raw JSON payload; declared schema
# {k: integer}; strict key-set + integer coercion (classifier.py:116-149,
# parsers.py:244-272,294-369).
# ---------------------------------------------------------------------------

_CLASSIFY_ORACLE = """
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
  'events:props' AS log_schema_type
FROM events
WHERE json_keys(props) = ['k']
  AND CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
ORDER BY event_id
"""


def _props_registry() -> SchemaRegistry:
    reg = SchemaRegistry()
    reg.register(LogSchema(name="events:props", schema={"k": "integer"}, parser="json"))
    return reg


@query("classify_strict_json", oracle=_CLASSIFY_ORACLE,
       doc="JSON classification with strict key-set equality and integer coercion.")
def classify_strict_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    clf = Classifier(_props_registry())
    batch = clf.classify(ev, raw_col="props", keep_cols=["event_id"])
    out = batch.by_log_type["events:props"]
    return (
        out.select("event_id", F.col("record.k").alias("k"), "log_schema_type")
        .repartition(1).sortWithinPartitions("event_id")
    )


# ---------------------------------------------------------------------------
# Rules engine: a native-expression rule over classified events.
# Routing filter + native predicate, alert-row construction
# (rules_engine.py:183-217,484-499).
# ---------------------------------------------------------------------------

_RULE_ORACLE = """
SELECT
  md5(CAST(event_id AS VARCHAR)) AS id,
  'high_value_error' AS rule_name,
  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%fZ') AS created,
  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d-%H') AS dt,
  event_id,
  user_id
FROM events
WHERE event_type = 'error' AND value >= 15.0
ORDER BY event_id
"""


def _rules_registry() -> RuleRegistry:
    reg = RuleRegistry()
    reg.add(Rule(
        name="high_value_error",
        expr=lambda record: (record["event_type"] == "error") & (record["value"] >= 15.0),
        logs=["events:stream"],
        outputs=["slack:alerts"],
        merge_by_keys=["user_id"],
        merge_window_mins=60,
        description="error events with value >= 15",
    ))
    return reg


@query("rule_alerts_native", oracle=_RULE_ORACLE,
       doc="Native-expression rule -> alert rows with reference timestamp/dt formats.")
def rule_alerts_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    records = ev.select(
        F.struct("event_id", "user_id", "event_type", "value").alias("record"),
        F.col("ts"),
        F.col("event_id"),
    )
    engine = RulesEngine(_rules_registry())
    alerts = engine.run(
        records,
        log_type="events:stream",
        event_time=F.col("ts"),
        alert_id=F.md5(F.col("event_id").cast("string")),
    )
    return (
        alerts.select(
            "id", "rule_name", "created", "dt",
            F.get_json_object("record", "$.event_id").cast("bigint").alias("event_id"),
            F.get_json_object("record", "$.user_id").cast("bigint").alias("user_id"),
        )
        .repartition(1).sortWithinPartitions("event_id")
    )


# ---------------------------------------------------------------------------
# Normalization + artifact extraction (normalize.py:175-219,
# artifact_extractor.py:101-188): conditioned path extraction, exploded to
# flat artifact rows.
# ---------------------------------------------------------------------------

_ARTIFACTS_ORACLE = """
WITH rec AS (
  SELECT md5(CAST(event_id AS VARCHAR)) AS streamalert_record_id,
         CAST(user_id AS VARCHAR) AS user_id, event_type,
         json_extract_string(props, '$.k') AS k
  FROM events
)
SELECT 'user identity' AS function, streamalert_record_id,
       'events:stream' AS source_type, 'userName' AS type, user_id AS value
FROM rec WHERE user_id IS NOT NULL
UNION ALL
SELECT 'metric value' AS function, streamalert_record_id,
       'events:stream' AS source_type, 'metric' AS type, k AS value
FROM rec WHERE k IS NOT NULL
UNION ALL
SELECT 'error type' AS function, streamalert_record_id,
       'events:stream' AS source_type, 'errorEvent' AS type, event_type AS value
FROM rec WHERE lower(event_type) = 'error'
ORDER BY streamalert_record_id, type, value
"""


def _norm_spec() -> NormalizationSpec:
    return NormalizationSpec(types={
        "userName": [PathSpec(path="user_id", function="user identity")],
        "metric": [PathSpec(path="k", function="metric value")],
        "errorEvent": [PathSpec(
            path="event_type", function="error type",
            condition={"path": "event_type", "is": "error"},
        )],
    })


@query("normalized_artifacts", oracle=_ARTIFACTS_ORACLE,
       doc="Normalization map projection exploded into flat artifact rows.")
def normalized_artifacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    records = ev.select(
        F.col("event_id"),
        F.struct(
            F.col("user_id").cast("string").alias("user_id"),
            F.col("event_type"),
            F.get_json_object("props", "$.k").alias("k"),
        ).alias("record"),
        F.lit("events:stream").alias("log_schema_type"),
    )
    normalizer = Normalizer(_norm_spec())
    normed = normalizer.apply(records, record_id=F.md5(F.col("event_id").cast("string")))
    return extract_artifacts(normed).repartition(1).sortWithinPartitions("streamalert_record_id", "type", "value")


# ---------------------------------------------------------------------------
# Threat intel: broadcast IOC join over normalized values
# (threat_intel.py:76-103,168-229 re-expressed as a join).
# ---------------------------------------------------------------------------

_IOC_ORACLE = """
WITH ioc(ioc_value, sub_type) AS (
  VALUES ('3', 'mal_user'), ('7', 'mal_user'), ('13', 'compromised'), ('42', 'compromised')
)
SELECT md5(CAST(e.event_id AS VARCHAR)) AS streamalert_record_id,
       'user' AS ioc_type,
       CAST(e.user_id AS VARCHAR) AS value,
       i.sub_type
FROM events e JOIN ioc i ON CAST(e.user_id AS VARCHAR) = i.ioc_value
ORDER BY streamalert_record_id
"""


@query("threat_intel_hits", oracle=_IOC_ORACLE,
       doc="IOC detection as a broadcast join against the threat-intel table.")
def threat_intel_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    records = ev.select(
        F.col("event_id"),
        F.struct(F.col("user_id").cast("string").alias("user_id")).alias("record"),
    )
    normalizer = Normalizer(NormalizationSpec(types={
        "userName": [PathSpec(path="user_id", function="user identity")],
    }))
    normed = normalizer.apply(records, record_id=F.md5(F.col("event_id").cast("string")))
    ioc_df = local_rows_df(
        spark,
        [("3", "mal_user"), ("7", "mal_user"), ("13", "compromised"), ("42", "compromised")],
        "ioc_value string, sub_type string",
    )
    ti = ThreatIntel(ioc_df, normalized_ioc_types={"user": ["userName"]})
    return ti.hits(normed).repartition(1).sortWithinPartitions("streamalert_record_id")


# ---------------------------------------------------------------------------
# Lookup-table enrichment: broadcast-hash join on a derived key
# (lookup_tables/table.py:32-43 -> enrich_join).
# ---------------------------------------------------------------------------

_LOOKUP_ORACLE = """
WITH lk(key, tier) AS (
  VALUES ('0','bronze'), ('1','silver'), ('2','gold'), ('3','platinum'), ('4','diamond')
)
SELECT e.event_id, CAST(e.user_id % 5 AS VARCHAR) AS user_bucket, lk.tier
FROM events e LEFT JOIN lk ON CAST(e.user_id % 5 AS VARCHAR) = lk.key
ORDER BY e.event_id
"""


@query("lookup_enrich", oracle=_LOOKUP_ORACLE,
       doc="Lookup-table enrichment as a broadcast-hash join.")
def lookup_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).withColumn(
        "user_bucket", (F.col("user_id") % 5).cast("string")
    )
    lookups = LookupTables(spark)
    # VALUES builds a LocalRelation whose size statistic Catalyst knows,
    # so the enrich join's size-gated broadcast hint can fire; a
    # createDataFrame-from-list frame is a stat-less ExistingRDD and
    # would (correctly, conservatively) fail the gate.
    lookups.register_frame(
        "tiers",
        spark.sql(
            "SELECT * FROM VALUES ('0','bronze'), ('1','silver'), "
            "('2','gold'), ('3','platinum'), ('4','diamond') AS t(key, tier)"
        ),
    )
    out = lookups.enrich_join(ev, "tiers", key_col="user_bucket", value_cols=["tier"])
    return out.select("event_id", "user_bucket", "tier").repartition(1).sortWithinPartitions("event_id")


# ---------------------------------------------------------------------------
# Alert merge, tumbling-window SQL form: keyed time-window grouping with
# AlertCount / AlertTimeFirst / AlertTimeLast (alert.py:382-433 columns).
# The reference's greedy grouping is covered by unit tests (not
# SQL-expressible); this is the windowed-aggregation equivalent.
# ---------------------------------------------------------------------------

_MERGE_ORACLE = """
SELECT
  event_type AS rule_name,
  CAST(user_id AS VARCHAR) AS merge_value,
  strftime(CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
  COUNT(*) AS alert_count,
  strftime(MIN(CAST(ts AS TIMESTAMP)), '%Y-%m-%dT%H:%M:%S.%fZ') AS alert_time_first,
  strftime(MAX(CAST(ts AS TIMESTAMP)), '%Y-%m-%dT%H:%M:%S.%fZ') AS alert_time_last
FROM events
WHERE event_type = 'error'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


@query("alert_merge_windowed", oracle=_MERGE_ORACLE,
       doc="Keyed windowed alert merge: count + first/last timestamps per group.")
def alert_merge_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.alerts.model import ALERT_TS_FMT

    ev = _events(spark, sf_dir)
    return (
        ev.filter(F.col("event_type") == "error")
        .groupBy(
            F.col("event_type").alias("rule_name"),
            F.col("user_id").cast("string").alias("merge_value"),
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("alert_count"),
            F.date_format(F.min("ts"), ALERT_TS_FMT).alias("alert_time_first"),
            F.date_format(F.max("ts"), ALERT_TS_FMT).alias("alert_time_last"),
        )
        .repartition(1).sortWithinPartitions("rule_name", "merge_value", "window_start")
    )
