"""Pipeline-closing queries: the greedy stateful alert merge (rows-only —
its iterative grouping is not SQL-expressible) and the scheduled-query →
streamquery → classifier feedback loop of SURVEY.md §3.2, oracle-checked
end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamalert_spark.alerts.merge import merge_alerts_batch
from streamalert_spark.alerts.model import ALERT_TS_FMT
from streamalert_spark.queries import query
from streamalert_spark.session import read_table


@query("alert_merge_greedy", oracle=None,
       doc="Greedy chronological alert merge with the 50-cap and "
           "oldest-alert window (alert_merger/main.py:106-132, "
           "alert.py:289-433) — iterative semantics, rows-only check.")
def alert_merge_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    alerts = ev.filter(F.col("event_type") == "error").select(
        F.lit("error_burst").alias("rule_name"),
        F.date_format("ts", ALERT_TS_FMT).alias("created"),
        F.to_json(F.struct(
            F.col("user_id").cast("string").alias("user_id"),
            F.col("event_type"),
        )).alias("record"),
        F.array(F.lit("user_id")).alias("merge_by_keys"),
        F.lit(15).alias("merge_window_mins"),
    )
    return merge_alerts_batch(alerts).repartition(1).sortWithinPartitions(
        "rule_name", "merge_values", "alert_time_first")


# Greedy chronological grouping IS SQL-expressible as a sequential
# recursion: walk each keyed partition in time order carrying the current
# group's start and size (a recursive CTE), exactly the reference loop at
# alert_merger/main.py:106-132. Only the merged-record SYNTHESIS
# (common-subset/diffs, alert.py:289-433) stays rows-only above.
_GREEDY_GROUPS_ORACLE = """
WITH RECURSIVE base AS (
  SELECT CAST(user_id AS VARCHAR) AS uid, CAST(ts AS TIMESTAMP) AS created
  FROM events WHERE event_type = 'error'
), ordered AS (
  SELECT uid, created,
         row_number() OVER (PARTITION BY uid ORDER BY created) AS rn
  FROM base
), walk AS (
  SELECT uid, rn, created, created AS grp_start, 1 AS cnt
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.uid, o.rn, o.created,
         CASE WHEN o.created <= w.grp_start + INTERVAL 15 MINUTE AND w.cnt < 50
              THEN w.grp_start ELSE o.created END,
         CASE WHEN o.created <= w.grp_start + INTERVAL 15 MINUTE AND w.cnt < 50
              THEN w.cnt + 1 ELSE 1 END
  FROM ordered o JOIN walk w ON o.uid = w.uid AND o.rn = w.rn + 1
)
SELECT 'error_burst' AS rule_name,
       '{"user_id":"' || uid || '"}' AS merge_values,
       COUNT(*) AS alert_count,
       strftime(MIN(created), '%Y-%m-%dT%H:%M:%S.%fZ') AS alert_time_first,
       strftime(MAX(created), '%Y-%m-%dT%H:%M:%S.%fZ') AS alert_time_last
FROM walk
GROUP BY uid, grp_start
ORDER BY rule_name, merge_values, alert_time_first
"""


@query("alert_merge_greedy_groups", oracle=_GREEDY_GROUPS_ORACLE,
       doc="Greedy chronological merge GROUPING (oldest-alert window + "
           "50-cap, alert_merger/main.py:106-132) hash-checked against a "
           "recursive-CTE oracle walking each partition in time order.")
def alert_merge_greedy_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    alerts = ev.filter(F.col("event_type") == "error").select(
        F.lit("error_burst").alias("rule_name"),
        F.date_format("ts", ALERT_TS_FMT).alias("created"),
        F.to_json(F.struct(
            F.col("user_id").cast("string").alias("user_id"),
            F.col("event_type"),
        )).alias("record"),
        F.array(F.lit("user_id")).alias("merge_by_keys"),
        F.lit(15).alias("merge_window_mins"),
    )
    return merge_alerts_batch(alerts).select(
        "rule_name", "merge_values", "alert_count",
        "alert_time_first", "alert_time_last",
    ).repartition(1).sortWithinPartitions(
        "rule_name", "merge_values", "alert_time_first")


_DATATYPE_ORACLE = """
SELECT md5(CAST(event_id AS VARCHAR)) AS id,
       'metric_watch' AS rule_name,
       event_id
FROM events
WHERE json_extract_string(props, '$.k') LIKE '%3%'
ORDER BY event_id
"""


@query("rule_datatype_routing", oracle=_DATATYPE_ORACLE,
       doc="Rule subscribed to a normalized datatype instead of a log type "
           "(rule.py:227-229): fires only where normalization extracted "
           "values (the extraction is condition-gated so routing selects).")
def rule_datatype_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.normalize.normalizer import (
        NormalizationSpec, Normalizer, PathSpec,
    )
    from streamalert_spark.rules.engine import RulesEngine
    from streamalert_spark.rules.registry import Rule, RuleRegistry

    ev = read_table(spark, sf_dir, "events")
    records = ev.select(
        F.col("ts"),
        F.struct(
            F.col("event_id").cast("string").alias("event_id"),
            F.get_json_object("props", "$.k").alias("k"),
        ).alias("record"),
    )
    normalizer = Normalizer(NormalizationSpec(types={
        "metric": [PathSpec(path="k", function="metric value",
                            condition={"path": "k", "contains": "3"})],
    }))
    normed = normalizer.apply(
        records, record_id=F.md5(F.col("record.event_id")))
    reg = RuleRegistry()
    reg.add(Rule(name="metric_watch", expr=lambda r: F.lit(True),
                 datatypes=["metric"], outputs=["slack:metrics"]))
    alerts = RulesEngine(reg).run(
        normed, log_type="events:props", event_time=F.col("ts"),
        alert_id=F.md5(F.col("record.event_id")),
    )
    return (
        alerts.select(
            "id", "rule_name",
            F.get_json_object("record", "$.event_id").cast("bigint").alias("event_id"),
        )
        .repartition(1).sortWithinPartitions("event_id")
    )


_FEEDBACK_ORACLE = """
SELECT event_type, COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("streamquery_feedback", oracle=_FEEDBACK_ORACLE,
       doc="Scheduled pack -> streamquery records -> classifier -> typed "
           "rows: the §3.2 feedback loop round-trips the aggregate exactly.")
def streamquery_feedback(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.classify.classifier import Classifier
    from streamalert_spark.schema.registry import LogSchema, SchemaRegistry
    from streamalert_spark.sql.scheduled import (
        QueryPack, QueryPackRepository, ScheduledQueryRunner,
    )

    read_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    repo = QueryPackRepository()
    repo.register(QueryPack(
        name="event_type_counts",
        description="hourly event type counts",
        query="SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
        tags=["hourly"],
    ))
    runner = ScheduledQueryRunner(spark, repo)
    feedback = runner.to_streamquery_records(runner.run(tags=["hourly"]))

    # re-enter the classifier as the streamquery log type
    # (conf/schemas/streamquery.json shape)
    reg = SchemaRegistry()
    reg.register(LogSchema(
        name="streamquery:1.0.0",
        schema={"streamquery_schema_version": "string",
                "execution": {}, "data": {}},
    ))
    batch = Classifier(reg).classify(feedback, raw_col="value")
    rec = batch.by_log_type["streamquery:1.0.0"]
    rows = F.from_json(F.col("record.data")["rows"], "array<map<string,string>>")
    return (
        rec.select(F.explode(rows).alias("r"))
        .select(
            F.col("r")["event_type"].alias("event_type"),
            F.col("r")["n"].cast("bigint").alias("n"),
        )
        .repartition(1).sortWithinPartitions("event_type")
    )
