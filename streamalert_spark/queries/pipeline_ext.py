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
from streamalert_spark.session import local_rows_df


# The raw merged_record JSON is oracle-reconstructable for THIS query's
# flat input shape: the operator serializes with json.dumps(sort_keys=True)
# (deterministic key order + ", "/": " separators), the group's records
# carry only (user_id, event_type) — both constant within a group — so
# OtherCommonKeys is exactly {"event_type": "error"} and every ValueDiffs
# entry is an empty dict keyed by a created timestamp (duplicate created
# strings collapse under Python dict semantics -> DISTINCT in the oracle;
# the collapse is value-invariant because all diffs are {}). The oracle
# replays the greedy walk of _GREEDY_GROUPS_ORACLE and string-builds the
# identical JSON, so the driver hash checks the FULL merged payload.
_GREEDY_FULL_ORACLE = """
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
       CAST(COUNT(*) AS BIGINT) AS alert_count,
       strftime(MIN(created), '%Y-%m-%dT%H:%M:%S.%fZ') AS alert_time_first,
       strftime(MAX(created), '%Y-%m-%dT%H:%M:%S.%fZ') AS alert_time_last,
       '{"AlertCount": ' || COUNT(*)
         || ', "AlertTimeFirst": "'
         || strftime(MIN(created), '%Y-%m-%dT%H:%M:%S.%fZ')
         || '", "AlertTimeLast": "'
         || strftime(MAX(created), '%Y-%m-%dT%H:%M:%S.%fZ')
         || '", "MergedBy": {"user_id": "' || uid
         || '"}, "OtherCommonKeys": {"event_type": "error"}, "ValueDiffs": {'
         || string_agg(
              DISTINCT '"' || strftime(created, '%Y-%m-%dT%H:%M:%S.%fZ')
                        || '": {}',
              ', ' ORDER BY '"' || strftime(created, '%Y-%m-%dT%H:%M:%S.%fZ')
                        || '": {}')
         || '}}' AS merged_record
FROM walk
GROUP BY uid, grp_start
ORDER BY rule_name, merge_values, alert_time_first
"""


@query("alert_merge_greedy", oracle=_GREEDY_FULL_ORACLE,
       doc="Greedy chronological alert merge with the 50-cap and "
           "oldest-alert window (alert_merger/main.py:106-132, "
           "alert.py:289-433); the oracle replays the walk AND "
           "string-builds the exact sort_keys JSON of the synthesized "
           "merged record, hash-checking the full payload.")
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


# The merged-record SYNTHESIS (common-subset / MergedBy / OtherCommonKeys /
# per-alert ValueDiffs, alert.py:289-433) IS oracle-checkable once reduced
# to a scalar: hash a canonical flattening of the merged record. With flat
# input records a field is "common" iff every record in the group carries
# the same value (here: user_id and event_type always; event_id only in
# effectively-singleton groups), MergedBy is the merge-key values,
# OtherCommonKeys is common-minus-merge-keys, and each alert's ValueDiffs
# holds exactly the non-common fields. The oracle replays the same greedy
# walk as _GREEDY_GROUPS_ORACLE, then rebuilds the canonical string with
# min/max/string_agg per group. Input is deduped on (user_id, created) on
# BOTH sides so ValueDiffs keys (created timestamps) are unique by
# construction — a duplicate key would silently drop a diff dict entry.
_MERGE_DIGEST_ORACLE = """
WITH RECURSIVE base AS (
  SELECT CAST(user_id AS VARCHAR) AS uid,
         CAST(event_id AS VARCHAR) AS eid,
         CAST(ts AS TIMESTAMP) AS created
  FROM events WHERE event_type = 'error'
  QUALIFY row_number() OVER (
    PARTITION BY user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%fZ')
    ORDER BY event_id DESC) = 1
), ordered AS (
  SELECT uid, eid, created,
         row_number() OVER (PARTITION BY uid ORDER BY created) AS rn
  FROM base
), walk AS (
  SELECT uid, rn, eid, created, created AS grp_start, 1 AS cnt
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.uid, o.rn, o.eid, o.created,
         CASE WHEN o.created <= w.grp_start + INTERVAL 15 MINUTE AND w.cnt < 50
              THEN w.grp_start ELSE o.created END,
         CASE WHEN o.created <= w.grp_start + INTERVAL 15 MINUTE AND w.cnt < 50
              THEN w.cnt + 1 ELSE 1 END
  FROM ordered o JOIN walk w ON o.uid = w.uid AND o.rn = w.rn + 1
), flagged AS (
  SELECT uid, grp_start, eid, created,
         MIN(eid) OVER (PARTITION BY uid, grp_start)
           = MAX(eid) OVER (PARTITION BY uid, grp_start) AS eid_common
  FROM walk
), grouped AS (
  SELECT uid, grp_start,
         COUNT(*) AS alert_count,
         strftime(MIN(created), '%Y-%m-%dT%H:%M:%S.%fZ') AS first_ts,
         strftime(MAX(created), '%Y-%m-%dT%H:%M:%S.%fZ') AS last_ts,
         bool_and(eid_common) AS eid_common,
         MIN(eid) AS eid_val,
         string_agg(
           strftime(created, '%Y-%m-%dT%H:%M:%S.%fZ') || '=' ||
           CASE WHEN eid_common THEN ''
                ELSE 'event_id:' || eid END,
           ',' ORDER BY created) AS diffs_str
  FROM flagged
  GROUP BY uid, grp_start
)
SELECT 'error_burst' AS rule_name,
       '{"user_id":"' || uid || '"}' AS merge_values,
       CAST(alert_count AS BIGINT) AS alert_count,
       first_ts AS alert_time_first,
       last_ts AS alert_time_last,
       md5('n=' || alert_count || '|first=' || first_ts ||
           '|last=' || last_ts || '|by=user_id:' || uid || '|common=' ||
           CASE WHEN eid_common
                THEN 'event_id:' || eid_val || ',event_type:error'
                ELSE 'event_type:error' END ||
           '|diffs=' || diffs_str) AS digest
FROM grouped
ORDER BY rule_name, merge_values, alert_time_first
"""


@query("alert_merge_digest", oracle=_MERGE_DIGEST_ORACLE,
       doc="Full greedy merge INCLUDING the merged-record synthesis "
           "(common-subset, MergedBy, OtherCommonKeys, per-alert "
           "ValueDiffs — alert.py:289-433) reduced to a canonical-string "
           "md5 digest and hash-checked against the recursive-CTE walk: "
           "closes the one rows-only gap alert_merge_greedy leaves.")
def alert_merge_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = read_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").cast("string").alias("uid"),
        F.col("event_id").cast("string").alias("eid"),
        F.col("event_id").alias("eid_num"),
        F.date_format("ts", ALERT_TS_FMT).alias("created"),
    )
    dedup_w = W.partitionBy("uid", "created").orderBy(F.col("eid_num").desc())
    alerts = (
        errors.withColumn("_rn", F.row_number().over(dedup_w))
        .filter(F.col("_rn") == 1)
        .select(
            F.lit("error_burst").alias("rule_name"),
            F.col("created"),
            F.to_json(F.struct(
                F.col("eid").alias("event_id"),
                F.lit("error").alias("event_type"),
                F.col("uid").alias("user_id"),
            )).alias("record"),
            F.array(F.lit("user_id")).alias("merge_by_keys"),
            F.lit(15).alias("merge_window_mins"),
        )
    )
    merged_schema = (
        "AlertCount bigint, AlertTimeFirst string, AlertTimeLast string, "
        "MergedBy map<string,string>, OtherCommonKeys map<string,string>, "
        "ValueDiffs map<string,map<string,string>>"
    )
    m = F.from_json(F.col("merged_record"), merged_schema)
    kv = lambda e: F.concat(e.key, F.lit(":"), e.value)  # noqa: E731
    common_str = F.array_join(
        F.array_sort(F.transform(F.map_entries(m["OtherCommonKeys"]), kv)),
        ",")
    diffs_str = F.array_join(
        F.array_sort(F.transform(
            F.map_entries(m["ValueDiffs"]),
            lambda e: F.concat(
                e.key, F.lit("="),
                F.array_join(
                    F.array_sort(F.transform(F.map_entries(e.value), kv)),
                    ";")))),
        ",")
    by_str = F.concat(F.lit("user_id:"), m["MergedBy"]["user_id"])
    digest = F.md5(F.concat(
        F.lit("n="), m["AlertCount"].cast("string"),
        F.lit("|first="), m["AlertTimeFirst"],
        F.lit("|last="), m["AlertTimeLast"],
        F.lit("|by="), by_str,
        F.lit("|common="), common_str,
        F.lit("|diffs="), diffs_str,
    ))
    return (
        merge_alerts_batch(alerts)
        .select("rule_name", "merge_values", "alert_count",
                "alert_time_first", "alert_time_last",
                digest.alias("digest"))
        .repartition(1).sortWithinPartitions(
            "rule_name", "merge_values", "alert_time_first")
    )


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


# ---------------------------------------------------------------------------
# Threat-intel feed ingest → IOC table → detection join, end to end
# (threat_intel_downloader/main.py:41-347 as a Spark ingest job).
# ---------------------------------------------------------------------------

# the fake ThreatStream feed served by the injectable transport: raw
# (value, itype, source, expiration_ts) objects BEFORE ingest processing —
# both engines independently apply source filtering, expiry conversion
# (missing -> now + 90 days), last-write-wins dedup, and the TTL filter
_TI_FEED_OBJECTS = [
    # live hit; overwritten TWICE by later-arriving rows below — DynamoDB
    # put_item last-write-wins is ARRIVAL order, so the final (page-3)
    # row wins even though its expiration is smaller than the page-1 one
    ("3", "c2_user", "CrowdStrike Intel", "2024-06-01T00:00:00.000Z"),
    ("3", "mal_user", "abuse.ch feed", "2025-01-01T00:00:00.000Z"),
    # missing expiry -> defaults to now + 90 days -> live
    ("7", "mal_user", "crowdstrike", None),
    # expired before _TI_NOW -> dropped by the TTL read filter
    ("13", "compromised", "crowdstrike", "2020-01-01T00:00:00.000Z"),
    # source not in the configured filter list -> dropped at ingest
    ("42", "compromised", "other-vendor", "2024-06-01T00:00:00.000Z"),
    # live but matches no user_id at any SF
    ("99999999", "mal_user", "abuse.ch", "2024-06-01T00:00:00.000Z"),
    # ioc 3's LAST write: smaller expiration than the abuse.ch row, but
    # arrival order means it wins the dedup (still live at _TI_NOW)
    ("3", "resurfaced_user", "crowdstrike", "2024-08-01T00:00:00.000Z"),
]
_TI_NOW = 1_700_000_000  # fixed clock: expiry default + TTL filter cutoff

_TI_FEED_VALUES = ", ".join(
    "({}, '{}', '{}', '{}', {})".format(
        seq, v, it, src, "NULL" if exp is None else f"'{exp}'")
    for seq, (v, it, src, exp) in enumerate(_TI_FEED_OBJECTS)
)

_TI_INGEST_ORACLE = f"""
WITH feed(seq, value, itype, source, exp) AS (VALUES {_TI_FEED_VALUES}),
processed AS (
  SELECT seq, value, itype,
         CASE WHEN exp IS NULL THEN {_TI_NOW} + 90 * 86400
              ELSE CAST(epoch(strptime(exp, '%Y-%m-%dT%H:%M:%S.%fZ'))
                        AS BIGINT) END AS expiration_ts
  FROM feed
  WHERE lower(source) LIKE '%crowdstrike%'
     OR lower(source) LIKE '%abuse.ch%'
),
dedup AS (
  SELECT value AS ioc_value,
         arg_max(itype, seq) AS sub_type,
         arg_max(expiration_ts, seq) AS expiration_ts
  FROM processed GROUP BY value
),
live AS (SELECT * FROM dedup WHERE expiration_ts > {_TI_NOW})
SELECT l.ioc_value AS value, l.sub_type, l.expiration_ts,
       COUNT(*) AS n_hits
FROM events e JOIN live l ON CAST(e.user_id AS VARCHAR) = l.ioc_value
GROUP BY 1, 2, 3
ORDER BY value
"""


@query("threat_intel_feed_ingest", oracle=_TI_INGEST_ORACLE,
       doc="The full threat-intel pipeline: paginated feed ingest "
           "(injectable transport serving a 3-page fake ThreatStream "
           "feed, with one 500-then-retry page) -> source filter, "
           "ioc_keys projection, expiry epoch conversion with the "
           "90-day default -> ARRIVAL-ORDER last-write-wins dedup by "
           "ioc_value (put_item semantics: a later page overwrites even "
           "with a smaller expiration) -> "
           "ioc Parquet table snapshot -> TTL expiry read filter -> "
           "size-gated broadcast detection join against event user "
           "ids. Both engines independently replay the ingest rules "
           "from the same raw feed literals, so the hash checks the "
           "ingest semantics, not just the join.")
def threat_intel_feed_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from streamalert_spark.enrich.threat_intel import ThreatIntel
    from streamalert_spark.enrich.ti_downloader import (
        ThreatStreamFeed,
        fake_feed_transport,
        ingest_feed,
        load_ioc_table,
    )
    from streamalert_spark.normalize.normalizer import (
        NormalizationSpec,
        Normalizer,
        PathSpec,
    )

    def _obj(v, it, src, exp):
        return {"value": v, "itype": it, "type": "user", "source": src,
                "expiration_ts": exp}

    pages = [
        {"objects": [_obj(*o) for o in _TI_FEED_OBJECTS[:2]],
         "meta": {"next": "/page/1", "offset": 1000}},
        {"_url": "/page/1", "_status": 500, "_then_ok": True,
         "objects": [_obj(*o) for o in _TI_FEED_OBJECTS[2:4]],
         "meta": {"next": "/page/2", "offset": 2000}},
        {"_url": "/page/2",
         "objects": [_obj(*o) for o in _TI_FEED_OBJECTS[4:]],
         "meta": {"next": None, "offset": 3000}},
    ]
    feed = ThreatStreamFeed(
        api_user="u", api_key="k",
        ioc_types=["user"], excluded_sub_types=["bot_user"],
        ioc_sources=["crowdstrike", "abuse.ch"],
        fetch=fake_feed_transport(pages), now_epoch=_TI_NOW,
    )
    work = tempfile.mkdtemp(prefix="ti_feed_q_")
    try:
        ingest_feed(spark, feed, work)
        live = load_ioc_table(spark, work, now_epoch=_TI_NOW)

        ev = read_table(spark, sf_dir, "events")
        records = ev.select(
            F.col("event_id"),
            F.struct(F.col("user_id").cast("string")
                     .alias("user_id")).alias("record"),
        )
        normed = Normalizer(NormalizationSpec(types={
            "userName": [PathSpec(path="user_id",
                                  function="user identity")],
        })).apply(records,
                  record_id=F.md5(F.col("event_id").cast("string")))
        ti = ThreatIntel(live.select("ioc_value", "sub_type"),
                         normalized_ioc_types={"user": ["userName"]})
        ledger = (
            ti.hits(normed)
            .groupBy("value", "sub_type")
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .join(live.select(F.col("ioc_value").alias("value"),
                              "expiration_ts"), "value")
            .select("value", "sub_type", "expiration_ts", "n_hits")
        )
        # the ledger is IOC-table-scale (rows = live IOCs with hits);
        # materialize so the temp parquet dir can be removed immediately
        rows = ledger.collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return (
        local_rows_df(
            spark, rows, "value string, sub_type string, "
                         "expiration_ts bigint, n_hits bigint")
        .repartition(1).sortWithinPartitions("value")
    )
