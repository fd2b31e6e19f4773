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
from streamalert_spark.streaming.bounded import bounded_stream_shuffle
from streamalert_spark.session import local_rows_df, read_table
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


# ----------------------------------------------------------- Salesforce

# 2024-01-01T00:00:00Z
_SF_EPOCH_DAY1 = 1704067200


def _fake_salesforce_fetch(method: str, url: str, headers: dict,
                           data: dict | None):
    """Deterministic stand-in for the salesforce REST API, exercising the
    FULL protocol an app run performs (salesforce.py:103-378): OAuth
    token POST, API-version discovery (the fake only answers queries sent
    to the LATEST advertised version), EventLogFile query filtered by the
    LogDate checkpoint, and per-file CSV content with a header line."""
    import re as _re

    if method == "POST":
        assert data is not None and data["grant_type"] == "password"
        # password and security_token arrive concatenated
        assert data["password"].endswith("T" * 24)
        return {"access_token": "tok-fake", "instance_url": "https://fake.example"}
    if url.endswith("/services/data/"):
        assert headers["Authorization"] == "Bearer tok-fake"
        return [{"version": "31.0"}, {"version": "46.0"}, {"version": "44.0"}]
    if "query?q=" in url:
        # version discovery must have picked the largest advertised one
        assert "/services/data/v46.0/" in url
        last = _re.search(r"LogDate\+>\+([^+]+)\+", url).group(1)
        records = []
        for d in range(1, 5):
            if f"2024-01-0{d}T00:00:00Z" > last:  # ISO strings order by time
                records.append({
                    "Id": f"0AT00000000000{d}",
                    "EventType": "Login",
                    "LogFile": ("services/data/v46.0/sobjects/EventLogFile/"
                                f"0AT00000000000{d}/LogFile"),
                    "LogDate": f"2024-01-0{d}T00:00:00.000+0000",
                    "LogFileLength": 512.0,
                })
        return {"totalSize": len(records), "done": True, "records": records}
    d = int(_re.search(r"EventLogFile/0AT00000000000(\d)/LogFile", url).group(1))
    rows = [f'"Login","2024-01-0{d}T0{h}:00:00Z","user{d}{h}"'
            for h in range(5)]
    return "\n".join(['"EVENT_TYPE","TIMESTAMP_DERIVED","USER_ID"'] + rows)


def _fixed_sf_clock() -> float:
    # 2024-01-05T00:00:00Z — a deterministic "run start" checkpoint
    return float(_SF_EPOCH_DAY1 + 4 * 86400)


_APP_SF_ORACLE = f"""
SELECT '"Login","2024-01-0' || d || 'T0' || h || ':00:00Z","user' || d || h || '"'
         AS record,
       'salesforce:salesforce_login' AS log_type,
       CAST({_SF_EPOCH_DAY1} + (d - 1) * 86400 AS BIGINT) AS event_timestamp
FROM range(1, 5) t(d), range(0, 5) u(h)
ORDER BY event_timestamp, record
"""


@query("app_source_salesforce", oracle=_APP_SF_ORACLE,
       doc="Salesforce event-log backfill through the app DataSource "
           "(salesforce.py:1-460): OAuth token flow, latest-API-version "
           "discovery, EventLogFile query WHERE LogDate > checkpoint, "
           "per-file CSV fetch with header dropped — the deterministic "
           "fake transport asserts each protocol step, and the records "
           "land as raw CSV lines ready for the CSV classifier.")
def app_source_salesforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.sources.app_source import TRANSPORTS, register_app_source

    TRANSPORTS["salesforce_login"] = {
        "fetch": _fake_salesforce_fetch, "clock": _fixed_sf_clock,
    }
    register_app_source(spark)
    df = (
        spark.read.format("streamalert_app")
        .option("app", "salesforce_login")
        .option("auth_client_id", "c" * 85)
        .option("auth_client_secret", "1" * 19)
        .option("auth_username", "auditor@example.com")
        .option("auth_password", "hunter2")
        .option("auth_security_token", "T" * 24)
        .load()
    )
    return df.repartition(1).sortWithinPartitions("event_timestamp", "record")


# ------------------------------------------- app source: streaming resume

_APP_STREAM_ORACLE = """
SELECT '{"event_id": "ev-' || i || '", "result": "SUCCESS", "timestamp": '
         || i || '}' AS record,
       'synthetic:synthetic' AS log_type,
       CAST(i AS BIGINT) AS event_timestamp
FROM range(1, 251) t(i)
ORDER BY event_timestamp
"""


@query("app_source_stream_resume", oracle=_APP_STREAM_ORACLE,
       doc="App-source STREAMING read with a mid-stream restart: run 1 "
           "drains the service to t=150 over 2 micro-batches (one poll "
           "per batch, page size 100), then a NEW query on the same "
           "checkpoint picks up at the committed offset and drains to "
           "t=250 — the offset-log resume that replaces the reference's "
           "parameter-store checkpoint (app_base.py:222-258). The hash "
           "check proves no record is duplicated or dropped across the "
           "restart boundary.")
def app_source_stream_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from streamalert_spark.sources.app_source import register_app_source

    register_app_source(spark)
    work = tempfile.mkdtemp(prefix="app_stream_resume_")
    out_dir, ckpt = f"{work}/out", f"{work}/ckpt"
    try:
        for end_ts in (150, 250):  # restart happens between the two runs
            src = (
                spark.readStream.format("streamalert_app")
                .option("app", "synthetic").option("end_timestamp", str(end_ts))
                .load()
            )
            q = (
                src.writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        # bounded showcase output (250 rows): materialize so the work dir
        # (checkpoint log + parquet) can be removed immediately — repeated
        # driver/bench invocations must not accumulate /tmp state
        rows = (spark.read.schema("record string, log_type string, "
                                  "event_timestamp bigint").parquet(out_dir)
                .collect())
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return (local_rows_df(spark, rows, "record string, log_type string, "
                                       "event_timestamp bigint")
            .repartition(1).sortWithinPartitions("event_timestamp"))


# ------------------------------------------ streaming first-seen, bounded

_FIRST_SEEN_ORACLE = """
SELECT CAST(i % 37 AS BIGINT) AS k, CAST(MIN(i) AS BIGINT) AS first_ts
FROM range(1, 301) t(i)
GROUP BY i % 37
ORDER BY k
"""


@query("stream_first_seen_bounded", oracle=_FIRST_SEEN_ORACLE,
       doc="STREAMING first-seen detection driven end-to-end under the "
           "hash gate: the synthetic app source streams 300 events over "
           "3 micro-batches, first_seen (applyInPandasWithState, per-key "
           "boolean state with no timeout — new-device/new-IP semantics) "
           "emits exactly each key's earliest row. The oracle is the "
           "batch definition (MIN ts per key), so the check proves the "
           "stateful operator's suppress-after-first behavior exactly.")
def stream_first_seen_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.sources.app_source import register_app_source
    from streamalert_spark.streaming.bounded import run_bounded_to_rows
    from streamalert_spark.streaming.first_seen import first_seen

    register_app_source(spark)
    src = (
        spark.readStream.format("streamalert_app")
        .option("app", "synthetic").option("end_timestamp", "300")
        .option("page_size", "150")  # every key appears in BOTH batches
        .load()
        .select(F.pmod("event_timestamp", F.lit(37)).alias("k"),
                F.col("event_timestamp"))
    )
    firsts = first_seen(src, ["k"], ts_col="event_timestamp")
    out = run_bounded_to_rows(spark, firsts,
                              "k bigint, event_timestamp bigint")
    return (
        out.select("k", F.col("event_timestamp").alias("first_ts"))
        .repartition(1).sortWithinPartitions("k")
    )


# ----------------------------------------- streaming rate alerts, bounded

_RATE_ALERT_ORACLE = """
SELECT CAST(i % 3 AS BIGINT) AS k,
       CAST((i // 60) * 60 AS BIGINT) AS window_start,
       CAST((i // 60) * 60 + 60 AS BIGINT) AS window_end,
       COUNT(*) AS cnt
FROM range(1, 602) t(i)
WHERE i < 600
GROUP BY 1, 2, 3
HAVING COUNT(*) >= 5
ORDER BY k, window_start
"""


@query("stream_rate_alerts_bounded", oracle=_RATE_ALERT_ORACLE,
       doc="STREAMING rate-threshold alerting under the hash gate: 601 "
           "events stream through 2 micro-batches; tumbling 1-minute "
           "event-time windows emit exactly once when the watermark "
           "closes them (append mode; the final no-data micro-batch "
           "flushes the last closed window, and the still-open [600,660) "
           "window is correctly withheld). The oracle is the batch "
           "GROUP BY definition over the closed range.")
def stream_rate_alerts_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.sources.app_source import register_app_source
    from streamalert_spark.streaming.bounded import run_bounded_to_rows
    from streamalert_spark.streaming.spikes import rate_threshold_alerts

    register_app_source(spark)
    src = (
        spark.readStream.format("streamalert_app")
        .option("app", "synthetic").option("end_timestamp", "601")
        .option("page_size", "301")  # window [300,360) spans the batches
        .load()
        .select(F.pmod("event_timestamp", F.lit(3)).alias("k"),
                F.timestamp_seconds("event_timestamp").alias("ts"))
    )
    alerts = rate_threshold_alerts(
        src, "k", "ts", window="1 minute",
        watermark="0 seconds", threshold=5)
    out = alerts.select(
        "k",
        F.unix_timestamp("window_start").alias("window_start"),
        F.unix_timestamp("window_end").alias("window_end"),
        "cnt",
    )
    rows = run_bounded_to_rows(
        spark, out,
        "k bigint, window_start bigint, window_end bigint, cnt bigint")
    return rows.repartition(1).sortWithinPartitions("k", "window_start")


# ----------------------------------------- streaming CDC apply, bounded

_STREAM_CDC_ORACLE = """
WITH base AS (
  SELECT CAST(i AS BIGINT) AS k, 'base-' || CAST(i AS VARCHAR) AS v
  FROM range(0, 37) t(i)
),
changes AS (
  SELECT CAST(i % 37 AS BIGINT) AS k, i AS seq,
         CASE WHEN i % 10 = 0 THEN 'D' ELSE 'U' END AS op,
         'v-' || CAST(i AS VARCHAR) AS v
  FROM range(1, 301) t(i)
),
latest AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
    FROM changes) WHERE rn = 1
)
SELECT k, v FROM (
  SELECT b.k, b.v FROM base b WHERE b.k NOT IN (SELECT k FROM latest)
  UNION ALL
  SELECT k, v FROM latest WHERE op <> 'D'
)
ORDER BY k
"""


@query("stream_cdc_apply_bounded", oracle=_STREAM_CDC_ORACLE,
       doc="STREAMING CDC ingest under the hash gate: 300 change records "
           "stream through 3 micro-batches; foreachBatch applies each "
           "batch with MERGE INTO semantics (ops/cdc.apply_changelog) "
           "against a VERSIONED parquet snapshot — read latest version, "
           "merge, write next — exactly the Debezium->lakehouse upsert "
           "loop. The oracle is the ONE-SHOT batch merge of the full "
           "changelog, so the check proves incremental-apply == "
           "batch-apply (latest-wins composes across batches when the "
           "CDC sequence is monotone).")
def stream_cdc_apply_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from streamalert_spark.ops.cdc import apply_changelog
    from streamalert_spark.sources.app_source import register_app_source

    register_app_source(spark)
    work = tempfile.mkdtemp(prefix="cdc_stream_q_")
    snap = f"{work}/snap"
    try:
        base = spark.range(0, 37).select(
            F.col("id").alias("k"),
            F.concat(F.lit("base-"), F.col("id").cast("string")).alias("v"))
        base.write.parquet(f"{snap}/v0")
        state = {"ver": 0}

        def apply_batch(batch_df, epoch_id):
            # idempotent per epoch: a retried micro-batch (foreachBatch's
            # at-least-once contract) finds its version already written
            # and must not re-apply — exactly-once via epoch-keyed output
            import os as _os

            target = f"{snap}/v{epoch_id + 1}"
            if _os.path.exists(_os.path.join(target, "_SUCCESS")):
                state["ver"] = max(state["ver"], epoch_id + 1)
                return
            changes = batch_df.select(
                F.pmod("event_timestamp", F.lit(37)).alias("k"),
                F.col("event_timestamp").alias("seq"),
                F.when(F.col("event_timestamp") % 10 == 0, "D")
                 .otherwise("U").alias("op"),
                F.concat(F.lit("v-"),
                         F.col("event_timestamp").cast("string")).alias("v"),
            )
            sess = batch_df.sparkSession
            cur = sess.read.schema("k bigint, v string").parquet(
                f"{snap}/v{epoch_id}")
            nxt = apply_changelog(cur, changes, ["k"], "seq", "op")
            # overwrite: a retry after a PARTIAL write (dir exists, no
            # _SUCCESS) must replace the debris, not ErrorIfExists-fail
            nxt.write.mode("overwrite").parquet(target)
            state["ver"] = max(state["ver"], epoch_id + 1)

        src = (
            spark.readStream.format("streamalert_app")
            .option("app", "synthetic").option("end_timestamp", "300")
            .option("page_size", "150")  # 2 incremental versions
            .load()
        )
        with bounded_stream_shuffle(spark):
            q = (
                src.writeStream.foreachBatch(apply_batch)
                .option("checkpointLocation", f"{work}/ckpt")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        rows = (spark.read.schema("k bigint, v string")
                .parquet(f"{snap}/v{state['ver']}").collect())
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return (local_rows_df(spark, rows, "k bigint, v string")
            .repartition(1).sortWithinPartitions("k"))


# -------------------------------------- streaming session windows, bounded

_SESSION_ORACLE = """
WITH ev AS (
  SELECT CAST(i % 3 AS BIGINT) AS k,
         i // 100 AS burst,
         i + (i // 100) * 120 AS s
  FROM range(1, 601) t(i)
),
sess AS (
  -- within a burst a key's events are 3 apart (< the 30s gap: one
  -- session); consecutive bursts are 120s apart (> gap: sessions split)
  SELECT k,
         CAST(MIN(s) AS BIGINT) AS session_start,
         CAST(MAX(s) + 30 AS BIGINT) AS session_end,
         COUNT(*) AS cnt
  FROM ev
  GROUP BY k, burst
)
SELECT k, session_start, session_end, cnt
FROM sess
WHERE session_end <= (SELECT MAX(s) FROM ev)
ORDER BY k, session_start
"""


@query("stream_session_windows_bounded", oracle=_SESSION_ORACLE,
       doc="STREAMING gap-based sessionization under the hash gate: 600 "
           "events whose timeline has a 120s silence every 100 events "
           "stream through 2 micro-batches; session_window (30s gap) "
           "merges each key's burst into ONE session in the state store "
           "even when the burst spans micro-batch boundaries, and emits "
           "it exactly once when the watermark passes session end (the "
           "still-open final burst is withheld). Oracle is the batch "
           "islands definition over the same timeline.")
def stream_session_windows_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.sources.app_source import register_app_source
    from streamalert_spark.streaming.bounded import run_bounded_to_rows
    from streamalert_spark.streaming.sessions import session_windows

    register_app_source(spark)
    src = (
        spark.readStream.format("streamalert_app")
        .option("app", "synthetic").option("end_timestamp", "600")
        .option("page_size", "300")  # a burst spans the batch boundary
        .load()
        .select(
            F.pmod("event_timestamp", F.lit(3)).alias("k"),
            F.timestamp_seconds(
                F.col("event_timestamp")
                + F.expr("event_timestamp DIV 100") * 120
            ).alias("ts"),
        )
    )
    sessions = session_windows(src, "k", "ts", gap="30 seconds",
                               watermark="0 seconds")
    out = sessions.select(
        "k",
        F.unix_timestamp("session_start").alias("session_start"),
        F.unix_timestamp("session_end").alias("session_end"),
        "cnt",
    )
    rows = run_bounded_to_rows(
        spark, out,
        "k bigint, session_start bigint, session_end bigint, cnt bigint")
    return rows.repartition(1).sortWithinPartitions("k", "session_start")


# --------------------------------------- streaming alert delivery, bounded

_ALERT_WRITER_ORACLE = """
WITH alerts AS (
  SELECT 'al-' || CAST(i AS VARCHAR) AS id,
         'rule_' || CAST(i % 3 AS VARCHAR) AS rule_name,
         'chan-' || CAST(i % 2 AS VARCHAR) AS descriptor,
         i
  FROM range(1, 61) t(i)
)
SELECT id, 'json:' || descriptor AS output,
       md5('{"descriptor": "' || descriptor || '", "id": "' || id
           || '", "rule_name": "' || rule_name || '"}') AS body_md5
FROM alerts
ORDER BY id, output
"""


@query("alert_output_writer_ledger", oracle=_ALERT_WRITER_ORACLE,
       doc="Alert DELIVERY as a Python DataSource streaming SINK "
           "(format streamalert_outputs): 60 alerts stream through 2 "
           "micro-batches; write(iterator) runs ON THE EXECUTORS, builds "
           "each output's request body with the transport-free builders, "
           "stages a task-local ledger file keyed by taskAttemptId, and "
           "commit() promotes staged files to attempt-unique epoch names "
           "and atomically writes the epoch MANIFEST (the commit point; "
           "readers consume only manifest-listed files, so a crash "
           "between renames and manifest plus a differently-partitioned "
           "retry still yields exactly-once receipts; re-commit discards "
           "its staging, abort removes it) — Spark's file-sink pattern, "
           "replacing the driver-side foreachBatch iterator for delivery "
           "at scale. The hash check covers the committed ledger "
           "receipts (id, output, canonical body md5).")
def alert_output_writer_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from streamalert_spark.sources.alert_writer import (
        read_ledger, register_alert_writer,
    )
    from streamalert_spark.sources.app_source import register_app_source

    register_app_source(spark)
    register_alert_writer(spark)
    work = tempfile.mkdtemp(prefix="alert_writer_q_")
    ledger_dir = f"{work}/ledger"
    try:
        src = (
            spark.readStream.format("streamalert_app")
            .option("app", "synthetic").option("end_timestamp", "60")
            # 2 micro-batches (40+20): the crash-window property needs a
            # second epoch commit and nothing more — the exactly-once
            # receipt semantics are per-commit, not per-row, so 60
            # alerts exercise the identical protocol 200 did (r9
            # verdict: bench hygiene, cut the demo floor)
            .option("page_size", "40")
            .load()
            .select(
                F.concat(F.lit("al-"),
                         F.col("event_timestamp").cast("string")).alias("id"),
                F.concat(F.lit("rule_"),
                         F.pmod("event_timestamp", F.lit(3)).cast("string"))
                 .alias("rule_name"),
                F.concat(F.lit('["json:chan-'),
                         F.pmod("event_timestamp", F.lit(2)).cast("string"),
                         F.lit('"]')).alias("outputs"),
            )
        )
        with bounded_stream_shuffle(spark):
            q = (
                src.writeStream.format("streamalert_outputs")
                .option("path", ledger_dir)
                .option("checkpointLocation", f"{work}/ckpt")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        rows = [tuple(r) for r in
                read_ledger(spark, ledger_dir)
                .select("id", "output", "body_md5").collect()]
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return (
        local_rows_df(spark, rows, "id string, output string, body_md5 string")
        .repartition(1).sortWithinPartitions("id", "output")
    )


# ---------------------------------- streaming outer join, bounded

_STREAM_OUTER_JOIN_ORACLE = """
SELECT CAST(i AS BIGINT) AS k,
       CASE WHEN i % 2 = 0 THEN CAST(i AS BIGINT) END AS matched_k,
       i % 2 = 0 AS matched
FROM range(1, 301) t(i)
WHERE i % 2 = 0            -- inner matches emit as they arrive
   OR i + 10 < 300         -- unmatched emit nulls once the watermark
                           -- (max event time 300, 0s delay) passes
                           -- their join horizon lts + 10s
ORDER BY k
"""


@query("stream_outer_join_bounded", oracle=_STREAM_OUTER_JOIN_ORACLE,
       doc="STREAMING LEFT OUTER stream-stream join under the hash gate: "
           "two live streams join on key + a 10s event-time range; "
           "matches emit as they arrive, and an UNMATCHED left row emits "
           "its null-padded form only when the watermark proves no match "
           "can still come (state evicted at lts + range) — rows whose "
           "horizon is still open at end of stream are correctly "
           "withheld. The oracle is the batch definition restricted to "
           "the closed horizon.")
def stream_outer_join_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.sources.app_source import register_app_source
    from streamalert_spark.streaming.bounded import run_bounded_to_rows
    from streamalert_spark.streaming.join import stream_stream_join

    register_app_source(spark)
    left = (
        spark.readStream.format("streamalert_app")
        .option("app", "synthetic").option("end_timestamp", "300")
        .option("page_size", "150")
        .load()
        .select(F.col("event_timestamp").alias("k"),
                F.timestamp_seconds("event_timestamp").alias("lts"))
    )
    # right keys are the EVEN numbers 2..600: every even left key
    # matches at the same event time, every odd one never does
    right = (
        spark.readStream.format("streamalert_app")
        .option("app", "synthetic").option("end_timestamp", "300")
        .option("page_size", "150")
        .load()
        .select((F.col("event_timestamp") * 2).alias("k2"),
                F.timestamp_seconds(F.col("event_timestamp") * 2)
                 .alias("rts"))
    )
    joined = stream_stream_join(
        left, right, F.col("k") == F.col("k2"),
        left_ts="lts", right_ts="rts",
        left_watermark="0 seconds", right_watermark="0 seconds",
        range_after="10 seconds", how="left_outer",
    )
    out = joined.select("k", F.col("k2").alias("matched_k"),
                        F.col("k2").isNotNull().alias("matched"))
    rows = run_bounded_to_rows(
        spark, out, "k bigint, matched_k bigint, matched boolean")
    return rows.repartition(1).sortWithinPartitions("k")


# ------------------------------------- streaming late-data drops, bounded

_LATE_DATA_ORACLE = """
WITH arr AS (
  -- three ARRIVAL batches; batch 2 carries three LATE rows from the
  -- batch-0 era (t=55, t=100 target windows already evicted; t=130's
  -- window is still live)
  SELECT t, 0 AS b FROM range(1, 151) s(t)
  UNION ALL SELECT t, 1 FROM range(151, 211) s(t)
  UNION ALL SELECT t, 2 FROM range(211, 271) s(t)
  UNION ALL SELECT * FROM (VALUES (55, 2), (100, 2), (130, 2)) v(t, b)
),
-- watermark IN EFFECT during batch b = max event time of PRIOR batches
-- minus the 30s delay (advances only between batches)
wm AS (
  SELECT bb.b,
         COALESCE((SELECT MAX(t) FROM arr a2 WHERE a2.b < bb.b), 30) - 30
           AS w
  FROM (SELECT DISTINCT b FROM arr) bb(b)
),
-- Spark's actual protocol: a late row still MERGES into live state; it
-- is dropped only when its window was already EVICTED, i.e. emitted at
-- the end of an earlier batch — window_end <= watermark in effect
-- during the PREVIOUS batch
kept AS (
  SELECT a.t FROM arr a
  LEFT JOIN wm prev ON prev.b = a.b - 1
  WHERE prev.w IS NULL OR (a.t // 60) * 60 + 60 > prev.w
),
final_wm AS (SELECT MAX(t) - 30 AS w FROM arr),
agg AS (
  SELECT (t // 60) * 60 AS ws, COUNT(*) AS cnt FROM kept GROUP BY 1
)
SELECT CAST(ws AS BIGINT) AS window_start,
       CAST(ws + 60 AS BIGINT) AS window_end, cnt
FROM agg, final_wm
WHERE ws + 60 <= final_wm.w
ORDER BY window_start
"""


@query("stream_late_data_bounded", oracle=_LATE_DATA_ORACLE,
       doc="STREAMING late-data accounting under the hash gate: events "
           "arrive as 3 parquet files consumed one per micro-batch "
           "(deterministic batch boundaries via maxFilesPerTrigger + "
           "mtime order); batch 2 carries three LATE rows from batch "
           "0's era. Two target windows the watermark already EVICTED "
           "(emitted at the end of batch 1) and are dropped; the third "
           "targets a still-live window and is correctly merged. The "
           "oracle replays Spark's actual protocol — late rows merge "
           "into LIVE state, drop only when window_end <= the watermark "
           "in effect during a PRIOR batch (eviction), emit when "
           "window_end <= final watermark — so the hash pins the "
           "eviction boundary, not the naive "
           "drop-everything-behind-the-watermark model (which Spark "
           "does NOT implement for aggregations)."
           " test_streaming.py additionally pins "
           "numRowsDroppedByWatermark == 2 for this exact scenario.")
def stream_late_data_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from streamalert_spark.streaming.bounded import run_bounded_to_rows

    work = tempfile.mkdtemp(prefix="late_data_q_")
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir)
    batches = [
        ("a.parquet", list(range(1, 151)), 1_000_000),
        ("b.parquet", list(range(151, 211)), 1_000_010),
        ("c.parquet", list(range(211, 271)) + [55, 100, 130], 1_000_020),
    ]
    try:
        for name, ts, mtime in batches:
            path = os.path.join(in_dir, name)
            pq.write_table(pa.table({"t": ts}), path)
            os.utime(path, (mtime, mtime))
        src = (
            spark.readStream.schema("t bigint")
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
            .select(F.timestamp_seconds("t").alias("ts"))
        )
        agg = (
            src.withWatermark("ts", "30 seconds")
            .groupBy(F.window("ts", "1 minute"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.unix_timestamp("window.start").alias("window_start"),
                    F.unix_timestamp("window.end").alias("window_end"),
                    "cnt")
        )
        rows = run_bounded_to_rows(
            spark, agg,
            "window_start bigint, window_end bigint, cnt bigint")
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return rows.repartition(1).sortWithinPartitions("window_start")


# ------------------------------------- streaming CEP sequence match, bounded

from streamalert_spark.queries.analytics_ext import _PATTERN_SEQ_ORACLE


@query("stream_pattern_match_bounded", oracle=_PATTERN_SEQ_ORACLE,
       doc="STREAMING CEP sequence match: the pattern_sequence_alerts "
           "rule (>= 2 consecutive errors then purchase within 30 days) "
           "run as a per-user applyInPandasWithState state machine over "
           "3 deterministic micro-batches (events split into time "
           "terciles, one file per trigger). State = three bigints per "
           "live key; a failure run that spans a batch boundary still "
           "matches -- the cross-batch property the batch oracle cannot "
           "see but this hash pins, because the oracle IS the batch CEP "
           "SQL and the stream must agree with it exactly.")
def stream_pattern_match_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from streamalert_spark.session import read_table
    from streamalert_spark.streaming.bounded import run_bounded_to_rows
    from streamalert_spark.streaming.cep import OUT_SCHEMA, pattern_match_stream

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_timestamp("ts").alias("es"))
    lo, hi = ev.agg(F.min("es"), F.max("es")).first()
    b1 = lo + (hi - lo) // 3
    b2 = lo + 2 * (hi - lo) // 3
    work = tempfile.mkdtemp(prefix="cep_stream_q_")
    in_dir = os.path.join(work, "in")
    try:
        for i, cond in enumerate([
            F.col("es") <= b1,
            (F.col("es") > b1) & (F.col("es") <= b2),
            F.col("es") > b2,
        ]):
            part = os.path.join(in_dir, f"b{i}")
            ev.filter(cond).coalesce(1).write.parquet(part)
            os.utime(part, (1_000_000 + 10 * i,) * 2)
            for f in os.listdir(part):
                os.utime(os.path.join(part, f),
                         (1_000_000 + 10 * i,) * 2)
        src = (
            spark.readStream
            .schema("user_id bigint, event_id bigint, "
                    "event_type string, es bigint")
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(in_dir, "*"))
        )
        out = pattern_match_stream(src)
        rows = run_bounded_to_rows(spark, out, OUT_SCHEMA)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return rows.repartition(1).sortWithinPartitions("user_id", "run_start_s")


# the ooo demo runs on a deterministic 1-in-5 key subset (~300 keys /
# 20k rows at sf0.1): the buffered-reorder semantics are per-key, so a
# key subset exercises the identical protocol while keeping the demo's
# Python state-machine work (every row round-trips the buffer) off the
# bench's critical path. Oracle = the SAME batch CEP SQL on the SAME
# subset.
# str.replace substitutes EVERY occurrence — pin the marker to exactly
# one hit so a future edit adding another bare "  FROM events" line to
# the shared oracle cannot silently corrupt the subset oracle.
assert _PATTERN_SEQ_ORACLE.count("  FROM events\n") == 1, (
    "pattern-seq oracle gained a second '  FROM events' scan; the "
    "subset rewrite below would corrupt it — use a unique marker")
_PATTERN_SEQ_ORACLE_SUBSET = _PATTERN_SEQ_ORACLE.replace(
    "  FROM events\n",
    "  FROM events WHERE user_id % 5 = 0\n",
)
assert "WHERE user_id % 5 = 0" in _PATTERN_SEQ_ORACLE_SUBSET


@query("stream_pattern_match_ooo_bounded", oracle=_PATTERN_SEQ_ORACLE_SUBSET,
       doc="STREAMING CEP over OUT-OF-ORDER input: events are split into "
           "3 micro-batches by jittered event time (a deterministic "
           "per-event jitter pushes events near tercile boundaries into "
           "the WRONG batch, so per-key event-time order is violated "
           "across batches), then a sentinel batch advances the "
           "watermark past everything. pattern_match_stream_ordered "
           "buffers rows in per-key state and feeds the CEP machine in "
           "event-time order only once the watermark passes them (the "
           "Flink CEP design); event-time timeouts flush keys with no "
           "follow-up data and evict live runs whose success horizon "
           "passed. The oracle is the SAME batch CEP SQL — the hash pins "
           "that watermark-staged reordering reproduces in-order "
           "semantics exactly.")
def stream_pattern_match_ooo_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from streamalert_spark.session import read_table
    from streamalert_spark.streaming.bounded import run_bounded_to_rows
    from streamalert_spark.streaming.cep import (
        OUT_SCHEMA, pattern_match_stream_ordered,
    )

    ev = (read_table(spark, sf_dir, "events")
          .filter(F.col("user_id") % 5 == 0)
          .select("user_id", "event_id", "event_type",
                  F.unix_timestamp("ts").alias("es")))
    lo, hi = ev.agg(F.min("es"), F.max("es")).first()
    jit = int((hi - lo) // 6 + 1)  # disorder bound = watermark delay
    # deterministic jitter in [0, jit): Knuth multiplicative hash of the
    # unique event_id — events within `jit` of a tercile boundary can land
    # in the adjacent batch, violating per-key order across batches
    shifted = ev.withColumn(
        "_s",
        F.col("es") + F.pmod(
            F.pmod(F.col("event_id") * F.lit(2654435761),
                   F.lit(2 ** 31)), F.lit(jit)))
    # one jittered boundary is enough to violate per-key order across
    # batches (cross-batch disorder is what the buffer must fix; the
    # multi-boundary shape is pinned by test_cep_ordered_out_of_order_input)
    # — 3 triggers instead of 4 keeps the demo's micro-batch floor down
    c1 = lo + (hi + jit - lo) // 2
    work = tempfile.mkdtemp(prefix="cep_ooo_q_")
    in_dir = os.path.join(work, "in")
    try:
        parts = [
            shifted.filter(F.col("_s") <= c1),
            shifted.filter(F.col("_s") > c1),
            # sentinel: one throwaway key advancing the watermark past
            # every buffered row so event-time timeouts flush them
            local_rows_df(
                spark, [(-1, 0, "view", int(hi + 2 * jit + 1000))],
                "user_id bigint, event_id bigint, event_type string, "
                "es bigint"),
        ]
        for i, part_df in enumerate(parts):
            part = os.path.join(in_dir, f"b{i}")
            part_df.select("user_id", "event_id", "event_type", "es") \
                .coalesce(1).write.parquet(part)
            os.utime(part, (1_000_000 + 10 * i,) * 2)
            for f in os.listdir(part):
                os.utime(os.path.join(part, f),
                         (1_000_000 + 10 * i,) * 2)
        src = (
            spark.readStream
            .schema("user_id bigint, event_id bigint, "
                    "event_type string, es bigint")
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(in_dir, "*"))
        )
        out = pattern_match_stream_ordered(
            src, watermark_delay=f"{jit} seconds")
        rows = run_bounded_to_rows(spark, out, OUT_SCHEMA)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return (rows.filter(F.col("user_id") >= 0)
            .repartition(1).sortWithinPartitions("user_id", "run_start_s"))


# --------------------------------------- stream-static enrichment, bounded

_STREAM_STATIC_ORACLE = """
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE), 2)
         AS total_value
FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


@query("stream_static_enrich_bounded", oracle=_STREAM_STATIC_ORACLE,
       doc="STREAM-STATIC join under the hash gate: events stream "
           "through 2 micro-batches and each batch joins the STATIC "
           "nation dimension (the Spark pattern for enriching a stream "
           "against a slowly-changing reference table — the static side "
           "is re-planned per micro-batch, so a refreshed dim is picked "
           "up without restarting). The dim is scale-free (25 rows at "
           "every SF) and broadcast; the stream side never shuffles for "
           "the join. Oracle is the equivalent batch join + rollup.")
def stream_static_enrich_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from streamalert_spark.session import read_table
    from streamalert_spark.streaming.bounded import run_bounded_to_rows

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.col("value").cast("decimal(18,6)").alias("v"))
    work = tempfile.mkdtemp(prefix="stream_static_q_")
    in_dir = os.path.join(work, "in")
    try:
        for i, cond in enumerate([F.col("event_id") % 2 == 0,
                                  F.col("event_id") % 2 == 1]):
            part = os.path.join(in_dir, f"b{i}")
            ev.filter(cond).coalesce(1).write.parquet(part)
            os.utime(part, (1_000_000 + 10 * i,) * 2)
            for f in os.listdir(part):
                os.utime(os.path.join(part, f), (1_000_000 + 10 * i,) * 2)
        src = (
            spark.readStream
            .schema("event_id bigint, user_id bigint, v decimal(18,6)")
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(in_dir, "*"))
        )
        nat = read_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").cast("bigint").alias("n_nationkey"),
            "n_name")
        enriched = src.join(
            F.broadcast(nat),
            F.pmod(F.col("user_id"), F.lit(25)) == F.col("n_nationkey"))
        rows = run_bounded_to_rows(
            spark, enriched.select("event_id", "n_name", "v"),
            "event_id bigint, n_name string, v decimal(18,6)")
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return (
        rows.groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
             F.round(F.sum("v").cast("double"), 2).alias("total_value"))
        .repartition(1).sortWithinPartitions("n_name")
    )


# --------------------------------------- streaming HLL distinct, bounded

def _stream_hll_oracle() -> str:
    from streamalert_spark.ops.sketch import (
        HLL_M, HLL_NUMERATOR, hll_bucket_sql, hll_rho_sql, hll_term_sql,
        hll_trimmed_sql,
    )

    return f"""
WITH vals AS (
  SELECT DISTINCT CAST(i % 3 AS BIGINT) AS grp, CAST(i % 83 AS VARCHAR) AS v
  FROM range(1, 301) t(i)
),
hashed AS (SELECT grp, v, {hll_trimmed_sql('v')} AS trimmed FROM vals),
rhos AS (
  SELECT grp, {hll_bucket_sql('v')} AS bucket,
         {hll_rho_sql('trimmed')} AS rho
  FROM hashed
),
regs AS (SELECT grp, bucket, MAX(rho) AS m_j FROM rhos GROUP BY 1, 2),
spine AS (
  SELECT g.grp, t.b AS bucket
  FROM (SELECT DISTINCT grp FROM vals) g, range(0, {HLL_M}) t(b)
),
terms AS (
  SELECT s.grp, {hll_term_sql('r.m_j')} AS term
  FROM spine s LEFT JOIN regs r
    ON r.grp = s.grp AND r.bucket = s.bucket
),
sums AS (
  SELECT grp, CAST(SUM(term) AS BIGINT) AS hll_sum FROM terms GROUP BY grp
)
SELECT grp, hll_sum,
       ROUND({HLL_NUMERATOR!r} / CAST(hll_sum AS DOUBLE), 4) AS hll_estimate
FROM sums ORDER BY grp
"""


@query("stream_hll_distinct_bounded", oracle=_stream_hll_oracle(),
       doc="STREAMING distinct-count via a mergeable HLL sketch: the "
           "rho/bucket derivation runs JVM-side in the stream's "
           "projection, a NATIVE stateful max aggregation maintains the "
           "64 registers per group across micro-batches (state size is "
           "groups x 64 regardless of cardinality — the reason to sketch "
           "a stream instead of counting distinct), update-mode emissions "
           "land in an append-only ledger where max() makes retried "
           "batches idempotent, and the harmonic sum + estimate are "
           "computed batch-side from the final registers. Hash-checked "
           "against the batch HLL definition over the full input.")
def stream_hll_distinct_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from streamalert_spark.ops.sketch import (
        HEX_INT_DIGITS, HLL_M, HLL_NUMERATOR, _hll_rho_from,
        hex_prefix_int, hll_sums,
    )
    from streamalert_spark.sources.app_source import register_app_source

    register_app_source(spark)
    work = tempfile.mkdtemp(prefix="hll_stream_q_")
    try:
        src = (
            spark.readStream.format("streamalert_app")
            .option("app", "synthetic").option("end_timestamp", "300")
            .option("page_size", "100")
            .load()
        )
        v = F.pmod("event_timestamp", F.lit(83)).cast("string")
        updates = (
            src.select(
                F.pmod("event_timestamp", F.lit(3)).cast("bigint")
                 .alias("grp"),
                F.pmod(hex_prefix_int(F.md5(F.concat(F.lit("hb:"), v))),
                       F.lit(HLL_M)).alias("bucket"),
                _hll_rho_from(
                    F.substring(F.md5(F.concat(F.lit("hr:"), v)),
                                1, HEX_INT_DIGITS)).alias("rho"),
            )
            .groupBy("grp", "bucket")
            .agg(F.max("rho").alias("m_j"))
        )

        def sink(batch_df, epoch_id):
            batch_df.write.mode("append").parquet(f"{work}/regs")

        with bounded_stream_shuffle(spark):
            q = (
                updates.writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", f"{work}/ckpt")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        rows = (spark.read
                .schema("grp bigint, bucket bigint, m_j int")
                .parquet(f"{work}/regs").collect())
    finally:
        shutil.rmtree(work, ignore_errors=True)
    emitted = (local_rows_df(spark, rows, "grp bigint, bucket bigint, m_j int")
               .withColumn("bucket", F.col("bucket").cast("int")))
    regs = emitted.groupBy("grp", "bucket").agg(F.max("m_j").alias("m_j"))
    groups = emitted.select("grp").distinct()
    sums = hll_sums(groups, regs, "grp")
    return (
        sums.select(
            "grp", "hll_sum",
            F.round(F.lit(HLL_NUMERATOR) / F.col("hll_sum").cast("double"), 4)
             .alias("hll_estimate"),
        )
        .repartition(1).sortWithinPartitions("grp")
    )


# ---------------------------------- streaming histogram quantiles, bounded

_STREAM_HIST_ORACLE = """
WITH vals AS (
  SELECT CAST(i % 3 AS BIGINT) AS grp,
         CAST((i * i) % 977 AS DOUBLE) AS v
  FROM range(1, 301) t(i)
),
hist AS (
  SELECT grp, CAST(floor(v / 10.0) AS BIGINT) AS bucket, COUNT(*) AS cnt
  FROM vals GROUP BY 1, 2
),
c AS (
  SELECT grp, bucket, cnt,
         SUM(cnt) OVER (PARTITION BY grp ORDER BY bucket) AS cum
  FROM hist
),
j AS (
  SELECT c.*, cum - cnt AS cum_before,
         MAX(cum) OVER (PARTITION BY grp) AS n
  FROM c
)
SELECT grp,
       MAX(CASE WHEN cum_before < 0.5 * n AND cum >= 0.5 * n
                THEN ROUND(bucket * 10.0 + 10.0 * (0.5 * n - cum_before) / cnt, 6)
           END) AS p50_est,
       MAX(CASE WHEN cum_before < 0.9 * n AND cum >= 0.9 * n
                THEN ROUND(bucket * 10.0 + 10.0 * (0.9 * n - cum_before) / cnt, 6)
           END) AS p90_est,
       MAX(CASE WHEN cum_before < 0.99 * n AND cum >= 0.99 * n
                THEN ROUND(bucket * 10.0 + 10.0 * (0.99 * n - cum_before) / cnt, 6)
           END) AS p99_est,
       CAST(MAX(n) AS BIGINT) AS n_events
FROM j GROUP BY grp ORDER BY grp
"""


@query("stream_histogram_quantiles_bounded", oracle=_STREAM_HIST_ORACLE,
       doc="STREAMING quantile monitoring via a mergeable fixed-width "
           "histogram: a NATIVE stateful count per (group, bucket) "
           "accumulates across micro-batches (state = occupied buckets, "
           "independent of row count — the reason to histogram a stream "
           "instead of sorting it), update-mode emissions land in an "
           "append ledger where the cumulative counts make retries "
           "idempotent (max = final), and the quantile interpolation "
           "runs batch-side on the final bins via the SAME merge-side "
           "estimator the batch sketch uses. Hash-checked against the "
           "batch histogram definition over the full input.")
def stream_histogram_quantiles_bounded(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from streamalert_spark.ops.sketch import quantiles_from_histogram
    from streamalert_spark.sources.app_source import register_app_source

    register_app_source(spark)
    work = tempfile.mkdtemp(prefix="hist_stream_q_")
    try:
        src = (
            spark.readStream.format("streamalert_app")
            .option("app", "synthetic").option("end_timestamp", "300")
            .option("page_size", "100")
            .load()
        )
        i = F.col("event_timestamp")
        updates = (
            src.select(
                F.pmod(i, F.lit(3)).cast("bigint").alias("grp"),
                F.floor(F.pmod(i * i, F.lit(977)).cast("double") / 10.0)
                 .cast("bigint").alias("bucket"),
            )
            .groupBy("grp", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

        def sink(batch_df, epoch_id):
            batch_df.write.mode("append").parquet(f"{work}/bins")

        with bounded_stream_shuffle(spark):
            q = (
                updates.writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", f"{work}/ckpt")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        rows = (spark.read
                .schema("grp bigint, bucket bigint, cnt bigint")
                .parquet(f"{work}/bins").collect())
    finally:
        shutil.rmtree(work, ignore_errors=True)
    emitted = local_rows_df(spark, rows, "grp bigint, bucket bigint, cnt bigint")
    # update-mode emissions are cumulative per key -> max is the final bin
    final_bins = emitted.groupBy("grp", "bucket").agg(
        F.max("cnt").alias("cnt"))
    return (
        quantiles_from_histogram(final_bins, "grp", width=10.0)
        .repartition(1).sortWithinPartitions("grp")
    )


# ------------------------------------ streaming decayed counters, bounded

_STREAM_DECAY_ORACLE = """
WITH e AS (
  SELECT CAST(i % 5 AS BIGINT) AS k, i AS seq,
         CAST(i // 60 AS BIGINT) AS h,
         CAST((i % 7) + 1 AS BIGINT) AS v
  FROM range(1, 301) t(i)
),
folded AS (
  SELECT k,
         list_reduce(
           list(row(h, v * 1000000) ORDER BY seq),
           (acc, x) -> row(x[1],
                           acc[2] // (CAST(1 AS BIGINT)
                             << CAST(least(x[1] - acc[1], 62) AS INT))
                           + x[2])) AS m
  FROM e GROUP BY k
)
SELECT k, CAST(m[1] AS BIGINT) AS last_h, CAST(m[2] AS BIGINT) AS score_fp
FROM folded ORDER BY k
"""


@query("stream_decayed_counters_bounded", oracle=_STREAM_DECAY_ORACLE,
       doc="STREAMING half-life decayed risk counters: per-key "
           "(last_hour, score) state folded across micro-batches — "
           "score integer-halves once per elapsed hour, then the event "
           "adds v*1e6. Exact against the one-shot batch fold because "
           "floor division NESTS over power-of-two divisors, so the "
           "oracle reproduces the identical value with DuckDB's "
           "list_reduce. State is TWO BIGINTs per key (optional idle "
           "TTL evicts keys whose score has decayed to ~0); update-mode "
           "emissions land in an epoch ledger, latest epoch wins.")
def stream_decayed_counters_bounded(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from streamalert_spark.sources.app_source import register_app_source
    from streamalert_spark.streaming.decay import decayed_counters_stream

    register_app_source(spark)
    work = tempfile.mkdtemp(prefix="decay_stream_q_")
    try:
        src = (
            spark.readStream.format("streamalert_app")
            .option("app", "synthetic").option("end_timestamp", "300")
            .option("page_size", "100")
            .load()
        )
        i = F.col("event_timestamp")
        ev = src.select(
            F.pmod(i, F.lit(5)).cast("bigint").alias("k"),
            i.cast("bigint").alias("seq"),
            F.expr("event_timestamp DIV 60").cast("bigint").alias("h"),
            (F.pmod(i, F.lit(7)) + 1).cast("bigint").alias("v"),
        )
        out = decayed_counters_stream(ev)

        def sink(batch_df, epoch_id):
            (batch_df.withColumn("epoch", F.lit(int(epoch_id)))
             .write.mode("append").parquet(f"{work}/led"))

        with bounded_stream_shuffle(spark):
            q = (
                out.writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", f"{work}/ckpt")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        rows = (spark.read
                .schema("k bigint, last_h bigint, score_fp bigint, "
                        "epoch bigint")
                .parquet(f"{work}/led").collect())
    finally:
        shutil.rmtree(work, ignore_errors=True)
    led = local_rows_df(
        spark, rows, "k bigint, last_h bigint, score_fp bigint, epoch bigint")
    final = led.groupBy("k").agg(
        F.max_by(F.struct("last_h", "score_fp"), "epoch").alias("m"))
    return (
        final.select("k", F.col("m.last_h").alias("last_h"),
                     F.col("m.score_fp").alias("score_fp"))
        .repartition(1).sortWithinPartitions("k")
    )


# --------------------------------------- streaming EWMA control chart, bounded

from streamalert_spark.queries.analytics_sketch import _EWMA_ORACLE


@query("stream_ewma_alerts_bounded", oracle=_EWMA_ORACLE,
       doc="STREAMING EWMA control chart: the ewma_control_chart batch "
           "query run as a per-type applyInPandasWithState fold across "
           "3 hour-aligned micro-batches — state is (last_hour, s_fp), "
           "empty spine hours fold x=0, and the alert set (count "
           "doubles the smoothed baseline) must equal the batch "
           "recursive-CTE walk exactly: every fold step is "
           "non-negative integer floor division, so stream and batch "
           "are bit-identical. The fold consumes JVM-side HOURLY "
           "AGGREGATES (r10: the demo previously streamed raw events "
           "through Python state — counting per hour is a map-side "
           "combine, and at scale the Arrow transfer should carry "
           "|types| x |hours| rows, not the corpus). Oracle = the SAME "
           "batch EWMA SQL; alert-only emission means no watermark "
           "sentinel batch is needed. State: two bigints per event "
           "TYPE (bounded domain).")
def stream_ewma_alerts_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from streamalert_spark.session import read_table
    from streamalert_spark.streaming.bounded import run_bounded_to_rows
    from streamalert_spark.streaming.decay import (
        EWMA_OUT_SCHEMA, ewma_alerts_stream,
    )

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
               "00:00:00', ts) DIV 1000000 DIV 3600").alias("h"))
    # the stateful fold consumes HOURLY AGGREGATES (its input contract —
    # see ewma_alerts_stream): count once JVM-side, materialize the tiny
    # (type, hour, x) frame, and the three demo batches are a few
    # hundred rows each instead of three full raw-event parquet writes
    hourly = (ev.groupBy("event_type", "h")
              .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
              .localCheckpoint())
    lo, hi = hourly.agg(F.min("h"), F.max("h")).first()
    # hour-aligned tercile splits: each micro-batch carries WHOLE hours,
    # preserving the stateful fold's per-key event-time order contract
    c1 = lo + (hi - lo) // 3
    c2 = lo + 2 * (hi - lo) // 3
    work = tempfile.mkdtemp(prefix="ewma_stream_q_")
    in_dir = os.path.join(work, "in")
    try:
        for i, cond in enumerate([
            F.col("h") <= c1,
            (F.col("h") > c1) & (F.col("h") <= c2),
            F.col("h") > c2,
        ]):
            part = os.path.join(in_dir, f"b{i}")
            hourly.filter(cond).coalesce(1).write.parquet(part)
            os.utime(part, (1_000_000 + 10 * i,) * 2)
            for f in os.listdir(part):
                os.utime(os.path.join(part, f), (1_000_000 + 10 * i,) * 2)
        src = (
            spark.readStream
            .schema("event_type string, h bigint, x bigint")
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(in_dir, "*"))
        )
        out = ewma_alerts_stream(src, lo_hour=int(lo))
        rows = run_bounded_to_rows(spark, out, EWMA_OUT_SCHEMA)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return rows.repartition(1).sortWithinPartitions("event_type", "h")


# --------------------------------------- streaming TWAP/LOCF steps, bounded

_TWAP_STEPS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
  WHERE user_id IS NOT NULL AND value IS NOT NULL AND user_id % 10 = 0
),
stepped AS (
  SELECT user_id, event_id, s, cents,
         LEAD(s) OVER (PARTITION BY user_id ORDER BY s, event_id)
           AS next_s
  FROM seq
)
SELECT user_id, event_id, s, next_s, cents,
       CAST(cents * (next_s - s) AS BIGINT) AS area_inc
FROM stepped WHERE next_s IS NOT NULL
ORDER BY user_id, s, event_id
"""


@query("stream_twap_steps_bounded", oracle=_TWAP_STEPS_ORACLE,
       doc="STREAMING LOCF metering: twap_locf_per_user's step integral "
           "run as a per-user applyInPandasWithState operator across 3 "
           "micro-batches — each arriving observation CLOSES the "
           "previous one's step and emits its exact cent-second area; "
           "the carried state is (last_s, last_eid, last_cents), three "
           "bigints per live meter, so a step spanning a batch boundary "
           "emits bit-identically to the batch LEAD window (the hash "
           "pins exactly that cross-batch continuity). Demo runs on the "
           "deterministic 1-in-10 user subset; batches split on second "
           "boundaries so same-second ties stay within one batch, per "
           "the operator's ordering contract. Oracle = the batch "
           "stepped CTE on the same subset.")
def stream_twap_steps_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from streamalert_spark.session import read_table
    from streamalert_spark.streaming.bounded import run_bounded_to_rows
    from streamalert_spark.streaming.decay import (
        TWAP_OUT_SCHEMA, twap_steps_stream,
    )

    seq = (read_table(spark, sf_dir, "events")
           .filter(F.col("user_id").isNotNull() & F.col("value").isNotNull()
                   & (F.col("user_id") % 10 == 0))
           .select("user_id", "event_id",
                   F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ "
                          "'1970-01-01 00:00:00', ts) DIV 1000000")
                   .alias("s"),
                   F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
                   .alias("cents"))
           .localCheckpoint())
    lo, hi = seq.agg(F.min("s"), F.max("s")).first()
    c1 = lo + (hi - lo) // 3
    c2 = lo + 2 * (hi - lo) // 3
    work = tempfile.mkdtemp(prefix="twap_stream_q_")
    in_dir = os.path.join(work, "in")
    try:
        for i, cond in enumerate([
            F.col("s") <= c1,
            (F.col("s") > c1) & (F.col("s") <= c2),
            F.col("s") > c2,
        ]):
            part = os.path.join(in_dir, f"b{i}")
            seq.filter(cond).coalesce(1).write.parquet(part)
            os.utime(part, (1_000_000 + 10 * i,) * 2)
            for f in os.listdir(part):
                os.utime(os.path.join(part, f), (1_000_000 + 10 * i,) * 2)
        src = (
            spark.readStream
            .schema("user_id bigint, event_id bigint, s bigint, "
                    "cents bigint")
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(in_dir, "*"))
        )
        out = twap_steps_stream(src)
        rows = run_bounded_to_rows(spark, out, TWAP_OUT_SCHEMA)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return rows.repartition(1).sortWithinPartitions(
        "user_id", "s", "event_id")
