"""conf/ directory loading (shared/config.py layout) + the shipped example."""

from __future__ import annotations

import json
from pathlib import Path

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"


def test_load_conf_dir_registers_and_routes():
    from streamalert_spark.schema.loader import load_conf_dir

    reg = load_conf_dir(EXAMPLES / "conf")
    assert set(reg.all()) == {
        "cloudwatch:events", "cloudwatch:flow_logs", "osquery:differential",
        "cloudtrail:events", "binaryalert", "carbonblack:ingress.event.procstart",
        "duo:administrator", "duo:authentication", "fleet:results",
        "ghe:general", "okta:logevents", "onelogin:events",
        "packetbeat:dns", "packetbeat:flow", "trendmicro:malwareevent",
        "aliyun:actiontrail", "box:admin_events", "gsuite:reports",
        "pan", "slack:access", "slack:integration", "streamquery:version1"}
    # family name 'cloudwatch' expands to both types in declared order
    kinesis = [s.name for s in reg.candidates("kinesis", "prod_streamalert")]
    assert kinesis == ["cloudwatch:events", "cloudwatch:flow_logs"]
    s3 = [s.name for s in reg.candidates("s3", "osquery-logs-bucket")]
    assert s3 == ["osquery:differential"]
    sns = [s.name for s in reg.candidates("sns", "prefix_cluster_sample_topic")]
    assert sns == ["binaryalert", "trendmicro:malwareevent"]
    app = [s.name for s in reg.candidates(
        "streamalert_app", "prefix_cluster_duo_admin_sm-app-name_app")]
    assert app == ["duo:administrator"]


def test_normalization_spec_from_raw_conf():
    """normalize.py:130-173 — params as a single str-list path, or a list of
    dicts with path/function/condition/send_to_artifacts; condition paths
    are lists."""
    from streamalert_spark.normalize import NormalizationSpec

    spec = NormalizationSpec.from_config({
        "event_name": ["detail", "eventName"],
        "account": [
            {"path": ["account"], "function": "Destination account ID"},
            {"path": ["detail", "userIdentity", "principalId"],
             "function": "Source account ID",
             "condition": {"path": ["detail", "eventType"], "is": "awsapicall"},
             "send_to_artifacts": False},
        ],
    })
    assert spec.types["event_name"][0].path == "detail.eventName"
    assert spec.types["event_name"][0].function is None
    acct = spec.types["account"]
    assert acct[0].path == "account" and acct[0].send_to_artifacts
    assert acct[1].condition == {"path": "detail.eventType", "is": "awsapicall"}
    assert not acct[1].send_to_artifacts

    import pytest as _pytest
    with _pytest.raises(ValueError):
        NormalizationSpec.from_config({"bad": "not-a-list"})
    with _pytest.raises(ValueError):
        NormalizationSpec.from_config({"bad": [{"path": ["a"], "bogus_key": 1}]})


def test_normalization_from_conf_applies(spark):
    """from_config spec drives the generated projection end to end."""
    from pyspark.sql import functions as F

    from streamalert_spark.normalize import NormalizationSpec, Normalizer

    spec = NormalizationSpec.from_config({
        "ip_address": [{"path": ["detail", "sourceIPAddress"],
                        "function": "Source IP addresses"}],
        "event_name": ["detail", "eventName"],
    })
    df = spark.createDataFrame(
        [((("1.2.3.4", "RunInstances"),),)],
        "record struct<detail: struct<sourceIPAddress: string, eventName: string>>",
    )
    out = Normalizer(spec).apply(df, record_col="record")
    row = out.select(
        F.col("streamalert_normalization")["ip_address"][0]["values"][0].alias("ip"),
        F.col("streamalert_normalization")["event_name"][0]["values"][0].alias("ev"),
        "streamalert_record_id",
    ).collect()[0]
    assert row["ip"] == "1.2.3.4" and row["ev"] == "RunInstances"
    assert row["streamalert_record_id"]


def test_example_pipeline_end_to_end(spark):
    from examples.rules.security import build_rules
    from streamalert_spark.schema.loader import load_conf_dir
    from streamalert_spark.streaming.pipeline import StreamingPipeline

    conf = load_conf_dir(EXAMPLES / "conf")
    pipeline = StreamingPipeline(schemas=conf, rules=build_rules(), cluster="prod")
    events = [
        {"account": "1", "detail": {}, "detail-type": "GuardDuty Finding",
         "id": "x", "region": "r", "resources": [], "source": "aws.guardduty",
         "time": "t", "version": "0"},
        {"version": 2, "account": "1", "srcaddr": "a", "dstaddr": "b",
         "srcport": 1, "dstport": 22, "action": "REJECT"},
        {"version": 2, "account": "1", "srcaddr": "a", "dstaddr": "b",
         "srcport": 1, "dstport": 443, "action": "ACCEPT"},
    ]
    source = spark.createDataFrame([(json.dumps(e),) for e in events], "value string")
    alerts = pipeline.build_alerts(source, service="kinesis", resource="prod_streamalert")
    names = sorted(r["rule_name"] for r in alerts.collect())
    assert names == ["flow_denied_ssh", "guard_duty_all"]
