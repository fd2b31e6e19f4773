"""conf/ directory loading (shared/config.py layout) + the shipped example."""

from __future__ import annotations

import json
from pathlib import Path

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"


def test_load_conf_dir_registers_and_routes():
    from streamalert_spark.schema.loader import load_conf_dir

    reg = load_conf_dir(EXAMPLES / "conf")
    assert set(reg.all()) == {
        "cloudwatch:events", "cloudwatch:flow_logs", "osquery:differential"}
    # family name 'cloudwatch' expands to both types in declared order
    kinesis = [s.name for s in reg.candidates("kinesis", "prod_streamalert")]
    assert kinesis == ["cloudwatch:events", "cloudwatch:flow_logs"]
    s3 = [s.name for s in reg.candidates("s3", "osquery-logs-bucket")]
    assert s3 == ["osquery:differential"]


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
