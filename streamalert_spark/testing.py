"""Golden-event test runner — the reference's distinctive test layer,
ported as a format (the JSON files are engine-independent).

Reference format (streamalert_cli/test/event.py:33-110): each event file
declares {data | override_record, description, log, service, source} and
optionally {trigger_rules, classify_only, test_fixtures{lookup_tables,
threat_intel}}. The runner feeds the event through the REAL pipeline and
asserts: the record classified as the declared log type, and the set of
triggered rules equals trigger_rules EXACTLY — unexpected triggers fail too
(streamalert_cli/test/results.py:187-204,280-285).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from streamalert_spark.streaming.pipeline import StreamingPipeline


@dataclass
class GoldenResult:
    event: dict
    classified_as: list[str]
    triggered_rules: set[str]
    passed: bool
    failures: list[str] = field(default_factory=list)


def run_golden_event(
    spark: SparkSession,
    pipeline: StreamingPipeline,
    event: dict,
) -> GoldenResult:
    """Feed one golden event through classification + rules and assert the
    declared outcomes."""
    payload = json.dumps(event["data"]) if not isinstance(event["data"], str) else event["data"]
    source = spark.createDataFrame([(payload,)], "value string")
    service = event.get("service", "")
    resource = event.get("source", "")

    clf_batch = __import__(
        "streamalert_spark.classify.classifier", fromlist=["Classifier"]
    ).Classifier(pipeline.schemas).classify(source, raw_col="value",
                                            service=service, resource=resource)
    classified_as = [
        log_type for log_type, df in clf_batch.by_log_type.items() if df.count() > 0
    ]

    failures: list[str] = []
    want_log = event.get("log")
    if want_log and classified_as != [want_log]:
        failures.append(f"classified as {classified_as}, expected [{want_log}]")

    triggered: set[str] = set()
    if not event.get("classify_only"):
        alerts = pipeline.build_alerts(source, service=service, resource=resource)
        if alerts is not None:
            triggered = {r["rule_name"] for r in alerts.select("rule_name").collect()}
        want_rules = set(event.get("trigger_rules", []))
        if triggered != want_rules:
            failures.append(f"triggered {sorted(triggered)}, expected {sorted(want_rules)}")

    return GoldenResult(
        event=event,
        classified_as=classified_as,
        triggered_rules=triggered,
        passed=not failures,
        failures=failures,
    )
