"""Golden-event test runner — the reference's distinctive test layer,
ported as a format (the JSON files are engine-independent).

Reference format (streamalert_cli/test/event.py:33-110): each event file
declares {data | override_record, description, log, service, source} and
optionally {trigger_rules, classify_only, compress,
test_fixtures{lookup_tables, threat_intel}}. The runner feeds the event
through the REAL pipeline and asserts: the record classified as the
declared log type, and the set of triggered rules equals trigger_rules
EXACTLY — unexpected triggers fail too
(streamalert_cli/test/results.py:187-204,280-285).

Option support:
- ``override_record``: deep-merged over a type-default record generated
  from the declared log schema (event.py:78-96).
- ``compress``: gzip the payload and run it through the real Kinesis
  decode path before classification (event.py test option `compress`).
- ``test_fixtures.lookup_tables``: {table: {key: value}} registered into
  the passed LookupTables before the run (handler.py fixture loading).
- ``test_fixtures.threat_intel``: [{ioc_value, sub_type}] rows built into
  a ThreatIntel table for the run; requires the pipeline to carry a
  ThreatIntel (its ioc table is swapped for the fixture rows), mirroring
  the reference's fixture-backed mock table.
- ``publisher_tests``: {output: [tests]} run against the published alert
  representation (docs/source/testing.rst:175-241); each test is
  {jmespath_expression, condition: is|in, value} or the [path, cond,
  value] triple shorthand. Path expressions support the dotted-path
  subset of jmespath the shipped tests use. Requires passing the
  ``dispatcher`` (its per-service publisher lists build the publication).
- ``skip_publishers``: suppress publisher_tests for the event
  (event.py:96-97).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import SparkSession

from streamalert_spark.streaming.pipeline import StreamingPipeline


@dataclass
class GoldenResult:
    event: dict
    classified_as: list[str]
    triggered_rules: set[str]
    passed: bool
    failures: list[str] = field(default_factory=list)


def _deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _default_record(schema_dict: dict) -> dict:
    """Type-default record for override_record events (parsers.py:157-171
    defaults, event.py:78-96 merge semantics)."""
    from streamalert_spark.schema.types import type_default

    out = {}
    for key, tok in schema_dict.items():
        out[key] = _default_record(tok) if isinstance(tok, dict) and tok else type_default(tok)
    return out


def load_golden_events(path: str | Path) -> list[dict]:
    """Load every *.json golden-event file under ``path`` (each file holds
    one event dict or a list of them) — the reference keeps these next to
    each rule; any directory layout works here."""
    events: list[dict] = []
    for fp in sorted(Path(path).rglob("*.json")):
        loaded = json.loads(fp.read_text())
        items = loaded if isinstance(loaded, list) else [loaded]
        for ev in items:
            ev.setdefault("_file", str(fp))
            events.append(ev)
    return events


def _search_path(data, path: str):
    """Dotted-path lookup — the jmespath subset the shipped publisher
    tests use (testing.rst:200). A path that IS a literal key wins at any
    level (jmespath's quoted-identifier form, needed for flat publication
    keys like '@slack.text'); quotes around the whole path are stripped."""
    path = path.strip('"')
    cur = data
    remaining = path.split(".")
    while remaining:
        if not isinstance(cur, dict):
            return None
        whole = ".".join(remaining)
        if whole in cur:
            return cur[whole]
        cur = cur.get(remaining.pop(0))
    return cur


def _run_publisher_tests(event: dict, alert_rows: list[dict], dispatcher) -> list[str]:
    """publisher_tests assertions (testing.rst:175-241): per output under
    test, compose its publisher pipeline over each triggered alert and
    check extracted values."""
    from streamalert_spark.streaming.sinks import compose_publishers

    failures: list[str] = []
    for output, tests in (event.get("publisher_tests") or {}).items():
        service = output.split(":", 1)[0]
        pubs = dispatcher.publishers.get(service, []) if dispatcher else []
        matching = [a for a in alert_rows if output in (a.get("outputs") or [])]
        if not matching:
            failures.append(f"publisher_tests[{output}]: no triggered alert has this output")
            continue
        for alert in matching:
            publication = compose_publishers(pubs, alert)
            for t in tests:
                if isinstance(t, (list, tuple)):
                    path, cond, want = t
                else:
                    path, cond, want = (t["jmespath_expression"], t["condition"], t["value"])
                got = _search_path(publication, path)
                ok = (got == want) if cond == "is" else (
                    want in got if got is not None else False)
                if not ok:
                    failures.append(
                        f"publisher_tests[{output}] {path} {cond} {want!r}: got {got!r}")
    return failures


def run_golden_event(
    spark: SparkSession,
    pipeline: StreamingPipeline,
    event: dict,
    lookups=None,
    dispatcher=None,
) -> GoldenResult:
    """Feed one golden event through classification + rules and assert the
    declared outcomes."""
    fixtures = event.get("test_fixtures", {})
    if fixtures.get("lookup_tables"):
        if lookups is None:
            raise ValueError("event declares lookup_tables fixtures; pass lookups=")
        for tname, data in fixtures["lookup_tables"].items():
            lookups.register_dict(tname, data)
    if fixtures.get("threat_intel"):
        import dataclasses

        from streamalert_spark.enrich.threat_intel import ThreatIntel

        if pipeline.threat_intel is None:
            raise ValueError("event declares threat_intel fixtures; pipeline "
                             "carries no ThreatIntel config")
        ioc_df = spark.createDataFrame(
            [(r["ioc_value"], r.get("sub_type", "")) for r in fixtures["threat_intel"]],
            "ioc_value string, sub_type string",
        )
        pipeline = dataclasses.replace(pipeline, threat_intel=ThreatIntel(
            ioc_df,
            normalized_ioc_types=pipeline.threat_intel.normalized_ioc_types,
            excluded_cidrs=pipeline.threat_intel.excluded_cidrs,
        ))

    if "data" in event:
        data = event["data"]
    else:
        base = _default_record(pipeline.schemas.get(event["log"]).schema)
        data = _deep_merge(base, event["override_record"])
    payload = data if isinstance(data, str) else json.dumps(data)

    if event.get("compress"):
        import base64
        import gzip

        from streamalert_spark.sources.decode import kinesis_decode

        wire = base64.b64encode(gzip.compress(payload.encode(), mtime=0)).decode("ascii")
        source = kinesis_decode(
            spark.createDataFrame([(wire,)], "data string")
        ).select("value")
    else:
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
        alert_rows: list[dict] = []
        if alerts is not None:
            alert_rows = [r.asDict(recursive=True) for r in alerts.collect()]
            for a in alert_rows:
                if isinstance(a.get("record"), str):
                    a["record"] = json.loads(a["record"])
            triggered = {a["rule_name"] for a in alert_rows}
        want_rules = set(event.get("trigger_rules", []))
        if triggered != want_rules:
            failures.append(f"triggered {sorted(triggered)}, expected {sorted(want_rules)}")
        if event.get("publisher_tests") and not event.get("skip_publishers"):
            failures.extend(_run_publisher_tests(event, alert_rows, dispatcher))

    return GoldenResult(
        event=event,
        classified_as=classified_as,
        triggered_rules=triggered,
        passed=not failures,
        failures=failures,
    )
