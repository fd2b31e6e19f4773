"""Cloud output request builders (alert_processor/outputs/slack.py,
pagerduty.py request-construction parity, transport-free)."""

from __future__ import annotations

import json

from streamalert_spark.streaming.outputs import (
    elide_middle,
    pagerduty_v1_request,
    pagerduty_v2_request,
    register_cloud_outputs,
    slack_request,
)

_ALERT = {
    "id": "aid-1",
    "rule_name": "my_rule",
    "rule_description": "author: x\ndescription: something bad",
    "record": json.dumps({"user": "bob", "nested": {"k": [1, 2]}}),
    "log_source": "prefix_cluster1_streamalert",
    "outputs": ["slack:alerts", "pagerduty:incidents", "pagerduty-v2:oncall"],
    "context": {},
}


def test_slack_default_request_renders_record_mrkdwn():
    body = slack_request(dict(_ALERT))
    assert body["text"] == "*StreamAlert Rule Triggered: my_rule*"
    assert body["mrkdwn"] is True
    att = body["attachments"][0]
    assert att["title"] == "Record:"
    assert "*Rule Description:*" in att["pretext"]
    # sorted keys, tab-indented nesting, list indices
    assert "*nested:*" in att["text"]
    assert "\t*k:*" in att["text"]
    assert "\t\t*[1]* 1" in att["text"]
    assert "*user:* bob" in att["text"]


def test_slack_default_request_splits_long_records():
    big = {f"key_{i:04d}": "v" * 100 for i in range(120)}
    body = slack_request(dict(_ALERT, record=json.dumps(big)))
    atts = body["attachments"]
    assert len(atts) > 1
    assert atts[0]["title"].startswith("Record (Part 1 of")
    assert all(len(a["text"]) <= 4000 for a in atts)
    assert atts[0]["pretext"] and not atts[1]["pretext"]  # desc on first only


def test_slack_custom_attachments_normalized_and_capped():
    pub = dict(_ALERT)
    pub["@slack.text"] = "custom header"
    pub["@slack.attachments"] = [{"text": "x" * 5000}] + [{"text": "ok"}] * 25
    body = slack_request(pub)
    assert body["text"] == "custom header"
    assert len(body["attachments"]) == 20
    first = body["attachments"][0]
    assert len(first["text"]) <= 4000 and " ... " in first["text"]
    assert first["color"] == "#36a64f" and first["mrkdwn_in"] == ["text", "pretext"]


def test_elide_middle():
    assert elide_middle("abcdef", 10) == "abcdef"
    out = elide_middle("a" * 30 + "b" * 30, 21)
    assert len(out) <= 21 and " ... " in out
    assert out.startswith("aaaa") and out.endswith("bbbb")


def test_pagerduty_v1_body_and_context_validation():
    pub = dict(_ALERT)
    pub["@pagerduty.contexts"] = [
        {"type": "link", "href": "https://x", "text": "t"},
        {"type": "link", "href": "https://x"},           # missing text
        {"type": "image", "src": "https://img"},
        {"type": "nope"}, "not-a-dict",
    ]
    body = pagerduty_v1_request(pub, "incidents", service_key="sk")
    assert body["service_key"] == "sk" and body["event_type"] == "trigger"
    assert body["description"] == "StreamAlert Rule Triggered - my_rule"
    assert body["details"]["record"]["user"] == "bob"
    assert body["contexts"] == [
        {"type": "link", "href": "https://x", "text": "t"},
        {"type": "image", "src": "https://img"},
    ]


def test_pagerduty_v2_body_dedup_and_media_validation():
    pub = dict(_ALERT)
    pub["@pagerduty-v2.images"] = [{"src": "https://i"}, {"href": "no-src"}]
    pub["@pagerduty-v2.links"] = [{"href": "https://l"}, {"text": "no-href"}]
    body = pagerduty_v2_request(pub, "oncall", routing_key="rk")
    assert body["routing_key"] == "rk"
    assert body["dedup_key"] == "oncall:aid-1"
    assert body["payload"]["summary"] == "StreamAlert Rule Triggered - my_rule"
    assert body["payload"]["severity"] == "critical"
    assert body["payload"]["source"] == "prefix_cluster1_streamalert"
    assert body["images"] == [{"src": "https://i", "href": "", "alt": ""}]
    assert body["links"] == [{"href": "https://l", "text": "https://l"}]


def test_layout_publishers_flow_into_builders():
    """Layout publishers set the @service fields the builders prefer —
    the end-to-end presentation path: publisher -> builder body."""
    from streamalert_spark.alerts.layouts import (
        pagerduty_shorten_title,
        pagerduty_v2_high_urgency,
        slack_summary,
    )
    from streamalert_spark.streaming.sinks import compose_publishers

    pub = compose_publishers([slack_summary], dict(_ALERT))
    body = slack_request(pub)
    assert body["text"] == "Rule triggered"
    assert body["attachments"][0]["title"] == "my_rule"

    pub = compose_publishers(
        [pagerduty_shorten_title, pagerduty_v2_high_urgency], dict(_ALERT))
    body = pagerduty_v2_request(pub, "oncall", routing_key="rk")
    assert body["payload"]["summary"] == "my_rule"
    assert body["payload"]["severity"] == "critical"


def test_dispatcher_integration_with_recording_transport():
    from streamalert_spark.streaming.sinks import AlertDispatcher

    sent: list[tuple[str, dict]] = []
    dispatcher = AlertDispatcher()
    register_cloud_outputs(
        dispatcher, lambda service, body: sent.append((service, body)) or True)
    done = dispatcher.dispatch_alert(dict(_ALERT), set())
    assert done == {"slack:alerts", "pagerduty:incidents", "pagerduty-v2:oncall"}
    services = sorted(s for s, _ in sent)
    assert services == ["pagerduty", "pagerduty-v2", "slack"]
    slack_body = next(b for s, b in sent if s == "slack")
    assert slack_body["attachments"]
