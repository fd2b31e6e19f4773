"""Slack/PagerDuty layout publishers + rule-description parsing, pinned to
the reference's behavior (tests/unit/streamalert/shared/test_description.py;
publishers/community/{slack,pagerduty}/*_layout.py)."""

from __future__ import annotations

import json

from streamalert_spark.alerts.description import parse_description, present_description
from streamalert_spark.alerts.layouts import (
    pagerduty_as_custom_details,
    pagerduty_attach_image,
    pagerduty_pretty_print_arrays,
    pagerduty_shorten_title,
    pagerduty_v2_high_urgency,
    pagerduty_v2_low_urgency,
    slack_attach_full_record,
    slack_attach_publication,
    slack_attach_rule_info,
    slack_attach_string_template,
    slack_summary,
)
from streamalert_spark.alerts.publishers import stringify_arrays


# ------------------------------------------------------------- description

def test_parse_simple_and_spacing():
    assert parse_description("\nauthor: Derek Wang\n") == {
        "author": ["Derek Wang"], "description": []}
    assert parse_description("\n\n    author: Derek Wang\n    ") == {
        "author": ["Derek Wang"], "description": []}


def test_parse_no_fields_and_misleading_colons():
    got = parse_description(
        "\nThis rule has no format and thus the entire\n"
        "  string is considered to be lines of the\n  description.\n")
    assert got == {"description": [
        "This rule has no format and thus the entire",
        "string is considered to be lines of the",
        "description.",
    ]}
    got = parse_description(
        "A sentence with colons in strange places. For example: right here\n"
        "But should not have fields because... reasons.")
    assert list(got) == ["description"] and len(got["description"]) == 2


def test_present_multiline_and_urls():
    got = present_description(
        "author: Derek Wang\n"
        "description:  This description\n"
        "    has multiple lines\n"
        "       with inconsistent indentation\n")
    assert got == {"author": "Derek Wang",
                   "description": "This description has multiple lines "
                                  "with inconsistent indentation",
                   "fields": {}}

    got = present_description(
        "reference:    https://www.airbnb.com/\n"
        "                    users/notifications\n"
        "                      ?a=b&$=b20L#hash=value[0]\n")
    assert got["fields"]["reference"] == (
        "https://www.airbnb.com/users/notifications?a=b&$=b20L#hash=value[0]")

    # a line that breaks the URL shape joins with a space instead
    got = present_description(
        "reference:    https://www.airbnb.com/users/notifications\n"
        "              Gets concatenated with this line with a space inbetween.\n")
    assert got["fields"]["reference"] == (
        "https://www.airbnb.com/users/notifications "
        "Gets concatenated with this line with a space inbetween.")


def test_present_http_label_and_adjacent_urls():
    got = present_description(
        "reference:    https://www.airbnb.com/users/notifications\n"
        "              https://www.airbnb.com/account/profile\n"
        "    HTTP URL: https://www.airbnb.com/account/haha\n")
    assert got["fields"]["reference"] == (
        "https://www.airbnb.com/users/notifications"
        "https://www.airbnb.com/account/profile")
    assert got["fields"]["http url"] == "https://www.airbnb.com/account/haha"


def test_present_double_linebreaks_become_newlines():
    got = present_description(
        "description:\n"
        "    Normal linebreaks like\n"
        "    this continue flowing.\n"
        "\n"
        "    A double linebreak makes a newline.\n"
        "\n"
        "\n"
        "    Two blanks make two newlines.\n")
    assert got["description"] == (
        "Normal linebreaks like this continue flowing.\n"
        "A double linebreak makes a newline."
        "\n\n"
        "Two blanks make two newlines.")


# ------------------------------------------------------------------ slack

_ALERT = {
    "id": "abc-123",
    "rule_name": "my_rule",
    "rule_description": "author: someone\ndescription: a thing happened\n"
                        "playbook: wiki/playbooks/thing",
    "created": "2024-03-05T15:28:19.000000Z",
    "record": json.dumps({"field": "value", "n": 1}),
    "context": {},
    "source_entity": "my_stream",
    "source_service": "kinesis",
    "outputs": ["slack:alerts"],
}


def test_slack_summary_shape():
    pub = slack_summary(_ALERT, {"prior": True})
    assert pub["@slack.text"] == "Rule triggered"
    att = pub["@slack.attachments"][0]
    assert att["fallback"] == "Rule triggered: my_rule"
    assert att["color"] == "#ff5a5f"
    assert att["author_name"] == "someone"
    assert att["title"] == "my_rule"
    assert "my_rule" in att["title_link"] and "path" in att["title_link"]
    assert att["text"] == "a thing happened"
    assert att["ts"] == 1709652499
    assert pub["@slack._previous_publication"] == {"prior": True}


def test_slack_attach_rule_info_fields_only():
    pub = slack_attach_rule_info(_ALERT, {})
    fields = pub["@slack.attachments"][0]["fields"]
    assert fields == [{"title": "Playbook", "value": "wiki/playbooks/thing"}]


def test_slack_attach_publication_requires_summary():
    # without the summary's passthrough it is a no-op
    assert slack_attach_publication(_ALERT, {"x": 1}) == {"x": 1}
    pub = slack_summary(_ALERT, {"orig": 1})
    pub = slack_attach_publication(_ALERT, pub)
    att = pub["@slack.attachments"][-1]
    assert att["title"] == "Alert Data:"
    assert '"orig": 1' in att["text"] and att["text"].startswith("```")


def test_slack_attach_string_template_from_context():
    alert = dict(_ALERT, context={"slack_message_template": "Rule {name} hit"})
    pub = slack_attach_string_template(alert, {"name": "X"})
    assert pub["@slack.attachments"][0]["text"] == "Rule X hit"
    pub = slack_attach_string_template(dict(_ALERT, context={}), {})
    assert pub["@slack.attachments"][0]["text"] == "[MISSING TEMPLATE]"


def test_slack_attach_full_record_single_chunk():
    pub = slack_attach_full_record(_ALERT, {})
    atts = pub["@slack.attachments"]
    assert len(atts) == 1
    att = atts[0]
    assert att["title"] == "Record" and att["author"] == "my_stream"
    assert att["fields"] == [{"title": "Alert Id", "value": "abc-123"}]
    assert "kinesis" in att["footer"]
    assert att["text"].startswith("```") and '"field": "value"' in att["text"]


def test_slack_attach_full_record_chunks_long_records():
    big = {f"key_{i}": "v" * 80 for i in range(120)}
    alert = dict(_ALERT, record=json.dumps(big))
    pub = slack_attach_full_record(alert, {})
    atts = pub["@slack.attachments"]
    assert len(atts) > 1
    assert atts[0]["title"] == "Record" and atts[-1]["title"] == ""
    assert atts[0]["fields"] == [] and atts[-1]["fields"][0]["title"] == "Alert Id"
    assert all(len(a["text"]) <= 4000 for a in atts)
    # chunks split on line boundaries: rejoining recovers the document
    joined = "\n".join(a["text"].strip("`\n") for a in atts)
    assert '"key_0"' in joined and '"key_119"' in joined


def test_slack_escapes_html_like_reference_cgi_escape():
    alert = dict(_ALERT, rule_description="description: a <b> & c")
    att = slack_summary(alert, {})["@slack.attachments"][0]
    assert att["text"] == "a &lt;b&gt; &amp; c"


# -------------------------------------------------------------- pagerduty

def test_pagerduty_shorten_title():
    pub = pagerduty_shorten_title(_ALERT, {})
    assert pub["@pagerduty-v2.summary"] == "my_rule"
    assert pub["@pagerduty-incident.incident_title"] == "my_rule"
    assert pub["@pagerduty.description"] == "my_rule"


def test_pagerduty_as_custom_details_excludes_specials():
    pub = {"@pagerduty.description": "x", "record": {"a": 1}, "other": 2}
    out = pagerduty_as_custom_details(_ALERT, pub)
    assert out["@pagerduty.details"] == {"record": {"a": 1}, "other": 2}
    assert out["@pagerduty-v2.custom_details"] == {"record": {"a": 1}, "other": 2}


def test_pagerduty_urgency_markers():
    assert pagerduty_v2_high_urgency(_ALERT, {})["@pagerduty-v2.severity"] == "critical"
    assert pagerduty_v2_high_urgency(_ALERT, {})["@pagerduty-incident.urgency"] == "high"
    assert pagerduty_v2_low_urgency(_ALERT, {})["@pagerduty-v2.severity"] == "warning"
    assert pagerduty_v2_low_urgency(_ALERT, {})["@pagerduty-incident.urgency"] == "low"


def test_stringify_and_pretty_print_arrays():
    pub = {"a": [1, 2], "nested": {"b": ["x", "y"], "keep": [{"d": 1}]}}
    out = stringify_arrays(_ALERT, json.loads(json.dumps(pub)))
    assert out["a"] == "1\n2" and out["nested"]["b"] == "x\ny"
    assert out["nested"]["keep"] == [{"d": 1}]
    out = pagerduty_pretty_print_arrays(_ALERT, json.loads(json.dumps(pub)))
    assert out["a"] == "1\n\n----------\n\n2"


def test_pagerduty_attach_image_both_apis():
    out = pagerduty_attach_image(_ALERT, {})
    assert out["@pagerduty-v2.images"][0]["alt"] == "StreamAlert Docs"
    assert out["@pagerduty.contexts"][0]["type"] == "image"


# ------------------------------------------------- golden publisher_tests

def test_golden_publisher_tests_slack_layout(spark):
    """The VERDICT done-criterion: publisher goldens pass for the Slack
    Summary/AttachFullRecord shapes through the golden-event runner."""
    from pathlib import Path

    from streamalert_spark.streaming.sinks import AlertDispatcher
    from streamalert_spark.testing import load_golden_events, run_golden_event
    from tests.test_streaming import _guardduty_pipeline

    events = load_golden_events(Path(__file__).parent / "golden")
    event = dict(next(
        e for e in events if e["_file"].endswith("guardduty.json")
        and e.get("trigger_rules")))
    dispatcher = AlertDispatcher()
    dispatcher.register(
        "slack", lambda pub, desc: True,
        publishers=[slack_summary, slack_attach_full_record])
    event["publisher_tests"] = {
        "slack:alerts": [
            {"jmespath_expression": "@slack.text",
             "condition": "is", "value": "Rule triggered"},
        ]
    }
    res = run_golden_event(spark, _guardduty_pipeline(), event,
                           dispatcher=dispatcher)
    assert res.passed, res.failures
