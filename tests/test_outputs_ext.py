"""Request-construction parity tests for the extended cloud outputs
(reference tests/unit/streamalert/alert_processor/outputs/*)."""

from __future__ import annotations

import json

from streamalert_spark.streaming.outputs_ext import (
    PagerDutyIncidentWorkflow,
    aws_cloudwatch_log_entry,
    aws_firehose_record,
    aws_lambda_invocation,
    aws_s3_object,
    aws_sns_message,
    aws_sqs_message,
    carbonblack_ban_action,
    demisto_labels,
    demisto_request,
    demisto_severity,
    github_request,
    jira_comment_request,
    jira_dispatch,
    jira_issue_request,
    komand_request,
    pagerduty_incident_put_request,
    phantom_dispatch,
    register_extended_outputs,
    teams_request,
    victorops_request,
)
from streamalert_spark.streaming.sinks import AlertDispatcher

_ALERT = {
    "id": "79192344-4a6d-4850-8d06-9c3fef1060a4",
    "rule_name": "cb_binarystore_file_added",
    "rule_description": "Info about this rule and what actions to take",
    "record": json.dumps({"md5": "0F9AA55DA3", "type": "binarystore.file.added"}),
    "log_source": "carbonblack:binarystore.file.added",
    "outputs": ["slack:unit_test_channel"],
    "source_service": "s3",
    "source_entity": "corp-prefix.prod.cb.region",
    "context": {},
}


# ------------------------------------------------------------------ teams

def test_teams_default_card():
    card = teams_request(dict(_ALERT))
    assert card["@type"] == "MessageCard"
    assert card["title"] == "StreamAlert Rule Triggered: cb_binarystore_file_added"
    assert card["text"] == _ALERT["rule_description"]
    assert card["themeColor"] == "E81123"          # teams.py:101
    info, record = card["sections"]
    assert info["activityTitle"] == "Alert Info"
    assert {"name": "rule_name", "value": "cb_binarystore_file_added"} in info["facts"]
    assert record["activityTitle"] == "StreamAlert Alert Record"
    # record facts are stringified key/value pairs (teams.py:146-155)
    assert {"name": "md5", "value": "0F9AA55DA3"} in record["facts"]


def test_teams_overrides_and_buttons():
    card = teams_request(dict(
        _ALERT, **{
            "@teams.title": "T", "@teams.description": "D",
            "@teams.card_color": "00FF00", "@teams.with_record": False,
            "@teams.additional_card_sections": {"activityTitle": "extra"},
            "@teams.buttons": [("Go", "https://x.example")],
        }))
    assert card["title"] == "T" and card["text"] == "D"
    assert card["themeColor"] == "00FF00"
    titles = [s["activityTitle"] for s in card["sections"]]
    assert titles == ["Alert Info", "extra"]       # record suppressed
    (action,) = card["potentialAction"]
    assert action["@type"] == "OpenUri" and action["name"] == "Go"
    assert action["targets"] == [{"os": "default", "uri": "https://x.example"}]


# -------------------------------------------------------------- victorops

def test_victorops_body():
    body = victorops_request(dict(_ALERT))
    assert body == {
        "message_type": "CRITICAL",
        "entity_id": "streamalert/alert",
        "entity_display_name": "cb_binarystore_file_added",
        "record": _ALERT["record"],
    }


# ----------------------------------------------------------------- github

def test_github_issue_default_and_override():
    issue = github_request(dict(_ALERT), labels="security,streamalert")
    assert issue["title"] == "StreamAlert: cb_binarystore_file_added"
    assert issue["labels"] == ["security", "streamalert"]
    assert issue["body"].startswith("### Description\n")
    assert '"md5": "0F9AA55DA3"' in issue["body"]

    issue = github_request(dict(_ALERT, **{"@github.title": "t",
                                           "@github.body": "b"}))
    assert issue["title"] == "t" and issue["body"] == "b"
    assert issue["labels"] == []


# ------------------------------------------------------------------- jira

def test_jira_issue_and_comment_bodies():
    issue = jira_issue_request(dict(_ALERT), project_key="SEC",
                               issue_type="Task")
    assert issue["fields"]["project"] == {"key": "SEC"}
    assert issue["fields"]["issuetype"] == {"name": "Task"}
    assert issue["fields"]["summary"] == "StreamAlert cb_binarystore_file_added"
    assert issue["fields"]["description"].startswith("{code:JSON}")
    comment = jira_comment_request(dict(_ALERT))
    assert comment["body"] == issue["fields"]["description"]


def test_jira_dispatch_aggregation_flow():
    calls = []
    ok = jira_dispatch(
        dict(_ALERT), "d", project_key="SEC", issue_type="Task",
        aggregate=True,
        find_issue=lambda jql: calls.append(("find", jql)) or 1234,
        create_comment=lambda iid, body: calls.append(("comment", iid)) or 1,
        create_issue=lambda body: calls.append(("issue",)) or 1)
    assert ok
    assert calls[0][0] == "find"
    assert 'summary ~ "StreamAlert cb_binarystore_file_added"' in calls[0][1]
    assert 'project="SEC"' in calls[0][1]
    assert calls[1] == ("comment", 1234)
    assert not any(c[0] == "issue" for c in calls)  # no new issue created

    # comment failure falls back to issue creation (jira.py:333-343)
    calls = []
    ok = jira_dispatch(
        dict(_ALERT), "d", project_key="SEC", issue_type="Task",
        aggregate=True,
        find_issue=lambda jql: 1234,
        create_comment=lambda iid, body: False,
        create_issue=lambda body: calls.append(("issue",)) or 99)
    assert ok and calls == [("issue",)]


# ----------------------------------------------------------------- komand

def test_komand_wraps_publication_in_data():
    pub = dict(_ALERT)
    assert komand_request(pub) == {"data": pub}


# ---------------------------------------------------------------- demisto

def test_demisto_severity_mapping():
    assert demisto_severity("informational") == 0.5
    assert demisto_severity("info") == 0.5
    assert demisto_severity("med") == 2
    assert demisto_severity("CRITICAL") == 4
    assert demisto_severity(None) == 0
    assert demisto_severity("bogus") == 0


def test_demisto_label_flattening_matches_reference_ordering():
    # demisto.py:273-340 + reference test_demisto.py EXPECTED_LABELS
    data = {
        "record": {"md5": "0F9AA55DA3", "node_id": 1},
        "context": {"demisto": {"foo": "bar", "deepArray": [
            {"key": "value"}, {"integer": 0}, {"bool": True}]}},
    }
    labels = demisto_labels(data)
    assert labels == [
        {"type": "context.demisto.deepArray[0].key", "value": "value"},
        {"type": "context.demisto.deepArray[1].integer", "value": "0"},
        {"type": "context.demisto.deepArray[2].bool", "value": "True"},
        {"type": "context.demisto.foo", "value": "bar"},
        {"type": "record.md5", "value": "0F9AA55DA3"},
        {"type": "record.node_id", "value": "1"},
    ]


def test_demisto_request_defaults_and_overrides():
    body = demisto_request(dict(_ALERT))
    assert body["name"] == "cb_binarystore_file_added"
    assert body["type"] == "Unclassified"
    assert body["owner"] == "StreamAlert"
    assert body["playbook"] == "Unknown"
    assert body["severity"] == 0
    assert body["details"] == _ALERT["rule_description"]
    assert body["customFields"] == {}
    assert body["createInvestigation"] is True
    assert {"type": "rule_name", "value": "cb_binarystore_file_added"} in body["labels"]

    body = demisto_request(dict(_ALERT, **{
        "@demisto.incident_type": "Phishing", "@demisto.severity": "high",
        "@demisto.label_data": {"only": "this"}}))
    assert body["type"] == "Phishing" and body["severity"] == 3
    assert body["labels"] == [{"type": "only", "value": "this"}]


# ---------------------------------------------------------------- phantom

def test_phantom_dispatch_reuses_or_creates_container():
    artifacts = []
    ok = phantom_dispatch(
        dict(_ALERT), "d",
        get_container_id=lambda rule: 77,
        create_container=lambda body: (_ for _ in ()).throw(AssertionError),
        create_artifact=lambda body: artifacts.append(body) or 1)
    assert ok
    (artifact,) = artifacts
    assert artifact["container_id"] == 77
    assert artifact["name"] == "Phantom Artifact"
    assert artifact["label"] == "Alert"
    assert artifact["cef"]["md5"] == "0F9AA55DA3"   # raw record as CEF

    created = []
    ok = phantom_dispatch(
        dict(_ALERT), "d",
        get_container_id=lambda rule: None,
        create_container=lambda body: created.append(body) or 88,
        create_artifact=lambda body: 1)
    assert ok
    assert created == [{"name": "cb_binarystore_file_added",
                        "description": _ALERT["rule_description"]}]


# ------------------------------------------------------------ carbonblack

def test_carbonblack_ban_action():
    pub = dict(_ALERT, context={"carbonblack": {"action": "ban",
                                                "value": "ABCD1234"}})
    assert carbonblack_ban_action(pub) == {
        "action": "ban", "md5hash": "ABCD1234",
        "text": "Banned from StreamAlert", "enabled": True,
    }
    # context arrives as JSON text from the map<string,string> alert row
    pub = dict(_ALERT, context={"carbonblack":
                                json.dumps({"action": "ban", "value": "X"})})
    assert carbonblack_ban_action(pub)["md5hash"] == "X"
    # missing context / unsupported action refuse (carbonblack.py:73-110)
    assert carbonblack_ban_action(dict(_ALERT)) is None
    pub = dict(_ALERT, context={"carbonblack": {"action": "nuke"}})
    assert carbonblack_ban_action(pub) is None


# -------------------------------------------------------------------- aws

def test_aws_firehose_record_and_size_refusal():
    rec = aws_firehose_record(dict(_ALERT))
    assert rec["Data"].endswith("\n")
    assert json.loads(rec["Data"]) == _ALERT
    assert '","rule_name":"' in rec["Data"]                 # compact separators
    assert aws_firehose_record(dict(_ALERT, record="x" * 1000 * 1000)) is None


def test_aws_lambda_qualifier_parsing():
    inv = aws_lambda_invocation(dict(_ALERT), function_name="corp-func")
    assert inv["FunctionName"] == "corp-func" and "Qualifier" not in inv
    assert json.loads(inv["Payload"])["md5"] == "0F9AA55DA3"
    inv = aws_lambda_invocation(dict(_ALERT), function_name="corp-func:prod")
    assert inv["FunctionName"] == "corp-func" and inv["Qualifier"] == "prod"
    arn = "arn:aws:lambda:us-east-1:123456789012:function:corp-func:prod"
    inv = aws_lambda_invocation(dict(_ALERT), function_name=arn)
    assert inv["FunctionName"] == "corp-func" and inv["Qualifier"] == "prod"
    inv = aws_lambda_invocation(
        dict(_ALERT, **{"@aws-lambda.alert_data": {"x": 1}}),
        function_name="f")
    assert inv["Payload"] == '{"x":1}'


def test_aws_s3_key_format():
    obj = aws_s3_object(dict(_ALERT), dt_hour="2017-01-25-00",
                        object_uuid="abc-123")
    assert obj["Key"] == ("alerts/dt=2017-01-25-00/"
                          "s3_corp-prefix.prod.cb.region_"
                          "cb_binarystore_file_added_abc-123.json")
    assert json.loads(obj["Body"])["id"] == _ALERT["id"]


def test_aws_sns_subject_elided_and_overrides():
    msg = aws_sns_message(dict(_ALERT))
    assert msg["Subject"] == ("cb_binarystore_file_added triggered alert "
                              "79192344-4a6d-4850-8d06-9c3fef1060a4")[:99]
    assert json.loads(msg["Message"]) == _ALERT
    long_subject = "x" * 200
    msg = aws_sns_message(dict(_ALERT, **{"@aws-sns.topic": long_subject,
                                          "@aws-sns.message": "m"}))
    assert len(msg["Subject"]) <= 99 and " ... " in msg["Subject"]
    assert msg["Message"] == "m"


def test_aws_sqs_message_data():
    msg = aws_sqs_message(dict(_ALERT))
    assert json.loads(msg["MessageBody"])["md5"] == "0F9AA55DA3"
    msg = aws_sqs_message(dict(_ALERT, **{"@aws-sqs.message_data": {"a": 1}}))
    assert msg["MessageBody"] == '{"a":1}'


def test_aws_cloudwatch_log_entry():
    line = aws_cloudwatch_log_entry(dict(_ALERT))
    assert line.startswith("New Alert:\n")
    assert json.loads(line[len("New Alert:\n"):]) == _ALERT


# --------------------------------------------------- pagerduty-incident

def test_pagerduty_incident_put_request_policy_vs_assignment():
    body = pagerduty_incident_put_request(
        dict(_ALERT), {}, service_id="SVC1",
        default_escalation_policy_id="EP1",
        resolve_user_id=lambda email: None,
        resolve_priority_id=lambda name: None)
    inc = body["incident"]
    assert inc["title"] == ("StreamAlert Incident - Rule triggered: "
                            "cb_binarystore_file_added")
    assert inc["service"] == {"id": "SVC1", "type": "service_reference"}
    assert inc["body"] == {"type": "incident_body",
                           "details": _ALERT["rule_description"]}
    assert inc["escalation_policy"] == {"id": "EP1",
                                        "type": "escalation_policy_reference"}
    assert "priority" not in inc and "urgency" not in inc

    # resolved assignee suppresses the escalation policy (pagerduty.py:812-817)
    body = pagerduty_incident_put_request(
        dict(_ALERT, **{"@pagerduty-incident.urgency": "high"}),
        {"assigned_user": "a@b.c", "incident_priority": "P1"},
        service_id="SVC1", default_escalation_policy_id="EP1",
        resolve_user_id=lambda email: "U7",
        resolve_priority_id=lambda name: "PRI7")
    inc = body["incident"]
    assert inc["assignments"] == [{"assignee": {"id": "U7",
                                                "type": "user_reference"}}]
    assert "escalation_policy" not in inc
    assert inc["priority"] == {"id": "PRI7", "type": "priority_reference"}
    assert inc["urgency"] == "high"

    # invalid urgency dropped; unresolvable assignee falls back to policy
    body = pagerduty_incident_put_request(
        dict(_ALERT, **{"@pagerduty-incident.urgency": "medium"}),
        {"assigned_user": "a@b.c", "assigned_policy_id": "EP9"},
        service_id="SVC1", default_escalation_policy_id="EP1",
        resolve_user_id=lambda email: None,
        resolve_priority_id=lambda name: None)
    inc = body["incident"]
    assert inc["escalation_policy"]["id"] == "EP9"
    assert "urgency" not in inc


def test_pagerduty_incident_workflow_sequence():
    log = []

    wf = PagerDutyIncidentWorkflow(
        service_id="SVC1", escalation_policy_id="EP1",
        email_from="ops@corp.example", integration_key="IK",
        get_user_id_by_email=lambda e: {"ops@corp.example": "APIUSER",
                                        "resp@corp.example": "R1"}.get(e),
        get_priority_id_by_name=lambda n: None,
        enqueue_event=lambda body: log.append(("event", body)) or
        {"dedup_key": body["dedup_key"]},
        get_incident_id_by_key=lambda key: log.append(("lookup", key)) or "INC9",
        modify_incident=lambda iid, body: log.append(("put", iid, body)) or True,
        add_note=lambda iid, note: log.append(("note", iid, note)) or True,
        request_responder=lambda iid, frm, msg, to:
        log.append(("responder", iid, frm, to)) or True)

    pub = dict(_ALERT, context={"pagerduty-incident": {
        "responders": "resp@corp.example", "note": "ctx note"}})
    assert wf.run(pub, "sox") is True

    kinds = [entry[0] for entry in log]
    assert kinds == ["event", "lookup", "put", "responder", "note"]
    event_body = log[0][1]
    assert event_body["routing_key"] == "IK"
    assert event_body["dedup_key"] == "sox:" + _ALERT["id"]
    assert log[1][1] == "sox:" + _ALERT["id"]
    assert log[2][1] == "INC9"
    assert log[3] == ("responder", "INC9", "APIUSER", "R1")
    assert log[4] == ("note", "INC9", "ctx note")


def test_pagerduty_incident_workflow_instability_note():
    notes = []
    wf = PagerDutyIncidentWorkflow(
        service_id="S", escalation_policy_id="E",
        email_from="ops@corp.example", integration_key="IK",
        get_user_id_by_email=lambda e:
        "APIUSER" if e == "ops@corp.example" else None,
        get_priority_id_by_name=lambda n: None,
        enqueue_event=lambda body: {"dedup_key": body["dedup_key"]},
        get_incident_id_by_key=lambda key: "INC1",
        modify_incident=lambda iid, body: True,
        add_note=lambda iid, note: notes.append(note) or True,
        request_responder=lambda *a: True)
    pub = dict(_ALERT, context={"pagerduty-incident":
                                {"responders": ["ghost@corp.example"]}})
    assert wf.run(pub, "d") is True
    # default note, then the instability note about the failed responder
    assert notes[0] == "Creating SOX Incident"
    assert "failed to correctly setup" in notes[1]
    assert "ghost@corp.example" in notes[1]


def test_pagerduty_incident_workflow_aborts_without_user():
    wf = PagerDutyIncidentWorkflow(
        service_id="S", escalation_policy_id="E", email_from="nobody@x",
        integration_key="IK",
        get_user_id_by_email=lambda e: None,
        get_priority_id_by_name=lambda n: None,
        enqueue_event=lambda body: (_ for _ in ()).throw(AssertionError),
        get_incident_id_by_key=lambda key: None,
        modify_incident=lambda iid, body: None,
        add_note=lambda iid, note: None, request_responder=lambda *a: None)
    assert wf.run(dict(_ALERT), "d") is False


# ---------------------------------------------------------- registration

def test_register_extended_outputs_dispatch():
    sent = []
    dispatcher = AlertDispatcher()
    register_extended_outputs(dispatcher, lambda svc, body:
                              sent.append((svc, body)) or True)
    alert = dict(_ALERT, outputs=["teams:corp", "victorops:oncall",
                                  "aws-sqs:queue", "aws-cloudwatch-log:x"])
    done = dispatcher.dispatch_alert(alert, set())
    assert done == {"teams:corp", "victorops:oncall", "aws-sqs:queue",
                    "aws-cloudwatch-log:x"}
    services = {svc for svc, _ in sent}
    assert services == {"teams", "victorops", "aws-sqs", "aws-cloudwatch-log"}
