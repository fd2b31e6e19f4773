"""Remaining cloud output request builders: Teams, VictorOps, GitHub,
Jira (v1 session + v2 token — same bodies), Komand, Demisto, Phantom,
CarbonBlack, and the six AWS outputs, plus the PagerDuty *incident*
workflow, all transport-free.

Like ``streaming/outputs.py`` (Slack / PagerDuty events), these port the
reference connectors' request-CONSTRUCTION semantics — presentation
defaults, ``@service.field`` publisher overrides, field validation, size
limits — and hand finished bodies to an injectable transport.  Credential
loading and HTTP remain environment-dependent and out of the engine.

Reference files (alert_processor/outputs/): teams.py:74-131 (card
layout), victorops.py:73-115, github.py:76-135, jira.py:208-350 /
jira_v2.py (same bodies, token auth), komand.py:55-88, demisto.py:120-340,
phantom.py:102-182, carbonblack.py:60-110, aws.py:77-640,
pagerduty.py:419-1010 (incident WorkContext).
"""

from __future__ import annotations

import json
from typing import Any, Callable

from streamalert_spark.streaming.outputs import elide_middle

# ------------------------------------------------------------------ teams


def _teams_record_facts(record: Any) -> list[dict]:
    """The record section adds every top-level key as a stringified fact
    (teams.py:133-155)."""
    if not isinstance(record, dict):
        return []
    return [{"name": key, "value": str(value)} for key, value in record.items()]


def teams_request(publication: dict, descriptor: str = "") -> dict:
    """The Office 365 connector-card ("MessageCard") POST body
    (teams.py:74-131).  The reference builds this through pymsteams; the
    emitted JSON shape is the public MessageCard format: title/text/
    themeColor, an Alert-Info facts section, the record as a facts
    section (suppressible via @teams.with_record), extra sections, and
    link buttons as OpenUri potentialActions (teams.py:211-237)."""
    rule_name = publication.get("rule_name") or ""
    record = _record_value(publication)

    title = publication.get("@teams.title",
                            f"StreamAlert Rule Triggered: {rule_name}")
    description = publication.get("@teams.description",
                                  publication.get("rule_description") or "")
    card_color = publication.get("@teams.card_color", "E81123")
    with_record = publication.get("@teams.with_record", True)

    sections: list[dict] = [{
        "activityTitle": "Alert Info",
        "facts": [
            {"name": "rule_name", "value": rule_name},
            {"name": "alert_id", "value": publication.get("id", "")},
        ],
    }]
    if with_record:
        sections.append({
            "activityTitle": "StreamAlert Alert Record",
            "facts": _teams_record_facts(record),
        })
    extra = publication.get("@teams.additional_card_sections", [])
    if not isinstance(extra, list):
        extra = [extra]
    sections.extend(s for s in extra if isinstance(s, dict))

    card = {
        "@type": "MessageCard",
        "@context": "https://schema.org/extensions",
        "title": title,
        "text": description,
        "themeColor": card_color,
        "sections": sections,
    }
    buttons = publication.get("@teams.buttons", [])
    if buttons:
        card["potentialAction"] = [
            {"@type": "OpenUri", "name": str(text),
             "targets": [{"os": "default", "uri": str(url)}]}
            for text, url in buttons
        ]
    return card


# -------------------------------------------------------------- victorops


def victorops_request(publication: dict, descriptor: str = "") -> dict:
    """VictorOps alert body (victorops.py:73-115): CRITICAL message with
    the published record; no magic override fields — publishers replace
    the publication itself."""
    return {
        "message_type": "CRITICAL",
        "entity_id": "streamalert/alert",
        "entity_display_name": publication.get("rule_name") or "",
        "record": publication.get("record"),
    }


# ----------------------------------------------------------------- github


def _record_value(publication: dict) -> Any:
    rec = publication.get("record")
    if isinstance(rec, str):
        try:
            return json.loads(rec)
        except ValueError:
            return rec
    return rec if rec is not None else {}


def github_request(publication: dict, descriptor: str = "",
                   labels: str = "") -> dict:
    """GitHub issue body (github.py:76-135): default title and a
    markdown body embedding the record, overridable via @github.title /
    @github.body; labels come from the output config (comma-split)."""
    rule_name = publication.get("rule_name") or ""
    default_body = (
        "### Description\n{}\n\n### Event data\n\n```\n{}\n```".format(
            publication.get("rule_description") or "",
            json.dumps(_record_value(publication), indent=2, sort_keys=True),
        ))
    return {
        "title": publication.get("@github.title", f"StreamAlert: {rule_name}"),
        "body": publication.get("@github.body", default_body),
        "labels": labels.split(",") if labels else [],
    }


# ------------------------------------------------------------------- jira


def jira_issue_request(publication: dict, descriptor: str = "",
                       project_key: str = "", issue_type: str = "") -> dict:
    """Jira create-issue body (jira.py:208-245; jira_v2.py identical —
    the v2 output differs only in auth, which is transport).  The whole
    publication serializes into a {code:JSON} block unless overridden."""
    summary, description = _jira_presentation(publication)
    return {
        "fields": {
            "project": {"key": project_key},
            "summary": summary,
            "description": description,
            "issuetype": {"name": issue_type},
        }
    }


def jira_comment_request(publication: dict, descriptor: str = "") -> dict:
    """Jira add-comment body used when aggregation finds an existing
    issue (jira.py:140-163)."""
    _, description = _jira_presentation(publication)
    return {"body": description}


def _jira_presentation(publication: dict) -> tuple[str, str]:
    """Defaults + @jira.* overrides (jira.py:306-316)."""
    rule_name = publication.get("rule_name") or ""
    default_body = "{{code:JSON}}{}{{code}}".format(
        json.dumps(publication, sort_keys=True, default=str))
    summary = publication.get("@jira.issue_summary", f"StreamAlert {rule_name}")
    description = publication.get("@jira.description", default_body)
    return summary, description


def jira_search_jql(publication: dict, project_key: str) -> str:
    """The aggregation search: find an open issue whose summary matches
    (jira.py:188-206)."""
    summary, _ = _jira_presentation(publication)
    return f'summary ~ "{summary}" and project="{project_key}"'


def jira_dispatch(publication: dict, descriptor: str, *,
                  project_key: str, issue_type: str,
                  create_issue: Callable[[dict], Any],
                  aggregate: bool = False,
                  find_issue: Callable[[str], Any] | None = None,
                  create_comment: Callable[[Any, dict], Any] | None = None) -> bool:
    """The reference dispatch flow (jira.py:294-350): with aggregation
    on, comment on the existing issue found by JQL summary search; fall
    back to creating a new issue (also when the comment fails)."""
    if aggregate and find_issue is not None:
        issue_id = find_issue(jira_search_jql(publication, project_key))
        if issue_id and create_comment is not None:
            if create_comment(issue_id, jira_comment_request(publication, descriptor)):
                return True
    issue_id = create_issue(
        jira_issue_request(publication, descriptor, project_key, issue_type))
    return bool(issue_id)


# ----------------------------------------------------------------- komand


def komand_request(publication: dict, descriptor: str = "") -> dict:
    """Komand trigger-event body: the publication nested under 'data'
    (komand.py:78-88)."""
    return {"data": publication}


# ---------------------------------------------------------------- demisto

DEMISTO_SEVERITY_UNKNOWN = 0
DEMISTO_SEVERITY_INFORMATIONAL = 0.5
DEMISTO_SEVERITY_LOW = 1
DEMISTO_SEVERITY_MEDIUM = 2
DEMISTO_SEVERITY_HIGH = 3
DEMISTO_SEVERITY_CRITICAL = 4


def demisto_severity(severity_string: Any) -> float:
    """Severity-string mapping (demisto.py:253-271)."""
    if not isinstance(severity_string, str):
        return DEMISTO_SEVERITY_UNKNOWN
    lc = severity_string.lower()
    return {
        "info": DEMISTO_SEVERITY_INFORMATIONAL,
        "informational": DEMISTO_SEVERITY_INFORMATIONAL,
        "low": DEMISTO_SEVERITY_LOW,
        "med": DEMISTO_SEVERITY_MEDIUM,
        "medium": DEMISTO_SEVERITY_MEDIUM,
        "high": DEMISTO_SEVERITY_HIGH,
        "critical": DEMISTO_SEVERITY_CRITICAL,
    }.get(lc, DEMISTO_SEVERITY_UNKNOWN)


def demisto_labels(label_data: Any) -> list[dict]:
    """Flatten the nested publication into discrete string key/values,
    paths dotted with [i] list indices, sorted by type
    (demisto.py:273-340 enumerate_fields + add_label)."""
    labels: list[dict] = []

    def walk(value: Any, path: str = "") -> None:
        if isinstance(value, list):
            for idx, item in enumerate(value):
                walk(item, f"{path}[{idx}]")
        elif isinstance(value, dict):
            for key in value:
                walk(value[key], f"{path}.{key}" if path else str(key))
        else:
            labels.append({"type": str(path), "value": str(value)})

    walk(label_data)
    labels.sort(key=lambda item: item["type"])
    return labels


def demisto_request(publication: dict, descriptor: str = "") -> dict:
    """Demisto create-incident body (demisto.py:120-155 send +
    DemistoRequestAssembler.assemble, 276-340): presentation defaults,
    @demisto.* overrides, flattened labels, createInvestigation on."""
    return {
        "type": publication.get("@demisto.incident_type", "Unclassified"),
        "name": str(publication.get("@demisto.incident_name",
                                    publication.get("rule_name") or "")),
        "owner": str(publication.get("@demisto.owner", "StreamAlert")),
        "playbook": publication.get("@demisto.playbook", "Unknown"),
        "severity": demisto_severity(publication.get("@demisto.severity", "unknown")),
        "labels": demisto_labels(
            publication.get("@demisto.label_data", publication)),
        "customFields": {},
        "details": str(publication.get("@demisto.details",
                                       publication.get("rule_description") or "")),
        "createInvestigation": True,
    }


# ---------------------------------------------------------------- phantom


def phantom_container_request(publication: dict, descriptor: str = "") -> dict:
    """Phantom container body, one per rule name (phantom.py:102-135)."""
    return {
        "name": publication.get("rule_name") or "",
        "description": publication.get("rule_description") or "",
    }


def phantom_artifact_request(publication: dict, container_id: Any,
                             descriptor: str = "") -> dict:
    """Phantom artifact body: raw record as CEF, publication as data
    (phantom.py:165-173)."""
    return {
        "cef": _record_value(publication),
        "container_id": container_id,
        "data": publication,
        "name": "Phantom Artifact",
        "label": "Alert",
    }


def phantom_dispatch(publication: dict, descriptor: str, *,
                     get_container_id: Callable[[str], Any],
                     create_container: Callable[[dict], Any],
                     create_artifact: Callable[[dict], Any]) -> bool:
    """The reference flow (phantom.py:137-182): reuse the container named
    after the rule if one exists, else create it; then post the artifact."""
    rule_name = publication.get("rule_name") or ""
    container_id = get_container_id(rule_name)
    if not container_id:
        container_id = create_container(
            phantom_container_request(publication, descriptor))
    if not container_id:
        return False
    return bool(create_artifact(
        phantom_artifact_request(publication, container_id, descriptor)))


# ------------------------------------------------------------ carbonblack


def carbonblack_ban_action(publication: dict, descriptor: str = "") -> dict | None:
    """CarbonBlack is an *action* output: rules pass
    context['carbonblack'] = {'action': 'ban', 'value': <md5>} and the
    output ensures a BannedHash exists and is enabled
    (carbonblack.py:60-110).  Returns the intended state change, or None
    when the context is missing/unsupported (reference logs + returns
    False)."""
    context = publication.get("context") or {}
    cb = context.get("carbonblack", {})
    if isinstance(cb, str):
        try:
            cb = json.loads(cb)
        except ValueError:
            return None
    if not isinstance(cb, dict) or cb.get("action") != "ban":
        return None
    binary_hash = cb.get("value")
    if not binary_hash:
        return None
    return {
        "action": "ban",
        "md5hash": binary_hash,
        "text": "Banned from StreamAlert",
        "enabled": True,
    }


# -------------------------------------------------------------------- aws

FIREHOSE_MAX_RECORD_SIZE = 1000 * 1000  # aws.py:79


def aws_firehose_record(publication: dict, descriptor: str = "") -> dict | None:
    """Firehose PutRecord data: compact JSON publication + newline,
    refused when over 1 MB (aws.py:103-157)."""
    json_alert = json.dumps(publication, separators=(",", ":"), default=str) + "\n"
    if len(json_alert) > FIREHOSE_MAX_RECORD_SIZE:
        return None
    return {"Data": json_alert}


def aws_lambda_invocation(publication: dict, descriptor: str = "",
                          function_name: str = "") -> dict:
    """Lambda invoke parameters (aws.py:195-262): the alert record (or
    @aws-lambda.alert_data) as compact JSON; full-ARN / name:qualifier /
    bare-name forms all resolve function + optional qualifier."""
    alert_data = publication.get("@aws-lambda.alert_data",
                                 _record_value(publication))
    parts = function_name.split(":")
    if len(parts) in (2, 8):
        function, qualifier = parts[-2], parts[-1]
    else:
        function, qualifier = parts[-1], None
    params = {
        "FunctionName": function,
        "InvocationType": "Event",
        "Payload": json.dumps(alert_data, separators=(",", ":"), default=str),
    }
    if qualifier:
        params["Qualifier"] = qualifier
    return params


def aws_s3_object(publication: dict, descriptor: str = "", *,
                  dt_hour: str, object_uuid: str) -> dict:
    """S3 put body + key (aws.py:445-486):
    alerts/dt=YYYY-MM-DD-HH/service_entity_rule_uuid.json.  The clock and
    uuid are injected so the key is deterministic under test; production
    passes now().strftime('%Y-%m-%d-%H') and uuid4()."""
    key = "alerts/dt={}/{}_{}_{}_{}.json".format(
        dt_hour,
        publication.get("source_service") or "",
        publication.get("source_entity") or "",
        publication.get("rule_name") or "",
        object_uuid,
    )
    return {"Key": key, "Body": json.dumps(publication, default=str)}


def aws_sns_message(publication: dict, descriptor: str = "") -> dict:
    """SNS publish body (aws.py:515-545): subject elided to 99 chars,
    @aws-sns.topic / @aws-sns.message overrides."""
    rule_name = publication.get("rule_name") or ""
    default_subject = "{} triggered alert {}".format(
        rule_name, publication.get("id", ""))
    default_message = json.dumps(publication, indent=2, sort_keys=True,
                                 default=str)
    return {
        "Subject": elide_middle(
            publication.get("@aws-sns.topic", default_subject), 99),
        "Message": publication.get("@aws-sns.message", default_message),
    }


def aws_sqs_message(publication: dict, descriptor: str = "") -> dict:
    """SQS send body (aws.py:570-608): the record (or
    @aws-sqs.message_data) as compact JSON."""
    message_data = publication.get("@aws-sqs.message_data",
                                   _record_value(publication))
    return {"MessageBody": json.dumps(message_data, separators=(",", ":"),
                                      default=str)}


def aws_cloudwatch_log_entry(publication: dict, descriptor: str = "") -> str:
    """CloudWatch log line (aws.py:625-640): indent-2 publication dump."""
    return "New Alert:\n" + json.dumps(publication, indent=2, default=str)


# --------------------------------------------------- pagerduty-incident


def pagerduty_incident_put_request(publication: dict, rule_context: dict, *,
                                   service_id: str,
                                   default_escalation_policy_id: str,
                                   resolve_user_id: Callable[[str], Any],
                                   resolve_priority_id: Callable[[str], Any],
                                   ) -> dict:
    """The PUT /incidents/:id body (pagerduty.py:747-831): title/body
    defaults with @pagerduty-incident.* overrides, priority reference
    resolved by name, user assignment XOR escalation policy (assignments
    win when the assignee resolves — sending both lets the policy
    supersede them, pagerduty.py:812-817), and urgency only when valid."""
    rule_name = publication.get("rule_name") or ""
    incident_title = publication.get(
        "@pagerduty-incident.incident_title",
        f"StreamAlert Incident - Rule triggered: {rule_name}")
    incident_body = publication.get("@pagerduty-incident.incident_body",
                                    publication.get("rule_description") or "")
    incident_urgency = publication.get("@pagerduty-incident.urgency", None)

    incident: dict = {
        "type": "incident",
        "title": incident_title,
        "service": {"id": service_id, "type": "service_reference"},
        "body": {"type": "incident_body", "details": incident_body},
    }

    priority_name = (rule_context or {}).get("incident_priority")
    if priority_name:
        priority_id = resolve_priority_id(priority_name)
        if priority_id:
            incident["priority"] = {"id": priority_id,
                                    "type": "priority_reference"}

    assignments = None
    user_to_assign = (rule_context or {}).get("assigned_user")
    if user_to_assign:
        user_id = resolve_user_id(user_to_assign)
        if user_id:
            assignments = [{"assignee": {"id": user_id,
                                         "type": "user_reference"}}]
    if assignments:
        incident["assignments"] = assignments
    else:
        incident["escalation_policy"] = {
            "id": (rule_context or {}).get("assigned_policy_id",
                                           default_escalation_policy_id),
            "type": "escalation_policy_reference",
        }

    if incident_urgency in ("low", "high"):
        incident["urgency"] = incident_urgency
    return {"incident": incident}


class PagerDutyIncidentWorkflow:
    """The pagerduty-incident WorkContext (pagerduty.py:585-1008) with
    the REST/events API behind injectable callables.  Sequence: verify
    the from-user → enqueue the events-v2 alert (with_record honoured
    from rule context) → resolve the container incident id from the
    dedup_key → PUT the incident update → request responders → add the
    triage note (@pagerduty-incident.note → context note → 'Creating SOX
    Incident') → on partial failure, best-effort instability note."""

    def __init__(self, *, service_id: str, escalation_policy_id: str,
                 email_from: str, integration_key: str,
                 get_user_id_by_email: Callable[[str], Any],
                 get_priority_id_by_name: Callable[[str], Any],
                 enqueue_event: Callable[[dict], Any],
                 get_incident_id_by_key: Callable[[str], Any],
                 modify_incident: Callable[[Any, dict], Any],
                 add_note: Callable[[Any, str], Any],
                 request_responder: Callable[[Any, Any, str, Any], Any]):
        self.service_id = service_id
        self.escalation_policy_id = escalation_policy_id
        self.email_from = email_from
        self.integration_key = integration_key
        self.get_user_id_by_email = get_user_id_by_email
        self.get_priority_id_by_name = get_priority_id_by_name
        self.enqueue_event = enqueue_event
        self.get_incident_id_by_key = get_incident_id_by_key
        self.modify_incident = modify_incident
        self.add_note = add_note
        self.request_responder = request_responder

    def run(self, publication: dict, descriptor: str) -> bool:
        from streamalert_spark.streaming.outputs import pagerduty_v2_request

        api_user_id = self.get_user_id_by_email(self.email_from)
        if not api_user_id:       # pagerduty.py:955-968
            return False

        context = publication.get("context") or {}
        rule_context = context.get("pagerduty-incident", {})
        if isinstance(rule_context, str):
            try:
                rule_context = json.loads(rule_context)
            except ValueError:
                rule_context = {}

        # Events-v2 alert; with_record=False drops the record from the
        # default custom details (pagerduty.py:96-101, 864-884).
        event_publication = publication
        if not rule_context.get("with_record", True):
            event_publication = {k: v for k, v in publication.items()
                                 if k != "record"}
            event_publication["@pagerduty-v2.custom_details"] = {
                "description": publication.get("rule_description")}
        event = self.enqueue_event(pagerduty_v2_request(
            event_publication, descriptor, routing_key=self.integration_key))
        if not event or not event.get("dedup_key"):
            return False

        incident_id = self.get_incident_id_by_key(event["dedup_key"])
        if not incident_id:       # retry/backoff is transport policy
            return False

        put_body = pagerduty_incident_put_request(
            publication, rule_context,
            service_id=self.service_id,
            default_escalation_policy_id=self.escalation_policy_id,
            resolve_user_id=self.get_user_id_by_email,
            resolve_priority_id=self.get_priority_id_by_name)
        if not self.modify_incident(incident_id, put_body):
            return False

        # Past this point failures degrade to an instability note
        # (pagerduty.py:649-700).
        errors: list[str] = []
        responders = rule_context.get("responders", [])
        if responders and not isinstance(responders, list):
            responders = [responders]
        message = rule_context.get(
            "responder_message",
            "An incident was reported that requires your attention.")
        for responder_email in responders:
            responder_id = self.get_user_id_by_email(responder_email)
            ok = responder_id and self.request_responder(
                incident_id, api_user_id, message, responder_id)
            if not ok:
                errors.append(
                    "[pagerduty-incident] Failed to request a responder "
                    f"({responder_email}) on incident ({incident_id})")

        note = publication.get("@pagerduty-incident.note",
                               rule_context.get("note", "Creating SOX Incident"))
        if note and not self.add_note(incident_id, note):
            errors.append("[pagerduty-incident] Failed to add note to "
                          f"incident ({incident_id})")

        if errors:
            error_section = "\n".join(f"- {err}" for err in errors)
            self.add_note(incident_id, (
                "StreamAlert failed to correctly setup this incident. "
                "Please contact your StreamAlert administrator.\n\nErrors:\n"
                f"{error_section}"))
        return True


# ---------------------------------------------------------- registration

Transport = Callable[[str, Any], bool]

_SIMPLE_BUILDERS: dict[str, Callable[[dict, str], Any]] = {
    "teams": teams_request,
    "victorops": victorops_request,
    "komand": komand_request,
    "demisto": demisto_request,
    "aws-firehose": aws_firehose_record,
    "aws-sns": aws_sns_message,
    "aws-sqs": aws_sqs_message,
    "aws-cloudwatch-log": aws_cloudwatch_log_entry,
}


def register_extended_outputs(dispatcher, transport: Transport,
                              publishers: dict[str, list] | None = None) -> None:
    """Wire the single-request services into an AlertDispatcher; the
    flow services (jira, phantom, pagerduty-incident, carbonblack,
    github, aws-s3, aws-lambda) need per-deployment config/injectables
    and register individually via dispatcher.register."""
    publishers = publishers or {}
    for service, builder in _SIMPLE_BUILDERS.items():
        def fn(publication: dict, descriptor: str, _b=builder, _s=service) -> bool:
            body = _b(publication, descriptor)
            if body is None:      # e.g. firehose size refusal
                return False
            return transport(_s, body)

        dispatcher.register(service, fn, publishers.get(service))
