"""Slack / PagerDuty presentation-layer publishers.

Ports of the reference community layout publishers onto this engine's
``(alert: dict, publication: dict) -> dict`` publisher contract:
- publishers/community/slack/slack_layout.py:31-325 (Summary,
  AttachRuleInfo, AttachPublication, AttachStringTemplate,
  AttachFullRecord)
- publishers/community/pagerduty/pagerduty_layout.py:20-150
  (ShortenTitle, as_custom_details, v2_high_urgency, v2_low_urgency,
  PrettyPrintArrays, AttachImage)

The reference passes an Alert object; here the alert row dict supplies
the same fields (rule_name, rule_description, created, record, context,
source_service, source_entity, id). Escaping matches cgi.escape: &, <, >
only (html.escape with quote=False).
"""

from __future__ import annotations

import calendar
import html
import json
import time
import urllib.parse

from streamalert_spark.alerts.description import present_description
from streamalert_spark.alerts.publishers import _stringify_scalar_arrays, register

# slack_layout.py:24-28 section colors
RAUSCH = "#ff5a5f"
BABU = "#00d1c1"
LIMA = "#8ce071"
HACKBERRY = "#7b0051"
BEACH = "#ffb400"

_GITHUB_REPO_URL = "https://github.com/airbnb/streamalert"
_SEARCH_PATH = "/search"
_RULES_PATH = "/rules"

# slack_layout.py:243-246
_SLACK_MAX_ATTACHMENT_CHARS = 4000
_LENGTH_PADDING = 10


def _escape(text: str) -> str:
    return html.escape(text, quote=False)


def _record_dict(alert: dict) -> dict:
    rec = alert.get("record")
    if isinstance(rec, str):
        try:
            return json.loads(rec)
        except ValueError:
            return {"raw": rec}
    return rec or {}


def _created_epoch(alert: dict):
    """slack_layout.py:67 — epoch seconds of alert.created, '' if absent."""
    created = alert.get("created")
    if not created:
        return ""
    try:
        return calendar.timegm(
            time.strptime(created.split(".")[0], "%Y-%m-%dT%H:%M:%S"))
    except ValueError:
        return ""


def _rule_search_url(rule_name: str) -> str:
    """slack_layout.py:91-108 — a GitHub code-search link likely to find
    the rule's file (an exact path cannot be derived from the name)."""
    q = urllib.parse.urlencode({"q": f"{rule_name} path:{_RULES_PATH}"})
    return f"{_GITHUB_REPO_URL}{_SEARCH_PATH}?{q}"


@register
def slack_summary(alert: dict, publication: dict) -> dict:
    """Brief summary attachment: rule, author, description, time
    (slack_layout.py:31-108). Passes the prior publication through under
    @slack._previous_publication for downstream publishers."""
    rule_name = alert.get("rule_name") or ""
    pres = present_description(alert.get("rule_description"))
    return {
        "@slack.text": "Rule triggered",
        "@slack.attachments": [
            {
                "fallback": f"Rule triggered: {rule_name}",
                "color": RAUSCH,
                "author_name": pres["author"],
                "author_link": "",
                "author_icon": "",
                "title": rule_name,
                "title_link": _rule_search_url(rule_name),
                "text": _escape(pres["description"]),
                "image_url": "",
                "thumb_url": "",
                "footer": "",
                "footer_icon": "",
                "ts": _created_epoch(alert),
                "mrkdwn_in": [],
            },
        ],
        "@slack._previous_publication": publication,
    }


@register
def slack_attach_rule_info(alert: dict, publication: dict) -> dict:
    """Attachment with the description's extra fields (reference/playbook
    etc. — slack_layout.py:111-137); author and description excluded."""
    pres = present_description(alert.get("rule_description"))
    publication.setdefault("@slack.attachments", []).append({
        "color": LIMA,
        "fields": [
            {"title": key.capitalize(), "value": value}
            for key, value in pres["fields"].items()
        ],
    })
    return publication


@register
def slack_attach_publication(alert: dict, publication: dict) -> dict:
    """Attach the pre-Summary publication as a code block
    (slack_layout.py:140-177); no-op unless run right after
    slack_summary."""
    if ("@slack._previous_publication" not in publication
            or "@slack.attachments" not in publication):
        return publication
    block = "```\n{}\n```".format(json.dumps(
        publication["@slack._previous_publication"],
        indent=2, sort_keys=True, separators=(",", ": ")))
    publication["@slack.attachments"].append({
        "color": BABU,
        "title": "Alert Data:",
        "text": _escape(block),
        "mrkdwn_in": ["text"],
    })
    return publication


@register
def slack_attach_string_template(alert: dict, publication: dict) -> dict:
    """Render context['slack_message_template'].format(**publication) as
    an attachment (slack_layout.py:180-228); template args come from the
    pre-Summary publication when present."""
    context = alert.get("context") or {}
    template = context.get("slack_message_template", "[MISSING TEMPLATE]")
    args = publication.get("@slack._previous_publication", publication)
    publication.setdefault("@slack.attachments", []).append({
        "color": BEACH,
        "text": _escape(template.format(**args)),
    })
    return publication


@register
def slack_attach_full_record(alert: dict, publication: dict) -> dict:
    """Attach the full record as one or more <=4000-char code-block
    attachments, split on line boundaries (slack_layout.py:231-311): the
    first carries source entity + title, the last carries the alert id
    and source-service footer."""
    attachments = publication.setdefault("@slack.attachments", [])
    document = _escape(json.dumps(
        _record_dict(alert), indent=2, sort_keys=True, separators=(",", ": ")))
    lines = document.split("\n")

    def make(chunk: str, is_first: bool, is_last: bool) -> dict:
        footer = ""
        service = alert.get("source_service") or ""
        if is_last and service:
            footer = "via <https://console.aws.amazon.com/{}/home|{}>".format(
                service, service)
        return {
            "color": HACKBERRY,
            "author": (alert.get("source_entity") or "") if is_first else "",
            "title": "Record" if is_first else "",
            "text": f"```\n{chunk}\n```",
            "fields": [{"title": "Alert Id", "value": alert.get("id")}] if is_last else [],
            "footer": footer,
            "footer_icon": "",
            "mrkdwn_in": ["text"],
        }

    limit = _SLACK_MAX_ATTACHMENT_CHARS - _LENGTH_PADDING
    first = True
    chunk = ""
    for line in lines:
        if chunk and len(chunk) + len(line) > limit:
            attachments.append(make(chunk, first, False))
            chunk = ""
            first = False
        chunk += "\n" + line
    if chunk:
        attachments.append(make(chunk, first, True))
    return publication


# ---------------------------------------------------------------- pagerduty

@register
def pagerduty_shorten_title(alert: dict, publication: dict) -> dict:
    """Title becomes just the rule name, dropping the 'StreamAlert Rule
    Triggered -' prefix (pagerduty_layout.py:20-38)."""
    rule_name = alert.get("rule_name")
    publication["@pagerduty-v2.summary"] = rule_name
    publication["@pagerduty-incident.incident_title"] = rule_name
    publication["@pagerduty.description"] = rule_name
    return publication


@register
def pagerduty_as_custom_details(alert: dict, publication: dict) -> dict:
    """Everything except @pagerduty* specials goes to custom details
    (pagerduty_layout.py:41-57)."""
    details = {k: v for k, v in publication.items()
               if not k.startswith("@pagerduty")}
    publication["@pagerduty.details"] = details
    publication["@pagerduty-v2.custom_details"] = details
    return publication


@register
def pagerduty_v2_high_urgency(alert: dict, publication: dict) -> dict:
    """critical severity / high urgency (pagerduty_layout.py:60-69)."""
    publication["@pagerduty-v2.severity"] = "critical"
    publication["@pagerduty-incident.urgency"] = "high"
    return publication


@register
def pagerduty_v2_low_urgency(alert: dict, publication: dict) -> dict:
    """warning severity / low urgency (pagerduty_layout.py:72-81)."""
    publication["@pagerduty-v2.severity"] = "warning"
    publication["@pagerduty-incident.urgency"] = "low"
    return publication


@register
def pagerduty_pretty_print_arrays(alert: dict, publication: dict) -> dict:
    """StringifyArrays with a paragraph-separator delimiter so scalar
    arrays render readably in the PagerDuty UI
    (pagerduty_layout.py:84-108)."""
    return _stringify_scalar_arrays(publication, "\n\n----------\n\n")


@register
def pagerduty_attach_image(alert: dict, publication: dict) -> dict:
    """Attach a banner image for both event API versions
    (pagerduty_layout.py:111-150)."""
    publication.setdefault("@pagerduty-v2.images", []).append({
        "src": "https://streamalert.io/en/stable/_images/sa-banner.png",
        "href": "https://streamalert.io/en/stable/",
        "alt": "StreamAlert Docs",
    })
    publication.setdefault("@pagerduty.contexts", []).append({
        "type": "image",
        "src": "https://streamalert.io/en/stable/_images/sa-banner.png",
    })
    return publication
