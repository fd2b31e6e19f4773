"""Cloud output request builders: the full request-body construction for
the Slack and PagerDuty (Events v1 + v2) services, transport-free.

The reference's output connectors (alert_processor/outputs/slack.py:35-420,
outputs/pagerduty.py:56-417) mix three concerns: credential loading, HTTP,
and request construction. The first two are environment-dependent and stay
out of the engine; the request construction — the actual output semantics
(mrkdwn rendering, attachment splitting/limits, publisher-field overrides,
dedup keys, context/image/link validation) — is built here and handed to an
injectable ``transport`` callable, so delivery in production is one HTTP
POST of the returned body.

Builders read from the composed publication; the default presentation
fields (rule_name, rule_description, record, log_source, id) are present
because the dispatcher seeds the publication from the alert row, and
layout publishers that replace the publication set the ``@service.*``
override fields the builders prefer.
"""

from __future__ import annotations

import html
import json
from typing import Any, Callable

# Slack recommends no message larger than 4000 bytes and caps attachments
# at 20 per message (slack.py:37-38)
SLACK_MAX_MESSAGE_SIZE = 4000
SLACK_MAX_ATTACHMENTS = 20


def elide_middle(text: str, max_length: int) -> str:
    """Shorten text to max_length by replacing the middle with ' ... '
    (alert_processor/helpers.py:19-33)."""
    if len(text) <= max_length:
        return text
    half = (max_length - 5) // 2
    return f"{text[:half]} ... {text[-half:]}"


def _record_dict(publication: dict) -> Any:
    rec = publication.get("record")
    if isinstance(rec, str):
        try:
            return json.loads(rec)
        except ValueError:
            return rec
    return rec if rec is not None else {}


# ------------------------------------------------------------------ slack

def _mrkdwn_lines(value: Any, depth: int) -> list[str]:
    """Human-readable mrkdwn rendering of a JSON value: sorted map keys as
    ``*key:*``, list elements as ``*[i]*``, tab indentation per nesting
    level (slack.py:336-419)."""
    tab = "\t" * depth
    if isinstance(value, dict):
        lines: list[str] = []
        for key, item in sorted(value.items()):
            if isinstance(item, (dict, list)) and item:
                lines.append(f"{tab}*{key}:*")
                lines.extend(_mrkdwn_lines(item, depth + 1))
            else:
                rendered = _mrkdwn_lines(item, depth + 1)
                lines.append(f"{tab}*{key}:* {rendered[0] if rendered else item}")
        return lines
    if isinstance(value, list):
        lines = []
        for idx, item in enumerate(value, start=1):
            if isinstance(item, (dict, list)) and item:
                lines.append(f"{tab}*[{idx}]*")
                lines.extend(_mrkdwn_lines(item, depth + 1))
            else:
                rendered = _mrkdwn_lines(item, depth + 1)
                lines.append(f"{tab}*[{idx}]* {rendered[0] if rendered else item}")
        return lines
    return [f"{value}"]


def _split_record_text(record: Any) -> list[str]:
    """Escape then split the rendered record at line/space boundaries so
    every chunk fits Slack's message size (slack.py:68-102)."""
    text = html.escape("\n".join(_mrkdwn_lines(record, 0)), quote=False)
    chunks = []
    while text:
        if len(text) <= SLACK_MAX_MESSAGE_SIZE:
            chunks.append(text)
            break
        cut = text[: SLACK_MAX_MESSAGE_SIZE + 1].rfind("\n")
        if cut == -1:
            cut = text[: SLACK_MAX_MESSAGE_SIZE + 1].rfind(" ")
        if cut == -1:
            cut = SLACK_MAX_MESSAGE_SIZE
        chunks.append(text[:cut])
        text = text[cut + 1:]
    return chunks


_SLACK_ATTACHMENT_DEFAULTS = {
    "fallback": "", "color": "#36a64f", "pretext": "", "author_name": "",
    "author_link": "", "author_icon": "", "title": "", "title_link": "",
    "text": "", "fields": [], "image_url": "", "thumb_url": "",
    "footer": "", "footer_icon": "", "ts": "", "mrkdwn_in": ["text", "pretext"],
}


def slack_request(publication: dict, descriptor: str = "") -> dict:
    """The Slack webhook POST body (slack.py:_format_message, 298-330):
    publisher-supplied @slack.attachments are normalized onto the
    attachment skeleton with size/count limits; otherwise the record
    renders as mrkdwn split across numbered Record attachments."""
    rule_name = publication.get("rule_name") or ""
    header = publication.get("@slack.text",
                             f"*StreamAlert Rule Triggered: {rule_name}*")

    if "@slack.attachments" in publication:
        attachments = []
        for custom in publication["@slack.attachments"][:SLACK_MAX_ATTACHMENTS]:
            att = {**_SLACK_ATTACHMENT_DEFAULTS, **custom}
            if len(att["text"]) > SLACK_MAX_MESSAGE_SIZE:
                att["text"] = elide_middle(att["text"], SLACK_MAX_MESSAGE_SIZE)
            attachments.append(att)
    else:
        messages = _split_record_text(_record_dict(publication))
        attachments = []
        for idx, message in enumerate(messages[:SLACK_MAX_ATTACHMENTS], start=1):
            title = "Record:" if len(messages) == 1 else \
                f"Record (Part {idx} of {len(messages)}):"
            pretext = ""
            if idx == 1:
                pretext = "*Rule Description:*\n{}\n".format(
                    publication.get("rule_description") or "")
            attachments.append({
                "fallback": header,
                "color": "#b22222",
                "pretext": pretext,
                "title": title,
                "text": message,
                "mrkdwn_in": ["text", "pretext"],
            })

    return {"text": header, "mrkdwn": True, "attachments": attachments}


# -------------------------------------------------------------- pagerduty

def _valid_contexts(contexts: Any) -> list[dict]:
    """Keep only well-formed link/image contexts (pagerduty.py:311-335)."""
    if not isinstance(contexts, list):
        return []
    out = []
    for ctx in contexts:
        if not isinstance(ctx, dict):
            continue
        kind = ctx.get("type")
        if kind == "link" and "href" in ctx and "text" in ctx:
            out.append(ctx)
        elif kind == "image" and "src" in ctx:
            out.append(ctx)
    return out


def pagerduty_v1_request(publication: dict, descriptor: str = "",
                         service_key: str = "") -> dict:
    """Events API v1 trigger body (pagerduty.py:232-310 +
    PagerDutyEventsV1ApiClient.send_event, 1385-1406)."""
    rule_name = publication.get("rule_name") or ""
    details_default = {
        "description": publication.get("rule_description"),
        "record": _record_dict(publication),
    }
    return {
        "service_key": service_key,
        "event_type": "trigger",
        "description": publication.get(
            "@pagerduty.description", f"StreamAlert Rule Triggered - {rule_name}"),
        "details": publication.get("@pagerduty.details", details_default),
        "client": "StreamAlert",
        "client_url": publication.get("@pagerduty.client_url", ""),
        "contexts": _valid_contexts(publication.get("@pagerduty.contexts", [])),
    }


def _valid_images(images: Any) -> list[dict]:
    if not isinstance(images, list):
        return []
    return [
        {"src": i["src"], "href": i.get("href", ""), "alt": i.get("alt", "")}
        for i in images if isinstance(i, dict) and "src" in i
    ]


def _valid_links(links: Any) -> list[dict]:
    if not isinstance(links, list):
        return []
    return [
        {"href": l["href"], "text": l.get("text", l["href"])}
        for l in links if isinstance(l, dict) and "href" in l
    ]


def pagerduty_v2_request(publication: dict, descriptor: str = "",
                         routing_key: str = "") -> dict:
    """Events API v2 enqueue body (pagerduty.py:56-144): dedup_key is
    namespaced by descriptor so one alert fanning to several services
    cannot collide."""
    rule_name = publication.get("rule_name") or ""
    details_default: dict = {"description": publication.get("rule_description"),
                             "record": _record_dict(publication)}
    return {
        "routing_key": routing_key,
        "event_action": "trigger",
        "dedup_key": f"{descriptor}:{publication.get('id', '')}",
        "payload": {
            "summary": publication.get(
                "@pagerduty-v2.summary", f"StreamAlert Rule Triggered - {rule_name}"),
            "source": publication.get("log_source"),
            "severity": publication.get("@pagerduty-v2.severity", "critical"),
            "custom_details": publication.get(
                "@pagerduty-v2.custom_details", details_default),
            "component": publication.get("@pagerduty-v2.component"),
            "group": publication.get("@pagerduty-v2.group"),
            "class": publication.get("@pagerduty-v2.class"),
        },
        "client": "StreamAlert",
        "client_url": publication.get("@pagerduty-v2.client_url"),
        "images": _valid_images(publication.get("@pagerduty-v2.images", [])),
        "links": _valid_links(publication.get("@pagerduty-v2.links", [])),
    }


# ------------------------------------------------------------- dispatcher

Transport = Callable[[str, dict], bool]       # (service, request_body) -> ok

_BUILDERS = {
    "slack": slack_request,
    "pagerduty": pagerduty_v1_request,
    "pagerduty-v2": pagerduty_v2_request,
}


def register_cloud_outputs(dispatcher, transport: Transport,
                           publishers: dict[str, list] | None = None) -> None:
    """Wire the request builders into an AlertDispatcher with an
    injectable transport (production: an HTTP POST; tests: a recorder).
    """
    publishers = publishers or {}
    for service, builder in _BUILDERS.items():
        def fn(publication: dict, descriptor: str, _b=builder, _s=service) -> bool:
            return transport(_s, _b(publication, descriptor))

        dispatcher.register(service, fn, publishers.get(service))
