"""Fuzzy rule-description parsing for presentation publishers.

Behavioral parity with the reference's RuleDescriptionParser
(streamalert/shared/description.py:19-164): rule docstrings are
newline-delimited, mostly one ``field: value`` per line, where a field
label is <=20 chars of word-ish text (never an http/https scheme) before
a colon. Lines before any label belong to ``description``. Values may
continue across lines; URL fragments concatenate with no separator;
blank lines inside a value surface as newlines in the joined text.
"""

from __future__ import annotations

import re

# label: <=20 alphanum/underscore/dash/space/& chars, not an URL scheme
# (description.py:67-70)
_LABEL = re.compile(r"^(?!https?:)(?P<field>[a-zA-Z\d\-_&\s]{0,20}):(?P<rest>.*)$")
# a joined fragment that still looks like one long URL keeps concatenating
# (description.py:71-74)
_URL = re.compile(
    r"^(?:http(s)?://)?[\w.-]+(?:\.[\w\.-]+)+"
    r"[\w\-\._~:/?#[\]@!\$&'\(\)\*\+,;=.]+$"
)


def parse_description(text: str | None) -> dict[str, list[str]]:
    """Split a description into {lowercased field: [value lines]}
    (description.py:75-117). Blank lines are kept as '' entries so the
    joiner can reproduce paragraph breaks."""
    fields: dict[str, list[str]] = {"description": []}
    current = "description"
    for raw_line in (text or "").strip().split("\n"):
        line = raw_line.strip()
        if not line:
            fields.setdefault(current, []).append("")
            continue
        m = _LABEL.match(line)
        if m:
            current = m.group("field").strip().lower()
            value = m.group("rest").strip()
        else:
            value = line
        fields.setdefault(current, []).append(value)
    return fields


def _join(lines: list[str]) -> str:
    """Join a field's lines (description.py:120-145): leading blanks are
    dropped, URL continuations concatenate bare, buffered blank lines
    become embedded newlines, everything else joins with one space."""
    doc: str | None = None
    pending_breaks = ""
    for line in lines:
        if not line:
            pending_breaks += "\n"
            continue
        if doc is None:
            doc = line
            pending_breaks = ""
        elif _URL.match(doc + line):
            doc += line
        else:
            doc += (pending_breaks or " ") + line
            pending_breaks = ""
    return doc or ""


def present_description(text: str | None) -> dict:
    """{author, description, fields} presentation (description.py:119-164);
    'maintainer' aliases author, every other label lands under fields."""
    out: dict = {"author": "", "description": "", "fields": {}}
    for key, lines in parse_description(text).items():
        if key in ("author", "maintainer"):
            out["author"] = _join(lines)
        elif key == "description":
            out["description"] = _join(lines)
        else:
            out["fields"][key] = _join(lines)
    return out
