"""Fuzzy rule-description parsing (reference: shared/description.py:19-164).

Rule docstrings carry loosely-structured metadata — newline-delimited
``field: value`` lines where a field may span multiple lines, long URLs
wrap across lines and re-join, and a leading free-text block belongs to
``description``. Publishers (e.g. the Slack summary layout) surface the
parsed author/description in the published alert.
"""

from __future__ import annotations

import re

# a label is ≤20 chars of word/dash/space/& characters before a colon and
# never an http(s): scheme (description.py:66-69)
_FIELD_RE = re.compile(
    r"^(?!http:|https:)(?P<field>[a-zA-Z\d\-_&\s]{0,20}):(?P<remainder>.*)$"
)
# a joined fragment that still looks like one URL keeps concatenating
# (description.py:70-72)
_URL_RE = re.compile(
    r"^(?:http(s)?://)?[\w.-]+(?:\.[\w\.-]+)+"
    r"[\w\-\._~:/?#[\]@!\$&'\(\)\*\+,;=.]+$"
)


def parse(description: str | None) -> dict[str, list[str]]:
    """description text -> {field: [raw lines]}; text before any field
    label accrues to 'description'; blank lines are preserved as ''
    (description.py:75-116)."""
    lines = [ln.strip() for ln in (description or "").strip().split("\n")]
    fields: dict[str, list[str]] = {}
    current = "description"
    for line in lines:
        fields.setdefault(current, [])
        if not line:
            fields[current].append("")
            continue
        m = _FIELD_RE.match(line)
        if m:
            current = m.group("field").strip().lower()
            value = m.group("remainder").strip()
        else:
            value = line
        fields.setdefault(current, []).append(value)
    return fields


def _join(lines: list[str]) -> str:
    """Single-newlines collapse to spaces, double-newlines survive as a
    paragraph break, split URLs re-join with no space
    (description.py:120-146)."""
    if not isinstance(lines, list) or not lines:
        return ""
    doc: str | None = None
    pending_breaks = ""
    for line in lines:
        if not line:
            pending_breaks += "\n"
            continue
        if doc is None:
            pending_breaks = ""
            doc = line
        elif _URL_RE.match(doc + line):
            doc += line
        else:
            doc += (pending_breaks or " ") + line
            pending_breaks = ""
    return doc or ""


def present(description: str | None) -> dict:
    """{'author', 'description', 'fields': {...}} — 'maintainer' aliases
    author (description.py:148-164)."""
    out = {"author": "", "description": "", "fields": {}}
    for key, lines in parse(description).items():
        if key in ("author", "maintainer"):
            out["author"] = _join(lines)
        elif key == "description":
            out["description"] = _join(lines)
        else:
            out["fields"][key] = _join(lines)
    return out
