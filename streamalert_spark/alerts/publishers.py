"""The shipped generic publisher library.

Reference: publishers/community/generic.py — seven registerable
publications transforms composed in series by the alert processor
(shared/publisher.py:39-120). Signature here follows the engine's
Publisher contract ``(alert: dict, publication: dict) -> dict``
(streaming/sinks.py); the reference passes an Alert object, so
``alert.record``/``alert.context`` become dict lookups.
"""

from __future__ import annotations

import re
from collections import OrderedDict, deque
from typing import Any

NORMALIZATION_KEY = "streamalert_normalization"

PUBLISHERS: dict[str, Any] = {}


def register(fn):
    """@Register equivalent (shared/publisher.py) — name-keyed registry."""
    PUBLISHERS[fn.__name__] = fn
    return fn


@register
def add_record(alert: dict, publication: dict) -> dict:
    """Attach the alert's source record (generic.py:23-28)."""
    publication["record"] = alert.get("record")
    return publication


@register
def blank(*_) -> dict:
    """Reset the publication to an empty dict (generic.py:31-34)."""
    return {}


@register
def remove_internal_fields(_, publication: dict) -> dict:
    """Drop engine-internal fields (generic.py:37-45)."""
    for key in ("staged", "publishers", "outputs"):
        publication.pop(key, None)
    return publication


def _delete_keys_matching(publication: dict, pattern: str) -> dict:
    """BFS-delete every nested dict key matching ``pattern``
    (generic.py:48-81 semantics: the whole branch under a match goes)."""
    queue: deque = deque([publication])
    while queue:
        node = queue.popleft()
        if isinstance(node, dict):
            for key in list(node):
                if re.search(pattern, key):
                    node.pop(key, None)
            queue.extend(node.values())
        elif isinstance(node, list):
            queue.extend(node)
    return publication


@register
def remove_fields(alert: dict, publication: dict) -> dict:
    """Delete fields named by regexps in context['remove_fields']
    (generic.py:84-105)."""
    context = alert.get("context") or {}
    for pattern in context.get("remove_fields", []):
        publication = _delete_keys_matching(publication, pattern)
    return publication


@register
def remove_streamalert_normalization(_, publication: dict) -> dict:
    """Drop the normalization map wherever it appears (generic.py:108-111)."""
    return _delete_keys_matching(publication, NORMALIZATION_KEY)


@register
def enumerate_fields(_, publication: dict) -> dict:
    """Flatten nested structure into dotted/indexed keys, sorted
    (generic.py:114-168): {'a': {'b': [x]}} -> {'a.b[0]': x}."""
    flat: dict[str, Any] = {}

    def walk(value, path: str) -> None:
        if isinstance(value, dict):
            for key, item in value.items():
                walk(item, f"{path}.{key}" if path else str(key))
        elif isinstance(value, list):
            for idx, item in enumerate(value):
                walk(item, f"{path}[{idx}]")
        else:
            flat[path] = value

    walk(publication, "")
    return OrderedDict(sorted(flat.items()))


def _stringify_scalar_arrays(publication: dict, delimiter: str) -> dict:
    """BFS over the publication joining every all-scalar list into one
    string (generic.py:206-273). Lists reached inside other lists are too
    late to replace (no back-reference) — same caveat as the reference."""
    queue: deque = deque([publication])
    while queue:
        node = queue.popleft()
        if isinstance(node, dict):
            for key, item in node.items():
                if isinstance(item, list) and not any(
                        isinstance(e, (dict, list)) for e in item):
                    node[key] = delimiter.join(str(e) for e in item)
                else:
                    queue.append(item)
        elif isinstance(node, list):
            queue.extend(node)
    return publication


@register
def stringify_arrays(_, publication: dict) -> dict:
    """Join scalar arrays with newlines (generic.py StringifyArrays)."""
    return _stringify_scalar_arrays(publication, "\n")


@register
def populate_fields(alert: dict, publication: dict) -> dict:
    """Keep ONLY context['populate_fields'], hoisted to the top level
    (generic.py:171-221): every deeply-nested value under an exactly-
    matching key is collected; 0 hits -> None, 1 -> the value, many ->
    list of values."""
    context = alert.get("context") or {}
    wanted = context.get("populate_fields", [])
    out: dict[str, Any] = {}
    for name in wanted:
        hits: list[Any] = []
        queue: deque = deque([publication])
        while queue:
            node = queue.popleft()
            if isinstance(node, dict):
                for key, item in node.items():
                    if key == name:
                        hits.append(item)
                    queue.append(item)
            elif isinstance(node, list):
                queue.extend(node)
        out[name] = hits[0] if len(hits) == 1 else (hits or None)
    return out


# Hook for deployment-global Demisto classification rules: each entry is
# ``alert_dict -> falsy | dict-of-traits`` and the first truthy result
# wins (publishers/sample/sample_demisto.py GLOBAL_CLASSIFIERS).
DEMISTO_GLOBAL_CLASSIFIERS: list[Any] = []


@register
def demisto_classification(alert: dict, publication: dict) -> dict:
    """Set Demisto incident traits as @demisto.* magic keys
    (publishers/sample/sample_demisto.py): context['demisto'] wins
    verbatim; otherwise the first truthy DEMISTO_GLOBAL_CLASSIFIERS
    result applies; otherwise the publication passes through. (The
    reference sample iterates ``for key, value in payload`` over its
    classifier dict — we iterate .items(), which is what that sample
    intends; its shipped `_any_rule_with_demisto` is illustrative
    pseudo-code, so no default classifier registers here.)"""
    context = alert.get("context") or {}
    if "demisto" in context:
        for key, value in context["demisto"].items():
            publication[f"@demisto.{key}"] = value
        return publication
    for code in DEMISTO_GLOBAL_CLASSIFIERS:
        payload = code(alert)
        if payload:
            for key, value in payload.items():
                publication[f"@demisto.{key}"] = value
            return publication
    return publication
