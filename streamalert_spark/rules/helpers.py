"""Rule helper stdlib — importable inside Python rule bodies.

Parity with rules/helpers/base.py in the reference (line numbers cited per
function). These run inside vectorized rule evaluation, so they are plain
Python over dict records; several have native-Column twins in
``native`` for rules that want to stay JVM-side.
"""

from __future__ import annotations

import fnmatch
import json
import random
import time
from collections.abc import Iterable
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F


def path_matches_any(text: str, patterns: Iterable[str]) -> bool:
    """fnmatch against any pattern (reference base.py:35)."""
    return any(fnmatch.fnmatch(text, p) for p in patterns)


def starts_with_any(text: str, prefixes: Iterable[str]) -> bool:
    """base.py:56."""
    return any(text.startswith(p) for p in prefixes)


def ends_with_any(text: str, suffixes: Iterable[str]) -> bool:
    """base.py:74."""
    return any(text.endswith(s) for s in suffixes)


def contains_any(text: str, substrings: Iterable[str]) -> bool:
    """base.py:92."""
    return any(s in text for s in substrings)


def matches_any(text: str, patterns: Iterable[str]) -> bool:
    """fnmatch full-match against any (base.py:110)."""
    return any(fnmatch.fnmatch(text, p) for p in patterns)


def last_hour(unixtime: float, hours: int = 1) -> bool:
    """Event occurred within the trailing N hours (base.py:129)."""
    seconds = hours * 3600
    return bool(unixtime) and float(unixtime) >= time.time() - seconds


def data_has_value(data: Any, search_value: Any) -> bool:
    """Deep search for an exact value (base.py:144)."""
    if isinstance(data, list):
        return any(data_has_value(item, search_value) for item in data)
    if isinstance(data, dict):
        return any(data_has_value(v, search_value) for v in data.values())
    return data == search_value


def data_has_value_with_substring(data: Any, search_value: str) -> bool:
    """Deep search for a substring (base.py:163)."""
    if isinstance(data, list):
        return any(data_has_value_with_substring(item, search_value) for item in data)
    if isinstance(data, dict):
        return any(data_has_value_with_substring(v, search_value) for v in data.values())
    return isinstance(data, str) and search_value in data


def data_has_value_from_list(data: Any, needle_list: Iterable[Any]) -> bool:
    """Deep search for any exact value from a list (base.py:182)."""
    return any(data_has_value(data, needle) for needle in needle_list)


def data_has_value_from_substring_list(data: Any, needle_list: Iterable[str]) -> bool:
    """Deep search for any substring from a list (base.py:203)."""
    return any(data_has_value_with_substring(data, needle) for needle in needle_list)


def safe_json_loads(data: str) -> dict:
    """json.loads returning {} on failure (base.py:225)."""
    try:
        return json.loads(data)
    except (ValueError, TypeError):
        return {}


def random_bool(probability: float) -> bool:
    """True with the given probability (base.py:240)."""
    return random.random() <= probability  # noqa: S311 — sampling, not crypto


class native:
    """Column-expression twins for rules that stay JVM-side."""

    @staticmethod
    def contains_any(col: Column, substrings: Iterable[str]) -> Column:
        out = None
        for s in substrings:
            c = col.contains(s)
            out = c if out is None else (out | c)
        return out if out is not None else F.lit(False)

    @staticmethod
    def starts_with_any(col: Column, prefixes: Iterable[str]) -> Column:
        out = None
        for p in prefixes:
            c = col.startswith(p)
            out = c if out is None else (out | c)
        return out if out is not None else F.lit(False)

    @staticmethod
    def matches_any(col: Column, globs: Iterable[str]) -> Column:
        from streamalert_spark.classify.classifier import glob_to_like

        out = None
        for g in globs:
            c = col.like(glob_to_like(g))
            out = c if out is None else (out | c)
        return out if out is not None else F.lit(False)

    @staticmethod
    def random_bool(probability: float) -> Column:
        return F.rand() <= F.lit(probability)
