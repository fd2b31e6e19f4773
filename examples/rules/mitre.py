"""The mitre_attack community rule family on the Spark engine.

Ports rules/community/mitre_attack/defense_evasion/multi/
obfuscated_files_or_information/right_to_left_character.py — the one
datatypes-routed rule in the reference tree. It subscribes to normalized
types instead of log types (rule.py:227-229), so it fires on ANY log whose
normalization config extracts ``command`` / ``path`` / ``file_name``
values (carbonblack procstart and osquery shell history in the example
deployment).

The engine's datatype routing pre-filters to records with non-empty
extractions for a subscribed type; the RLO scan itself is a native
array_exists + contains over the normalization map — no Python.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamalert_spark.rules.registry import Rule, RuleRegistry

_RLO = "‮"  # right-to-left-override
_DATATYPES = ["command", "path", "file_name"]


def _any_value_contains_rlo(rec):
    """True when any extracted value of any subscribed normalized type
    contains U+202E (right_to_left_character.py:22-40)."""
    norm = F.col("streamalert_normalization")
    cond = F.lit(False)
    for dt in _DATATYPES:
        values = F.flatten(F.coalesce(
            F.transform(norm[dt], lambda e: e["values"]),
            F.array().cast("array<array<string>>"),
        ))
        cond = cond | F.exists(values, lambda v: v.contains(_RLO))
    return cond


def register(rules: RuleRegistry) -> None:
    rules.add(Rule(
        name="right_to_left_character",
        expr=_any_value_contains_rlo,
        datatypes=_DATATYPES,
        outputs=["pagerduty:csirt"],
        description="File/process name disguised with the U+202E "
                    "right-to-left-override character (ATT&CK T1027).",
    ))
