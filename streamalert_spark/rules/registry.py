"""Rule + matcher registry.

Reference behavior (streamalert/shared/rule.py:32-234): @rule registers a
named predicate f(record) -> bool with metadata — logs (log types it applies
to), datatypes (normalized types it subscribes to), matchers, outputs,
merge_by_keys/merge_window_mins, req_subkeys, context, dynamic_outputs,
publishers; names are unique (rule.py:53-60); disabled rules are skipped;
rule exceptions evaluate to False, never crash the pipeline
(rule.py:142-164). Matchers are shared predicates; ALL must pass before the
rule body runs (rule.py:92-122).

Spark-first twist: a rule may declare ``expr`` — a native Column-builder
(record_col -> Column) instead of (or in addition to) a Python ``process``
body. Native rules run fully JVM-side; Python-body rules run via a
vectorized mapInPandas batch evaluator. The engine always emits the cheap
routing filters (log type, req_subkeys, matchers-as-expressions) natively
BEFORE any Python — the plan-construction-time 'optimizer' the reference
does manually at rules_engine.py:484-497.
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import textwrap
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column


@dataclass
class Rule:
    name: str
    process: Callable[[dict], bool] | None = None          # Python predicate
    expr: Callable[[Column], Column] | None = None          # native Column predicate
    logs: list[str] | None = None                           # log types (None = all)
    datatypes: list[str] | None = None                      # normalized-type routing
    matchers: list[str] = field(default_factory=list)
    outputs: list[str] = field(default_factory=list)
    dynamic_outputs: list[Callable] = field(default_factory=list)
    publishers: Any = None
    req_subkeys: dict[str, list[str]] = field(default_factory=dict)
    merge_by_keys: list[str] = field(default_factory=list)
    merge_window_mins: int = 0
    context: dict | None = None
    description: str = ""
    disabled: bool = False

    def checksum(self) -> str:
        """md5 of the rule AST minus docstrings — staging change detection
        (reference rule.py:166-189)."""
        fn = self.process or self.expr
        if fn is None:
            return hashlib.md5(self.name.encode()).hexdigest()  # noqa: S324
        try:
            source = textwrap.dedent(inspect.getsource(fn))
            tree = ast.parse(source)
            for node in ast.walk(tree):
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Module)):
                    if (node.body and isinstance(node.body[0], ast.Expr)
                            and isinstance(node.body[0].value, ast.Constant)):
                        node.body = node.body[1:]
            return hashlib.md5(ast.dump(tree).encode()).hexdigest()  # noqa: S324
        except (OSError, TypeError, SyntaxError):
            return hashlib.md5(self.name.encode()).hexdigest()  # noqa: S324


class RuleRegistry:
    def __init__(self) -> None:
        self._rules: dict[str, Rule] = {}
        self._matchers: dict[str, Callable | None] = {}
        self._matcher_exprs: dict[str, Callable[[Column], Column]] = {}

    # -- rules ------------------------------------------------------------
    def rule(self, **options):
        """Decorator mirroring @rule (rule.py:32-37). The decorated function
        is the Python predicate body; pass expr=... for a native variant."""

        def deco(fn):
            name = options.pop("name", fn.__name__)
            if name in self._rules:
                raise ValueError(f"rule {name} already defined")  # rule.py:53-60
            if not (options.get("logs") or options.get("datatypes")):
                raise ValueError(f"rule {name} needs logs or datatypes routing")  # rule.py:71-75
            r = Rule(name=name, process=fn, description=(fn.__doc__ or "").strip(), **options)
            self._rules[name] = r
            return fn

        return deco

    def add(self, r: Rule) -> Rule:
        if r.name in self._rules:
            raise ValueError(f"rule {r.name} already defined")
        if not (r.logs or r.datatypes):
            raise ValueError(f"rule {r.name} needs logs or datatypes routing")
        self._rules[r.name] = r
        return r

    def rules_for_log_type(self, log_type: str) -> list[Rule]:
        """Routing (rule.py:231-234): enabled rules whose logs contain the
        type, or subscribe to all (logs=None with no datatypes routing)."""
        return [
            r for r in self._rules.values()
            if not r.disabled and (r.logs is None or log_type in (r.logs or []))
        ]

    def get(self, name: str) -> Rule:
        return self._rules[name]

    def all(self) -> list[Rule]:
        return list(self._rules.values())

    # -- matchers ----------------------------------------------------------
    def matcher(self, fn=None, *, expr: Callable[[Column], Column] | None = None, name: str | None = None):
        """Register a shared matcher; optionally with a native expression
        equivalent so the engine can pre-filter JVM-side."""

        def deco(f):
            mname = name or f.__name__
            self._matchers[mname] = f
            if expr is not None:
                self._matcher_exprs[mname] = expr
            return f

        if fn is not None:
            return deco(fn)
        return deco

    def matcher_fn(self, name: str) -> Callable | None:
        return self._matchers.get(name)

    def matcher_expr(self, name: str) -> Callable[[Column], Column] | None:
        return self._matcher_exprs.get(name)


# default module-level registry (mirrors the reference's import-time
# registration through shared/importer.py)
DEFAULT_REGISTRY = RuleRegistry()
rule = DEFAULT_REGISTRY.rule
matcher = DEFAULT_REGISTRY.matcher
