"""Rules engine: metadata-driven plan construction.

Reference loop (streamalert/rules_engine/rules_engine.py:458-512): for each
record, find rules for its log type, pre-check req_subkeys, run matchers,
run the rule body (exceptions -> False, rule.py:160-164), build an Alert.

Spark plan per rule (the 'optimizer' of SURVEY.md §4 — Catalyst cannot push
into opaque Python, so cheap predicates are emitted natively BEFORE any
Python runs):

  records(log_type)                       -- routing filter, free
    .filter(req_subkeys native exprs)     -- rules_engine.py:135-170
    .filter(matcher native exprs)         -- when the matcher has an expr twin
    .filter(rule.expr)                    -- native rules: fully JVM-side
    [.mapInPandas(python body)]           -- only Python-body rules pay this
    .select(alert columns)

The per-rule frames union into one alerts DataFrame. Union-of-filters over
one cached scan is a single pass at execution time; rules sharing a log type
share the scan subplan.
"""

from __future__ import annotations

import copy
import json
import os
import time
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streamalert_spark.alerts.model import alert_columns
from streamalert_spark.rules.registry import Rule, RuleRegistry

# reference env-var opt-in for the per-rule timing harness
# (rules_engine.py:67-70, shared/stats.py:26-97)
TRACK_RULE_STATS_ENV = "STREAMALERT_TRACK_RULE_STATS"


def _to_plain(value):
    """Arrow/pandas struct-and-map values -> plain Python dict/list for rule
    bodies (struct -> dict arrives natively; map -> list of 2-tuples)."""
    if isinstance(value, dict):
        return {k: _to_plain(v) for k, v in value.items()}
    if isinstance(value, list):
        if value and isinstance(value[0], tuple) and len(value[0]) == 2:
            return {k: _to_plain(v) for k, v in value}
        return [_to_plain(v) for v in value]
    if isinstance(value, tuple):
        return [_to_plain(v) for v in value]
    return value


class RulesEngine:
    def __init__(self, registry: RuleRegistry, track_rule_stats: bool | None = None):
        self.registry = registry
        # per-rule wall-ms + call-count harness (shared/stats.py:26-97),
        # opt-in via the reference's env var; Spark shape: one accumulator
        # pair per rule, aggregated across executors. Only Python-bodied
        # rules are timed — native-expression rules run inside codegen where
        # per-rule time is not separable (their cost shows in the plan).
        self.track_rule_stats = (
            track_rule_stats
            if track_rule_stats is not None
            else bool(os.environ.get(TRACK_RULE_STATS_ENV))
        )
        self._stat_accs: dict[str, tuple] = {}

    def _stats_for(self, df: DataFrame, rule_name: str):
        if not self.track_rule_stats:
            return None
        if rule_name not in self._stat_accs:
            sc = df.sparkSession.sparkContext
            self._stat_accs[rule_name] = (sc.accumulator(0.0), sc.accumulator(0))
        return self._stat_accs[rule_name]

    def rule_stats(self) -> dict[str, dict]:
        """{rule: {ms, calls, avg_ms}} (RuleStatisticTracker.statistics_info
        shape, stats.py:59-73)."""
        out = {}
        for name, (t_acc, c_acc) in self._stat_accs.items():
            calls = c_acc.value
            out[name] = {
                "ms": t_acc.value,
                "calls": calls,
                "avg_ms": (t_acc.value / calls) if calls else 0.0,
            }
        return out

    def stats_info(self) -> str:
        """Human-readable per-rule statistics (stats.py:59-73)."""
        stats = self.rule_stats()
        if not stats:
            return "No rule statistics to return"
        pad = max(len(n) for n in stats) + 4
        lines = [
            f"{name:<{pad}}{s['ms']:14.8f} ms  {s['calls']:6d} calls  {s['avg_ms']:14.8f} avg"
            for name, s in sorted(stats.items(), key=lambda kv: (kv[1]["ms"], kv[0]))
        ]
        return "Rule statistics:\n\n" + "\n".join(lines)

    # -- native pre-filters --------------------------------------------------
    def _req_subkeys_filter(self, record: Column, r: Rule) -> Column | None:
        """rules_engine.py:135-170: required nested keys present."""
        conds = []
        for parent, subkeys in (r.req_subkeys or {}).items():
            for sk in subkeys:
                conds.append(record[parent][sk].isNotNull())
        if not conds:
            return None
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out

    def _matcher_filter(self, record: Column, r: Rule) -> tuple[Column | None, list]:
        """Native matcher expressions where available; Python matcher fns
        otherwise (ALL must pass — rule.py:92-122)."""
        native_conds, python_matchers = [], []
        for name in r.matchers:
            expr_builder = self.registry.matcher_expr(name)
            if expr_builder is not None:
                native_conds.append(expr_builder(record))
            else:
                fn = self.registry.matcher_fn(name)
                if fn is not None:
                    python_matchers.append(fn)
        cond = None
        for c in native_conds:
            cond = c if cond is None else (cond & c)
        return cond, python_matchers

    # -- python body evaluation (vectorized) ----------------------------------
    @staticmethod
    def _python_eval(df: DataFrame, r: Rule, python_matchers: list, record_col: str,
                     stats=None) -> DataFrame:
        """Evaluate matchers + rule body per batch via mapInPandas. Exceptions
        map to False (rule.py:142-164); context is deep-copied per record
        (rule.py:152-157). ``stats`` is an optional (time_acc, count_acc)
        accumulator pair timing the rule body (stats.py:35-57)."""
        process = r.process
        base_context = r.context

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if pdf.empty:
                    yield pdf
                    continue
                keep = []
                body_ms = 0.0
                body_calls = 0
                for rec in pdf[record_col]:
                    record = _to_plain(rec)
                    ok = True
                    try:
                        for m in python_matchers:
                            if not m(record):
                                ok = False
                                break
                        if ok and process is not None:
                            ctx = copy.deepcopy(base_context) if base_context is not None else None
                            t0 = time.perf_counter() if stats else 0.0
                            ok = bool(process(record, ctx)) if ctx is not None else bool(process(record))
                            if stats:
                                body_ms += (time.perf_counter() - t0) * 1000.0
                                body_calls += 1
                    except Exception:  # noqa: BLE001 — rule.py:160-164: never crash
                        ok = False
                    keep.append(ok)
                if stats and body_calls:
                    stats[0].add(body_ms)
                    stats[1].add(body_calls)
                yield pdf[pd.Series(keep, index=pdf.index)]

        return df.mapInPandas(run, schema=df.schema)

    # -- dynamic outputs -------------------------------------------------------
    @staticmethod
    def _dynamic_outputs_eval(df: DataFrame, r: Rule, record_col: str) -> DataFrame:
        """Evaluate dynamic-output functions per record and attach a
        '_dynamic_outputs' array column (rules_engine.py:245-308: each
        function gets (record[, context]) and returns str | list | None;
        failures contribute nothing)."""
        fns = r.dynamic_outputs
        base_context = r.context

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                outs = []
                for rec in pdf[record_col]:
                    record = _to_plain(rec)
                    extra: list[str] = []
                    for fn in fns:
                        try:
                            got = (fn(record, copy.deepcopy(base_context))
                                   if base_context is not None else fn(record))
                        except Exception:  # noqa: BLE001 — bad fn adds nothing
                            continue
                        if isinstance(got, str):
                            extra.append(got)
                        elif isinstance(got, (list, tuple)):
                            extra.extend(str(g) for g in got if g)
                    outs.append(extra)
                yield pdf.assign(_dynamic_outputs=outs)

        from pyspark.sql import types as T

        schema = T.StructType(
            list(df.schema.fields)
            + [T.StructField("_dynamic_outputs", T.ArrayType(T.StringType()))]
        )
        return df.mapInPandas(run, schema=schema)

    # -- public API ------------------------------------------------------------
    def run(
        self,
        df: DataFrame,
        log_type: str,
        record_col: str = "record",
        event_time: Column | None = None,
        cluster: str = "",
        source_service: str = "",
        source_entity: str = "",
        alert_id: Column | None = None,
        staged_rules: dict[str, bool] | None = None,
        required_outputs: list[str] | None = None,
    ) -> DataFrame | None:
        """Classified records of one log type -> alerts DataFrame (or None
        when no rule routes to this type).

        staged_rules/required_outputs implement the staging gate
        (rules_engine.py:219-243): a staged rule's alerts carry
        staged=true and are routed ONLY to the required outputs.
        """
        rules = self.registry.rules_for_log_type(log_type)
        record = F.col(record_col)
        ts = event_time if event_time is not None else F.current_timestamp()

        alert_frames: list[DataFrame] = []
        for r in rules:
            cur = df
            if r.datatypes:
                # datatype routing (rule.py:227-229, docs/rules.rst:174-179):
                # the record's normalization must contain at least one
                # subscribed normalized type. Without a normalization column
                # a datatype-routed rule can never match.
                if "streamalert_normalization" not in df.columns:
                    continue
                norm = F.col("streamalert_normalization")
                cond = None
                for dt_name in r.datatypes:
                    # the map carries every CONFIGURED type (empty values
                    # when its condition failed) — presence means actual
                    # extracted values, not just the key
                    c = F.size(F.flatten(
                        F.transform(norm[dt_name], lambda e: e["values"])
                    )) > 0
                    cond = c if cond is None else (cond | c)
                cur = cur.filter(cond)
            pre = self._req_subkeys_filter(record, r)
            if pre is not None:
                cur = cur.filter(pre)
            mcond, python_matchers = self._matcher_filter(record, r)
            if mcond is not None:
                cur = cur.filter(mcond)
            if r.expr is not None:
                cur = cur.filter(r.expr(record))
            if r.process is not None or python_matchers:
                cur = self._python_eval(cur, r, python_matchers, record_col,
                                        stats=self._stats_for(cur, r.name))
            staged = bool((staged_rules or {}).get(r.name, False))
            outputs_override = None
            if staged:
                # staging gate: only the required outputs receive staged
                # alerts (rules_engine.py:219-243)
                outputs_override = F.array(
                    *[F.lit(o) for o in (required_outputs or [])]
                ).cast("array<string>")
            elif r.dynamic_outputs:
                cur = self._dynamic_outputs_eval(cur, r, record_col)
                # merge static + dynamic, keep only valid 'service:descriptor'
                # outputs (rules_engine.py:310-338 format check)
                outputs_override = F.array_distinct(F.concat(
                    F.array(*[F.lit(o) for o in r.outputs]).cast("array<string>"),
                    F.filter(
                        F.coalesce(F.col("_dynamic_outputs"), F.array().cast("array<string>")),
                        lambda o: o.rlike("^[a-zA-Z0-9_-]+:\\S+$"),
                    ),
                ))
            alert_frames.append(
                cur.select(
                    *alert_columns(
                        r,
                        record_json=F.to_json(record),
                        event_time=ts,
                        cluster=cluster,
                        source_service=source_service,
                        source_entity=source_entity,
                        log_type=log_type,
                        alert_id=alert_id,
                        staged=staged,
                        outputs_override=outputs_override,
                    )
                )
            )
        if not alert_frames:
            return None
        out = alert_frames[0]
        for f_ in alert_frames[1:]:
            out = out.unionByName(f_)
        return out


def record_to_dict(record_json: str) -> dict:
    """Inverse of the engine's to_json for delivery-side publishers."""
    return json.loads(record_json)
