"""Query registry — the engine's public, driver-checkable query surface.

Every implemented operator family from SURVEY.md §2 registers at least one
named query here. Each entry pairs a Spark callable ``(spark, sf_dir) ->
DataFrame`` with an equivalent DuckDB-runnable ANSI SQL oracle (or None for
genuinely non-SQL-expressible operators — the driver then records a weaker
rows-only check).

Determinism contract (both sides must hash-match):
- money/metric aggregates go through DECIMAL so sum order cannot perturb
  low-order float bits, then cast back to DOUBLE;
- every computed column is aliased identically in Spark and oracle SQL;
- ORDER BY always carries a unique tie-break column;
- hashing uses md5-of-string (portable) — never engine-native hash().
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class RegisteredQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a named query with its DuckDB oracle."""

    def deco(fn):
        QUERIES[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, RegisteredQuery]:
    """Import every query module (side-effect: registration) and return the registry."""
    from streamalert_spark.queries import (  # noqa: F401
        analytics_ext,
        curation_ext,
        llm_ops,
        multimodal_surface,
        parsers_surface,
        pii_surface,
        pipeline,
        pipeline_ext,
        scale_ext,
        sources_surface,
        sql_joins_ext,
        sql_surface,
        surface_ext,
        training_ext,
    )

    return QUERIES
