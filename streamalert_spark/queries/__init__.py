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


# Queries whose implementation or oracle changed THIS round and should
# be re-verified externally even though their last driver row is recent.
# The rest of the verify-first ordering is DERIVED, not curated: the
# ledger (queries/ledger.py) scans the committed CORRECTNESS_r*.json
# driver records and sorts never-driver-green names first, these changed
# names second, then everything else oldest-green-first. Clear this list
# at the start of each round.
_CHANGED_THIS_ROUND = [
    # r11 planned to keep this list at exactly the two behavior-touching
    # ADVICE fixes so the ledger's oldest-green-first order could drain
    # the full 48-query r6 cohort (48 + 2 = the driver's 50 slots).
    "replica_antientropy_buckets",  # r11: digest = exact wide sum mod 2^62
    "cuped_ab_adjusted_lift",       # r11: adjustment widened to DEC38/HUGEINT
    # Late-round addition, deliberately accepted at the cost of ONE r6
    # name slipping to r12: the full-registry sf1 parity sweep caught
    # (r * 1000000) overflowing int32 once a source holds >2148 docs —
    # a crash under ANSI Spark at scale. Rank now BIGINT; values
    # identical everywhere the old expression survived.
    "score_quantile_normalize",     # r11: ppm rank arithmetic in BIGINT
]


def load_all() -> dict[str, RegisteredQuery]:
    """Import every query module (side-effect: registration) and return the
    registry, ordered by re-verification urgency (see queries/ledger.py:
    never-driver-green first, then _CHANGED_THIS_ROUND, then oldest
    driver-green round ascending)."""
    from streamalert_spark.queries import (  # noqa: F401
        analytics_ext,
        analytics_sketch,
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
        sql_tpch_ext,
        surface_ext,
        training_ext,
        warehouse_ext,
    )

    from pathlib import Path

    from streamalert_spark.queries.ledger import load_ledger, verify_order

    repo_root = Path(__file__).resolve().parents[2]
    ledger = load_ledger(repo_root)
    order = verify_order(list(QUERIES), ledger, _CHANGED_THIS_ROUND)
    return {n: QUERIES[n] for n in order}
