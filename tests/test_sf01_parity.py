"""Rotating oracle parity at sf0.1 — 10x the external driver's gate scale
(r10 verdict item 3). The in-repo sweep runs every query at sf0.01; the
overflow-headroom arguments (DECIMAL(38,0)/HUGEINT power sums, fixed-point
folds) are otherwise static claims above that scale. This marker runs a
~20-query subset against DuckDB at sf0.1 each round: a FIXED core of the
queries whose arithmetic carries the widest intermediate products, plus a
window that ROTATES with the round number so successive rounds walk the
whole registry.

Opt-in (one per-round run, ~2-4 min): SPARK_GRAFT_SF01=1 pytest -m sf01
NOTES.md records which names rotated through each round.
"""

from __future__ import annotations

import os

import pytest

from streamalert_spark.queries.ledger import _RECORD_RE
from tests.conftest import TABLES
from tests.test_oracle_parity import _duck_rows, _load_registry, _normalize, _spark_rows

RUN = os.environ.get("SPARK_GRAFT_SF01") == "1"

pytestmark = [
    pytest.mark.sf01,
    pytest.mark.skipif(
        not RUN, reason="sf0.1 parity rotation; set SPARK_GRAFT_SF01=1"),
]

SF01_DIR = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")

# Queries whose intermediates grow fastest with data volume (power sums,
# fixed-point folds, digest sums, product-limit folds) — re-checked at
# sf0.1 EVERY round, not rotated.
CORE = [
    "interarrival_burstiness",
    "cuped_ab_adjusted_lift",
    "degree_assortativity",
    "km_survival_curve",
    "replica_antientropy_buckets",
    "twap_locf_per_user",
]

ROTATING_SLOTS = 14


def _current_round(repo_root: str) -> int:
    newest = 0
    for name in os.listdir(repo_root):
        m = _RECORD_RE.search(name)
        if m:
            newest = max(newest, int(m.group(1)))
    return newest + 1  # records lag the round in progress by one


def _selected_names() -> list[str]:
    registry = _load_registry()
    core = [n for n in CORE if n in registry and registry[n].oracle]
    pool = sorted(n for n, rq in registry.items()
                  if rq.oracle and n not in core)
    rnd = _current_round(os.path.dirname(os.path.dirname(__file__)))
    start = (rnd * ROTATING_SLOTS) % len(pool)
    window = [pool[(start + i) % len(pool)] for i in range(ROTATING_SLOTS)]
    return core + window


@pytest.fixture(scope="module")
def duck_sf01():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF01_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS "
                        f"SELECT * FROM read_parquet('{path}')")
    return con


@pytest.mark.parametrize("name", _selected_names() if RUN else [])
def test_query_matches_oracle_at_sf01(spark, duck_sf01, name):
    rq = _load_registry()[name]
    s_rows, s_cols = _spark_rows(rq.fn(spark, SF01_DIR))
    d_rows, d_cols = _duck_rows(duck_sf01, rq.oracle)
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}")
    assert _normalize(s_rows, s_cols) == _normalize(d_rows, d_cols), (
        f"{name}: value mismatch at sf0.1")
