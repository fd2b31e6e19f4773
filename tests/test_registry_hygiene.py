"""Registry hygiene (r10 verdict item 6): a typo'd registration must not
be able to silently drop a query from the driver sample.

Two failure modes are pinned:
- a query module that defines ``@query`` entries but is missing from
  ``load_all()``'s import list would register its names only when someone
  happens to import it — the driver, which calls ``load_all()``, would
  never see them;
- an oracle whose SQL DuckDB cannot parse would surface only when the
  driver runs it (as a red CORRECTNESS row), one round too late. A cheap
  ``EXPLAIN`` catches it at pytest time without executing anything.
"""

from __future__ import annotations

import importlib
import pkgutil
from pathlib import Path

import pytest

import streamalert_spark.queries as qpkg
from streamalert_spark.queries import QUERIES, load_all


def test_every_query_module_is_reachable_from_load_all():
    """Importing EVERY module in the queries package must not register a
    single name beyond what load_all() already surfaced — i.e. load_all's
    hand-maintained import list covers every module that calls @query."""
    before = set(load_all())
    pkg_dir = Path(qpkg.__file__).parent
    for info in pkgutil.iter_modules([str(pkg_dir)]):
        importlib.import_module(f"{qpkg.__name__}.{info.name}")
    after = set(QUERIES)
    orphaned = after - before
    assert not orphaned, (
        f"queries registered by modules missing from load_all()'s import "
        f"list (the driver would never sample them): {sorted(orphaned)}")
    assert before == after


def test_load_all_is_a_permutation_of_the_raw_registry():
    ordered = load_all()
    assert set(ordered) == set(QUERIES)
    assert len(ordered) == len(QUERIES)


_REGISTRY = load_all()


@pytest.mark.parametrize(
    "name", sorted(n for n, rq in _REGISTRY.items() if rq.oracle))
def test_oracle_parses_in_duckdb(duck, name):
    """EXPLAIN (parse + bind only, no execution) against the sf0.01 views;
    a syntax error or a reference to a missing table/column fails here
    instead of in the external driver's correctness run."""
    duck.execute(f"EXPLAIN {_REGISTRY[name].oracle}")
