"""Doc-drift guards: the coverage map must reference every registered
query, so a new operator can't land without its inventory row."""

from __future__ import annotations

from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_every_query_is_listed_in_coverage_map():
    from streamalert_spark.queries import load_all

    coverage = (REPO / "COVERAGE.md").read_text()
    missing = [name for name in load_all() if name not in coverage]
    assert not missing, f"queries absent from COVERAGE.md: {missing}"


def test_readme_query_count_is_current():
    from streamalert_spark.queries import load_all

    registry = load_all()
    n_total = len(registry)
    n_oracle = sum(1 for rq in registry.values() if rq.oracle is not None)
    readme = (REPO / "README.md").read_text()
    assert f"{n_total} queries, {n_oracle} of them checked" in readme, (
        f"README count stale: registry has {n_total}/{n_oracle}")
