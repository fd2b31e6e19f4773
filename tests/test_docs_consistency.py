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


def test_readme_rows_only_list_matches_registry():
    """README enumerates EXACTLY the oracle-less queries (each with its
    documented ceiling); a query gaining or losing an oracle must update
    the README paragraph."""
    from streamalert_spark.queries import load_all

    registry = load_all()
    rows_only = {n for n, rq in registry.items() if rq.oracle is None}
    readme = (REPO / "README.md").read_text()
    para = readme.split("rows-only by design")[1].split("\n\n")[0]
    documented = {n for n in registry if f"`{n}`" in para}
    assert documented == rows_only, (
        f"README rows-only paragraph drift: documented={sorted(documented)} "
        f"registry={sorted(rows_only)}")


def test_notes_md_carries_current_round_counts():
    """NOTES.md must state the CURRENT registry size somewhere — stale
    round docs mislead the next round's reader."""
    from streamalert_spark.queries import load_all

    registry = load_all()
    n_total = len(registry)
    n_oracle = sum(1 for rq in registry.values() if rq.oracle is not None)
    notes = (REPO / "NOTES.md").read_text()
    assert f"{n_total}-query registry" in notes and f"{n_oracle} oracle" in notes, (
        f"NOTES.md counts stale: registry has {n_total}/{n_oracle}")


def test_scale_md_broadcast_claims_match_code():
    """SCALE.md must not describe a gated broadcast as unconditional:
    every enrichment join that rides ops.hints.gated_broadcast in code
    has to be documented as size-gated (r7 verdict found this drifted)."""
    scale = (REPO / "SCALE.md").read_text()
    assert "F.broadcast(ioc_df)" not in scale, (
        "SCALE.md still claims an explicit/unconditional IOC broadcast; "
        "enrich/threat_intel.py uses gated_broadcast")
    ti_section = scale.split("Threat-intel IOC")[1].split("- **")[0]
    assert "gated" in ti_section.lower()
    lookup_section = scale.split("Lookup tables")[1].split("- **")[0]
    assert "gated" in lookup_section.lower()


def _notes_title_round_accepted(title_round: int, newest_correctness: int) -> bool:
    """A NOTES title naming round T is current in BOTH lifecycle phases:
    while round T is being built (newest CORRECTNESS is T-1) and at the
    instant round T closes (the driver drops CORRECTNESS_rT, making the
    newest T). The r9 pin demanded exactly newest+1 and therefore turned
    red at every end-of-round artifact drop (r9 verdict, What's wrong #1)."""
    return title_round in (newest_correctness, newest_correctness + 1)


def test_notes_md_title_round_is_current():
    """NOTES.md's title must name the round being built (r8 verdict found
    it frozen at "round-6" while the body led with round-8 sections).
    Accept round N while newest CORRECTNESS is N-1 (mid-round) or N
    (the driver just closed round N)."""
    import re

    rounds = [
        int(re.search(r"_r0*(\d+)", p.name).group(1))
        for p in REPO.glob("CORRECTNESS_r*.json")
    ]
    newest = max(rounds)
    title = (REPO / "NOTES.md").read_text().splitlines()[0]
    m = re.search(r"round-(\d+)", title)
    assert m, f"NOTES.md title {title!r} carries no 'round-N' marker"
    title_round = int(m.group(1))
    assert _notes_title_round_accepted(title_round, newest), (
        f"NOTES.md title says round-{title_round}; newest CORRECTNESS is "
        f"r{newest}, so only round-{newest} or round-{newest + 1} is current")
    # Simulate the end-of-round artifact drop that broke the r9 pin: the
    # driver writing CORRECTNESS_r{title_round}.json must NOT invalidate
    # a title that was accepted mid-round.
    assert _notes_title_round_accepted(title_round, title_round - 1), (
        "title must be accepted mid-round (newest = title_round - 1)")
    assert _notes_title_round_accepted(title_round, title_round), (
        "title must stay accepted the moment the driver drops "
        "CORRECTNESS_r{title_round}.json (newest = title_round)")
