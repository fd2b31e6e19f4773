"""Sampler-rotation ledger — derive the verify-first prefix from the
driver's own correctness records instead of a hand-curated name list.

The external driver hash-checks the FIRST 50 names of the registry each
round and records the outcome in ``CORRECTNESS_r{N}.json`` at the repo
root. With a 200+-query registry and a 50-slot sample, a full refresh
takes 5 rounds, so *which* names lead the registry decides how stale the
external evidence for each query is allowed to get. Through round 9 that
ordering lived in a hand-maintained comment block (the r9 verdict called
the bookkeeping "the error surface"); this module replaces it:

- :func:`load_ledger` scans the committed ``CORRECTNESS_r*.json`` records
  and maps each query name to the newest round whose driver row was green
  (``hash_match`` for oracle-paired queries; the driver's weaker
  ``no_oracle`` rows-only row for oracle-less ones).
- :func:`verify_order` turns the ledger into the registry order:
  never-driver-green names first (new queries and any query whose last
  sample errored), then queries whose implementation or oracle changed
  this round (declared in ``_CHANGED_THIS_ROUND`` next to the registry),
  then everything else oldest-green-first. Ties break by registration
  order, so the ordering is deterministic for a given set of records.

Only membership in the first 50 slots matters to the driver; the bucket
order just makes the policy legible. The in-repo DuckDB parity sweep
(``tests/test_oracle_parity.py``) still covers every query every run —
this ledger only decides which names the external oracle re-checks
soonest.
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterable, Sequence
from pathlib import Path

_RECORD_RE = re.compile(r"CORRECTNESS_r0*(\d+)\.json$")


def load_ledger(repo_root: Path) -> dict[str, int]:
    """Map query name -> newest round with a green driver row.

    Green means ``hash_match is True`` (full value parity) or an
    ``err == "no_oracle"`` row (the driver's weaker rows-only check for
    queries that declare no oracle). Rows that errored or mismatched do
    NOT advance the ledger, so a query whose last sample failed sorts as
    stale and gets re-sampled promptly.
    """
    ledger: dict[str, int] = {}
    for path in sorted(repo_root.glob("CORRECTNESS_r*.json")):
        m = _RECORD_RE.search(path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            record = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(record, dict):
            continue
        for name, row in record.items():
            if not isinstance(row, dict):
                continue
            green = row.get("hash_match") is True or row.get("err") == "no_oracle"
            if green and rnd > ledger.get(name, -1):
                ledger[name] = rnd
    return ledger


def verify_order(
    names: Sequence[str],
    ledger: dict[str, int],
    changed: Iterable[str] = (),
) -> list[str]:
    """Order registry ``names`` by re-verification urgency.

    Buckets: (0) never driver-green, (1) changed this round, (2) the
    rest by ascending last-green round. Registration order breaks ties
    inside every bucket. ``changed`` names unknown to the registry are
    ignored (a rename must update the declaration, and the pairing test
    in tests/test_ledger.py enforces that).

    Precedence note: a name that is BOTH never-driver-green and declared
    in ``changed`` sorts in bucket 0, not bucket 1 — never-green wins.
    That is deliberate: "no external evidence yet" is strictly more
    urgent than "evidence exists but predates this round's change", and
    both buckets land inside the 50-slot sample anyway whenever the
    declaration list is kept short.

    Fallback note: with an EMPTY ledger (no readable CORRECTNESS_r*.json
    under the scanned root — e.g. the package imported from installed
    site-packages rather than the repo checkout) every name lands in
    bucket 0 and the output degrades to pure registration order. That is
    deterministic but NOT the documented staleness policy; callers that
    need the policy must run from a checkout that carries the driver
    records.
    """
    pos = {n: i for i, n in enumerate(names)}
    changed_set = {n for n in changed if n in pos}

    def key(name: str) -> tuple[int, int, int]:
        if name not in ledger:
            return (0, 0, pos[name])
        if name in changed_set:
            return (1, 0, pos[name])
        return (2, ledger[name], pos[name])

    return sorted(names, key=key)
