"""The sampler-rotation ledger (queries/ledger.py) replaced the
hand-curated _VERIFY_FIRST comment block (r9 verdict item 3). These
tests pin the policy: never-driver-green first, changed-this-round
second, then oldest-green ascending — and that load_all() actually
surfaces the registry in that order, so the external driver's 50-slot
prefix sample always drains the stalest evidence first."""

from __future__ import annotations

import json
from pathlib import Path

from streamalert_spark.queries import _CHANGED_THIS_ROUND, QUERIES, load_all
from streamalert_spark.queries.ledger import load_ledger, verify_order

REPO = Path(__file__).resolve().parent.parent

DRIVER_SAMPLE_SLOTS = 50


def test_load_ledger_parses_green_rows_only(tmp_path):
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({
        "a": {"hash_match": True, "err": None},
        "b": {"hash_match": False, "err": None},
        "c": {"hash_match": None, "err": "no_oracle"},
        "d": {"hash_match": None, "err": "Traceback: boom"},
    }))
    (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps({
        "b": {"hash_match": True, "err": None},
    }))
    ledger = load_ledger(tmp_path)
    # hash-green advances; rows-only no_oracle counts as the weaker green;
    # errors and mismatches do not advance.
    assert ledger == {"a": 3, "b": 5, "c": 3}


def test_load_ledger_keeps_newest_green_round(tmp_path):
    for rnd in (2, 7, 4):
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
            json.dumps({"q": {"hash_match": True, "err": None}}))
    assert load_ledger(tmp_path) == {"q": 7}


def test_load_ledger_survives_garbage_records(tmp_path):
    (tmp_path / "CORRECTNESS_r02.json").write_text("not json {")
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps(["a", "list"]))
    (tmp_path / "CORRECTNESS_r04.json").write_text(
        json.dumps({"q": {"hash_match": True}, "junk": "not-a-dict"}))
    assert load_ledger(tmp_path) == {"q": 4}


def test_verify_order_buckets_and_tiebreaks():
    names = ["reg0", "reg1", "reg2", "reg3", "reg4", "reg5"]
    ledger = {"reg0": 9, "reg2": 5, "reg3": 7, "reg5": 5}
    order = verify_order(names, ledger, changed=["reg3", "ghost-renamed"])
    # never-green (registration order), changed, then oldest-green with
    # registration tie-break; unknown changed names are ignored.
    assert order == ["reg1", "reg4", "reg3", "reg2", "reg5", "reg0"]


def test_changed_declaration_names_exist_in_registry():
    registry = load_all()
    missing = [n for n in _CHANGED_THIS_ROUND if n not in registry]
    assert not missing, (
        f"_CHANGED_THIS_ROUND names absent from the registry (rename must "
        f"update the declaration): {missing}")


def test_load_all_order_is_the_ledger_policy():
    """The comment block is gone; the registry order IS the policy output.
    Recompute the expectation from the raw records and registration order
    and demand exact agreement."""
    registry = load_all()
    ledger = load_ledger(REPO)
    expected = verify_order(list(QUERIES), ledger, _CHANGED_THIS_ROUND)
    assert list(registry) == expected


def test_driver_prefix_drains_the_stalest_queries():
    """Membership property the policy exists for: no query outside the
    first 50 slots may have an older (or absent) driver-green round than
    a non-changed query inside them — modulo the changed-this-round
    promotions, which are bounded by the same 50 slots."""
    registry = load_all()
    names = list(registry)
    ledger = load_ledger(REPO)
    assert len(_CHANGED_THIS_ROUND) < DRIVER_SAMPLE_SLOTS
    head, tail = names[:DRIVER_SAMPLE_SLOTS], names[DRIVER_SAMPLE_SLOTS:]
    for n in _CHANGED_THIS_ROUND:
        assert n in head, f"changed query {n} fell out of the driver sample"
    worst_head = max(
        ledger.get(n, -1) for n in head if n not in _CHANGED_THIS_ROUND)
    best_tail = min(ledger.get(n, -1) for n in tail) if tail else worst_head
    assert worst_head <= best_tail, (
        f"a query with driver-green round {best_tail} sits outside the "
        f"sample while round-{worst_head} evidence sits inside it")
