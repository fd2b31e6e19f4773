"""File-based golden events (the reference keeps these JSON files next to
each rule — streamalert_cli/test/event.py format, loaded verbatim)."""

from __future__ import annotations

from pathlib import Path

import pytest

from streamalert_spark.testing import load_golden_events, run_golden_event
from tests.test_streaming import _guardduty_pipeline

EVENTS = load_golden_events(Path(__file__).parent / "golden")


def test_fixture_files_found():
    assert len(EVENTS) >= 4


@pytest.mark.parametrize(
    "event", EVENTS, ids=[e.get("description", "?") for e in EVENTS])
def test_golden_file(spark, event):
    res = run_golden_event(spark, _guardduty_pipeline(), event)
    assert res.passed, res.failures
