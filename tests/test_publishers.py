"""Generic publisher library (publishers/community/generic.py parity)."""

from __future__ import annotations

from streamalert_spark.alerts.publishers import (
    PUBLISHERS,
    add_record,
    blank,
    enumerate_fields,
    populate_fields,
    remove_fields,
    remove_internal_fields,
    remove_streamalert_normalization,
)


def test_registry_has_generic_library():
    # the eight generic.py transforms; layout publishers (slack/pagerduty)
    # register on import and may also be present
    assert set(PUBLISHERS) >= {
        "add_record", "blank", "remove_internal_fields", "remove_fields",
        "remove_streamalert_normalization", "enumerate_fields",
        "populate_fields", "stringify_arrays",
    }


def test_add_record_and_blank():
    alert = {"record": {"a": 1}}
    assert add_record(alert, {})["record"] == {"a": 1}
    assert blank(alert, {"x": 1}) == {}


def test_remove_internal_fields():
    pub = {"staged": True, "publishers": {}, "outputs": ["slack:x"], "keep": 1}
    assert remove_internal_fields(None, pub) == {"keep": 1}


def test_remove_fields_regex_deep():
    """generic.py:84-105 — regexp keys removed at any depth, whole branch."""
    alert = {"context": {"remove_fields": ["^secret", "^tmp$"]}}
    pub = {
        "secret_token": "x",
        "nested": {"tmp": {"deep": 1}, "keep": [{"secret2": 2, "ok": 3}]},
    }
    out = remove_fields(alert, pub)
    assert out == {"nested": {"keep": [{"ok": 3}]}}


def test_remove_streamalert_normalization_nested():
    pub = {"a": {"streamalert_normalization": {"ip": []}, "b": 1}}
    assert remove_streamalert_normalization(None, pub) == {"a": {"b": 1}}


def test_enumerate_fields_flattens_sorted():
    """generic.py:114-168 — dotted + indexed keys, alphabetical order."""
    pub = {
        "top1": {"mid1": "low", "mid2": ["low1", "low2"], "mid3": {"low1": "verylow"}},
        "top2": "mid",
    }
    out = enumerate_fields(None, pub)
    assert list(out) == sorted(out)
    assert out["top1.mid1"] == "low"
    assert out["top1.mid2[0]"] == "low1"
    assert out["top1.mid2[1]"] == "low2"
    assert out["top1.mid3.low1"] == "verylow"
    assert out["top2"] == "mid"


def test_populate_fields_cardinality():
    """generic.py:171-221 — 0 hits None, 1 hit scalar, many hits list."""
    alert = {"context": {"populate_fields": ["user", "missing", "id"]}}
    pub = {
        "a": {"user": "alice", "id": 1},
        "b": [{"user": "bob"}, {"id": 2}],
    }
    out = populate_fields(alert, pub)
    assert sorted(out["user"]) == ["alice", "bob"]
    assert out["missing"] is None
    assert sorted(out["id"]) == [1, 2]
    assert set(out) == {"user", "missing", "id"}


def test_composes_with_dispatcher_pipeline():
    from streamalert_spark.streaming.sinks import compose_publishers

    alert = {"record": {"x": 1}, "outputs": ["slack:sec"],
             "context": {"populate_fields": ["x"]}}
    pub = compose_publishers(
        [add_record, remove_internal_fields, populate_fields], alert)
    assert pub == {"x": 1}


def test_demisto_classification_context_wins():
    from streamalert_spark.alerts.publishers import PUBLISHERS

    pub = PUBLISHERS["demisto_classification"]
    alert = {"context": {"demisto": {"incident_type": "X", "playbook": "Y"}}}
    out = pub(alert, {})
    assert out == {"@demisto.incident_type": "X", "@demisto.playbook": "Y"}


def test_demisto_classification_global_classifiers():
    from streamalert_spark.alerts import publishers as P

    def classify(alert):
        if "sample" in alert.get("rule_name", ""):
            return {"incident_type": "Sample Alert"}
        return False

    P.DEMISTO_GLOBAL_CLASSIFIERS.append(classify)
    try:
        hit = P.PUBLISHERS["demisto_classification"](
            {"rule_name": "sample_rule", "context": {}}, {})
        miss = P.PUBLISHERS["demisto_classification"](
            {"rule_name": "other", "context": {}}, {"k": 1})
    finally:
        P.DEMISTO_GLOBAL_CLASSIFIERS.remove(classify)
    assert hit == {"@demisto.incident_type": "Sample Alert"}
    assert miss == {"k": 1}
