"""JMESPath-subset compiler: each supported shape vs hand-computed
expectations (the jmespath library itself is not in this container), and
loud ValueError on the unsupported grammar."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from streamalert_spark.parsers.jmespath_subset import apply_json_path, parse_path

DOC = {
    "items": [
        {"level": "error", "n": 1, "payload": {"id": "a"}},
        {"level": "info", "n": 2, "payload": {"id": "b"}},
        {"level": "error", "n": 3, "payload": {"id": "c"}},
        {"level": "error", "n": 4, "payload": {"id": "d"}},
    ],
    "meta": {"batch": [{"tag": "x"}, {"tag": "y"}]},
}


def _run(spark, path, doc=DOC):
    df = spark.createDataFrame([(json.dumps(doc),)], "raw string")
    df, col, temps = apply_json_path(df, "raw", path)
    return [r["out"] for r in df.select(col.alias("out")).collect()]


def _ids(rows):
    return [json.loads(r)["id"] for r in rows if r is not None]


def test_star_projection_and_field(spark):
    assert _ids(_run(spark, "items[*].payload")) == ["a", "b", "c", "d"]


def test_index_positive_negative_oob(spark):
    assert _ids(_run(spark, "items[0].payload")) == ["a"]
    assert _ids(_run(spark, "items[-1].payload")) == ["d"]
    # out of range -> null result (one row, no value): record goes invalid
    assert _run(spark, "items[9].payload") == [None]


def test_slice_variants(spark):
    assert _ids(_run(spark, "items[1:3].payload")) == ["b", "c"]
    assert _ids(_run(spark, "items[:2].payload")) == ["a", "b"]
    assert _ids(_run(spark, "items[-2:].payload")) == ["c", "d"]
    assert _run(spark, "items[3:1].payload") == []


def test_filter_string_eq(spark):
    assert _ids(_run(spark, "items[?level == 'error'].payload")) == ["a", "c", "d"]


def test_filter_numeric_ordering_and_conjunction(spark):
    assert _ids(_run(spark, "items[?n > 2].payload")) == ["c", "d"]
    assert _ids(
        _run(spark, "items[?level == 'error' && n <= 3].payload")) == ["a", "c"]


def test_filter_null_and_missing_field(spark):
    doc = {"items": [{"k": None, "payload": {"id": "p"}},
                     {"payload": {"id": "q"}},
                     {"k": 1, "payload": {"id": "r"}}]}
    # missing and explicit-null both compare == null (jmespath semantics)
    assert _ids(_run(spark, "items[?k == null].payload", doc)) == ["p", "q"]
    assert _ids(_run(spark, "items[?k != null].payload", doc)) == ["r"]


def test_filter_boolean_literal(spark):
    doc = {"items": [{"ok": True, "payload": {"id": "t"}},
                     {"ok": False, "payload": {"id": "f"}}]}
    assert _ids(_run(spark, "items[?ok == true].payload", doc)) == ["t"]


def test_chained_projections(spark):
    doc = {"batches": [
        {"rows": [{"payload": {"id": "1a"}}, {"payload": {"id": "1b"}}]},
        {"rows": [{"payload": {"id": "2a"}}]},
    ]}
    assert _ids(_run(spark, "batches[*].rows[*].payload", doc)) == \
        ["1a", "1b", "2a"]
    assert _ids(_run(spark, "batches[1:].rows[0].payload", doc)) == ["2a"]


def test_missing_array_yields_no_rows(spark):
    assert _run(spark, "nope[*].payload") == []
    assert _run(spark, "nope[?a == 'b']") == []


def test_unsupported_grammar_raises():
    for bad in ["items[]", "items[*] | [0]", "length(items)",
                "items[?level == `raw`]", "items[1:5:2]",
                "items[?level < 'x']"]:
        with pytest.raises(ValueError):
            parse_path(bad)


def test_classifier_end_to_end_filter_path(spark):
    """A schema whose json_path carries a filter projection classifies
    only the matching elements, through the real classifier."""
    from streamalert_spark.classify.classifier import Classifier
    from streamalert_spark.schema.registry import LogSchema, SchemaRegistry

    payload = json.dumps({"items": [
        {"level": "error", "payload": {"id": "e1", "msg": "boom"}},
        {"level": "info", "payload": {"id": "i1", "msg": "meh"}},
        {"level": "error", "payload": {"id": "e2", "msg": "bam"}},
    ]})
    df = spark.createDataFrame([(payload,)], "value string")
    reg = SchemaRegistry()
    reg.register(LogSchema(
        name="app:errors",
        schema={"id": "string", "msg": "string"},
        configuration={"json_path": "items[?level == 'error'].payload"},
    ))
    out = Classifier(reg).classify(df, raw_col="value")
    rows = sorted(
        (r["record"]["id"], r["record"]["msg"])
        for r in out.by_log_type["app:errors"].collect())
    assert rows == [("e1", "boom"), ("e2", "bam")]


def test_filter_literals_containing_operators(spark):
    """&& and ] inside a quoted literal are literal characters, not
    grammar — the tokenizer must respect quotes."""
    doc = {"items": [
        {"m": "a && b", "payload": {"id": "amp"}},
        {"m": "a]b", "payload": {"id": "br"}},
        {"m": "plain", "payload": {"id": "pl"}},
    ]}
    assert _ids(_run(spark, "items[?m == 'a && b'].payload", doc)) == ["amp"]
    assert _ids(_run(spark, "items[?m == 'a]b'].payload", doc)) == ["br"]
    assert _ids(
        _run(spark, "items[?m == 'a && b' && m != 'x'].payload", doc)) == ["amp"]


def test_filter_type_strict_no_text_coercion(spark):
    """Real jmespath is type-strict: '3' (string) never matches the
    numeric literal 3 and vice versa; booleans only match boolean
    literals; != is true on type mismatch AND on a missing field
    (null != x -> true)."""
    rows = [
        ('{"items": [{"n": 3, "id": "num3"}]}',),
        ('{"items": [{"n": "3", "id": "str3"}]}',),
        ('{"items": [{"n": 3.0, "id": "dec3"}]}',),
        ('{"items": [{"n": true, "id": "bool"}]}',),
        ('{"items": [{"id": "missing"}]}',),
    ]
    df = spark.createDataFrame(rows, "j string")

    def ids(path):
        d2, col, temps = apply_json_path(df, "j", path)
        return sorted(
            r[0] for r in d2.select(
                F.get_json_object(col, "$.id")).collect())

    # numeric equality: bigint 3 and decimal 3.0 match; string "3" no
    assert ids("items[?n == 3]") == ["dec3", "num3"]
    # numeric ordering: only real numbers participate
    assert ids("items[?n >= 3]") == ["dec3", "num3"]
    # string equality: only the string-typed field matches
    assert ids("items[?n == '3']") == ["str3"]
    # boolean literal: only the boolean-typed field matches
    assert ids("items[?n == true]") == ["bool"]
    # != on numeric literal: type mismatches and the missing field are
    # all "not equal" (jmespath null != 3 -> true)
    assert ids("items[?n != 3]") == ["bool", "missing", "str3"]
    # != on string literal symmetric
    assert ids("items[?n != '3']") == ["bool", "dec3", "missing", "num3"]
