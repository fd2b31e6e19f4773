"""Model-based fidelity tests: a seeded random corpus runs through the
Spark classifier ONCE per family, and every record's outcome is compared
against a pure-Python model implementing the reference's loop semantics
verbatim (parsers.py). One Spark job per test keeps this fast while
covering hundreds of adversarial payloads."""

from __future__ import annotations

import json
import random

from pyspark.sql import functions as F

from streamalert_spark.classify.classifier import Classifier
from streamalert_spark.schema.registry import LogSchema, SchemaRegistry


def _classify_values(spark, schema: LogSchema, payloads: list[str]):
    reg = SchemaRegistry()
    reg.register(schema)
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "idx long, value string")
    batch = Classifier(reg).classify(df, raw_col="value", keep_cols=["idx"])
    return {r["idx"]: r["record"].asDict() for r in batch.by_log_type[schema.name].collect()}


# ------------------------------------------------------------------ KV model

def _kv_model(data: str, schema_keys: list[str], delim: str = " ", sep: str = "="):
    """The reference KV loop (parsers.py:775-812), verbatim semantics."""
    kv_payload: dict = {}
    fields = [f for f in data.split(delim) if f]
    if len(fields) != len(schema_keys):
        return None
    for index, fld in enumerate(fields):
        if sep not in fld:
            continue
        key, value = fld.split(sep, 1)
        if key in kv_payload:
            kv_payload[schema_keys[index]] = value
        else:
            kv_payload[key] = value
    # strict key check (parsers.py:244-272, no optionals here)
    if set(kv_payload) != set(schema_keys):
        return None
    return kv_payload


def test_kv_random_corpus_matches_reference_model(spark):
    rng = random.Random(20240813)
    keys = ["alpha", "beta", "gamma"]
    tokens = keys + ["alpha", "zzz", "beta"]
    payloads = []
    for _ in range(300):
        nf = rng.randint(1, 5)
        parts = []
        for _ in range(nf):
            k = rng.choice(tokens)
            if rng.random() < 0.15:
                parts.append(k)  # no separator
            else:
                parts.append(f"{k}={rng.choice(['1', 'x', 'a=b', ''])}")
        if rng.random() < 0.1:
            parts.insert(rng.randint(0, len(parts)), "")  # blank field
        payloads.append(" ".join(parts))

    schema = LogSchema(
        name="m:kv",
        schema={k: "string" for k in keys},
        parser="kv",
    )
    got = _classify_values(spark, schema, payloads)
    for i, p in enumerate(payloads):
        want = _kv_model(p, keys)
        if want is None:
            assert i not in got, f"payload {p!r} should be invalid, got {got.get(i)}"
        else:
            assert i in got, f"payload {p!r} should be valid (model: {want})"
            assert got[i] == want, f"payload {p!r}: {got[i]} != {want}"


# ------------------------------------------------------------- keyset model

def test_json_keyset_random_corpus_matches_reference_model(spark):
    """Strict key-set equality modulo optionals (parsers.py:244-272) +
    optional backfill defaults (parsers.py:138-171)."""
    rng = random.Random(99)
    required = {"a", "b"}
    optional = {"o1", "o2"}
    pool = list(required | optional | {"x", "y"})
    payloads = []
    for _ in range(300):
        ks = rng.sample(pool, rng.randint(0, len(pool)))
        payloads.append(json.dumps({k: "v" for k in ks}))

    schema = LogSchema(
        name="m:json",
        schema={"a": "string", "b": "string", "o1": "string", "o2": "string"},
        configuration={"optional_top_level_keys": ["o1", "o2"]},
    )
    got = _classify_values(spark, schema, payloads)
    for i, p in enumerate(payloads):
        ks = set(json.loads(p))
        valid = required <= ks <= (required | optional)
        if not valid:
            assert i not in got, f"keys {sorted(ks)} should be invalid"
        else:
            assert i in got, f"keys {sorted(ks)} should be valid"
            rec = got[i]
            for o in optional - ks:
                assert rec[o] == "", f"optional {o} not backfilled: {rec}"


# ---------------------------------------------------------- coercion model

def test_coercion_random_corpus_matches_reference_model(spark):
    """integer/float/boolean coercion semantics (parsers.py:294-369):
    int() parse failure invalidates; falsy raw values are skipped;
    boolean is str(value).lower() == 'true'."""
    rng = random.Random(7)
    int_vals = ["1", "-3", "1.5", "abc", "", "007", "9" * 18]
    bool_vals = ["true", "True", "TRUE", "false", "yes", "1", ""]
    payloads = []
    for _ in range(200):
        payloads.append(json.dumps({
            "n": rng.choice(int_vals),
            "flag": rng.choice(bool_vals),
        }))

    schema = LogSchema(name="m:co", schema={"n": "integer", "flag": "boolean"})
    got = _classify_values(spark, schema, payloads)
    for i, p in enumerate(payloads):
        d = json.loads(p)
        raw_n = d["n"]
        if raw_n:  # falsy values skip conversion (parsers.py:321-323)
            try:
                want_n = int(raw_n)
            except ValueError:
                assert i not in got, f"{raw_n!r} should invalidate"
                continue
        else:
            want_n = None
        assert i in got, f"payload {p!r} should be valid"
        rec = got[i]
        assert rec["n"] == want_n, f"{raw_n!r}: {rec['n']} != {want_n}"
        assert rec["flag"] == (str(d["flag"]).lower() == "true")
