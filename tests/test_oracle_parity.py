"""Local mirror of the driver's correctness gate: run registered Spark
queries AND their DuckDB oracles at sf0.01, compare row counts and values
(columns sorted by name, rows sorted, exact equality).

The DEFAULT run covers a deterministic rotating cohort of ~1/6 of the
registry (plus every ``_CHANGED_THIS_ROUND`` name) so that ``pytest
tests/`` finishes inside the external driver's verify window; the cohort
is keyed on the newest committed ``CORRECTNESS_r*.json`` round number,
so successive rounds cover the whole registry. Set
``SPARK_GRAFT_HEAVY=1`` (or ``SPARK_GRAFT_FULL_PARITY=1``) for the full
242-query sweep (the builder's own per-round gate before committing
query changes)."""

from __future__ import annotations

import math
import os

import pytest

from tests.conftest import ORACLE_SF_DIR, rotating_cohort

FULL = (os.environ.get("SPARK_GRAFT_FULL_PARITY") == "1"
        or os.environ.get("SPARK_GRAFT_HEAVY") == "1")


def _load_registry():
    from streamalert_spark.queries import load_all

    return load_all()


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def _spark_rows(df):
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return rows, cols


def _duck_rows(duck, sql):
    res = duck.execute(sql)
    cols = [d[0] for d in res.description]
    return res.fetchall(), cols


_ALL_NAMES = sorted(_load_registry().keys())

if FULL:
    NAMES = _ALL_NAMES
else:
    from streamalert_spark.queries import _CHANGED_THIS_ROUND

    # ~242/6 = 40 queries per default run; full coverage every 6 rounds,
    # plus every body that changed this round regardless of cohort.
    NAMES = sorted(
        set(rotating_cohort(_ALL_NAMES, 6))
        | (set(_CHANGED_THIS_ROUND) & set(_ALL_NAMES))
    )


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    rq = _load_registry()[name]
    if rq.oracle is None:
        df = rq.fn(spark, ORACLE_SF_DIR)
        assert df.count() >= 0
        return
    s_rows, s_cols = _spark_rows(rq.fn(spark, ORACLE_SF_DIR))
    d_rows, d_cols = _duck_rows(duck, rq.oracle)
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    sn = _normalize(s_rows, s_cols)
    dn = _normalize(d_rows, d_cols)
    for i, (a, b) in enumerate(zip(sn, dn)):
        for va, vb in zip(a, b):
            if isinstance(va, float) and isinstance(vb, float):
                assert math.isclose(va, vb, rel_tol=0, abs_tol=0) or va == vb, (
                    f"{name} row {i}: {a} != {b}"
                )
            else:
                assert va == vb, f"{name} row {i}: {a} != {b}"
