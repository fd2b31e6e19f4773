"""Local mirror of the driver's correctness gate: run every registered
Spark query AND its DuckDB oracle at sf0.01, compare row counts and values
(columns sorted by name, rows sorted, exact equality)."""

from __future__ import annotations

import math

import pytest

from tests.conftest import ORACLE_SF_DIR


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


NAMES = sorted(_load_registry().keys())


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
