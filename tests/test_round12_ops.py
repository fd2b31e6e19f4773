"""Round-12 pins for the staged banded-hyperplane LSH near-dup path —
the linear-scale replacement shape for the fixed-bucket embedding
near-dup variants after the third measured decade caught
semantic_cell_neardup's quadratic term (10.5 s at sf1, unfinished after
30+ min at sf10: within-cell pairs grow n²/8 and the join parallelism is
capped at the 8 cell keys)."""

from __future__ import annotations

import pytest

from streamalert_spark.ops.similarity import (
    _half_up6,
    _pydot,
    _pynorm,
    banded_hyperplane_pairs,
    derive_rows_per_band,
)
from streamalert_spark.queries.analytics_ext import _hyperplanes
from streamalert_spark.session import read_table

from tests.conftest import heavy

_BANDS = 4
_ROWS = 4
_THRESHOLD = 0.30


def _python_reference(rows, planes, bands, rows_per_band, threshold):
    """Independent witness: band keys, candidates, exact cosine — all in
    plain Python over the collected fixture."""
    nbits = bands * rows_per_band
    sigs = {}
    for vid, vec in rows:
        bits = ["1" if _pydot(vec, planes[i]) >= 0 else "0"
                for i in range(nbits)]
        sigs[vid] = ["%d:%s" % (b, "".join(
            bits[b * rows_per_band:(b + 1) * rows_per_band]))
            for b in range(bands)]
    vecs = dict(rows)
    ids = sorted(vecs)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if not set(sigs[a]) & set(sigs[b]):
                continue
            score = _half_up6(
                _pydot(vecs[a], vecs[b]) / (_pynorm(vecs[a]) * _pynorm(vecs[b])))
            if score >= threshold:
                out[(a, b)] = score
    return out


@pytest.fixture(scope="module")
def fixture_rows(spark):
    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    return [(int(r["vec_id"]), [float(v) for v in r["embedding"]])
            for r in emb.select("vec_id", "embedding").collect()]


def test_banded_pairs_match_python_witness(spark, fixture_rows):
    planes = _hyperplanes(num_planes=_BANDS * _ROWS)
    want = _python_reference(fixture_rows, planes, _BANDS, _ROWS, _THRESHOLD)
    assert want, "fixture must produce at least one banded near-dup pair"

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    got = {(int(r["a"]), int(r["b"])): float(r["score"])
           for r in banded_hyperplane_pairs(
               emb, planes, bands=_BANDS, rows_per_band=_ROWS,
               threshold=_THRESHOLD).collect()}
    assert got == want


@heavy
def test_banded_pairs_partition_invariant(spark, fixture_rows):
    planes = _hyperplanes(num_planes=_BANDS * _ROWS)
    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = sorted(tuple(r) for r in banded_hyperplane_pairs(
        emb, planes, bands=_BANDS, rows_per_band=_ROWS,
        threshold=_THRESHOLD).collect())
    for parts in (3, 17):
        again = sorted(tuple(r) for r in banded_hyperplane_pairs(
            emb.repartition(parts), planes, bands=_BANDS,
            rows_per_band=_ROWS, threshold=_THRESHOLD).collect())
        assert again == base


def test_sizing_rule_holds_bucket_size_constant():
    """r = max(floor, ceil(log2(n/target))) keeps expected bucket size
    n/2^r inside [target/2, target] once n clears the floor regime."""
    assert derive_rows_per_band(200) == 4
    assert derive_rows_per_band(1_000) == 4
    for n in (10_000, 1_000_000, 100_000_000, 10_000_000_000):
        r = derive_rows_per_band(n)
        assert n / 2 ** r <= 1_000, (n, r)
        assert n / 2 ** r > 500 or r == 4, (n, r)
    # each decade adds ~3.3 bits — the knob grows with log(n), never n
    assert derive_rows_per_band(10_000_000_000) - derive_rows_per_band(
        1_000_000) <= 14
