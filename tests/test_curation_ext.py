"""Unit + plan tests for the URL/length/quality curation operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamalert_spark.ops import curation
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_url_host_and_registrable_domain(spark):
    rows = spark.createDataFrame(
        [
            ("https://w3.src5-cdn.example:8443/p/42/en",),
            ("http://user:pw@Mail.Example.CO.UK/x",),
            ("https://localhost/",),
            ("https://a.b.c.d.example.com/deep/1/2/3?q=1#f",),
        ],
        ["url"],
    ).select(
        "url",
        curation.url_host(F.col("url")).alias("host"),
        curation.registrable_domain(curation.url_host(F.col("url"))).alias("dom"),
        curation.url_path_depth(F.col("url")).alias("depth"),
    )
    got = {r["url"]: (r["host"], r["dom"], r["depth"]) for r in rows.collect()}
    assert got["https://w3.src5-cdn.example:8443/p/42/en"] == \
        ("w3.src5-cdn.example", "src5-cdn.example", 3)
    # userinfo stripped, lowercased, co.uk takes three labels
    assert got["http://user:pw@Mail.Example.CO.UK/x"] == \
        ("mail.example.co.uk", "example.co.uk", 1)
    assert got["https://localhost/"] == ("localhost", "localhost", 0)
    # query/fragment excluded from path depth
    assert got["https://a.b.c.d.example.com/deep/1/2/3?q=1#f"][2] == 4


def test_domain_blocklist_filter_is_broadcast_anti_join(spark):
    docs = spark.createDataFrame(
        [(1, "https://x.bad.example/p"), (2, "https://x.good.example/p")],
        ["doc_id", "url"])
    blocked = spark.createDataFrame([("bad.example",)], ["domain"])
    kept = curation.domain_blocklist_filter(docs, blocked)
    assert [r["doc_id"] for r in kept.collect()] == [2]
    plan = _plan(kept)
    assert "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_length_histogram_bins_and_shares(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (2,), (7,), (8,), (0,)], ["n_chars"])
    rows = {r["len_bin"]: (r["bin_lo"], r["n_docs"], r["share"])
            for r in curation.length_histogram(df).collect()}
    # 0 clamps to 1; bin k covers [2^(k-1), 2^k)
    assert rows[1] == (1, 3, round(3 / 6, 6))
    assert rows[2] == (2, 1, round(1 / 6, 6))
    assert rows[3] == (4, 1, round(1 / 6, 6))
    assert rows[4] == (8, 1, round(1 / 6, 6))


def test_quality_buckets_thirds_and_broadcast(spark):
    # 9 docs, scores 0..8 with width 1 -> bins 0..8, one doc each:
    # cumulative thirds split exactly 3/3/3
    scored = spark.createDataFrame(
        [(i, float(i) + 0.5) for i in range(9)], ["doc_id", "score"])
    out = curation.quality_buckets(scored, "score", bin_width=1.0)
    got = {r["doc_id"]: r["bucket"] for r in out.collect()}
    assert [got[i] for i in range(9)] == \
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    plan = _plan(out)
    assert "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_quality_bucket_query_no_corpus_sort(spark):
    """The corpus is never range-partitioned: the only sort lives on the
    single-partition metadata-scale bin table."""
    from streamalert_spark.queries import load_all

    df = load_all()["quality_bucket_filter"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "rangepartitioning" not in plan.lower(), plan


def test_url_filter_query_matches_oracle(spark, duck):
    from streamalert_spark.queries import load_all

    q = load_all()["url_domain_filter"]
    srows = sorted(tuple(r) for r in q.fn(spark, SF_DIR).collect())
    # conftest's duck fixture registers sf0.01 views; rebuild at SF_DIR
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/documents.parquet')")
    drows = sorted(tuple(r) for r in con.execute(q.oracle).fetchall())
    assert srows == drows


def test_chunk_context_windows_edges(spark):
    from streamalert_spark.ops import text as text_ops

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x"), (3, "")], ["doc_id", "text"])
    out = text_ops.chunk_context_windows(df, window=3, stride=2)
    rows = {(r["doc_id"], r["chunk_id"]):
            (r["chunk_start"], r["n_chunk_tokens"], r["chunk_text"])
            for r in out.collect()}
    # doc 1: 5 tokens, starts 0/2/4 with the last window clipped
    assert rows[(1, 0)] == (0, 3, "a b c")
    assert rows[(1, 1)] == (2, 3, "c d e")
    assert rows[(1, 2)] == (4, 1, "e")
    # single-token and empty docs yield exactly one chunk
    assert rows[(2, 0)] == (0, 1, "x")
    assert rows[(3, 0)] == (0, 1, "")
    assert len(rows) == 5


def test_weighted_sample_matches_python_reference(spark):
    """The weighted-sample keys must equal the pure-Python max-of-w-md5
    computation, and heavier weights must win materially more slots than
    uniform (the E-S property: P(win) increases with weight)."""
    import hashlib

    from streamalert_spark.queries.curation_ext import weighted_sample_docs  # noqa: F401
    from streamalert_spark.session import read_table

    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    py = {}
    for d in ids:
        w = 1 + d % 5
        py[d] = max(hashlib.md5(f"ws:{d}:{j}".encode()).hexdigest()  # noqa: S324
                    for j in range(1, w + 1))
    want = sorted(py, key=lambda d: (py[d], -d), reverse=True)[:50]

    from streamalert_spark.queries import QUERIES

    got = [r["doc_id"] for r in
           QUERIES["weighted_sample_docs"].fn(spark, "/root/testdata/sf0.01").collect()]
    assert got == want
    # heavier docs (weight>=4) hold a disproportionate share of the top-50
    heavy_share = sum(1 for d in got if 1 + d % 5 >= 4) / 50
    heavy_pop = sum(1 for d in ids if 1 + d % 5 >= 4) / len(ids)
    assert heavy_share > heavy_pop

def test_weighted_sample_weight_cap_guard(spark):
    """The op's scale contract: a weight beyond MAX_SAMPLE_WEIGHT fails
    fast at execution (distributed raise_error, no driver pass) instead of
    silently exploding the scan by the weight; in-range weights work."""
    import pytest

    from streamalert_spark.ops.sampling import (
        MAX_SAMPLE_WEIGHT, weighted_sample_keys,
    )

    ok = spark.createDataFrame([(1, 3), (2, MAX_SAMPLE_WEIGHT)], "id int, w int")
    rows = weighted_sample_keys(ok, "id", "w").collect()
    assert len(rows) == 2 and all(len(r["draw"]) == 32 for r in rows)

    bad = spark.createDataFrame([(1, MAX_SAMPLE_WEIGHT + 1)], "id int, w int")
    with pytest.raises(Exception, match="weight out of"):
        weighted_sample_keys(bad, "id", "w").collect()
    zero = spark.createDataFrame([(1, 0)], "id int, w int")
    with pytest.raises(Exception, match="weight out of"):
        weighted_sample_keys(zero, "id", "w").collect()
