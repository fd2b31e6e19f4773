"""Unit + plan-shape tests for the training-prep ops (packing, vocab,
mixture reweighting, BPE learning)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _pack(spark, rows, seq_len, n_shards=1):
    from streamalert_spark.ops.packing import pack_sequences

    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    return pack_sequences(df, seq_len=seq_len, n_shards=n_shards)


def test_pack_boundary_doc_starts_new_pack(spark):
    # three docs of 3 tokens each, seq_len 4: doc0 starts at 0 (pack 0),
    # doc1 starts at 3 (pack 0), doc2 starts at 6 (pack 1)
    rows = [(i, "s", "a b c") for i in range(3)]
    out = {r["pack_id"]: r.asDict() for r in _pack(spark, rows, 4).collect()}
    assert out[0]["n_docs"] == 2 and out[0]["total_tokens"] == 6
    assert out[1]["n_docs"] == 1 and out[1]["first_doc"] == 2


def test_pack_sharding_is_deterministic_partition(spark):
    rows = [(i, "s", "a b") for i in range(8)]
    out = _pack(spark, rows, 100, n_shards=4).collect()
    # 4 shards, each with docs {i, i+4}: one pack per shard
    assert len(out) == 4
    assert all(r["n_docs"] == 2 and r["total_tokens"] == 4 for r in out)
    assert sorted(r["shard"] for r in out) == [0, 1, 2, 3]


def test_pack_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        _pack(spark, [(0, "s", "a")], 0)


def test_pack_plan_has_no_global_sort(spark):
    rows = [(i, "s", "a b c") for i in range(10)]
    plan = _plan(_pack(spark, rows, 4, n_shards=4))
    assert "rangepartitioning" not in plan.lower(), plan


def test_mixture_reweight_uniform_target(spark):
    from streamalert_spark.queries import load_all

    out = load_all()["mixture_reweight"].fn(
        spark, "/root/testdata/sf0.001").collect()
    shares = [r["current_share"] for r in out]
    assert abs(sum(shares) - 1.0) < 1e-4
    for r in out:
        # weight * current_share == target_share (up to rounding)
        assert r["sample_weight"] > 0
        assert abs(r["sample_weight"] * r["current_share"]
                   - r["target_share"]) < 1e-3


def test_vocab_topk_is_take_ordered(spark):
    from streamalert_spark.queries import load_all

    df = load_all()["vocab_topk"].fn(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    rows = df.collect()
    # sf0.001's synthetic vocab is smaller than the top-k limit
    assert 0 < len(rows) <= 50
    freqs = [r["freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Pure-Python BPE (Sennrich-style), lexicographic tie-break."""
    vocab = {" ".join(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            parts = syms.split(" ")
            for i in range(len(parts) - 1):
                pairs[f"{parts[i]} {parts[i+1]}"] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], [-ord(ch) for ch in kv[0]]))
        # lexicographic ASC tie-break on pair at equal count
        best_count = best[1]
        cands = sorted(p for p, c in pairs.items() if c == best_count)
        pair = cands[0]
        if best_count < 2:
            break
        merges.append((pair, best_count))
        a, b = pair.split(" ")

        def merge_word(syms: str) -> str:
            parts = syms.split(" ")
            out, i = [], 0
            while i < len(parts):
                if i < len(parts) - 1 and parts[i] == a and parts[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            return " ".join(out)

        vocab = {merge_word(syms): c for syms, c in vocab.items()}
    return merges


def test_learn_bpe_matches_reference(spark):
    from streamalert_spark.ops.bpe import learn_bpe
    from streamalert_spark.session import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    word_counts: Counter = Counter()
    for r in docs.select("text").collect():
        for w in r["text"].split(" "):
            if w:
                word_counts[w] += 1
    expect = _reference_bpe(dict(word_counts), 8)
    got = learn_bpe(docs, 8)
    assert got == expect


def test_learn_bpe_stops_when_dry(spark):
    from streamalert_spark.ops.bpe import learn_bpe

    df = spark.createDataFrame([(0, "ab cd")], "doc_id bigint, text string")
    merges = learn_bpe(df, 10)
    # every pair occurs once (< 2): no merges learned
    assert merges == []


def test_integer_pagerank_matches_python_reference(spark):
    from streamalert_spark.ops.pagerank import START_MASS, integer_pagerank

    edges = [(0, 1), (1, 2), (2, 0), (2, 1), (3, 0)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["node"]: r["mass"]
           for r in integer_pagerank(df, iters=3).collect()}

    # pure-python mirror
    nodes = sorted({n for e in edges for n in e})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = START_MASS * 15 // 100
    mass = {n: START_MASS for n in nodes}
    for _ in range(3):
        incoming = {n: 0 for n in nodes}
        for s, d in edges:
            incoming[d] += mass[s] * 85 // (100 * deg[s])
        mass = {n: base + incoming[n] for n in nodes}
    assert got == mass
    # node 3 is a source-only node: teleport term only
    assert got[3] == base


def test_compression_signals_match_zlib(spark):
    """The zlib kernel's byte counts and ratio equal the Python zlib
    reference exactly (same library, level 6), including multi-byte
    UTF-8 and None text; and the op is a zero-Exchange scan projection."""
    import zlib

    from streamalert_spark.ops.text import compression_signals

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),      # degenerate
        (2, "héllo wörld — naïve façade é́"),        # multi-byte
        (3, ""),                                                # empty
        (4, None),                                              # null text
        (5, "x " * 500),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r.asDict() for r in compression_signals(df).collect()}
    for doc_id, text in rows:
        if text is None:
            assert got[doc_id]["raw_bytes"] is None
            assert got[doc_id]["compression_ratio"] is None
            continue
        b = text.encode("utf-8")
        assert got[doc_id]["raw_bytes"] == len(b)
        assert got[doc_id]["compressed_bytes"] == len(zlib.compress(b, 6))
        assert got[doc_id]["compression_ratio"] == pytest.approx(
            round(len(zlib.compress(b, 6)) / max(len(b), 1), 6))
    # degenerate repetition compresses far better than prose
    assert got[1]["compression_ratio"] < got[0]["compression_ratio"]
    assert "Exchange" not in _plan(compression_signals(df)), _plan(compression_signals(df))


def test_bpe_oracle_matches_spark_on_repeated_symbol_corpus(spark, tmp_path):
    """Regression for the sentinel-replace bug: a corpus whose hottest
    pair is an IDENTICAL-symbol pair occurring in runs >= 5 ('bbbbb' ->
    greedy 'bb bb b', a naive two-pass replace gives 'bb b bb'). The
    recursive-CTE oracle must track ops/bpe.py exactly on it."""
    import duckdb

    from streamalert_spark.ops.bpe import learn_bpe
    from streamalert_spark.queries.training_ext import _bpe_recursive_cte

    texts = ["bbbbb bbbbbb abab", "bbbbb cc abab", "bbbbbbb cc", "abab cc dd"]
    pdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")
    pq = str(tmp_path / "documents.parquet")
    pdf.toPandas().to_parquet(pq)

    merges = learn_bpe(pdf, n_merges=10)
    spark_rows = [(i, p, c) for i, (p, c) in enumerate(merges)]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')")
    sql = _bpe_recursive_cte() + """
SELECT CAST(it AS BIGINT) AS merge_idx, pair,
       CAST(pair_count AS BIGINT) AS pair_count
FROM (
  SELECT it, pair, SUM(wc) AS pair_count,
         ROW_NUMBER() OVER (PARTITION BY it
                            ORDER BY SUM(wc) DESC, pair) AS rn
  FROM (SELECT it, array_to_string(parts[i:i+1], ' ') AS pair, wc
        FROM (SELECT it, string_split(syms, ' ') AS parts, wc FROM r),
             UNNEST(range(1, len(parts))) AS t(i))
  GROUP BY it, pair
)
WHERE rn = 1 AND it < (SELECT MAX(it) FROM r)
ORDER BY merge_idx
"""
    oracle_rows = [tuple(r) for r in con.execute(sql).fetchall()]
    assert spark_rows == oracle_rows
    # the fixture really exercises the identical-symbol run case
    assert any(p == "b b" for _, p, _ in spark_rows)
