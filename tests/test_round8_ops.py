"""Unit tests for the round-8 operators: interval-overlap exactly-once
claiming, int8 quantization error bounds, span-dedup invariants, and the
MAD summary against a plain-Python reference."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from tests.conftest import heavy


# ------------------------------------------------ interval overlap join

def _naive_overlaps(lefts, rights):
    return sorted(
        (li, ri)
        for li, (ll, lh) in enumerate(lefts)
        for ri, (rl, rh) in enumerate(rights)
        if ll <= rh and rl <= lh
    )


def test_interval_overlap_matches_naive_join_exactly_once(spark):
    """Randomized intervals (fixed seed): the bucketed join must produce
    exactly the naive overlap pairs — each pair ONCE, even when a pair
    shares several grid buckets."""
    from streamalert_spark.ops.rangejoin import bucketed_interval_overlap_join

    rng = random.Random(8)
    lefts = [(s := rng.randrange(0, 500), s + rng.randrange(0, 40))
             for _ in range(120)]
    rights = [(s := rng.randrange(0, 500), s + rng.randrange(0, 40))
              for _ in range(30)]
    lf = spark.createDataFrame(
        [(i, lo, hi) for i, (lo, hi) in enumerate(lefts)],
        "li int, l_lo bigint, l_hi bigint")
    rt = spark.createDataFrame(
        [(i, lo, hi) for i, (lo, hi) in enumerate(rights)],
        "ri int, r_lo bigint, r_hi bigint")
    for width in (40, 64, 500):  # >= longest interval; wider stays correct
        got = sorted(
            (r.li, r.ri)
            for r in bucketed_interval_overlap_join(
                lf, rt, "l_lo", "l_hi", "r_lo", "r_hi", width).collect())
        assert got == _naive_overlaps(lefts, rights), f"width={width}"


def test_interval_overlap_rejects_bad_width(spark):
    import pytest

    from streamalert_spark.ops.rangejoin import bucketed_interval_overlap_join

    df = spark.range(1).select(
        F.lit(0).alias("lo"), F.lit(1).alias("hi"))
    with pytest.raises(ValueError):
        bucketed_interval_overlap_join(df, df, "lo", "hi", "lo", "hi", 0)


# --------------------------------------------------- int8 quantization

def test_quantize_int8_error_bound_and_range(spark):
    """Every quantized element is within [-127, 127] and dequantizes to
    within half a quantization step (scale/127/2 + float slack) of the
    original; the max-|x| element hits exactly +-127."""
    from streamalert_spark.ops.similarity import quantize_int8
    from streamalert_spark.session import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    q = quantize_int8(emb).join(emb, "vec_id")
    rows = q.collect()
    assert rows
    for r in rows:
        s = r["q_scale"]
        assert s > 0
        step = s / 127.0
        mx = max(abs(v) for v in r["q_vec"])
        assert mx == 127  # the max-|x| element saturates the grid
        for orig, qv in zip(r["embedding"], r["q_vec"]):
            assert -127 <= qv <= 127
            assert abs(float(orig) - qv * step) <= step / 2 + 1e-9


def test_int8_dot_is_exact_integer(spark):
    from streamalert_spark.ops.similarity import int8_dot, quantize_int8
    from streamalert_spark.session import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings").filter(
        F.col("vec_id") < 5)
    q = quantize_int8(emb)
    a = q.filter(F.col("vec_id") == 0).select(F.col("q_vec").alias("a"))
    out = q.crossJoin(F.broadcast(a)).select(
        int8_dot(F.col("q_vec"), F.col("a")).alias("d")).collect()
    py = {r["vec_id"]: r["q_vec"] for r in q.collect()}
    expect = sorted(sum(x * y for x, y in zip(v, py[0])) for v in py.values())
    assert sorted(r["d"] for r in out) == expect


# ------------------------------------------------------ span dedup scrub

def test_span_dedup_kept_equals_distinct_spans(spark):
    """Sum of kept spans across the corpus == number of DISTINCT spans
    (first-occurrence semantics keep exactly one copy of each)."""
    from streamalert_spark.ops.text import span_dedup_scrub
    from streamalert_spark.session import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    out = span_dedup_scrub(docs, span_len=4)
    kept = out.agg(F.sum("n_kept")).collect()[0][0]
    toks = F.split(F.col("text"), " ")
    spans = docs.select(F.explode(F.transform(
        F.sequence(F.lit(0), F.size(toks) - 1, F.lit(4)),
        lambda s: F.array_join(F.slice(toks, s + 1, 4), " "))).alias("sp"))
    distinct = spans.select("sp").distinct().count()
    assert kept == distinct


def test_span_dedup_unique_corpus_keeps_everything(spark):
    """A corpus with no repeated spans is returned untouched (n_kept ==
    n_spans and the scrubbed text equals the original reassembly)."""
    from streamalert_spark.ops.text import span_dedup_scrub

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "p q r s t u v w")],
        "doc_id bigint, text string")
    rows = {r["doc_id"]: r for r in span_dedup_scrub(docs, 4).collect()}
    for r in rows.values():
        assert r["n_kept"] == r["n_spans"] == 2


# ------------------------------------------------------- MAD outliers

def test_mad_summary_matches_python_reference(spark):
    """Lower-median/MAD/outlier counts against a plain-Python rebuild on
    a deterministic skewed sample."""
    from streamalert_spark.ops.profile import robust_outlier_summary

    rng = random.Random(42)
    data = [("g", i, float(rng.randrange(0, 100))) for i in range(101)]
    data += [("g", 200 + i, 10_000.0 + i) for i in range(3)]  # wild values
    df = spark.createDataFrame(data, "grp string, id int, v double")
    got = robust_outlier_summary(df, "grp", "v", "id", k=3.0).collect()[0]

    vals = sorted(v for _, _, v in data)
    n = len(vals)
    med = vals[(n + 1) // 2 - 1]  # lower median, 1-based rank (n+1)//2
    devs = sorted(abs(v - med) for v in vals)
    mad = devs[(n + 1) // 2 - 1]
    n_out = sum(1 for v in vals if abs(v - med) > 3.0 * mad)
    assert got["n_rows"] == n
    assert got["median"] == round(med, 6)
    assert got["mad"] == round(mad, 6)
    assert got["n_outliers"] == n_out


# ------------------------------------------- prefix-preserving IP anon

def test_prefix_preserving_anon_property_all_pairs(spark):
    """The CryptoPAn invariant on ALL pairs (not just the audit's
    consecutive ones): common-prefix-length is preserved exactly, and
    the mapping is injective on the sample."""
    from streamalert_spark.ops.pii import prefix_preserving_anon

    rng = random.Random(7)
    ips = sorted({rng.randrange(0, 1 << 32) for _ in range(120)})
    df = spark.createDataFrame([(ip,) for ip in ips], "ip bigint")
    rows = {r["ip"]: r["anon_ip"] for r in
            prefix_preserving_anon(df, "ip").collect()}
    assert len(set(rows.values())) == len(ips)  # injective

    def cpl(a, b):
        x = (a ^ b) & 0xFFFFFFFF
        return 32 - x.bit_length()

    for i in range(len(ips)):
        for j in range(i + 1, len(ips)):
            a, b = ips[i], ips[j]
            assert cpl(a, b) == cpl(rows[a], rows[b]), (a, b)


def test_prefix_preserving_anon_key_changes_mapping(spark):
    """Rotating the key unlinks the pseudonyms (different key, different
    mapping) while each keyed mapping stays deterministic."""
    from streamalert_spark.ops.pii import prefix_preserving_anon

    df = spark.createDataFrame([(i * 977,) for i in range(50)], "ip bigint")
    a1 = {r["ip"]: r["anon_ip"]
          for r in prefix_preserving_anon(df, "ip", key="k1").collect()}
    a1b = {r["ip"]: r["anon_ip"]
           for r in prefix_preserving_anon(df, "ip", key="k1").collect()}
    a2 = {r["ip"]: r["anon_ip"]
          for r in prefix_preserving_anon(df, "ip", key="k2").collect()}
    assert a1 == a1b
    assert a1 != a2


def test_span_dedup_matches_python_reference_random_corpora(spark):
    """Randomized small-vocab corpora (seeded): the Spark op must agree
    with a direct Python rebuild of first-occurrence span dedup on every
    output column, including the scrubbed digest."""
    import hashlib

    from streamalert_spark.ops.text import span_dedup_scrub

    rng = random.Random(88)
    vocab = ["a", "b", "c"]
    for trial in range(5):
        docs = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randrange(1, 20))))
                for i in range(12)]
        # python reference
        seen, expect = set(), {}
        for doc_id, text in docs:
            toks = text.split(" ")
            spans = [" ".join(toks[s:s + 3])
                     for s in range(0, len(toks), 3)]
            kept = []
            for sp in spans:
                if sp not in seen:
                    seen.add(sp)
                    kept.append(sp)
            scrubbed = " ".join(kept)
            expect[doc_id] = (len(spans), len(kept),
                              hashlib.md5(scrubbed.encode()).hexdigest(),
                              len(scrubbed))
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        got = {r["doc_id"]: (r["n_spans"], r["n_kept"], r["scrubbed_md5"],
                             r["scrubbed_len"])
               for r in span_dedup_scrub(df, span_len=3).collect()}
        assert got == expect, f"trial {trial}"


# --------------------------- kernel vs SQL-twin equivalence pins

@heavy
def test_minhash_kernel_equals_sql_formulation(spark):
    """The Arrow minhash kernel and the pure-expression SQL formulation
    (the engine-portable reference) must produce bit-identical
    signatures — the pin that lets the kernel stay the default without
    drifting from what the oracles encode."""
    from streamalert_spark.ops.dedup import (
        minhash_signatures, minhash_signatures_sql,
    )
    from streamalert_spark.session import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    k = sorted(tuple(r) for r in minhash_signatures(docs).collect())
    s = sorted(tuple(r) for r in minhash_signatures_sql(docs).collect())
    assert k == s


def test_simhash_kernel_equals_sql_formulation(spark):
    from streamalert_spark.ops.dedup import simhash_bits, simhash_bits_sql
    from streamalert_spark.session import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").limit(60)
    k = sorted(tuple(r) for r in simhash_bits(docs).collect())
    s = sorted(tuple(r) for r in simhash_bits_sql(docs).collect())
    assert k == s
