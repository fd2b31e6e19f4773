"""Unit tests for the cross-engine-exact sketch operators (KMV
cardinality, rate spikes) — semantics pinned against pure-Python
references, plan shapes against .explain."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _py_kmv(values, k=32):
    """Pure-Python KMV reference: (kth_min_hash, estimate, exact)."""
    hashes = sorted(hashlib.md5(str(v).encode()).hexdigest() for v in set(values))  # noqa: S324
    n = len(hashes)
    kth = hashes[min(k, n) - 1]
    if n < k:
        return kth, float(n), n
    frac = 0.0
    for i, c in enumerate(kth[:13]):
        frac = frac + int(c, 16) * 16.0 ** -(i + 1)
    return kth, round((k - 1) / frac, 4), n


def test_kmv_matches_python_reference_above_k(spark):
    from streamalert_spark.ops.sketch import kmv_distinct

    # duplicates must not affect the sketch; offset chosen as a TYPICAL
    # hash draw (range(0,500) happens to be a ~3.8-sigma outlier of the
    # unbiased estimator — verified by sweeping 40 disjoint windows)
    values = list(range(1000, 1500)) * 2
    df = spark.createDataFrame([("g", v) for v in values], "g string, v bigint")
    row = kmv_distinct(df, "g", "v").collect()[0]
    kth, est, n = _py_kmv(values)
    assert row["kth_min_hash"] == kth
    assert row["kmv_estimate"] == est
    assert row["exact_distinct"] == n == 500
    # sanity: within 4 relative stderr (stderr ~ n/sqrt(k-2))
    assert abs(est - 500) / 500 < 4 / math.sqrt(30)


def test_kmv_exact_fallback_below_k(spark):
    """Groups with fewer than k distinct values report the EXACT count."""
    from streamalert_spark.ops.sketch import kmv_distinct

    df = spark.createDataFrame(
        [("small", v % 5) for v in range(50)], "g string, v bigint")
    row = kmv_distinct(df, "g", "v").collect()[0]
    assert row["kmv_estimate"] == 5.0
    assert row["exact_distinct"] == 5


def test_rate_spikes_flags_known_outlier(spark):
    """A constructed series (47 quiet hours + one burst) must flag exactly
    the burst hour, with the integer deviation and threshold matching the
    Python reference."""
    from streamalert_spark.ops.sketch import rate_spikes

    rows = []
    for h in range(48):
        cnt = 50 if h == 13 else 2
        for i in range(cnt):
            rows.append((f"2024-01-01 {h % 24:02d}:00:{i % 60:02d}", h // 24))
    df = spark.createDataFrame(rows, "t string, d bigint").select(
        F.lit("k").alias("key"),
        (F.to_timestamp("t") + F.make_interval(days=F.col("d"))).alias("ts"),
    )
    out = rate_spikes(df, "key", "ts").collect()
    assert len(out) == 1
    counts = [50 if h == 13 else 2 for h in range(48)]
    n, s, ss = len(counts), sum(counts), sum(c * c for c in counts)
    assert out[0]["cnt"] == 50
    assert out[0]["dev"] == round(50.0 * float(n) - float(s), 6)
    assert out[0]["threshold"] == round(
        3.0 * math.sqrt(float(n) * float(ss) - float(s) * float(s)), 6)


def test_rate_spikes_constant_series_flags_nothing(spark):
    from streamalert_spark.ops.sketch import rate_spikes

    rows = [(f"2024-01-01 {h:02d}:00:00",) for h in range(24)]
    df = spark.createDataFrame(rows, "t string").select(
        F.lit("k").alias("key"), F.to_timestamp("t").alias("ts"))
    assert rate_spikes(df, "key", "ts").count() == 0


def test_kmv_no_global_sort(spark):
    """The KMV window must hash-partition by group, never range-sort the
    whole relation."""
    from streamalert_spark.ops.sketch import kmv_distinct

    df = spark.createDataFrame([("g", v) for v in range(100)], "g string, v bigint")
    plan = _plan(kmv_distinct(df, "g", "v"))
    assert "RangePartitioning" not in plan, plan
def test_fuzzy_short_strings_complete(spark):
    """Short strings (< q*(k+1)) have no q-gram guarantee — the
    exhaustive short branch must still find their pairs ('cat'~'car'
    share NO 3-gram)."""
    from streamalert_spark.ops.fuzzy import edit_distance_pairs

    df = spark.createDataFrame(
        [("cat",), ("car",), ("ca",), ("categorical",), ("catamaran-x",)],
        "name string")
    got = {(r["n1"], r["n2"]): r["dist"]
           for r in edit_distance_pairs(df, "name", max_distance=2).collect()}
    assert got[("car", "cat")] == 1      # no shared 3-gram: short branch
    assert got[("ca", "cat")] == 1
    assert got[("ca", "car")] == 1
    assert ("cat", "categorical") not in got  # distance 8


def test_fuzzy_prefix_filter_tames_hot_gram(spark):
    """Frequent-gram mitigation (ops/fuzzy.py prefix filtering): 40
    pairwise-distant strings all sharing the trigram 'zzz' must produce
    ~0 block candidates (naive q-gram blocking would produce all
    40*39/2), while a genuinely close pair is still found — completeness
    under skew, with the hot bucket neutralized."""
    from streamalert_spark.ops.fuzzy import (
        edit_distance_pairs,
        qgram_block_candidates,
    )

    # 40 strings 'zzz' + 12 pseudorandom hex chars -> grams other than
    # 'zzz' are (nearly) unique per string; plus one close pair (1 edit)
    import hashlib

    names = []
    for i in range(40):
        suffix = hashlib.md5(f"hotgram-{i}".encode()).hexdigest()[:12]
        names.append(f"zzz{suffix}{i:02d}")
    names.append("zzzhello-world-pair-a")
    names.append("zzzhello-world-pair-b")
    df = spark.createDataFrame([(x,) for x in names], "name string")

    cands = qgram_block_candidates(df.select("name"), n=3, max_distance=2)
    n_cands = cands.count()
    # the hot 'zzz' gram is in NO string's 7-gram prefix (every string
    # has >= 7 rarer grams), so candidates come only from real overlap
    assert n_cands < 40, f"hot gram still dominates: {n_cands} candidates"

    got = {(r["n1"], r["n2"]): r["dist"]
           for r in edit_distance_pairs(df, "name", max_distance=2).collect()}
    assert got == {("zzzhello-world-pair-a", "zzzhello-world-pair-b"): 1}


def test_shingles_short_documents_yield_no_rows(spark):
    """A document with fewer than n words must produce zero shingles,
    not an array-index fault (Spark's sequence() counts DOWN for
    negative spans)."""
    from streamalert_spark.ops.dedup import shingles

    df = spark.createDataFrame(
        [(1, "only two"), (2, ""), (3, "a b c d")],
        "doc_id bigint, text string")
    rows = shingles(df, n=3).collect()
    assert {r["doc_id"] for r in rows} == {3}
    assert sorted(r["shingle"] for r in rows) == ["a b c", "b c d"]


def test_histogram_quantiles_accuracy_and_merge_semantics(spark):
    """The sketch estimate must land within one bucket width of the true
    percentile, and repartitioning the input must not change the result
    (the bucket counts are mergeable by addition)."""
    from streamalert_spark.ops.sketch import histogram_quantiles

    vals = [float(v % 100) + 0.5 for v in range(1000)]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    row = histogram_quantiles(df, "g", "v", width=10.0).collect()[0]
    import statistics
    for q, col in ((0.5, "p50_est"), (0.9, "p90_est"), (0.99, "p99_est")):
        true = statistics.quantiles(vals, n=10000)[int(q * 10000) - 1]
        assert abs(row[col] - true) <= 10.0, (q, row[col], true)
    row2 = histogram_quantiles(df.repartition(7), "g", "v", width=10.0).collect()[0]
    assert row.asDict() == row2.asDict()


def _py_cms_cells(key: str, w: int, d: int):
    return [(i, int(hashlib.md5(f"{i}:{key}".encode()).hexdigest()[:12], 16) % w)  # noqa: S324
            for i in range(d)]


def test_cms_matches_python_reference_and_one_sided(spark):
    """CMS estimates must equal the pure-Python sketch exactly, and never
    undershoot the true count (the one-sided CMS guarantee)."""
    from collections import Counter

    from streamalert_spark.ops.sketch import cms_point_estimates

    w, d = 16, 3  # small width to force collisions
    values = [f"k{v % 37}" for v in range(500)]
    truth = Counter(values)
    table = Counter()
    for key, cnt in truth.items():
        for cell in _py_cms_cells(key, w, d):
            table[cell] += cnt
    expected = {k: min(table[c] for c in _py_cms_cells(k, w, d)) for k in truth}

    df = spark.createDataFrame([(v,) for v in values], "k string")
    got = {r["k"]: r["cms_estimate"]
           for r in cms_point_estimates(df, df, "k", w=w, d=d).collect()}
    assert got == expected
    assert all(got[k] >= truth[k] for k in truth)


def test_cms_sketch_bounded_and_mergeable(spark):
    """The sketch never exceeds d*w rows and is partitioning-invariant
    (counters merge by addition)."""
    from streamalert_spark.ops.sketch import cms_sketch

    df = spark.createDataFrame([(f"k{v}",) for v in range(2000)], "k string")
    rows = sorted((r["depth"], r["col"], r["cnt"])
                  for r in cms_sketch(df, "k", w=32, d=4).collect())
    assert len(rows) <= 32 * 4
    assert sum(c for _, _, c in rows) == 2000 * 4
    rows2 = sorted((r["depth"], r["col"], r["cnt"])
                   for r in cms_sketch(df.repartition(9), "k", w=32, d=4).collect())
    assert rows == rows2


def test_bloom_no_false_negatives_and_python_reference(spark):
    """Every inserted key must pass membership (bloom filters never have
    false negatives), and the bitmap must equal the pure-Python build."""
    from streamalert_spark.ops.bloom import bloom_bitmap, bloom_member

    m, k = 64, 3
    keys = [str(v * 17) for v in range(20)]
    df = spark.createDataFrame([(x,) for x in keys], "key string")
    bitmap = bloom_bitmap(df, "key", m=m, k=k)

    bits = set()
    for key in keys:
        for i in range(k):
            bits.add(int(hashlib.md5(f"{i}:{key}".encode()).hexdigest()[:12], 16) % m)  # noqa: S324
    assert bitmap == "".join("1" if p in bits else "0" for p in range(m))

    passed = df.filter(bloom_member(F.col("key"), bitmap, k=k)).count()
    assert passed == len(keys)


def test_bloom_rejects_out_of_set_keys(spark):
    """With a sparse bitmap, keys outside the set are (almost all)
    rejected — the reduction actually reduces."""
    from streamalert_spark.ops.bloom import bloom_bitmap, bloom_member

    members = spark.createDataFrame([(f"in-{v}",) for v in range(8)], "key string")
    bitmap = bloom_bitmap(members, "key", m=512, k=3)
    probes = spark.createDataFrame([(f"out-{v}",) for v in range(200)], "key string")
    passed = probes.filter(bloom_member(F.col("key"), bitmap, k=3)).count()
    # load is 24/512 bits -> fp rate ~1e-4; 200 probes pass ~0
    assert passed <= 2


def _round_half_up(x, d=4):
    """Spark/DuckDB ROUND is half-away-from-zero; Python round() is
    banker's — 13/32 = 0.40625 separates them."""
    return math.floor(x * 10 ** d + 0.5) / 10 ** d


def _py_kmv_overlap(a_vals, b_vals, k=32):
    ha = sorted(hashlib.md5(str(v).encode()).hexdigest() for v in set(a_vals))[:k]  # noqa: S324
    hb = sorted(hashlib.md5(str(v).encode()).hexdigest() for v in set(b_vals))[:k]  # noqa: S324
    u = sorted(set(ha) | set(hb))
    n = len(u)
    c = sum(1 for h in u[:k] if h in set(ha) and h in set(hb))
    if n < k:
        return c, _round_half_up(c / n), float(c), float(n)
    frac = 0.0
    for i, ch in enumerate(u[k - 1][:13]):
        frac = frac + int(ch, 16) * 16.0 ** -(i + 1)
    return (c, _round_half_up(c / k),
            _round_half_up((c / float(k)) * ((k - 1) / frac)),
            _round_half_up((k - 1) / frac))


def test_kmv_overlap_matches_python_reference(spark):
    from streamalert_spark.ops.sketch import kmv_overlap

    a_vals = list(range(0, 400))
    b_vals = list(range(200, 600))
    a = spark.createDataFrame([(v,) for v in a_vals], "x bigint")
    b = spark.createDataFrame([(v,) for v in b_vals], "y bigint")
    row = kmv_overlap(a, "x", b, "y").collect()[0]
    c, jac, inter, union = _py_kmv_overlap(a_vals, b_vals)
    assert (row["sketch_matches"], row["jaccard_est"],
            row["intersection_est"], row["union_est"]) == (c, jac, inter, union)
    # estimator sanity: true jaccard 200/600, within 4 stderr
    assert abs(row["jaccard_est"] - 200 / 600) < 4 * 0.09


def test_kmv_overlap_exact_below_k(spark):
    """Unions smaller than k report EXACT intersection/union counts."""
    from streamalert_spark.ops.sketch import kmv_overlap

    a = spark.createDataFrame([(v,) for v in range(10)], "x bigint")
    b = spark.createDataFrame([(v,) for v in range(5, 15)], "y bigint")
    row = kmv_overlap(a, "x", b, "y").collect()[0]
    assert row["sketch_matches"] == 5
    assert row["intersection_est"] == 5.0
    assert row["union_est"] == 15.0
    assert row["jaccard_est"] == _round_half_up(5 / 15)


def test_z_value_matches_python_interleave(spark):
    """Morton interleave must equal the bit-level Python reference for
    edge and interior points."""
    from streamalert_spark.ops.layout import z_value

    def py_z(x, y, bits=8):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pts = [(0, 0), (255, 255), (1, 0), (0, 1), (170, 85), (37, 201)]
    df = spark.createDataFrame(pts, "x bigint, y bigint")
    got = {(r["x"], r["y"]): r["z"]
           for r in df.select("x", "y", z_value(F.col("x"), F.col("y")).alias("z")).collect()}
    assert got == {(x, y): py_z(x, y) for x, y in pts}
    assert got[(255, 255)] == 65535


def test_layout_ledger_pruning_verdicts(spark):
    """A file whose envelope misses the box on either dimension must be
    pruned (candidate=0); overlap on both dims makes it a candidate."""
    from streamalert_spark.ops.layout import layout_ledger

    rows = [
        ("l", 0, 5, 5),     # inside the box
        ("l", 1, 100, 5),   # x beyond box -> pruned, but y inside (yband hit)
        ("l", 2, 5, 100),   # y beyond box -> pruned both verdicts
    ]
    df = spark.createDataFrame(rows, "layout string, file_id bigint, x bigint, y bigint")
    got = {r["file_id"]: (r["candidate"], r["candidate_yband"])
           for r in layout_ledger(df, (0, 10, 0, 10)).collect()}
    assert got == {0: (1, 1), 1: (0, 1), 2: (0, 0)}


def test_seasonal_spikes_flag_off_peak_anomaly_not_diurnal_peak(spark):
    """A strong diurnal pattern (evening peak every day) must NOT trip
    the seasonal detector, while a one-off burst at a normally-quiet
    hour must — the exact failure mode of the flat-mean detector."""
    from streamalert_spark.ops.sketch import rate_spikes, seasonal_rate_spikes

    # 28 days: a single outlier among n constants has z = sqrt(n-1), so
    # the per-hod series needs n > 10 for a lone burst to clear 3 sigma
    rows = []
    for day in range(1, 29):
        for hod in range(24):
            cnt = 40 if hod == 20 else 3          # evening peak daily
            if day == 5 and hod == 3:
                cnt = 25                           # the real anomaly
            for i in range(cnt):
                rows.append((f"2024-01-{day:02d} {hod:02d}:00:{i % 60:02d}",))
    df = spark.createDataFrame(rows, "t string").select(
        F.lit("k").alias("key"), F.to_timestamp("t").alias("ts"))

    seasonal = seasonal_rate_spikes(df, "key", "ts").collect()
    assert [(r["hod"], r["cnt"]) for r in seasonal] == [(3, 25)]
    # the flat detector flags the 28 evening peaks and MISSES the 3am
    # burst (dev 13726 < threshold ~14989, dominated by peak variance)
    flat = rate_spikes(df, "key", "ts").collect()
    flat_hours = {(r["hour"].day, r["hour"].hour) for r in flat}
    assert (5, 3) not in flat_hours
    assert len(flat_hours) == 28 and all(h == 20 for _, h in flat_hours)


def test_kcore_peels_cascading_appendage(spark):
    """k-core must cascade: in K4-clique + path c0-p0-p1-p2 (p2 also
    tied to p0), every p node has degree >= 2 initially, but peeling at
    k=3 must remove ALL of them (each removal demotes the next) and
    keep exactly the clique with within-core degree 3."""
    from streamalert_spark.ops.kcore import kcore

    clique = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    tail = [(0, 10), (10, 11), (11, 12), (12, 10)]
    df = spark.createDataFrame(clique + tail, "a bigint, b bigint")
    got = sorted((r["node"], r["core_deg"]) for r in kcore(df, k=3).collect())
    assert got == [(0, 3), (1, 3), (2, 3), (3, 3)]


def test_kcore_keeps_exact_core_degrees(spark):
    """A 5-clique plus a pendant: 4-core keeps the clique at degree 4."""
    from streamalert_spark.ops.kcore import kcore

    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    df = spark.createDataFrame(clique + [(0, 99)], "a bigint, b bigint")
    got = sorted((r["node"], r["core_deg"]) for r in kcore(df, k=4).collect())
    assert got == [(i, 4) for i in range(5)]


def test_cms_unseen_key_estimates_zero_when_cell_empty(spark):
    """A probe key whose cells were never incremented must estimate 0 —
    the left-join/zero-counter semantics of a real CMS (an inner join
    would over-estimate from collision cells only)."""
    from streamalert_spark.ops.sketch import cms_point_estimates

    data = spark.createDataFrame([("present",)] * 5, "k string")
    # large width: the unseen key's cells are almost surely all empty
    probes = spark.createDataFrame([("absent-key",), ("present",)], "k string")
    got = {r["k"]: r["cms_estimate"]
           for r in cms_point_estimates(data, probes, "k", w=4096, d=4).collect()}
    assert got["present"] == 5
    assert got["absent-key"] == 0
