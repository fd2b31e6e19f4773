"""Unit tests for the round-10 operators: Benford digit/constant
semantics, burstiness regime edges, Gini diversity bounds — each pinned
against tiny hand fixtures independent of the DuckDB parity sweep."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# ------------------------------------------------------------- Benford

def test_benford_ppm_constants_are_exact():
    """The nine hardcoded ppm constants must be floor(log10(1+1/d)*1e6)
    up to the +-1 integerization that makes them sum to EXACTLY 1e6."""
    import math

    from streamalert_spark.queries.analytics_sketch import _BENFORD_PPM

    ppm = [int(x) for x in _BENFORD_PPM.strip("[]").split(",")]
    assert len(ppm) == 9
    assert sum(ppm) == 1_000_000
    for d, got in enumerate(ppm, start=1):
        exact = math.log10(1 + 1 / d) * 1_000_000
        assert abs(got - exact) < 1, (d, got, exact)
    assert ppm == sorted(ppm, reverse=True)  # Benford is monotone


def test_benford_digit_comes_from_cents_not_log(spark):
    """value=0.01 -> cents=1 -> digit 1; value=9.5 -> cents=950 ->
    digit 9; zero and negative values drop out."""
    from streamalert_spark.queries.analytics_sketch import (
        benford_first_digit_audit,
    )
    from streamalert_spark.session import local_rows_df

    rows = [(1, "2024-01-01 00:00:00", 1, "t", 0.01, None),
            (2, "2024-01-01 00:00:01", 1, "t", 9.50, None),
            (3, "2024-01-01 00:00:02", 1, "t", 0.0, None),
            (4, "2024-01-01 00:00:03", 1, "t", -3.0, None)]
    df = local_rows_df(
        spark, rows,
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string").withColumn("ts", F.col("ts").cast("timestamp"))

    import streamalert_spark.queries.analytics_sketch as mod
    orig = mod._events
    mod._events = lambda s, d: df
    try:
        got = {(r["digit"]): r["n_d"]
               for r in benford_first_digit_audit(spark, SF_DIR).collect()}
    finally:
        mod._events = orig
    assert got == {1: 1, 9: 1}


# --------------------------------------------------------- burstiness

def _run_burstiness(spark, rows):
    from streamalert_spark.queries.analytics_sketch import (
        interarrival_burstiness,
    )
    from streamalert_spark.session import local_rows_df

    df = local_rows_df(
        spark, rows,
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string").withColumn(
            "ts", F.col("ts").cast("timestamp"))
    import streamalert_spark.queries.analytics_sketch as mod
    orig = mod._events
    mod._events = lambda s, d: df
    try:
        return {r["user_id"]: r.asDict()
                for r in interarrival_burstiness(spark, SF_DIR).collect()}
    finally:
        mod._events = orig


def test_burstiness_constant_gap_is_periodic(spark):
    rows = [(i, f"2024-01-01 00:{i:02d}:00", 7, "t", 1.0, None)
            for i in range(5)]
    got = _run_burstiness(spark, rows)
    assert got[7]["cv2_fp"] == 0
    assert got[7]["regime"] == "periodic"
    assert got[7]["mean_gap_fp"] == 60 * 1_000_000


def test_burstiness_spike_gap_is_bursty(spark):
    # gaps 1,1,1,597: mean 150, heavily right-skewed -> CV^2 >> 2
    ts = [0, 1, 2, 3, 600]
    rows = [(i, f"2024-01-01 00:{t // 60:02d}:{t % 60:02d}",
             8, "t", 1.0, None) for i, t in enumerate(ts)]
    got = _run_burstiness(spark, rows)
    n, sg = 4, 600
    sg2 = 1 + 1 + 1 + 597 * 597
    want = ((n * sg2 - sg * sg) * 1_000_000) // (sg * sg)
    assert got[8]["cv2_fp"] == want
    assert got[8]["regime"] == "bursty"


def test_burstiness_needs_two_gaps(spark):
    rows = [(0, "2024-01-01 00:00:00", 9, "t", 1.0, None),
            (1, "2024-01-01 00:01:00", 9, "t", 1.0, None)]
    assert _run_burstiness(spark, rows) == {}  # 1 gap -> excluded


# ------------------------------------------------------------- Gini

def _run_gini(spark, rows):
    from streamalert_spark.queries.analytics_sketch import (
        event_gini_diversity,
    )
    from streamalert_spark.session import local_rows_df

    df = local_rows_df(
        spark, rows,
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string")
    import streamalert_spark.queries.analytics_sketch as mod
    orig = mod._events
    mod._events = lambda s, d: df
    try:
        return {r["user_id"]: r.asDict()
                for r in event_gini_diversity(spark, SF_DIR).collect()}
    finally:
        mod._events = orig


def test_gini_single_type_is_zero_and_uniform_hits_bound(spark):
    rows = ([(i, None, 1, "only", 1.0, None) for i in range(6)]
            + [(10 + i, None, 2, f"t{i % 3}", 1.0, None) for i in range(6)])
    got = _run_gini(spark, rows)
    assert got[1]["gini_fp"] == 0
    assert got[1]["n_types"] == 1
    # uniform over 3 types: 1 - 3*(1/3)^2 = 2/3
    assert got[2]["gini_fp"] == 1_000_000 - (3 * 4 * 1_000_000) // 36
    assert got[2]["n_types"] == 3


# ------------------------------------------------- replica anti-entropy

def test_antientropy_buckets_only_shrink_and_identical_replica_is_silent(spark):
    """B is A minus deletes plus cent-bumps, so every divergent bucket
    must satisfy n_a >= n_b; and a digest built twice from the SAME side
    must agree (the commutative-sum property the operator rests on)."""
    from streamalert_spark.queries import load_all

    reg = load_all()
    rows = reg["replica_antientropy_buckets"].fn(spark, SF_DIR).collect()
    assert rows, "the md5 gates mutate ~1/128 of orders; sf0.001 has hits"
    for r in rows:
        assert r["n_a"] >= r["n_b"]
        assert (r["n_a"], r["digest_a"]) != (r["n_b"], r["digest_b"])


def test_antientropy_digest_is_partitioning_invariant(spark):
    """Repartitioning the input must not change any bucket digest —
    the whole point of a commutative integer digest."""
    from streamalert_spark.queries import load_all
    from streamalert_spark.session import read_table

    reg = load_all()
    base = {(r["bucket"]): (r["n_a"], r["digest_a"], r["n_b"], r["digest_b"])
            for r in reg["replica_antientropy_buckets"]
            .fn(spark, SF_DIR).collect()}
    again = {(r["bucket"]): (r["n_a"], r["digest_a"], r["n_b"], r["digest_b"])
             for r in reg["replica_antientropy_buckets"]
             .fn(spark, SF_DIR).repartition(7).collect()}
    assert base == again


# ------------------------------------------------- tombstone purge audit

def test_tombstone_audit_conserves_rows(spark):
    from streamalert_spark.queries import load_all
    from streamalert_spark.session import read_table

    reg = load_all()
    got = {r["table_name"]: r.asDict()
           for r in reg["tombstone_purge_audit"].fn(spark, SF_DIR).collect()}
    assert set(got) == {"events", "orders", "customer"}
    n_events = (read_table(spark, SF_DIR, "events")
                .filter(F.col("user_id").isNotNull()).count())
    assert got["events"]["rows_purged"] + got["events"]["rows_retained"] \
        == n_events
    for t in got.values():
        assert t["subjects_purged"] <= t["rows_purged"]
    # the 1/16 gate must hit SOMEWHERE (events' ~15-user domain at
    # sf0.001 can legitimately have zero hits; customer's 150 cannot
    # plausibly miss AND the same subjects cascade into orders)
    assert got["customer"]["rows_purged"] > 0
    assert got["orders"]["rows_purged"] > 0


# -------------------------------------------------- Heaps vocab growth

def test_heaps_curve_is_monotone_and_bounded(spark):
    from streamalert_spark.queries import load_all

    rows = (load_all()["heaps_vocab_growth"].fn(spark, SF_DIR)
            .collect())
    assert rows
    prev_v = prev_t = 0
    for i, r in enumerate(rows):
        assert r["checkpoint_docs"] == 32 * (1 << i)  # geometric grid
        assert r["vocab_cum"] >= prev_v
        assert r["tokens_cum"] > prev_t
        assert r["vocab_cum"] <= r["tokens_cum"]  # types <= instances
        prev_v, prev_t = r["vocab_cum"], r["tokens_cum"]


# ------------------------------------------------ language-ID confusion

def test_langid_confusion_conserves_docs_per_lang(spark):
    from streamalert_spark.queries import load_all
    from streamalert_spark.session import read_table

    rows = (load_all()["langid_trigram_confusion"].fn(spark, SF_DIR)
            .collect())
    got = {}
    langs = set()
    for r in rows:
        got[r["lang"]] = got.get(r["lang"], 0) + r["n_docs"]
        langs.add(r["lang"])
        assert r["pred_lang"] in langs | {"unk", "de", "en", "es", "fr", "zh"}
    want = {r["lang"]: r["n"] for r in
            read_table(spark, SF_DIR, "documents")
            .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want  # every doc lands in exactly one matrix cell


# ------------------------------------------------ degree assortativity

def test_assortativity_is_a_valid_correlation(spark):
    from streamalert_spark.queries import load_all

    [r] = load_all()["degree_assortativity"].fn(spark, SF_DIR).collect()
    assert -1_000_000 <= r["assortativity_fp"] <= 1_000_000
    assert r["m_endpoints"] % 2 == 0  # symmetrized edge list
    # Cauchy-Schwarz sanity on the raw sums
    assert r["m_endpoints"] * r["sum_deg2"] >= r["sum_deg"] ** 2 // 1


# -------------------------------------------------- Holt trend residuals

def _tdiv(a: int, d: int) -> int:
    """Truncate-toward-zero division — Spark DIV == DuckDB // semantics."""
    return abs(a) // d * (1 if a >= 0 else -1)


def _holt_walk(counts_by_hour, lo, hi, scale=1_000_000):
    alerts = []
    l = b = None
    for h in range(lo, hi + 1):
        x = counts_by_hour.get(h, 0)
        if l is None:
            l, b = x * scale, 0
            continue
        fc = l + b
        if x >= 5 and abs(x * scale - fc) > max(l, 4 * scale):
            alerts.append((h, x, fc, x * scale - fc))
        l_new = _tdiv(x * scale, 4) + _tdiv(3 * (l + b), 4)
        b = _tdiv(l_new - l, 4) + _tdiv(3 * b, 4)
        l = l_new
    return alerts


def test_holt_stream_matches_hand_walk_with_negative_trend(spark):
    """Fixture with a spike then a crash so the trend term goes NEGATIVE
    — the signed-division path where floor (shiftright) and truncate
    (DIV, //) disagree; the hand walk uses truncate like both engines."""
    from streamalert_spark.queries.analytics_sketch import (
        holt_trend_residuals,
    )
    from streamalert_spark.session import local_rows_df

    counts = {0: 5, 1: 10, 2: 20, 3: 40, 4: 80, 5: 160, 6: 320, 7: 640,
              8: 5}
    rows = [(h * 100 + i, f"2024-01-01 {h:02d}:00:00", 1, "t", 1.0, None)
            for h, c in counts.items() for i in range(c)]
    df = local_rows_df(
        spark, rows,
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string").withColumn(
            "ts", F.col("ts").cast("timestamp"))
    import streamalert_spark.queries.analytics_sketch as mod
    orig = mod._events
    mod._events = lambda s, d: df
    try:
        got = sorted((r["h"], r["x"], r["forecast_fp"], r["residual_fp"])
                     for r in holt_trend_residuals(spark, SF_DIR).collect())
    finally:
        mod._events = orig
    # hours in the fixture are absolute epoch-hours of 2024-01-01 hh:00
    import datetime as dt
    base = int(dt.datetime(2024, 1, 1,
                           tzinfo=dt.timezone.utc).timestamp()) // 3600
    want = sorted(_holt_walk({base + h: c for h, c in counts.items()},
                             base, base + 8))
    assert got == want
    assert any(res < 0 for _, _, _, res in want), \
        "fixture must exercise a negative residual"


# --------------------------------------------------- k-center coreset

def test_kcenter_matches_bruteforce_greedy(spark):
    """Re-run Gonzalez greedy in plain Python on the quantized vectors
    and demand the identical selection trajectory and radii."""
    from streamalert_spark.queries import load_all
    from streamalert_spark.session import read_table

    import math

    emb = {r["vec_id"]: [int(math.floor(float(x) * 1000 + 0.5))
                         for x in r["embedding"]]
           for r in read_table(spark, SF_DIR, "embeddings").collect()}

    def d2(a, b):
        return sum((u - v) * (u - v) for u, v in zip(a, b))

    seed = min(emb)
    sel = [(0, seed, 0)]
    mind = {v: d2(emb[v], emb[seed]) for v in emb}
    for j in range(1, 8):
        far = max(mind, key=lambda v: (mind[v], -v))
        sel.append((j, far, mind[far]))
        for v in emb:
            mind[v] = min(mind[v], d2(emb[v], emb[far]))
    got = [(r["sel_idx"], r["vec_id"], r["radius"])
           for r in load_all()["kcenter_coreset"].fn(spark, SF_DIR)
           .collect()]
    assert got == sel
    radii = [r for _, _, r in got[1:]]
    assert radii == sorted(radii, reverse=True)  # greedy radii contract
    assert len({v for _, v, _ in got}) == 8


# ------------------------------------------- calibration reliability bins

def test_calibration_bins_conserve_docs_and_respect_bin_ranges(spark):
    from streamalert_spark.queries import load_all
    from streamalert_spark.session import read_table

    rows = (load_all()["calibration_reliability_bins"].fn(spark, SF_DIR)
            .collect())
    n_docs = read_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["bin"] <= 9
        lo, hi = r["bin"] * 200_000 - 1_000_000, \
            (r["bin"] + 1) * 200_000 - 1_000_000
        if r["bin"] == 9:
            hi = 1_000_000  # clamp bin absorbs the top edge
        assert lo <= r["mean_score_ppm"] < hi
        assert 0 <= r["gopher_pass_ppm"] <= 1_000_000


# ------------------------------------------------ reciprocal-rank fusion

def test_rrf_scores_decompose_into_rank_terms(spark):
    from streamalert_spark.queries import load_all

    rows = load_all()["rrf_fused_topk"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        want = 0
        if r["rank_full"] > 0:
            want += 1_000_000 // (60 + r["rank_full"])
        if r["rank_coarse"] > 0:
            want += 1_000_000 // (60 + r["rank_coarse"])
        assert r["rrf_fp"] == want
        assert r["rank_full"] > 0 or r["rank_coarse"] > 0
    fps = [r["rrf_fp"] for r in rows]
    assert fps == sorted(fps, reverse=True)


# --------------------------------------------------- Theil-Sen slopes

def test_theilsen_median_matches_bruteforce(spark):
    from streamalert_spark.queries import load_all
    from streamalert_spark.session import read_table

    got = {r["event_type"]: (r["n_pairs"], r["median_slope_fp"])
           for r in load_all()["theilsen_trend_slopes"]
           .fn(spark, SF_DIR).collect()}
    ev = read_table(spark, SF_DIR, "events").select(
        "event_type",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
               "00:00:00', ts) DIV 1000000 DIV 3600").alias("h")).collect()
    hourly = {}
    for r in ev:
        hourly.setdefault(r["event_type"], {})
        hourly[r["event_type"]][r["h"]] = \
            hourly[r["event_type"]].get(r["h"], 0) + 1
    for t, cnts in hourly.items():
        hs = sorted(cnts)
        slopes = sorted(
            ((cnts[h2] - cnts[h1]) * 1_000_000) // (h2 - h1)
            if (cnts[h2] - cnts[h1]) >= 0 else
            -((-(cnts[h2] - cnts[h1]) * 1_000_000) // (h2 - h1))
            for i, h1 in enumerate(hs) for h2 in hs[i + 1:])
        n = len(slopes)
        # lower median by the (slope, h1, h2) rank: the slope VALUE at
        # rank (n+1)//2 equals the (n+1)//2-th smallest slope
        assert got[t] == (n, slopes[(n + 1) // 2 - 1])


# ------------------------------------------------------- CUPED A/B

def test_cuped_adjustment_shrinks_preperiod_imbalance(spark):
    from streamalert_spark.queries import load_all

    rows = {r["arm"]: r.asDict()
            for r in load_all()["cuped_ab_adjusted_lift"]
            .fn(spark, SF_DIR).collect()}
    assert set(rows) == {0, 1}
    # weighted mean_x_all reconstruction: adjustment must conserve the
    # overall weighted mean of y up to DIV truncation per arm
    for arm in (0, 1):
        r = rows[arm]
        assert r["n_users"] > 0
        # adjusted mean = raw mean - theta*(x_arm - x_all)/1e6 exactly
        # (recompute the subtraction from the emitted columns)
        # x_all is not emitted; invert it from the two arms' identity
    n0, n1 = rows[0]["n_users"], rows[1]["n_users"]
    x_all = (rows[0]["mean_x_fp"] * n0 + rows[1]["mean_x_fp"] * n1) \
        // (n0 + n1)
    for arm in (0, 1):
        r = rows[arm]
        gap = r["theta_fp"] * (r["mean_x_fp"] - x_all)
        tgap = abs(gap) // 1_000_000 * (1 if gap >= 0 else -1)
        # reconstruction is exact up to the per-user-sum rounding that
        # x_all inversion reintroduces: allow 1 fp ulp
        assert abs((r["mean_y_fp"] - tgap) - r["adj_mean_y_fp"]) <= \
            abs(r["theta_fp"]) + 1


# ------------------------------------------------- LPM route enrich

def test_lpm_picks_longest_and_falls_through(spark):
    """Brute-force the 33-entry routing table in Python and demand the
    identical winner for every customer; the fixture must exercise all
    three prefix lengths."""
    from streamalert_spark.queries import load_all
    from streamalert_spark.session import read_table

    table = {}
    for t in range(16):
        table[(16, 10 * 16777216 + t * 65536)] = (16, f"pop-{t}-16")
        table[(24, 10 * 16777216 + t * 65536 + t * 256)] = (24, f"pop-{t}-24")
    table[(8, 10 * 16777216)] = (8, "core")

    got = {r["c_custkey"]: (r["prefix_len"], r["next_hop"])
           for r in load_all()["lpm_route_enrich"].fn(spark, SF_DIR)
           .collect()}
    keys = [r["c_custkey"] for r in
            read_table(spark, SF_DIR, "customer").collect()]
    seen_lens = set()
    for c in keys:
        ip = (10 * 16777216 + (c % 32) * 65536 + (c % 20) * 256
              + (c % 100))
        best = None
        for ln in (24, 16, 8):
            net = ip // (2 ** (32 - ln)) * (2 ** (32 - ln))
            if (ln, net) in table:
                best = table[(ln, net)]
                break
        assert got[c] == best, (c, ip, got[c], best)
        seen_lens.add(best[0])
    assert seen_lens == {8, 16, 24}  # all three lengths must win somewhere


# ------------------------------------------------- TWAP / LOCF

def test_twap_matches_python_step_integral(spark):
    from streamalert_spark.queries import load_all
    from streamalert_spark.session import read_table

    got = {r["user_id"]: (r["n_obs"], r["span_s"], r["twap_fp"])
           for r in load_all()["twap_locf_per_user"].fn(spark, SF_DIR)
           .collect()}
    rows = (read_table(spark, SF_DIR, "events")
            .filter(F.col("user_id").isNotNull()
                    & F.col("value").isNotNull())
            .select("user_id", "event_id",
                    F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ "
                           "'1970-01-01 00:00:00', ts) DIV 1000000")
                    .alias("s"),
                    F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
                    .alias("cents"))
            .collect())
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["s"], r["event_id"], r["cents"]))
    want = {}
    for u, obs in by_user.items():
        obs.sort()
        span = area = 0
        for (s1, _, c), (s2, _, _) in zip(obs, obs[1:]):
            span += s2 - s1
            area += c * (s2 - s1)
        if span > 0:
            want[u] = (len(obs) - 1, span, (area * 1_000_000) // span)
    assert got == want


# ------------------------------------------------ streaming TWAP steps

def test_twap_stream_closes_steps_across_batches(spark, tmp_path):
    """A user's step that OPENS in batch 0 and CLOSES in batch 1 must
    emit the identical area the batch LEAD window computes; same-second
    ties (deterministic zero-duration steps) ride along in batch 0."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from streamalert_spark.streaming.bounded import run_bounded_to_rows
    from streamalert_spark.streaming.decay import (
        TWAP_OUT_SCHEMA, twap_steps_stream,
    )

    # (event_id, s, cents): obs at s=10 (two ties), 20 | batch split | 50
    b0 = [(1, 10, 100), (2, 10, 150), (3, 20, 200)]
    b1 = [(4, 50, 300)]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, batch in enumerate([b0, b1]):
        path = in_dir / f"b{i}.parquet"
        pq.write_table(pa.table({
            "user_id": [7] * len(batch),
            "event_id": [e for e, _, _ in batch],
            "s": [s for _, s, _ in batch],
            "cents": [c for _, _, c in batch],
        }), path)
        os.utime(path, (1_000_000 + 10 * i,) * 2)
    src = (spark.readStream
           .schema("user_id bigint, event_id bigint, s bigint, cents bigint")
           .option("maxFilesPerTrigger", "1").parquet(str(in_dir)))
    got = sorted(
        (r["event_id"], r["s"], r["next_s"], r["cents"], r["area_inc"])
        for r in run_bounded_to_rows(
            spark, twap_steps_stream(src), TWAP_OUT_SCHEMA).collect())
    assert got == [
        (1, 10, 10, 100, 0),        # same-second tie: zero-duration step
        (2, 10, 20, 150, 1500),
        (3, 20, 50, 200, 6000),     # closed ACROSS the batch boundary
    ]


# ------------------------------------------------ Kaplan-Meier survival

def test_km_curve_is_monotone_and_conserves_risk_set(spark):
    from streamalert_spark.queries import load_all

    rows = load_all()["km_survival_curve"].fn(spark, SF_DIR).collect()
    assert rows
    assert rows[0]["t"] == 0
    prev_s = 1_000_000
    for i, r in enumerate(rows):
        assert 0 <= r["survival_fp"] <= prev_s  # KM never increases
        assert r["deaths"] <= r["at_risk"]
        if i > 0:
            # risk set shrinks by exactly the previous step's leavers
            # (deaths + censored); leavers aren't emitted, so only the
            # inequality deaths <= leavers is checkable directly
            assert r["at_risk"] <= rows[i - 1]["at_risk"] \
                - rows[i - 1]["deaths"]
        prev_s = r["survival_fp"]
    assert any(r["deaths"] > 0 for r in rows), "fixture must convert"
    # risk-set conservation: everyone who enters either dies or is
    # censored (sf0.001's 15-user cohort can legitimately have zero
    # censored members; the sf0.01 parity sweep shows real censoring)
    total_leave = rows[0]["at_risk"] - rows[-1]["at_risk"] \
        + rows[-1]["deaths"]
    assert total_leave >= sum(r["deaths"] for r in rows)
