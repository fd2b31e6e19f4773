"""Unit tests for the round-9 operators: EWMA fold semantics (batch and
streaming), link-prediction structural invariants, shard-manifest
determinism/balance, quantile-normalization bounds, and DNS-tunnel
verdict edges."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# ------------------------------------------------- EWMA fold (pure Python
# reference mirrored by BOTH the batch F.aggregate fold and the stream op)

def _ewma_walk(counts_by_hour: dict[int, int], lo: int, hi: int,
               scale: int = 1_000_000):
    """The batch oracle's recursive walk, hand-rolled."""
    alerts = []
    s = None
    for h in range(lo, hi + 1):
        x = counts_by_hour.get(h, 0)
        if s is None:
            s = x * scale
            continue
        if x >= 5 and x * scale > 2 * s:
            alerts.append((h, x, s))
        s = ((3 * s) >> 2) + ((x * scale) >> 2)
    return alerts


def test_ewma_stream_matches_walk_across_batches(spark, tmp_path):
    """Hand fixture: a quiet baseline, a long empty gap (zero-folds), and
    a spike — split across two hour-aligned micro-batches. The stream's
    alert rows must equal the hand walk, including the gap decay and the
    exact threshold edge (x*SCALE == 2*s must NOT alert)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from streamalert_spark.streaming.bounded import run_bounded_to_rows
    from streamalert_spark.streaming.decay import (
        EWMA_OUT_SCHEMA, EWMA_SCALE, ewma_alerts_stream,
    )

    lo = 100
    # hour -> count for one type; hour 103 is exactly 2x the running s of
    # 2*SCALE... construct the edge: s after seed 4 then folds
    counts = {100: 4, 101: 4, 102: 4, 106: 9, 110: 40}
    # the fold's input contract is hourly aggregates (event_type, h, x);
    # split hour 106 across two same-batch rows to exercise the
    # partially-combined-upstream summing path
    rows = [(h, x) for h, x in counts.items() if h != 106]
    rows += [(106, 4), (106, 5)]
    b1 = [(h, x) for h, x in rows if h <= 104]
    b2 = [(h, x) for h, x in rows if h > 104]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, batch in enumerate([b1, b2]):
        path = in_dir / f"b{i}.parquet"
        pq.write_table(pa.table({
            "event_type": ["login"] * len(batch),
            "h": [h for h, _ in batch],
            "x": [x for _, x in batch],
        }), path)
        os.utime(path, (1_000_000 + 10 * i,) * 2)
    src = (spark.readStream.schema("event_type string, h bigint, x bigint")
           .option("maxFilesPerTrigger", "1").parquet(str(in_dir)))
    out = ewma_alerts_stream(src, lo_hour=lo)
    got = sorted(
        (r["h"], r["x"], r["s_prev_fp"])
        for r in run_bounded_to_rows(spark, out, EWMA_OUT_SCHEMA).collect())
    want = _ewma_walk(counts, lo, 110, EWMA_SCALE)
    assert got == want
    assert len(got) >= 2  # the fixture must actually alert


def test_ewma_threshold_edge_is_strict():
    """x*SCALE == 2*s_prev must NOT alert (strict >)."""
    scale = 1_000_000
    # seed 4 at lo, then x=8 next hour: s_prev = 4*scale, 8*scale == 2*s
    assert _ewma_walk({0: 4, 1: 8}, 0, 1, scale) == []
    assert _ewma_walk({0: 4, 1: 9}, 0, 1, scale) == [(1, 9, 4 * scale)]


def test_ewma_batch_query_matches_walk(spark):
    """The F.aggregate batch fold reproduces the hand walk on real data."""
    from streamalert_spark.queries import load_all
    from streamalert_spark.session import read_table

    out = load_all()["ewma_control_chart"].fn(spark, SF_DIR).collect()
    ev = read_table(spark, SF_DIR, "events").select(
        "event_type",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
               "00:00:00', ts) DIV 1000000 DIV 3600").alias("h")).collect()
    lo = min(r["h"] for r in ev)
    hi = max(r["h"] for r in ev)
    by_type: dict[str, dict[int, int]] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], {})
        by_type[r["event_type"]][r["h"]] = \
            by_type[r["event_type"]].get(r["h"], 0) + 1
    want = sorted(
        (t, h, x, s)
        for t, counts in by_type.items()
        for h, x, s in _ewma_walk(counts, lo, hi))
    got = sorted((r["event_type"], r["h"], r["x"], r["s_prev_fp"])
                 for r in out)
    assert got == want


# ------------------------------------------------------- link prediction

def test_link_prediction_excludes_edges_and_bounds_jaccard(spark):
    from streamalert_spark.queries import load_all

    rows = load_all()["link_prediction_scores"].fn(spark, SF_DIR).collect()
    assert rows, "top-100 must be non-empty at sf0.001"
    # rebuild the deterministic edge set
    from streamalert_spark.session import read_table
    n = read_table(spark, SF_DIR, "documents").count()
    edges = set()
    for d in range(n):
        for dst in ((d * 2 + 1) % n, (d * 3 + 7) % n):
            if dst != d:
                edges.add((min(d, dst), max(d, dst)))
    for r in rows:
        assert r["a"] < r["c"]
        assert (r["a"], r["c"]) not in edges, "candidate must be a NON-edge"
        assert 1 <= r["cn"]
        assert 0 <= r["jaccard_ppm"] <= 1_000_000


def test_link_prediction_cn_matches_bruteforce(spark):
    """Common-neighbor counts against a brute-force adjacency check."""
    from streamalert_spark.queries import load_all
    from streamalert_spark.session import read_table

    rows = load_all()["link_prediction_scores"].fn(spark, SF_DIR).collect()
    n = read_table(spark, SF_DIR, "documents").count()
    adj: dict[int, set[int]] = {}
    for d in range(n):
        for dst in ((d * 2 + 1) % n, (d * 3 + 7) % n):
            if dst != d:
                adj.setdefault(d, set()).add(dst)
                adj.setdefault(dst, set()).add(d)
    for r in rows[:20]:
        cn = len(adj[r["a"]] & adj[r["c"]])
        assert cn == r["cn"]
        union = len(adj[r["a"]]) + len(adj[r["c"]]) - cn
        assert r["jaccard_ppm"] == (cn * 1_000_000) // union


# --------------------------------------------------- training shard manifest

def test_shard_manifest_dense_positions_and_determinism(spark):
    from streamalert_spark.queries import load_all

    fn = load_all()["training_shard_manifest"].fn
    rows = fn(spark, SF_DIR).collect()
    again = fn(spark, SF_DIR).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r["shard_id"] < 16
        by_shard.setdefault(r["shard_id"], []).append(r["pos"])
    # every shard's positions are dense 1..n (a manifest with holes would
    # break resumable epoch iteration)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # the keyed hash actually spreads: no shard may hold >25% of docs
    total = len(rows)
    assert max(len(p) for p in by_shard.values()) <= total // 4


# ------------------------------------------------- quantile normalization

def test_quantile_normalize_bounds_and_extremes(spark):
    from streamalert_spark.queries import load_all

    rows = load_all()["score_quantile_normalize"].fn(spark, SF_DIR).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        assert 0 <= r["pct_ppm"] <= 1_000_000
        assert 0 <= r["decile"] <= 9
        by_source.setdefault(r["source"], []).append(r)
    for source, rs in by_source.items():
        if len(rs) > 1:
            ppms = sorted(r["pct_ppm"] for r in rs)
            assert ppms[0] == 0 and ppms[-1] == 1_000_000, source
            # normalization is monotone in the underlying score
            ordered = sorted(rs, key=lambda r: (r["n_chars"], r["doc_id"]))
            assert all(a["pct_ppm"] <= b["pct_ppm"]
                       for a, b in zip(ordered, ordered[1:]))


# ------------------------------------------------------- DNS tunneling

def test_dns_tunnel_verdict_classes(spark):
    from streamalert_spark.queries import load_all

    rows = load_all()["dns_tunnel_scores"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r["user_id"] % 4 == 0:
            # 26-hex-char first label: long and digit-heavy -> flagged
            assert r["verdict"] == "tunnel_suspect", r
            assert r["max_label_len"] >= 24
        else:
            assert r["verdict"] == "benign", r
        assert r["n_labels"] >= 3
        assert 0 <= r["digit_ppm"] <= 1_000_000


# ------------------------------------------------------- CUSUM change-points

def _cusum_walk(counts: dict[int, int], lo: int, hi: int, mu: int):
    alerts, s = [], 0
    for h in range(lo, hi + 1):
        x = counts.get(h, 0)
        s_new = max(0, s + x - mu)
        if s <= 4 * mu < s_new:
            alerts.append((h, x, s_new))
        s = s_new
    return alerts


def test_cusum_query_matches_walk(spark):
    from streamalert_spark.queries import load_all
    from streamalert_spark.session import read_table

    out = load_all()["cusum_changepoints"].fn(spark, SF_DIR).collect()
    ev = read_table(spark, SF_DIR, "events").select(
        "event_type",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
               "00:00:00', ts) DIV 1000000 DIV 3600").alias("h")).collect()
    lo = min(r["h"] for r in ev)
    hi = max(r["h"] for r in ev)
    by_type: dict[str, dict[int, int]] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], {})
        by_type[r["event_type"]][r["h"]] = \
            by_type[r["event_type"]].get(r["h"], 0) + 1
    want = sorted(
        (t, h, x, sum(c.values()) // (hi - lo + 1), s)
        for t, c in by_type.items()
        for h, x, s in _cusum_walk(c, lo, hi, sum(c.values()) // (hi - lo + 1)))
    got = sorted((r["event_type"], r["h"], r["x"], r["mu"], r["cusum"])
                 for r in out)
    assert got == want
    assert got, "fixture must produce at least one change-point"


def test_cusum_crossing_is_first_only():
    """A run that stays above the band after crossing alerts ONCE."""
    counts = {0: 0, 1: 10, 2: 10, 3: 10}
    # mu=1: band=4; S walks 0, 9, 18, 27 -> single crossing at h=1
    assert [h for h, _, _ in _cusum_walk(counts, 0, 3, 1)] == [1]


# ------------------------------------------------------- OOV rate

def test_oov_rate_bounds_and_vocab_effect(spark):
    from streamalert_spark.queries import load_all

    rows = load_all()["oov_rate_by_source"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["oov_ppm"] <= 1_000_000
        assert r["n_oov"] <= r["n_tokens"]
        assert r["oov_ppm"] == (r["n_oov"] * 1_000_000) // r["n_tokens"]
    # the 16-token vocab must be smaller than the corpus vocabulary,
    # so SOME source has a non-zero OOV rate (otherwise the audit is
    # degenerate and measures nothing)
    assert any(r["oov_ppm"] > 0 for r in rows)


# ------------------------------------------------------- touch attribution

def test_touch_attribution_conserves_cents(spark):
    from streamalert_spark.queries import load_all

    rows = load_all()["touch_attribution"].fn(spark, SF_DIR).collect()
    assert rows
    saw_attr = saw_unattr = False
    for r in rows:
        assert (r["cents_first_touch"] + r["cents_last_touch"]
                + r["cents_unattributed"]) == r["cents"]
        if r["first_view_us"] is None:
            assert r["cents_unattributed"] == r["cents"]
            assert r["last_view_us"] is None
            saw_unattr = True
        else:
            # 40/60 split, remainder to last touch; last >= first view
            assert r["cents_first_touch"] == (r["cents"] * 2) // 5
            assert r["first_view_us"] <= r["last_view_us"] <= r["us"]
            saw_attr = True
    assert saw_attr  # fixture must exercise the attributed path


# --------------------------------------------------- matryoshka ANN audit

def test_matryoshka_overlap_bounds_and_self_exclusion(spark):
    from streamalert_spark.queries import load_all

    rows = load_all()["ann_matryoshka_audit"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["overlap_at_10"] <= 10
        assert r["top1_full"] != r["probe_id"]  # probe never matches itself
        assert r["top1_half"] != r["probe_id"]
    # truncation must cost SOMETHING somewhere, or the audit is vacuous
    assert any(r["overlap_at_10"] < 10 for r in rows)


# ------------------------------------------------------- password spray

def test_password_spray_thresholds(spark):
    """Every flagged window satisfies both gates, and the gates actually
    EXCLUDE something (run at sf0.01 where spray-shaped windows exist)."""
    from streamalert_spark.queries import load_all
    from streamalert_spark.session import read_table

    sf = "/root/testdata/sf0.01"
    rows = load_all()["password_spray_windows"].fn(spark, sf).collect()
    assert rows, "sf0.01 fixture must flag at least one window"
    for r in rows:
        assert r["n_users"] >= 3
        assert r["max_per_user"] <= 2
        assert r["n_users"] <= r["n_attempts"] <= 2 * r["n_users"]
    # the filter must be doing work: unfiltered windows outnumber flagged
    ev = read_table(spark, sf, "events")
    all_windows = (
        ev.filter((F.col("event_type") == "error")
                  & F.col("user_id").isNotNull())
        .select(F.get_json_object("props", "$.k").alias("src"),
                F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ "
                       "'1970-01-01 00:00:00', ts) DIV 1000000 DIV 86400")
                .alias("d"))
        .distinct().count())
    assert len(rows) < all_windows


# ------------------------------------------------- detections feed example

def test_run_detections_example_composes(spark):
    """The example's normalized feed must union every registered detector
    with the uniform (detector, entity, window_at, measure) schema and
    produce at least one detection from >= 4 distinct detectors."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from examples.run_detections import DETECTORS, normalize
    from streamalert_spark.queries import load_all

    registry = load_all()
    feed = None
    for detector, (qname, entity, when, measure) in DETECTORS.items():
        src = registry[qname].fn(spark, SF_DIR)
        # every configured column must exist on its query's output — a
        # renamed query column would otherwise silently feed NULLs
        for col in (entity, when, measure):
            assert col is None or col in src.columns, (detector, col)
        out = normalize(detector, src, entity, when, measure)
        assert out.columns == ["detector", "entity", "window_at", "measure"]
        feed = out if feed is None else feed.unionByName(out)
    rows = feed.collect()
    detectors_hit = {r["detector"] for r in rows}
    assert len(detectors_hit) >= 4, detectors_hit
    assert all(r["entity"] is not None for r in rows)
    assert all(r["measure"] is not None for r in rows), \
        "a firing detector must carry its signal strength"


# ------------------------------------------------------- bootstrap CI

def test_bootstrap_ci_brackets_point_estimate(spark):
    from streamalert_spark.queries import load_all

    rows = load_all()["bootstrap_ci_means"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["ci_lo_fp"] <= r["point_fp"] <= r["ci_hi_fp"], r
        assert r["ci_lo_fp"] < r["ci_hi_fp"], "degenerate CI"
        assert r["n"] > 0


def test_bootstrap_weights_are_two_coin_flips():
    """The md5-derived multiplier takes each value in {0,1,2} with the
    Binomial(2, 1/2) frequencies (sanity over a large id range)."""
    import hashlib

    odd = set("13579bdf")
    counts = {0: 0, 1: 0, 2: 0}
    for eid in range(4000):
        h = hashlib.md5(f"7:{eid}".encode()).hexdigest()  # noqa: S324
        counts[(h[0] in odd) + (h[1] in odd)] += 1
    assert 0.2 < counts[0] / 4000 < 0.3
    assert 0.45 < counts[1] / 4000 < 0.55
    assert 0.2 < counts[2] / 4000 < 0.3


# ------------------------------------------------------- LPA communities

def test_lpa_communities_partition_nodes(spark):
    """Community sizes must sum to the node count (every node assigned
    exactly one label), and LPA must be strictly finer than one blob:
    more than one community with fewer singletons than components would
    allow."""
    from streamalert_spark.queries import load_all
    from streamalert_spark.session import read_table

    rows = load_all()["lpa_communities"].fn(spark, SF_DIR).collect()
    assert len(rows) >= 2
    n = read_table(spark, SF_DIR, "documents").count()
    # communities of size >= 2 plus the suppressed singletons == all nodes
    covered = sum(r["n_nodes"] for r in rows)
    assert covered <= n
    for r in rows:
        assert r["min_node"] <= r["max_node"]
        assert r["n_nodes"] >= 2
