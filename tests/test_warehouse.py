"""SCD2 dimension maintenance: compression, interval closure, and the
point-in-time join contract (exactly one version per probe)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _t(s: str):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_scd2_compresses_unchanged_and_closes_intervals(spark):
    from streamalert_spark.ops.scd import scd2_from_changelog

    changes = spark.createDataFrame(
        [
            (1, "a", _t("2024-01-01 00:00:00")),
            (1, "a", _t("2024-01-01 01:00:00")),  # unchanged -> no new version
            (1, "b", _t("2024-01-01 02:00:00")),
            (1, "a", _t("2024-01-01 03:00:00")),  # back to a -> NEW version
            (2, "x", _t("2024-01-01 00:30:00")),
        ],
        "k bigint, v string, ts timestamp")
    rows = sorted(
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_from_changelog(changes, ["k"], ["v"], "ts").collect())
    assert rows == [
        (1, "a", _t("2024-01-01 00:00:00"), _t("2024-01-01 02:00:00"), 0),
        (1, "a", _t("2024-01-01 03:00:00"), None, 1),
        (1, "b", _t("2024-01-01 02:00:00"), _t("2024-01-01 03:00:00"), 0),
        (2, "x", _t("2024-01-01 00:30:00"), None, 1),
    ]


def test_point_in_time_join_exactly_one_version_per_probe(spark):
    from streamalert_spark.ops.scd import point_in_time_join, scd2_from_changelog

    changes = spark.createDataFrame(
        [
            (1, "old", _t("2024-01-01 00:00:00")),
            (1, "new", _t("2024-01-02 00:00:00")),
        ],
        "k bigint, v string, ts timestamp")
    hist = scd2_from_changelog(changes, ["k"], ["v"], "ts").drop("is_current")
    probes = spark.createDataFrame(
        [
            (10, 1, _t("2024-01-01 12:00:00")),  # inside first interval
            (11, 1, _t("2024-01-02 00:00:00")),  # boundary: new interval is closed-open
            (12, 1, _t("2023-12-31 00:00:00")),  # before any version -> no match
            (13, 2, _t("2024-01-01 12:00:00")),  # unknown key -> no match
        ],
        "pid bigint, k bigint, pts timestamp")
    got = {r["pid"]: r["v"]
           for r in point_in_time_join(probes, hist, ["k"], "pts").collect()}
    assert got == {10: "old", 11: "new"}


def test_compaction_plan_bins_and_order_preserved(spark):
    """Sequential packing: bins must cover contiguous order ranges and
    each bin opens exactly when accumulated bytes cross the target."""
    from streamalert_spark.ops.layout import compaction_plan

    sizes = [60, 60, 60, 10, 100, 5]  # cum_before: 0,60,120,180,190,290
    rows = [("p", i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "part string, seq bigint, bytes bigint")
    got = {r["seq"]: r["bin"]
           for r in compaction_plan(df, "part", "seq", "bytes", 100).collect()}
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 1, 5: 2}


def test_cdc_incremental_equals_oneshot(spark):
    """Splitting a changelog into seq-ordered batches and applying them
    incrementally must produce the same snapshot as one-shot apply —
    the property the streaming foreachBatch loop relies on."""
    import hashlib as _h

    from streamalert_spark.ops.cdc import apply_changelog

    base = spark.createDataFrame(
        [(k, f"base-{k}") for k in range(20)], "k bigint, v string")
    # deterministic pseudo-random changelog: 60 changes over 25 keys
    changes = []
    for seq in range(60):
        digest = _h.md5(f"cdc-{seq}".encode()).hexdigest()  # noqa: S324
        key = int(digest[:4], 16) % 25
        op = "D" if int(digest[4], 16) < 4 else "U"
        changes.append((key, seq, op, f"v{seq}"))
    schema = "k bigint, seq bigint, op string, v string"
    full = spark.createDataFrame(changes, schema)
    oneshot = sorted(
        (r["k"], r["v"])
        for r in apply_changelog(base, full, ["k"], "seq", "op").collect())
    snap = base
    for lo, hi in ((0, 20), (20, 40), (40, 60)):
        batch = spark.createDataFrame(
            [c for c in changes if lo <= c[1] < hi], schema)
        snap = apply_changelog(snap, batch, ["k"], "seq", "op")
    incremental = sorted((r["k"], r["v"]) for r in snap.collect())
    assert incremental == oneshot


def test_profile_is_single_scan(spark, tmp_path):
    """The table profile must read its parquet input exactly once — one
    scan plus the multi-distinct Expand, never one scan per column."""
    from streamalert_spark.ops.profile import profile

    p = str(tmp_path / "t.parquet")
    spark.range(100).selectExpr(
        "id AS a", "CAST(id % 7 AS STRING) AS b",
        "CAST(id AS DOUBLE) / 3 AS c").write.parquet(p)
    df = spark.read.parquet(p)
    plan = (profile(df, {"a": "int", "b": "string", "c": "double"})
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Scan parquet") == 1, plan


def test_bloom_member_is_pure_expression(spark):
    """Bloom membership must compile to expressions only — no join, no
    shuffle, no Python — so it can sit inside a fact-scan filter."""
    from streamalert_spark.ops.bloom import bloom_bitmap, bloom_member

    keys = spark.createDataFrame([(str(v),) for v in range(10)], "key string")
    bitmap = bloom_bitmap(keys, "key", m=128, k=3)
    probe = spark.range(1000).select(F.col("id").cast("string").alias("key"))
    plan = (probe.filter(bloom_member(F.col("key"), bitmap, k=3))
            ._jdf.queryExecution().executedPlan().toString())
    for bad in ("Exchange", "Join", "BatchEvalPython"):
        assert bad not in plan, plan


def test_new_ops_empty_input_behavior(spark):
    """Empty inputs must degrade cleanly: profile still emits one row per
    column (zero counts, NULL min/max), CDC with an empty changelog is
    the identity, compaction of no files is empty, SCD2 of an empty
    changelog is empty."""
    from streamalert_spark.ops.cdc import apply_changelog
    from streamalert_spark.ops.layout import compaction_plan
    from streamalert_spark.ops.profile import profile
    from streamalert_spark.ops.scd import scd2_from_changelog

    empty_docs = spark.createDataFrame([], "a bigint, b string")
    prof = profile(empty_docs, {"a": "int", "b": "string"}).collect()
    assert {(r["column_name"], r["n_rows"], r["null_count"], r["n_distinct"],
             r["min_value"]) for r in prof} == {("a", 0, 0, 0, None),
                                                ("b", 0, 0, 0, None)}

    base = spark.createDataFrame([(1, "a")], "k bigint, v string")
    no_changes = spark.createDataFrame([], "k bigint, seq bigint, op string, v string")
    assert [tuple(r) for r in
            apply_changelog(base, no_changes, ["k"], "seq", "op").collect()] == [(1, "a")]

    no_files = spark.createDataFrame([], "part string, seq bigint, bytes bigint")
    assert compaction_plan(no_files, "part", "seq", "bytes", 100).count() == 0
    assert scd2_from_changelog(no_changes, ["k"], ["v"], "seq").count() == 0


def test_salted_topk_bounded_state_plan(spark):
    """Stage 1 must rank inside (key, salt) partitions — the hot key's
    sort spreads over salt buckets (the partitioning carries the salt
    column) and nothing range-partitions or collects a group into an
    in-memory array buffer."""
    from streamalert_spark.ops.skew import salted_topk

    df = spark.createDataFrame(
        [("g", float(i), i) for i in range(100)], "g string, v double, rid bigint")
    plan = (salted_topk(df, ["g"], ["v", "rid"], ["v", "rid"], k=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "_sa_salt" in plan, plan          # stage-1 partitioning is salted
    assert "RangePartitioning" not in plan, plan
    assert "collect_list" not in plan, plan  # no unbounded array buffers


def test_snapshot_diff_round_trip(spark):
    """apply(diff(old, new)) onto old must reproduce new exactly —
    the theorem that makes snapshot-diff a valid CDC bootstrap."""
    from streamalert_spark.ops.cdc import apply_changelog, snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k bigint, v string, x double")
    new = spark.createDataFrame(
        [(1, "a", 10.0),        # unchanged
         (2, "b2", 20.0),       # value changed
         (4, "d", 41.0),        # other column changed
         (9, "new", 90.0)],     # inserted; key 3 deleted
        "k bigint, v string, x double")
    diff = snapshot_diff(old, new, ["k"])
    ops = {r["k"]: r["op"] for r in diff.collect()}
    assert ops == {2: "U", 3: "D", 4: "U", 9: "I"}
    changelog = diff.select(
        "k", F.monotonically_increasing_id().alias("seq"),
        F.when(F.col("op") == "D", "D").otherwise("U").alias("op"),
        F.col("new_v").alias("v"), F.col("new_x").alias("x"))
    rebuilt = sorted(tuple(r) for r in apply_changelog(
        old, changelog, ["k"], "seq", "op").collect())
    assert rebuilt == sorted(tuple(r) for r in new.collect())

def test_snapshot_diff_key_only_tables(spark):
    """Diffing two pure membership sets (every column a key) must emit
    I/D rows via anti-joins instead of crashing on an empty value
    struct; 'U' is impossible with no payload."""
    from streamalert_spark.ops.cdc import snapshot_diff

    old = spark.createDataFrame([(1,), (2,), (3,)], "k bigint")
    new = spark.createDataFrame([(2,), (3,), (9,)], "k bigint")
    diff = sorted(tuple(r) for r in snapshot_diff(old, new, ["k"]).collect())
    assert diff == [(1, "D"), (9, "I")]


def test_profile_sketched_keeps_all_null_columns(spark):
    """An all-NULL column is the canonical broken drop a profile exists
    to surface — it must appear with null_count = n_rows, distinct 0,
    on BOTH engines, not vanish from the report."""
    import duckdb

    from streamalert_spark.ops.profile import (
        profile_sketched, profile_sketched_oracle_sql,
    )

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, None)], "a int, b string")
    rows = {r["column_name"]: r for r in
            profile_sketched(df, {"a": "int", "b": "string"}).collect()}
    assert set(rows) == {"a", "b"}
    assert rows["b"]["null_count"] == 3
    assert rows["b"]["exact_distinct"] == 0
    assert rows["b"]["kmv_distinct"] == 0.0
    assert rows["b"]["kth_min_hash"] is None

    con = duckdb.connect()
    con.execute("CREATE TABLE t (a INTEGER, b VARCHAR)")
    con.execute("INSERT INTO t VALUES (1, NULL), (2, NULL), (3, NULL)")
    duck = {r[0]: r for r in con.execute(
        profile_sketched_oracle_sql("t", {"a": "int", "b": "string"})
    ).fetchall()}
    assert set(duck) == {"a", "b"}
    assert duck["b"][2] == 3 and duck["b"][5] == 0


def test_winnowing_survives_short_docs(spark):
    """Docs with fewer tokens than one k-gram must contribute nothing —
    not crash the ANSI array index (sequence counts DOWN below n)."""
    from streamalert_spark.queries import load_all
    import duckdb

    # patch a short doc in by unioning with the real table via a temp dir
    import tempfile, shutil, os
    work = tempfile.mkdtemp(prefix="winnow_short_")
    try:
        src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        extra = spark.createDataFrame(
            [(990001, "one two", "en", "srcX", 7),
             (990002, "", "en", "srcX", 0)],
            src.schema)
        src.unionByName(extra).write.parquet(f"{work}/documents.parquet")
        out = load_all()["winnowing_fingerprints"].fn(spark, work).collect()
        ids = {r["doc_id"] for r in out}
        assert 990001 not in ids and 990002 not in ids and len(ids) > 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
