"""Scheduled-query, rule-promotion, and multimodal-op tests."""

from __future__ import annotations

import json
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from streamalert_spark.sql.scheduled import (
    QueryPack,
    QueryPackRepository,
    ScheduledQueryRunner,
    generate_time_parameters,
)


def test_time_macros():
    """query_packs/parameters.py:31-76 — fixed macro table."""
    now = datetime(2024, 3, 15, 12, 30, 45, tzinfo=timezone.utc)
    p = generate_time_parameters(now)
    assert p["utcdatehour"] == "2024-03-15-12"
    assert p["utcdatehour_minus1hour"] == "2024-03-15-11"
    assert p["utcdatehour_minus2hour"] == "2024-03-15-10"
    assert p["utcdatehour_minus1day"] == "2024-03-14-12"
    assert p["utcdatehour_minus7day"] == "2024-03-08-12"
    assert p["utcisotime"] == "2024-03-15T12:30:45Z"
    assert p["utctimestamp"] == str(int(now.timestamp()))


def test_query_pack_param_substitution(spark):
    """configuration.py:40-58 — str.format substitution + callable params."""
    pack = QueryPack(
        name="p1", description="d",
        query="SELECT '{utcdatehour}' AS dt, '{custom}' AS c",
        tags=["hourly"],
        custom_params={"custom": lambda: "xyz"},
    )
    sql = pack.generate_query_string(generate_time_parameters(
        datetime(2024, 1, 1, 5, tzinfo=timezone.utc)))
    assert sql == "SELECT '2024-01-01-05' AS dt, 'xyz' AS c"


def test_scheduled_runner_and_feedback(spark):
    """One tick: tag-selected packs run, results feed back as
    streamquery-shaped records the classifier can parse."""
    spark.createDataFrame(
        [("r1", 3), ("r2", 5)], "rule string, n int"
    ).createOrReplaceTempView("counts_src")

    repo = QueryPackRepository()
    repo.register(QueryPack(
        name="counts", description="alert counts",
        query="SELECT rule, SUM(n) AS total FROM counts_src GROUP BY rule",
        tags=["hourly"],
    ))
    repo.register(QueryPack(
        name="ignored", description="off-tag",
        query="SELECT 1 AS one", tags=["daily"],
    ))

    runner = ScheduledQueryRunner(spark, repo)
    results = runner.run(tags=["hourly"])
    assert set(results) == {"counts"}
    df, execution = results["counts"]
    assert {r["rule"] for r in df.collect()} == {"r1", "r2"}
    assert execution["name"] == "counts"
    assert execution["engine_execution_time_in_millis"] >= 0

    feedback = runner.to_streamquery_records(results)
    rec = json.loads(feedback.collect()[0]["value"])
    assert rec["streamquery_schema_version"] == "1.0.0"
    assert rec["data"]["count"] == 2
    assert set(rec["data"]["headers"]) == {"rule", "total"}

    # the feedback record classifies under a streamquery-shaped schema
    from streamalert_spark.classify.classifier import Classifier
    from streamalert_spark.schema.registry import LogSchema, SchemaRegistry

    reg = SchemaRegistry()
    reg.register(LogSchema(
        name="streamquery:1.0.0",
        schema={"streamquery_schema_version": "string",
                "execution": {}, "data": {}},
    ))
    batch = Classifier(reg).classify(feedback, raw_col="value")
    assert batch.by_log_type["streamquery:1.0.0"].count() == 1


def test_duplicate_pack_rejected():
    repo = QueryPackRepository()
    repo.register(QueryPack(name="a", description="", query="SELECT 1"))
    with pytest.raises(ValueError):
        repo.register(QueryPack(name="a", description="", query="SELECT 2"))


# ------------------------------------------------------------- promotion

def test_rule_promotion(spark):
    from streamalert_spark.sql.promotion import (
        StagingInfo,
        alert_counts_since,
        digest,
        promotable_rules,
    )

    alerts = spark.createDataFrame(
        [("noisy", "2024-01-01-05"), ("noisy", "2024-01-01-06"),
         ("noisy", "2024-01-01-03"),  # before staging -> excluded
         ("other", "2024-01-01-05")],
        "rule_name string, dt string",
    )
    staged = [StagingInfo("noisy", "2024-01-01-04"), StagingInfo("quiet", "2024-01-01-04")]
    counts = alert_counts_since(spark, alerts, staged)
    got = {r["rule_name"]: r["alert_count"] for r in counts.collect()}
    assert got == {"noisy": 2, "quiet": 0}
    assert promotable_rules(counts, threshold=0) == ["quiet"]
    assert digest(counts).splitlines()[0] == "noisy: 2 alerts"


# ------------------------------------------------------------- multimodal

def test_multimodal_metadata_and_features(spark):
    from streamalert_spark.ops.multimodal import (
        attach_binary_metadata,
        extract_image_features,
    )

    df = spark.createDataFrame(
        [("m1", "image", bytearray(b"payload-one"), "image/png"),
         ("m2", "image", bytearray(b"payload-two-longer"), "image/jpeg")],
        "media_id string, modality string, content binary, mime_type string",
    )
    meta = attach_binary_metadata(df)
    rows = {r["media_id"]: r for r in meta.collect()}
    assert rows["m1"]["n_bytes"] == 11
    assert len(rows["m1"]["sha"]) == 64

    feats = extract_image_features(df)
    frows = {r["media_id"]: r for r in feats.collect()}
    assert set(feats.columns) == {"media_id", "n_bytes", "sha", "width", "height", "mean_luma"}
    assert 64 <= frows["m1"]["width"] <= 255
    assert frows["m2"]["n_bytes"] == 18
    # deterministic fake: same payload -> same features
    feats2 = {r["media_id"]: r for r in extract_image_features(df).collect()}
    assert feats2["m1"]["width"] == frows["m1"]["width"]


def test_frame_sample_plan(spark):
    from streamalert_spark.ops.multimodal import frame_sample_plan

    df = spark.createDataFrame([("v1", 35)], "media_id string, duration_s int")
    plan = frame_sample_plan(df, every_n_seconds=10)
    ts = [r["frame_ts"] for r in plan.collect()]
    assert ts == [0, 10, 20]


def test_multimodal_resize_and_audio(spark):
    """Resize arithmetic + audio duration are real; decode is stubbed —
    schema, batch shape, and Arrow plumbing are the tested surface."""
    from pyspark.sql import functions as F

    from streamalert_spark.ops.multimodal import (
        extract_audio_features, resize_images,
    )

    media = spark.createDataFrame(
        [("m1", bytearray(b"x" * 64000)), ("m2", bytearray(b"hello")), ("m3", None)],
        "media_id string, content binary",
    )
    resized = {r["media_id"]: r for r in resize_images(media, max_side=100).collect()}
    r1 = resized["m1"]
    assert r1["src_width"] >= 64 and r1["src_height"] >= 64
    assert max(r1["width"], r1["height"]) <= 100
    # aspect preserved within integer truncation
    assert abs(r1["width"] / r1["height"] - r1["src_width"] / r1["src_height"]) < 0.05
    assert resized["m3"]["width"] == 0  # null payload -> zero dims

    audio = {r["media_id"]: r for r in
             extract_audio_features(media, bytes_per_second=32000).collect()}
    assert audio["m1"]["duration_s"] == 2.0
    assert audio["m2"]["n_bytes"] == 5 and 0.0 <= audio["m2"]["rms"] <= 1.0
    assert audio["m3"]["sha"] == "" and audio["m3"]["duration_s"] == 0.0


def test_connected_components_chain_and_islands(spark):
    """a~b~c collapses to one component (the transitive closure the
    greedy resolution skips); disjoint pairs stay separate."""
    from streamalert_spark.ops.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        "a bigint, b bigint",
    )
    got = {r["doc_id"]: r["component_id"]
           for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_long_chain_converges(spark):
    """Large-star/small-star round bound: a 65-node chain (diameter 64)
    must converge within 8 rounds — min-label propagation would need 64,
    so the O(log n) alternating algorithm is what makes this pass."""
    from streamalert_spark.ops.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "a bigint, b bigint")
    got = connected_components(pairs, max_iterations=8).collect()
    assert {r["component_id"] for r in got} == {0}
    assert len(got) == 65


def test_ngram_overlap_flags_semantics(spark):
    """Only train docs sharing a 3-gram with the eval set are flagged,
    counting distinct shared shingles."""
    from streamalert_spark.ops.curation import ngram_overlap_flags

    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id bigint, text string")
    train = spark.createDataFrame(
        [(1, "the quick brown fox sleeps"),   # shares 2 shingles
         (2, "a wholly different sentence here"),
         (3, "quick brown fox jumps high")],  # shares 2 shingles
        "doc_id bigint, text string")
    got = {r["doc_id"]: r["n_shared_shingles"]
           for r in ngram_overlap_flags(train, eval_df).collect()}
    assert got == {1: 2, 3: 2}


def test_stratified_sample_deterministic_and_rate(spark):
    from streamalert_spark.ops.curation import stratified_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr") for i in range(2000)],
        "doc_id bigint, lang string")
    once = sorted(r["doc_id"] for r in
                  stratified_sample(df, {"en": 0.3}).collect())
    twice = sorted(r["doc_id"] for r in
                   stratified_sample(df, {"en": 0.3}).collect())
    assert once == twice                      # deterministic
    en_kept = sum(1 for i in once if i % 2 == 0)
    assert 0.2 < en_kept / 1000 < 0.4        # ~30% of the 1000 en rows
    assert sum(1 for i in once if i % 2 == 1) == 1000  # fr untouched


def test_stratified_sample_is_zero_shuffle(spark):
    from streamalert_spark.ops.curation import stratified_sample

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
    plan = stratified_sample(df, {"en": 0.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_cap_per_group_keeps_first_k(spark):
    from streamalert_spark.ops.curation import cap_per_group

    df = spark.createDataFrame(
        [(f"s{i % 3}", i) for i in range(30)], "source string, doc_id bigint")
    got = sorted((r["source"], r["doc_id"], r["rank"])
                 for r in cap_per_group(df, "source", "doc_id", k=2).collect())
    assert got == [("s0", 0, 1), ("s0", 3, 2),
                   ("s1", 1, 1), ("s1", 4, 2),
                   ("s2", 2, 1), ("s2", 5, 2)]


def test_connected_components_matches_union_find(spark):
    """Randomized cross-check: the distributed min-label propagation
    agrees with a driver-side union-find on seeded random graphs."""
    import random

    def union_find_components(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in nodes}

    from streamalert_spark.ops.dedup import connected_components

    for seed in (7, 21, 99):
        rng = random.Random(seed)
        edges = sorted({(rng.randrange(40), rng.randrange(40))
                        for _ in range(30) if True})
        edges = [(a, b) for a, b in edges if a != b]
        nodes = sorted({n for e in edges for n in e})
        pairs = spark.createDataFrame(edges, "a bigint, b bigint")
        got = {r["doc_id"]: r["component_id"]
               for r in connected_components(pairs).collect()}
        want = union_find_components(edges, nodes)
        assert got == want, f"seed {seed}: {got} != {want}"


def test_streamquery_feedback_row_and_byte_caps(spark):
    """kinesis.py:69-77 — the transport's 1 MB record cap, pinned in code:
    oversized result sets truncate deterministically (bounded collect via
    LIMIT max_rows+1; tail-trim to max_bytes) and flag data.truncated."""
    repo = QueryPackRepository()
    repo.register(QueryPack(
        name="big", description="d",
        query="SELECT id, repeat('x', 50) AS pad FROM range(1000) ORDER BY id",
        tags=["hourly"],
    ))
    runner = ScheduledQueryRunner(spark, repo)
    results = runner.run(tags=["hourly"])

    # row cap: only max_rows rows survive, record flags truncation
    rec = json.loads(
        runner.to_streamquery_records(results, max_rows=10).collect()[0]["value"]
    )
    assert rec["data"]["count"] == 10
    assert rec["data"]["truncated"] is True
    assert len(rec["data"]["rows"]) == 10

    # byte cap: serialized record fits max_bytes, trimming from the tail
    results = runner.run(tags=["hourly"])
    raw = runner.to_streamquery_records(
        results, max_rows=1000, max_bytes=5000
    ).collect()[0]["value"]
    assert len(raw.encode()) <= 5000
    rec = json.loads(raw)
    assert rec["data"]["truncated"] is True
    assert rec["data"]["count"] == len(rec["data"]["rows"]) > 0
    # kept rows are the PREFIX of the result (tail-trimmed)
    assert [r["id"] for r in rec["data"]["rows"]] == [str(i) for i in range(rec["data"]["count"])]

    # under both caps: record unchanged, no truncated key
    results = runner.run(tags=["hourly"])
    rec = json.loads(runner.to_streamquery_records(results).collect()[0]["value"])
    assert rec["data"]["count"] == 1000
    assert "truncated" not in rec["data"]


def test_streamquery_oversized_envelope_refuses(spark):
    """A pack whose execution metadata alone exceeds max_bytes cannot be
    fixed by row trimming — the serializer must refuse deterministically
    (the transport's put would reject the record anyway)."""
    repo = QueryPackRepository()
    repo.register(QueryPack(
        name="huge_envelope",
        description="d" * 6000,  # envelope > max_bytes by itself
        query="SELECT 1 AS one",
        tags=["hourly"],
    ))
    runner = ScheduledQueryRunner(spark, repo)
    results = runner.run(tags=["hourly"])
    with pytest.raises(ValueError, match="exceeds 5000 bytes"):
        runner.to_streamquery_records(results, max_bytes=5000)
