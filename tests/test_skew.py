"""Skew utilities: salted forms must return exactly the unsalted results."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import heavy


def test_salted_join_matches_plain_join(spark):
    left = spark.range(2000).select(
        # hot key: 0 holds half the rows
        F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame(
        [(0, "hot"), (1, "a"), (3, "b"), (999, "z")], "k long, label string")

    from streamalert_spark.ops.skew import salted_join

    plain = left.join(right, "k").select("k", "v", "label")
    salted = salted_join(left, right, "k", salt=8).select("k", "v", "label")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(0,), (0,), (7,)], "k long")
    right = spark.createDataFrame([(0, "x")], "k long, label string")

    from streamalert_spark.ops.skew import salted_join

    rows = sorted(map(tuple, salted_join(left, right, "k", salt=4, how="left")
                      .select("k", "label").collect()))
    assert rows == [(0, "x"), (0, "x"), (7, None)]


def test_salted_two_stage_agg_matches_plain(spark):
    df = spark.range(10000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v"))

    from streamalert_spark.ops.skew import salted_two_stage_agg

    out = salted_two_stage_agg(
        df, ["k"],
        {
            "cnt": (F.count(F.lit(1)), F.sum("cnt")),
            "total": (F.sum("v"), F.sum("total")),
            "mx": (F.max("v"), F.max("mx")),
        },
        salt=8,
    )
    got = {r["k"]: (r["cnt"], r["total"], r["mx"]) for r in out.collect()}
    want = {r["k"]: (r["cnt"], r["total"], r["mx"]) for r in
            df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"),
                                F.sum("v").alias("total"),
                                F.max("v").alias("mx")).collect()}
    assert got == want


@heavy
def test_kmeans_lloyd_matches_numpy_reference(spark):
    import numpy as np

    from streamalert_spark.ops.similarity import kmeans_lloyd
    from streamalert_spark.session import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = sorted(
        ((r["vec_id"], np.array(r["embedding"], dtype=np.float64))
         for r in emb.collect()),
        key=lambda t: t[0],
    )
    ids = np.array([t[0] for t in rows])
    X = np.stack([t[1] for t in rows])
    k, iters = 8, 3
    cents = X[:k].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)  # argmin ties -> lowest index, same rule
        for ci in range(k):
            if (lab == ci).any():
                cents[ci] = X[lab == ci].mean(axis=0)
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    expect = dict(zip(ids.tolist(), d.argmin(axis=1).tolist()))

    got = {r["vec_id"]: r["cluster"]
           for r in kmeans_lloyd(emb, k=k, iters=iters).collect()}
    mismatch = {i for i in expect if expect[i] != got[i]}
    # float accumulation order differs (numpy pairwise vs Spark sequential)
    # only exactly-on-boundary points could flip; none exist in this data
    assert not mismatch, mismatch


def test_salted_exact_distinct_matches_plain_and_spreads(spark):
    """salted_exact_distinct == plain count_distinct (value-derived salt
    makes per-bucket distincts disjoint), and a hot key's state really
    spreads over multiple salt buckets."""
    from streamalert_spark.ops.skew import _SALT, salted_exact_distinct

    rows = [("hot", i % 500) for i in range(5000)] + [("cold", i) for i in range(7)]
    df = spark.createDataFrame(rows, "k string, v bigint")
    got = {r["k"]: r["n_distinct"]
           for r in salted_exact_distinct(df, ["k"], "v").collect()}
    assert got == {"hot": 500, "cold": 7}

    # the hot key's 500 distinct values occupy many of the 16 buckets
    from pyspark.sql import functions as F
    staged = (
        df.groupBy("k", F.pmod(F.conv(F.substring(F.md5(F.col("v").cast("string")), 1, 4),
                                      16, 10).cast("bigint"), F.lit(16)).alias(_SALT))
        .count().filter(F.col("k") == "hot")
    )
    assert staged.count() >= 12


def test_cdc_apply_changelog_semantics(spark):
    """MERGE semantics: latest-by-seq wins, deletes drop, upserts replace
    or insert, untouched base rows carry through unchanged."""
    from streamalert_spark.ops.cdc import apply_changelog

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string")
    changes = spark.createDataFrame(
        [
            (1, 10, "U", "a2"),   # overwritten below by seq 20
            (1, 20, "U", "a3"),   # latest for key 1 -> wins
            (2, 5, "D", None),    # delete key 2
            (9, 7, "U", "new"),   # insert unseen key
            (3, 1, "D", None),    # deleted ...
            (3, 2, "U", "c2"),    # ... then re-upserted (latest wins)
        ],
        "k bigint, seq bigint, op string, v string")
    got = sorted(
        (r["k"], r["v"])
        for r in apply_changelog(base, changes, ["k"], "seq", "op").collect())
    assert got == [(1, "a3"), (3, "c2"), (9, "new")]


def test_cdc_base_not_shuffled(spark):
    """The base side must reach the anti join without an exchange keyed
    on it beyond the scan (the changelog is the only shuffled input)."""
    from streamalert_spark.ops.cdc import apply_changelog

    base = spark.range(1000).select(F.col("id").alias("k"),
                                    F.col("id").cast("string").alias("v"))
    changes = spark.createDataFrame(
        [(1, 1, "U", "x")], "k bigint, seq bigint, op string, v string")
    plan = (apply_changelog(base, changes, ["k"], "seq", "op")
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_salted_topk_matches_window_topk(spark):
    """Salted two-stage top-k must equal the window definition exactly,
    including under a hot key holding most rows."""
    from pyspark.sql import Window

    from streamalert_spark.ops.skew import salted_topk

    df = spark.range(5000).select(
        F.when(F.col("id") % 10 < 8, F.lit("hot")).otherwise(F.lit("cold")).alias("g"),
        (F.col("id") * 37 % 1000).cast("double").alias("v"),
        F.col("id").alias("rid"),
    )
    got = sorted(
        (r["g"], r["v"], r["rid"], r["rank"])
        for r in salted_topk(df, ["g"], ["v", "rid"], ["v", "rid"], k=5).collect())
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("rid").desc())
    want = sorted(
        (r["g"], r["v"], r["rid"], r["rn"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5).collect())
    assert got == [(g, v, rid, int(rk)) for g, v, rid, rk in want]

def test_salted_topk_hot_key_spreads_buckets(spark):
    """Skew fixture (one key = 50% of all rows): stage 1 must spread the
    hot key's sort across most of the 16 salt buckets — the whole point
    of the two-stage form — and still return the exact window top-k."""
    from pyspark.sql import Window

    from streamalert_spark.ops.skew import salted_topk, topk_salt_parts

    n = 10000
    df = spark.range(n).select(
        # key 'hot' holds exactly half of all rows
        F.when(F.col("id") < n / 2, F.lit("hot"))
         .otherwise(F.concat(F.lit("cold"), (F.col("id") % 97).cast("string")))
         .alias("g"),
        (F.col("id") * 37 % 1000).cast("double").alias("v"),
        F.col("id").alias("rid"),
    )

    _, _, salt_col = topk_salt_parts(["v", "rid"], ["v", "rid"], 16)
    occupied = (
        df.filter(F.col("g") == "hot")
        .groupBy(salt_col.alias("b")).count()
    ).collect()
    assert len(occupied) >= 12, f"hot key in only {len(occupied)} buckets"
    # no bucket hoards the hot key: the largest holds far less than all
    assert max(r["count"] for r in occupied) < 0.25 * n / 2

    got = sorted(
        (r["g"], r["v"], r["rid"], r["rank"])
        for r in salted_topk(df, ["g"], ["v", "rid"], ["v", "rid"], k=4).collect())
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("rid").desc())
    want = sorted(
        (r["g"], r["v"], r["rid"], r["rn"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 4).collect())
    assert got == [(g, v, rid, int(rk)) for g, v, rid, rk in want]


def test_jaccard_prefix_filter_excludes_hot_shingle(spark):
    """The prefix filter's reason to exist: a shingle shared by EVERY doc
    sits last in the (df, shingle) rarity order and must enter (almost)
    no prefix — the hot bucket that makes the all-shared-shingle join
    quadratic never forms — while the output still equals the brute-force
    definition exactly."""
    from streamalert_spark.ops.dedup import (
        _shingle_hash_rows, jaccard_prefix_pairs, ngram_jaccard_pairs,
    )

    # 60 docs, each with a UNIQUE body plus one GLOBAL hot phrase; docs
    # 2i/2i+1 are near-identical pairs
    rows = []
    for i in range(30):
        body = " ".join(f"w{i}x{j}" for j in range(12))
        rows.append((2 * i, f"{body} common hot phrase"))
        rows.append((2 * i + 1, f"{body} tail{i} common hot phrase"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    got = sorted((r["a"], r["b"]) for r in
                 jaccard_prefix_pairs(df, threshold=0.5).collect())
    want = sorted((r["a"], r["b"]) for r in
                  ngram_jaccard_pairs(df, threshold=0.5).collect())
    assert got == want and len(got) >= 30

    # the global 'common hot phrase' 3-gram has df=60 (every doc); count
    # how many prefixes it enters — rarity ordering must keep it out
    from pyspark.sql import Window

    hashed = _shingle_hash_rows(df, "text", "doc_id", 3)
    dfreq = hashed.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "sh")
    plen = F.col("sz") - F.ceil(F.lit(0.5) * F.col("sz")) + 1
    prefix = (hashed.join(dfreq, "sh")
              .withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= plen))
    hot_df = prefix.groupBy("sh").count().orderBy(F.col("count").desc())
    top = hot_df.first()
    # no shingle's prefix bucket covers a large fraction of the corpus
    assert top["count"] <= 12, top


@heavy
def test_kmeans_lloyd_fixed_matches_integer_reference(spark):
    """The fixed-point variant must match an exact integer NumPy replay
    bit-for-bit (no boundary caveat — there is no float accumulation)."""
    import numpy as np

    from streamalert_spark.ops.similarity import (
        KMEANS_FIXED_SCALE, kmeans_lloyd_fixed,
    )
    from streamalert_spark.session import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = sorted(
        ((r["vec_id"], np.array(r["embedding"], dtype=np.float64))
         for r in emb.collect()),
        key=lambda t: t[0],
    )
    ids = [t[0] for t in rows]
    Q = np.floor(np.stack([t[1] for t in rows]) * KMEANS_FIXED_SCALE
                 + 0.5).astype(np.int64)
    k, iters = 8, 3
    cents = Q[:k].copy()
    for _ in range(iters):
        d = ((Q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)  # ties -> lowest index, same rule
        for ci in range(k):
            if (lab == ci).any():
                # integer floor division, exact — matches Spark // and
                # the oracle's posmod identity
                cents[ci] = Q[lab == ci].sum(axis=0) // (lab == ci).sum()
    d = ((Q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    expect = dict(zip(ids, d.argmin(axis=1).tolist()))

    got = {r["vec_id"]: r["cluster"]
           for r in kmeans_lloyd_fixed(emb, k=k, iters=iters).collect()}
    assert got == expect


def test_salted_join_shuffle_path_spreads_hot_key(spark):
    """With broadcast disabled (the large-dim case the op exists for),
    the join must shuffle on (k, salt): the physical partitioning keys
    include the salt column, so the hot key's rows land on multiple
    reducers instead of one straggler."""
    from streamalert_spark.ops.skew import _SALT, salted_join

    left = spark.range(4000).select(
        F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("v"))
    right = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("label"))
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = salted_join(left, right, "k", salt=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert _SALT in plan, plan  # the shuffle key carries the salt
        # and the hot key's rows really occupy multiple salt buckets
        spread = (out.filter(F.col("k") == 0)
                  .select(F.countDistinct(_SALT)).collect()[0][0]
                  if _SALT in out.columns else None)
        if spread is not None:
            assert spread >= 4
    finally:
        if saved is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        else:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_aqe_skew_join_splits_hot_partition(spark):
    """The engine's first line of defense for sort-merge skew is AQE's
    runtime splitting (on in session.py). Force the conditions at test
    scale (tiny advisory/threshold sizes, broadcast disabled) and assert
    the final adaptive plan actually marked the join skew=true — proving
    the conf wiring works, not just that it is set."""
    import re

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(200_000).select(
            F.when(F.col("id") % 4 != 0, F.lit(0)).otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("pad-"), F.col("id").cast("string"),
                     F.lit("x" * 64)).alias("payload"))
        right = spark.range(0, 50_000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("label"))
        out = left.join(right, "k").groupBy("label").count()
        out.collect()  # AQE decides at runtime — run it
        final = out._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"SortMergeJoin.*skew=true", final)
        assert m, final[:4000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)
