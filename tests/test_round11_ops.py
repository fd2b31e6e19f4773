"""Round-11 pins: the two ADVICE overflow-headroom fixes must hold at row
counts where the OLD arithmetic diverged between engines (Spark wrapping
int64 silently, DuckDB erroring or carrying HUGEINT). Bench SFs never reach
those counts, so these tests build the hot arithmetic directly at
overflow-forcing magnitudes and demand bit-identical answers from both
engines."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamalert_spark.queries.warehouse_ext import _AE_DIGEST_MOD
from streamalert_spark.session import local_rows_df

from tests.conftest import heavy


def test_antientropy_digest_exact_past_int64_wrap(spark, duck):
    """A bucket whose 48-bit-prefix sum exceeds int64 (the ADVICE scenario:
    ~2^15 rows/bucket) must yield the SAME mod-2^62 digest in both engines.
    300k values near 2^47 sum to ~2^65 — a plain BIGINT sum wraps in Spark
    and errors in DuckDB; the exact wide sum + explicit modulus agrees."""
    n = 300_000
    base = (1 << 47) + 12345
    # Deterministic value stream with spread low bits, all < 2^48.
    values = [(base + (i * 2654435761) % (1 << 30)) for i in range(n)]
    py_digest = sum(values) % _AE_DIGEST_MOD
    assert sum(values) > (1 << 63), "fixture must actually exceed int64"

    sdf = spark.range(n).select(
        (F.lit(base)
         + (F.col("id") * F.lit(2654435761)) % F.lit(1 << 30)).alias("hi"))
    got_spark = sdf.agg(
        (F.sum(F.col("hi").cast("decimal(38,0)"))
         % F.lit(_AE_DIGEST_MOD)).cast("bigint").alias("d")).collect()[0]["d"]

    got_duck = duck.execute(
        f"SELECT CAST(SUM(v) % {_AE_DIGEST_MOD} AS BIGINT) FROM ("
        f"  SELECT {base} + (CAST(i AS BIGINT) * 2654435761) % {1 << 30} AS v"
        f"  FROM range({n}) t(i))").fetchone()[0]

    assert got_spark == py_digest == got_duck


def test_cuped_adjustment_exact_past_int64_product(spark, duck):
    """theta_fp * (mean_x_fp - mean_x_all_fp) beyond int64 (high per-user
    pre-period spend): the widened DECIMAL(38,0)/HUGEINT adjustment must
    produce the same truncated quotient in both engines — including the
    negative-gap direction, which exercises truncate-toward-zero."""
    cases = [  # (mean_y_fp, theta_fp, mean_x_fp, mean_x_all_fp)
        (10**18, 900_000, 4 * 10**18 // 3, 10**17),
        (10**15, 1_250_000, 10**17, 9 * 10**17),   # negative gap
        (-(10**15), 700_000, 10**16, 8 * 10**18),  # deeply negative adj
    ]
    expected = []
    for y, t, x, xa in cases:
        prod = t * (x - xa)
        assert abs(prod) > (1 << 63), "fixture must exceed int64"
        q = abs(prod) // 1_000_000
        expected.append(y - (q if prod >= 0 else -q))

    sdf = local_rows_df(
        spark, cases,
        "mean_y_fp long, theta_fp long, mean_x_fp long, mean_x_all_fp long")
    got_spark = [r["adj"] for r in sdf.select(
        F.expr("CAST(CAST(mean_y_fp AS DECIMAL(38,0)) "
               "- (CAST(theta_fp AS DECIMAL(38,0)) "
               "* (CAST(mean_x_fp AS DECIMAL(38,0)) "
               "- CAST(mean_x_all_fp AS DECIMAL(38,0)))) "
               "DIV 1000000 AS BIGINT)").alias("adj")).collect()]

    got_duck = [duck.execute(
        f"SELECT CAST(CAST({y} AS HUGEINT) - (CAST({t} AS HUGEINT) "
        f"* (CAST({x} AS HUGEINT) - CAST({xa} AS HUGEINT))) // 1000000 "
        f"AS BIGINT)").fetchone()[0] for y, t, x, xa in cases]

    assert got_spark == expected == got_duck


def test_cross_source_gram_matrix_v2_matches_legacy_self_join(spark):
    """The one-shuffle collect_set rewrite became the registered
    cross_source_ngram_matrix body in r12; this pin keeps the legacy
    distinct + gram self-join shape as an independent witness so the
    rewrite stays output-identical on real data."""
    from streamalert_spark.queries.curation_ext import (
        cross_source_ngram_matrix,
    )
    from streamalert_spark.session import read_table

    sf_dir = "/root/testdata/sf0.001"
    new = {(r["source_a"], r["source_b"]): r["n_shared_grams"]
           for r in cross_source_ngram_matrix(spark, sf_dir).collect()}

    docs = read_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    idx = F.when(F.size(toks) >= 4,
                 F.sequence(F.lit(1), F.size(toks) - 3)).otherwise(
                     F.array().cast("array<int>"))
    grams = (
        docs.select(F.col("source"), toks.alias("w"),
                    F.explode(idx).alias("i"))
        .select("source",
                F.concat_ws(" ", F.element_at("w", F.col("i")),
                            F.element_at("w", F.col("i") + 1),
                            F.element_at("w", F.col("i") + 2),
                            F.element_at("w", F.col("i") + 3)).alias("gram"))
        .distinct()
    )
    a, b = grams.alias("a"), grams.alias("b")
    legacy = {(r["source_a"], r["source_b"]): r["n_shared_grams"] for r in (
        a.join(b, (F.col("a.gram") == F.col("b.gram"))
               & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("source_a"),
                 F.col("b.source").alias("source_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_grams"))
        .collect())}
    assert legacy == new and len(new) > 0


@heavy
def test_space_saving_bounds_hold_under_any_partitioning(spark):
    """Staged r12 op: the space-saving summary's estimates move with the
    physical partitioning, but its guarantees must not — est <= true <=
    est_hi for every emitted key, and every key whose true frequency
    dwarfs the trim budget must surface with an exact count."""
    from streamalert_spark.ops.sketch import (
        space_saving_summary,
        space_saving_topk,
    )

    heavy = [(f"hh{i}", 2000) for i in range(5)]
    df = spark.range(10_000).selectExpr(
        "concat('tail', id) AS key").union(
        spark.range(5 * 2000).selectExpr(
            "concat('hh', id % 5) AS key"))
    exact = {r["key"]: r["c"] for r in
             df.groupBy("key").agg(F.count("*").alias("c")).collect()}

    for parts in (4, 32):
        rows = space_saving_summary(
            df.repartition(parts), "key", k=64).collect()
        got = {r["key"]: r for r in rows}
        for key, r in got.items():
            assert r["est"] <= exact[key] <= r["est_hi"], (parts, key)
        for key, true_c in heavy:
            assert key in got, (parts, key)
            # 2000 occurrences over <=32 partitions always rank in each
            # partition's top-64 against singleton tails -> exact est.
            assert got[key]["est"] == true_c
            assert got[key]["err_hi"] <= parts

    top = space_saving_topk(df.repartition(8), "key", k=64, top=5).collect()
    assert sorted(r["key"] for r in top) == sorted(k for k, _ in heavy)


@heavy
def test_profile_sketched_scalable_is_output_identical(spark):
    """Staged r12 op: the two-phase k-min rewrite (parallelism = columns
    x partitions, found after the sf10->sf100 decade measured the
    single-window original at 14.2x) must reproduce profile_sketched
    row-for-row — including columns with fewer than k distincts and
    all-NULL columns — under multiple partitionings."""
    from streamalert_spark.ops.profile import (
        profile_sketched,
        profile_sketched_scalable,
    )
    from streamalert_spark.queries.analytics_sketch import _LINEITEM_SPEC
    from streamalert_spark.session import read_table

    li = read_table(spark, "/root/testdata/sf0.01", "lineitem")
    want = sorted(tuple(r) for r in
                  profile_sketched(li, _LINEITEM_SPEC).collect())
    for parts in (3, 32):
        got = sorted(tuple(r) for r in profile_sketched_scalable(
            li.repartition(parts), _LINEITEM_SPEC).collect())
        assert got == want

    edge = spark.range(100).selectExpr(
        "CAST(id % 5 AS BIGINT) AS few",          # nd < k
        "CAST(NULL AS STRING) AS all_null",
        "CAST(id AS DOUBLE) / 7 AS many")
    spec = {"few": "int", "all_null": "string", "many": "double"}
    want_e = sorted(tuple(r) for r in profile_sketched(edge, spec).collect())
    got_e = sorted(tuple(r) for r in profile_sketched_scalable(
        edge.repartition(8), spec).collect())
    assert got_e == want_e


def test_score_quantile_rank_arithmetic_past_int32(spark, tmp_path, duck):
    """The sf1 parity sweep caught (r * 1000000) overflowing int32 once a
    source holds >2148 docs (ANSI Spark errors; DuckDB's BIGINT
    row_number does not). Force the boundary with a 3000-doc source and
    demand the fixed query both RUNS and hash-matches the oracle."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from streamalert_spark.queries import load_all

    n = 3000
    tbl = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(["w"] * n),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["big"] * n),
        "n_chars": pa.array([(i * 37) % 500 for i in range(n)],
                            type=pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    rq = load_all()["score_quantile_normalize"]
    got = sorted(tuple(r) for r in rq.fn(spark, str(tmp_path)).collect())
    con = __import__("duckdb").connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = sorted(tuple(r) for r in con.execute(rq.oracle).fetchall())
    assert len(got) == n and got == want
    # the boundary itself: max ppm must be exactly 1e6 (r = n-1)
    assert max(r[3] for r in got) == 1_000_000
