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
