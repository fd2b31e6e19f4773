"""Skew utilities: salted forms must return exactly the unsalted results."""

from __future__ import annotations

from pyspark.sql import functions as F


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
