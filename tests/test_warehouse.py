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
