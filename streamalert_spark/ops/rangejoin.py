"""Bucketed range join — point-in-interval joins (event in maintenance
window, IP in range, reading in calibration period) without the
nested-loop plan Spark produces for a raw BETWEEN condition.

The trick: pick a bucket width >= the longest interval, explode each
interval into the buckets it overlaps (<= 2 when width >= interval
length), bucket each point once, then EQUI-join on bucket and post-filter
the exact BETWEEN. The nested-loop O(points x intervals) becomes a hash
join whose probe side is one row per point — the standard bucketized
range-join strategy (what Databricks' range-join hint does internally).

Scale: ONE shuffle of points keyed by bucket; intervals explode to
O(intervals x 2) rows and usually broadcast. Correctness does not depend
on the width; only the bucket fan-out does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamalert_spark.ops.hints import gated_broadcast


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Inner-join points to every interval containing them
    (lo <= point <= hi). ``bucket_width`` must be >= the longest
    interval so each interval overlaps at most 2 buckets (wider is
    always correct, just coarser)."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    p = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / bucket_width).cast("bigint"))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("bigint"),
                F.floor(F.col(hi_col) / bucket_width).cast("bigint"),
            )
        ),
    )
    if broadcast_intervals:
        # size-gated: an interval table that outgrows the budget (IP
        # geolocation feeds run to tens of millions of ranges) falls back
        # to AQE's shuffle equi-join on _bucket — same results, no OOM
        iv = gated_broadcast(iv)
    return (
        p.join(iv, "_bucket")
        .filter(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("_bucket")
    )


def bucketed_interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bucket_width: int,
    broadcast_right: bool = True,
) -> DataFrame:
    """Interval-x-interval OVERLAP join (l_lo <= r_hi AND r_lo <= l_hi)
    without a nested loop — the interval generalization of
    ``bucketed_range_join``: both sides explode into the grid buckets
    they cover, pairs equi-join on bucket, the exact overlap predicate
    post-filters, and each pair is kept exactly ONCE at the bucket
    containing the overlap's start (greatest(l_lo, r_lo)), so no
    distinct pass is needed.

    Scale: ONE shuffle of each side keyed by bucket (fan-out <= 2 rows
    per interval when bucket_width >= the longest interval on that
    side; wider is always correct, just coarser). The right side rides
    a size-gated broadcast.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    lf = left.withColumn(
        "_bucket",
        F.explode(F.sequence(
            F.floor(F.col(l_lo) / bucket_width).cast("bigint"),
            F.floor(F.col(l_hi) / bucket_width).cast("bigint"))))
    rt = right.withColumn(
        "_bucket",
        F.explode(F.sequence(
            F.floor(F.col(r_lo) / bucket_width).cast("bigint"),
            F.floor(F.col(r_hi) / bucket_width).cast("bigint"))))
    if broadcast_right:
        rt = gated_broadcast(rt)
    overlap = (F.col(l_lo) <= F.col(r_hi)) & (F.col(r_lo) <= F.col(l_hi))
    claim = (
        F.floor(F.greatest(F.col(l_lo), F.col(r_lo)) / bucket_width)
         .cast("bigint") == F.col("_bucket"))
    return lf.join(rt, "_bucket").filter(overlap & claim).drop("_bucket")
