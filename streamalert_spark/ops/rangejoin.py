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
