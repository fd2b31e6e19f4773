"""Stream-stream equi-join with event-time bounds — correlating two live
streams (alerts with their triggering context, auth events with network
flows) without landing either to storage first.

Structured Streaming buffers both sides in the state store; UNBOUNDED
buffering is the failure mode at scale, so this wrapper REQUIRES
watermarks on both sides plus a time-range conjunct — together they let
Spark evict state older than the join horizon. State per side is then
bounded by rate x (watermark + range) instead of the whole stream.

Scale: one shuffle per side keyed by the join key (co-partitioned by the
planner); state eviction follows the combined watermark. Inner joins
emit as matches arrive; outer variants additionally emit nulls when the
watermark proves no match can come.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_ts: str,
    right_ts: str,
    left_watermark: str,
    right_watermark: str,
    range_after: str,
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``on`` AND the event-time range
    right_ts in [left_ts, left_ts + range_after]. Both watermarks are
    applied here so state stays bounded; ``range_after`` is a SQL
    interval string like '10 minutes'."""
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    cond = (
        on
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {range_after}"))
    )
    return lw.join(rw, cond, how)
