"""Streaming rate-threshold alerting — the Structured Streaming twin of
the batch rate-spike detector (ops/sketch.py rate_spikes), and the
streaming form of the reference's rate-based rule pattern (a scheduled
query aggregates counts, feeds them back into the stream, and a rule
fires on the aggregate — here the windowed aggregate IS the stream).

Semantics: tumbling event-time windows per key; a window emits an alert
row once the watermark closes it (append mode — exactly one alert per
(key, window), late data inside the watermark still counts). State is
bounded by the watermark: closed windows are evicted.

Scale: one keyed shuffle on (key, window); partial aggregation happens
map-side per micro-batch; watermark eviction keeps state at
O(active keys x windows-in-watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rate_threshold_alerts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    threshold: int = 10,
) -> DataFrame:
    """(key, window_start, window_end, cnt) for windows whose event count
    reaches ``threshold``, emitted once per closed window in append mode."""
    counts = (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.window(F.col(ts_col), window))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.filter(F.col("cnt") >= threshold).select(
        key_col,
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        F.col("cnt").cast("bigint").alias("cnt"),
    )
