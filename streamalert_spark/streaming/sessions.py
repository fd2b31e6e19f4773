"""Streaming sessionization — gap-based session windows over event time.

The streaming twin of the batch sessionizer (sessionize_events): Spark's
``session_window`` merges events into per-key sessions that close when no
event arrives within ``gap`` of the last one. A session row emits exactly
once, when the watermark passes the session's end (append mode) — so a
session that spans several micro-batches is merged in the state store and
still emits as ONE row, which is the property the bounded driver query
pins across a 6-micro-batch stream.

Scale: one keyed shuffle on (key, session candidate); the state store
holds only OPEN sessions per key (closed ones evict with the watermark),
so state is O(active keys), independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_windows(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """(key, session_start, session_end, cnt) per closed session —
    session_end is last-event-time + gap, Spark's session bound."""
    sessions = (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return sessions.select(
        key_col,
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "cnt",
    )
