"""Streaming deduplication — at-least-once sources (Kinesis re-reads,
S3 re-delivery, retried Firehose batches) produce duplicate records; this
drops them across micro-batches with bounded state.

Scale: dropDuplicatesWithinWatermark keeps one state row per key and
EVICTS keys older than the watermark, so state size is bounded by the
key arrival rate x watermark horizon — the only safe form at 100 TB/day.
Plain dropDuplicates on a stream would grow state forever and is exposed
only behind an explicit unbounded=True for small keyed control streams.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedupe_stream(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    unbounded: bool = False,
) -> DataFrame:
    """Drop duplicate records (same ``key_cols``) arriving within the
    watermark horizon of each other. ``ts_col`` must be the event-time
    timestamp column; late duplicates beyond ``watermark`` are the
    documented trade — they re-emit, matching the reference's
    at-least-once delivery contract (alerts carry stable ids, so
    downstream sinks stay idempotent)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if unbounded:
        return events.dropDuplicates(list(key_cols))
    return events.withWatermark(ts_col, watermark) \
        .dropDuplicatesWithinWatermark(list(key_cols))
