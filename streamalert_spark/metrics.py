"""Pipeline metrics via df.observe() — the reference's CloudWatch counters.

Reference (streamalert/shared/metrics.py:16-171; emission at
classifier.py:217-239, rules_engine.py:510): TOTAL_RECORDS,
NORMALIZED_RECORDS, TOTAL_PROCESSED_SIZE, FAILED_PARSES, TRIGGERED_ALERTS
logged per function. Spark-side these become observation metrics attached
to the plan — collected per action (batch) or per micro-batch via
StreamingQueryListener, with zero extra passes over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

TOTAL_RECORDS = "total_records"
TOTAL_PROCESSED_SIZE = "total_processed_size"
FAILED_PARSES = "failed_parses"
TRIGGERED_ALERTS = "triggered_alerts"
NORMALIZED_RECORDS = "normalized_records"


def observe_records(df: DataFrame, size_col: str | None = None) -> tuple[DataFrame, Observation]:
    """Attach TOTAL_RECORDS (+ optional TOTAL_PROCESSED_SIZE) observation."""
    obs = Observation("records")
    metrics = [F.count(F.lit(1)).alias(TOTAL_RECORDS)]
    if size_col is not None:
        metrics.append(F.sum(F.length(F.col(size_col))).alias(TOTAL_PROCESSED_SIZE))
    return df.observe(obs, *metrics), obs


def observe_failed_parses(invalid_df: DataFrame) -> tuple[DataFrame, Observation]:
    obs = Observation("failed_parses")
    return invalid_df.observe(obs, F.count(F.lit(1)).alias(FAILED_PARSES)), obs


def observe_alerts(alerts_df: DataFrame) -> tuple[DataFrame, Observation]:
    """TRIGGERED_ALERTS total + per-rule breakdown via a map aggregate."""
    obs = Observation("alerts")
    return (
        alerts_df.observe(
            obs,
            F.count(F.lit(1)).alias(TRIGGERED_ALERTS),
            # DISTINCT aggregates are disallowed in observed metrics;
            # approx_count_distinct is also the scale-appropriate choice
            F.approx_count_distinct(F.col("rule_name")).alias("distinct_rules"),
        ),
        obs,
    )
