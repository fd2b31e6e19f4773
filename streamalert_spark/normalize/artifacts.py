"""Artifact extraction: explode the normalization map into flat rows.

Reference behavior (streamalert/shared/artifact_extractor.py:26-64,101-188):
each normalized value becomes one artifact row with 5 string columns —
function, streamalert_record_id, source_type, type, value — honoring the
per-path send_to_artifacts flag (normalize.py:33,272-275). Artifacts land in
their own dt-partitioned historical table.

Spark: two explodes and a projection; fully native, shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_artifacts(df: DataFrame) -> DataFrame:
    """df must carry streamalert_normalization, streamalert_record_id and
    log_schema_type (the artifact's source_type)."""
    exploded = df.select(
        F.col("streamalert_record_id"),
        F.col("log_schema_type").alias("source_type"),
        F.explode("streamalert_normalization").alias("type", "entries"),
    ).select(
        "streamalert_record_id",
        "source_type",
        "type",
        F.explode("entries").alias("entry"),
    ).filter(F.col("entry.send_to_artifacts"))

    return exploded.select(
        F.coalesce(F.col("entry.function"), F.lit("")).alias("function"),
        "streamalert_record_id",
        "source_type",
        "type",
        F.explode("entry.values").alias("value"),
    )
