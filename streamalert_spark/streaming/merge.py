"""Streaming alert merge: applyInPandasWithState keyed by
(rule_name, merge-key values), with processing-time timeout = merge window.

Replaces the reference's DynamoDB-backed merger poll loop
(alert_merger/main.py:83-132): instead of a table scan per schedule tick,
alerts buffer in the state store per key; when the oldest buffered alert
exceeds its merge window (timeout fires), the group is synthesized
(shared/alert.py:382-433 semantics via alerts.merge.synthesize_merged) and
emitted. The 50-alert cap dispatches a full group early
(alert_merger/main.py:34).

Scale: state per key is bounded at 50 alerts x bounded alert size; keys
shard across executors by hash of (rule_name, merge_values) — the same
partitioning DynamoDB gave the reference. RocksDB state store recommended
at high key cardinality (spark.sql.streaming.stateStore.providerClass).
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from streamalert_spark.alerts.merge import (
    ALERT_TS_PY_FMT,
    MAX_MERGE_GROUP_SIZE,
    MERGED_SCHEMA,
    synthesize_merged,
)

_STATE_SCHEMA = "created array<string>, records array<string>, window_mins bigint, merge_keys array<string>"


def _merge_and_rows(
    rule_name: str,
    merge_values: str,
    created: list[str],
    records: list[str],
    merge_keys: list[str],
) -> dict[str, Any]:
    members = sorted(
        ({"created": c, "record": json.loads(r or "{}")} for c, r in zip(created, records)),
        key=lambda a: a["created"],
    )
    merged = synthesize_merged(members, list(merge_keys))
    return {
        "rule_name": rule_name,
        "merge_values": merge_values,
        "alert_count": merged["AlertCount"],
        "alert_time_first": merged["AlertTimeFirst"],
        "alert_time_last": merged["AlertTimeLast"],
        "merged_record": json.dumps(merged, sort_keys=True),
    }


def _merge_state_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    rule_name, merge_values = key
    out_rows: list[dict] = []

    if state.hasTimedOut:
        created, records, window_mins, merge_keys = state.get
        out_rows.append(_merge_and_rows(rule_name, merge_values, list(created), list(records), list(merge_keys)))
        state.remove()
        yield pd.DataFrame(out_rows)
        return

    created, records, window_mins, merge_keys = (
        state.get if state.exists else ([], [], 0, [])
    )
    created, records = list(created), list(records)
    for pdf in pdfs:
        for _, row in pdf.iterrows():
            created.append(row["created"])
            records.append(row["record"])
            window_mins = int(row["merge_window_mins"] or 0)
            merge_keys = list(row["merge_by_keys"] or [])
            if len(created) >= MAX_MERGE_GROUP_SIZE:
                # cap reached: dispatch the full group immediately (main.py:34)
                out_rows.append(_merge_and_rows(rule_name, merge_values, created, records, merge_keys))
                created, records = [], []

    if created:
        state.update((created, records, window_mins, merge_keys))
        state.setTimeoutDuration(max(int(window_mins), 1) * 60 * 1000)
    elif state.exists:
        state.remove()

    yield pd.DataFrame(out_rows) if out_rows else pd.DataFrame(
        columns=["rule_name", "merge_values", "alert_count",
                 "alert_time_first", "alert_time_last", "merged_record"]
    )


def _keyed(alerts: DataFrame) -> DataFrame:
    rec_map = F.from_json(F.col("record"), "map<string,string>")
    return alerts.withColumn(
        "merge_values",
        F.to_json(F.map_from_arrays(
            F.col("merge_by_keys"),
            F.transform(F.col("merge_by_keys"), lambda k: rec_map[k]),
        )),
    )


def streaming_merge(alerts: DataFrame) -> DataFrame:
    """Streaming alerts DataFrame (ALERT_SCHEMA columns) -> merged alerts.

    Use on a stream; for batch semantics use alerts.merge.merge_alerts_batch.
    """
    return (
        _keyed(alerts).groupBy("rule_name", "merge_values")
        .applyInPandasWithState(
            _merge_state_fn,
            outputStructType=MERGED_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def _merge_state_fn_event_time(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Event-time variant: the group dispatches when the WATERMARK passes
    oldest-alert + merge window (the reference's 'oldest alert older than
    its window' check, alert_merger/main.py:106-132, driven by event time
    so late-but-in-window alerts still join their group)."""
    import datetime as _dt

    rule_name, merge_values = key
    out_rows: list[dict] = []

    if state.hasTimedOut:
        created, records, window_mins, merge_keys = state.get
        out_rows.append(_merge_and_rows(
            rule_name, merge_values, list(created), list(records), list(merge_keys)))
        state.remove()
        yield pd.DataFrame(out_rows)
        return

    created, records, window_mins, merge_keys = (
        state.get if state.exists else ([], [], 0, [])
    )
    created, records = list(created), list(records)
    for pdf in pdfs:
        for _, row in pdf.iterrows():
            created.append(row["created"])
            records.append(row["record"])
            window_mins = int(row["merge_window_mins"] or 0)
            merge_keys = list(row["merge_by_keys"] or [])
            if len(created) >= MAX_MERGE_GROUP_SIZE:
                out_rows.append(_merge_and_rows(
                    rule_name, merge_values, created, records, merge_keys))
                created, records = [], []

    if created:
        state.update((created, records, window_mins, merge_keys))
        oldest = _dt.datetime.strptime(min(created), ALERT_TS_PY_FMT)
        fire_at = oldest + _dt.timedelta(minutes=max(int(window_mins), 1))
        state.setTimeoutTimestamp(int(fire_at.timestamp() * 1000))
    elif state.exists:
        state.remove()

    yield pd.DataFrame(out_rows) if out_rows else pd.DataFrame(
        columns=["rule_name", "merge_values", "alert_count",
                 "alert_time_first", "alert_time_last", "merged_record"]
    )


def streaming_merge_event_time(
    alerts: DataFrame, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """Event-time streaming merge: watermark on the alert's created time,
    EventTimeTimeout at oldest + merge window. ``watermark_delay`` is the
    lateness bound — alerts later than it can no longer join their group
    (the state store has already emitted)."""
    with_time = _keyed(alerts).withColumn(
        "event_time",
        F.to_timestamp(F.col("created"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
    ).withWatermark("event_time", watermark_delay)
    return (
        with_time.groupBy("rule_name", "merge_values")
        .applyInPandasWithState(
            _merge_state_fn_event_time,
            outputStructType=MERGED_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
