"""Streaming CEP sequence-pattern matching (MATCH_RECOGNIZE shape).

The batch form (`queries/analytics_ext.py pattern_sequence_alerts`) finds
runs of >= N consecutive failure events followed immediately by a success
within a horizon, via gaps-and-islands windows. This is the STREAMING
form: a per-key state machine carried across micro-batches with
applyInPandasWithState — the run survives a batch boundary, so a pattern
whose failures arrive in one micro-batch and whose success arrives three
batches later still matches (that is the property the bounded driver
query pins; see also streaming/first_seen.py for the API-choice note on
transformWithStateInPandas).

Correctness contract: per-key rows must arrive in event-time order
ACROSS micro-batches (within a batch the operator sorts). That is the
same per-key ordering contract Flink CEP and Kafka Streams sessionizers
assume; out-of-order sources need a watermark-sorted staging pass first.

Reference analogue: StreamAlert's community rules evaluate one record at
a time and cannot express "N consecutive failures then success" without
an external lookup table; this operator is the native-streaming sequence
rule. Scale: one shuffle keyed by the entity; state is THREE BIGINTs per
live key (run length, run start, run end) — RocksDB state-store ready.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("user_id bigint, n_failures bigint, run_start_s bigint, "
              "run_end_s bigint, success_s bigint")
STATE_SCHEMA = "run_len bigint, run_start bigint, run_end bigint"
_OUT_COLS = ["user_id", "n_failures", "run_start_s", "run_end_s",
             "success_s"]


def pattern_match_stream(
    events: DataFrame,
    failure_type: str = "error",
    success_type: str = "purchase",
    min_failures: int = 2,
    horizon_s: int = 2592000,
) -> DataFrame:
    """CEP over a stream of (user_id, event_id, event_type, es): emit one
    row per matched failure-run -> success sequence. Input rows need
    columns user_id/event_id/event_type/es (seconds)."""

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        frames = [p for p in pdfs if not p.empty]
        if not frames:
            return
        rows = (pd.concat(frames, ignore_index=True)
                if len(frames) > 1 else frames[0])
        rows = rows.sort_values(["es", "event_id"])
        run_len, run_start, run_end = (
            state.get if state.exists else (0, 0, 0))
        matches: list[tuple] = []
        for typ, es in zip(rows["event_type"].to_numpy(),
                           rows["es"].to_numpy()):
            es = int(es)
            if typ == failure_type:
                if run_len == 0:
                    run_start = es
                run_len += 1
                run_end = es
            else:
                if (typ == success_type and run_len >= min_failures
                        and es <= run_end + horizon_s):
                    matches.append(
                        (int(key[0]), run_len, run_start, run_end, es))
                run_len, run_start, run_end = 0, 0, 0
        state.update((run_len, run_start, run_end))
        if matches:
            yield pd.DataFrame(matches, columns=_OUT_COLS)

    return events.groupBy(events["user_id"]).applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
