"""Streaming CEP sequence-pattern matching (MATCH_RECOGNIZE shape).

The batch form (`queries/analytics_ext.py pattern_sequence_alerts`) finds
runs of >= N consecutive failure events followed immediately by a success
within a horizon, via gaps-and-islands windows. This module is the
STREAMING form: a per-key state machine carried across micro-batches with
applyInPandasWithState — the run survives a batch boundary, so a pattern
whose failures arrive in one micro-batch and whose success arrives three
batches later still matches.

Two operators, one state machine:

- ``pattern_match_stream`` — rows must arrive in event-time order PER KEY
  across micro-batches (within a batch the operator sorts). State is three
  bigints per key with a LIVE run; a key whose run resets (any
  non-failure event) has its state row REMOVED, so state tracks live runs,
  not lifetime distinct keys. An optional processing-time ``idle_ttl_s``
  additionally expires keys whose run went quiet (a run that has seen no
  event for the TTL is abandoned and its state dropped) — a wall-clock
  approximation of the event-time horizon, safe when processing roughly
  tracks event time; replay/backfill should use the ordered variant below
  instead, whose eviction is exact event time.

- ``pattern_match_stream_ordered`` — the watermark-staged variant for
  OUT-OF-ORDER sources (the Flink CEP design: buffer by watermark, fire
  in event-time order). Incoming rows buffer in per-key state; once the
  watermark passes a row's event time it is fed to the same state machine
  in (es, event_id) order. Disorder tolerance = the watermark delay; rows
  later than that are dropped (exactly Flink's late-event rule). Eviction
  is exact: a live run schedules an event-time timeout at
  ``run_end + horizon_s`` (past that, no success can ever match) and the
  timeout removes the state row; buffered rows schedule a timeout at their
  own event time so they flush even if the key never sees data again.

Reference analogue: StreamAlert's community rules evaluate one record at
a time and cannot express "N consecutive failures then success" without
an external lookup table; this operator is the native-streaming sequence
rule. Scale: one shuffle keyed by the entity; in-order state is THREE
BIGINTs per key with a live run (RocksDB state-store ready); ordered-mode
state adds the pending buffer, bounded by watermark delay × per-key rate.

API note: Spark 4's transformWithStateInPandas (native per-key TTL,
ListState for the pending buffer) is the forward-looking home for this —
blocked in this environment; see NOTES.md "transformWithStateInPandas
decision record" for the probe.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("user_id bigint, n_failures bigint, run_start_s bigint, "
              "run_end_s bigint, success_s bigint")
STATE_SCHEMA = "run_len bigint, run_start bigint, run_end bigint"
ORDERED_STATE_SCHEMA = (STATE_SCHEMA +
                        ", p_es array<bigint>, p_eid array<bigint>, "
                        "p_typ array<string>")
_OUT_COLS = ["user_id", "n_failures", "run_start_s", "run_end_s",
             "success_s"]


def _advance(run: tuple[int, int, int], es: int, typ: str, key: int,
             failure_type: str, success_type: str, min_failures: int,
             horizon_s: int, matches: list[tuple]) -> tuple[int, int, int]:
    """One step of the run state machine (shared by both operators):
    failures extend the run; ANY other event ends it, emitting a match
    first when it is the success type arriving within the horizon."""
    run_len, run_start, run_end = run
    if typ == failure_type:
        if run_len == 0:
            run_start = es
        return run_len + 1, run_start, es
    if (typ == success_type and run_len >= min_failures
            and es <= run_end + horizon_s):
        matches.append((key, run_len, run_start, run_end, es))
    return 0, 0, 0


def pattern_match_stream(
    events: DataFrame,
    failure_type: str = "error",
    success_type: str = "purchase",
    min_failures: int = 2,
    horizon_s: int = 2592000,
    idle_ttl_s: int | None = None,
) -> DataFrame:
    """CEP over an IN-ORDER stream of (user_id, event_id, event_type, es):
    emit one row per matched failure-run -> success sequence. State rows
    exist only for keys with a live failure run (reset => remove); pass
    ``idle_ttl_s`` to also expire runs idle that long in processing time."""

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            # idle TTL fired: the run went quiet past the TTL — abandon it
            state.remove()
            return
        frames = [p for p in pdfs if not p.empty]
        if not frames:
            return
        rows = (pd.concat(frames, ignore_index=True)
                if len(frames) > 1 else frames[0])
        rows = rows.sort_values(["es", "event_id"])
        run = tuple(state.get) if state.exists else (0, 0, 0)
        matches: list[tuple] = []
        for typ, es in zip(rows["event_type"].to_numpy(),
                           rows["es"].to_numpy()):
            run = _advance(run, int(es), typ, int(key[0]), failure_type,
                           success_type, min_failures, horizon_s, matches)
        if run[0] == 0:
            # no live run -> no state row (dead keys must not accumulate)
            if state.exists:
                state.remove()
        else:
            state.update(run)
            if idle_ttl_s is not None:
                state.setTimeoutDuration(idle_ttl_s * 1000)
        if matches:
            yield pd.DataFrame(matches, columns=_OUT_COLS)

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if idle_ttl_s is not None else GroupStateTimeout.NoTimeout)
    return events.groupBy(events["user_id"]).applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def pattern_match_stream_ordered(
    events: DataFrame,
    failure_type: str = "error",
    success_type: str = "purchase",
    min_failures: int = 2,
    horizon_s: int = 2592000,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """CEP over an OUT-OF-ORDER stream: rows buffer in per-key state and
    feed the state machine in (es, event_id) order once the watermark
    passes their event time. ``watermark_delay`` is the disorder bound —
    rows arriving later than that are dropped (Flink CEP's late rule).
    Event-time timeouts flush buffered rows with no follow-up data and
    evict live runs whose success horizon has passed."""
    with_ts = events.withColumn(
        "_ev_ts", F.timestamp_seconds("es")
    ).withWatermark("_ev_ts", watermark_delay)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            run_len, run_start, run_end, p_es, p_eid, p_typ = state.get
            run = (run_len, run_start, run_end)
            pend = [(int(e), int(i), t)
                    for e, i, t in zip(p_es, p_eid, p_typ)]
        else:
            run, pend = (0, 0, 0), []
        wm_ms = state.getCurrentWatermarkMs()
        if not state.hasTimedOut:
            for p in pdfs:
                if p.empty:
                    continue
                for es, eid, typ in zip(p["es"].to_numpy(),
                                        p["event_id"].to_numpy(),
                                        p["event_type"].to_numpy()):
                    # beyond the disorder tolerance: already fed rows with
                    # es <= watermark to the machine, so this one is late
                    if int(es) * 1000 > wm_ms:
                        pend.append((int(es), int(eid), typ))
        pend.sort()
        matches: list[tuple] = []
        rest_at = 0
        for es, eid, typ in pend:
            if es * 1000 > wm_ms:
                break
            rest_at += 1
            run = _advance(run, es, typ, int(key[0]), failure_type,
                           success_type, min_failures, horizon_s, matches)
        rest = pend[rest_at:]
        if run[0] and (run[2] + horizon_s) * 1000 <= wm_ms:
            # horizon passed: any success that could close this run would
            # have event time <= watermark, i.e. already processed or late
            run = (0, 0, 0)
        if rest:
            state.update(run + (
                [r[0] for r in rest], [r[1] for r in rest],
                [r[2] for r in rest]))
            # wake when the watermark reaches the earliest buffered row
            # (guaranteed > current watermark by the append guard above)
            state.setTimeoutTimestamp(rest[0][0] * 1000)
        elif run[0]:
            state.update(run + ([], [], []))
            state.setTimeoutTimestamp((run[2] + horizon_s) * 1000 + 1000)
        elif state.exists:
            state.remove()
        if matches:
            yield pd.DataFrame(matches, columns=_OUT_COLS)

    return with_ts.groupBy(with_ts["user_id"]).applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=ORDERED_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
