"""Streaming half-life decayed counters — per-key behavioral risk with a
power-of-two hourly half-life, carried across micro-batches.

Batch twin: `queries/analytics_sketch.py decayed_risk_scores` encodes the
SAME sequential fold (DuckDB list_reduce over the key's event-time-ordered
history). The streaming form keeps ONE (last_hour, score) pair per key and
folds each event as

    score = score DIV 2^(h - last_hour) + contribution;  last_hour = h

Determinism contract: the streamed score equals the one-shot sequential
fold over the key's full history, bit for bit, because floor division
nests over power-of-two divisors (floor(floor(n/p)/q) == floor(n/(p*q)))
and absolute-hour buckets make ages additive. Note this is fold-vs-fold
parity, NOT equality with the anchored per-event sum
Σ floor(v*scale / 2^age_h): floor does not distribute over the
intermediate sums, so the fold can differ from that sum by small carry
amounts whenever >=2 decay steps separate contributions (e.g. scale=1e6,
v=1 at h=0,10,20 → fold 1_000_977 vs per-event sum 1_000_976). Both the
oracle and the batch query use the fold definition, so the two engines
agree; just don't substitute the per-event-sum formula for either.

Ordering contract: per-key rows arrive in event-time order across
micro-batches (the same contract as `cep.pattern_match_stream`; front an
out-of-order source with the watermark-staged buffer pattern from
`cep.pattern_match_stream_ordered`). Scale: one shuffle keyed by the
entity; state is TWO BIGINTs per key; gaps are capped at 62 hours of
shift (a score decayed 2^62 is zero in fixed point anyway).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "k bigint, last_h bigint, score_fp bigint"
STATE_SCHEMA = "last_h bigint, score_fp bigint"
MAX_SHIFT = 62


def decayed_counters_stream(
    events: DataFrame,
    scale: int = 1_000_000,
    idle_ttl_s: int | None = None,
) -> DataFrame:
    """Per-key decayed counter over (k, seq, h, v): v*scale added at hour
    h, existing score halved once per elapsed hour. Emits the key's
    (last_h, score) after every micro-batch that touched it — the ledger
    consumer keeps the latest emission per key.

    State is semantically long-lived (a risk score exists as long as the
    entity does), but a key idle for ``idle_ttl_s`` of processing time
    has decayed toward 0 anyway — pass a TTL to evict it (the cep.py r7
    lesson: unbounded NoTimeout state must be a deliberate, documented
    choice). Eviction is near-lossless only when the TTL spans enough
    half-lives that 2^TTL_hours dwarfs any score — size it that way; a
    short TTL trades accuracy on returning keys for state size."""

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            # idle past the TTL: the score is ~0 by construction — drop it
            state.remove()
            return
        frames = [p for p in pdfs if not p.empty]
        if not frames:
            if idle_ttl_s is not None:
                state.setTimeoutDuration(idle_ttl_s * 1000)
            return
        rows = (pd.concat(frames, ignore_index=True)
                if len(frames) > 1 else frames[0])
        rows = rows.sort_values(["h", "seq"])
        last_h, score = tuple(state.get) if state.exists else (None, 0)
        for h, v in zip(rows["h"].to_numpy(), rows["v"].to_numpy()):
            h = int(h)
            if last_h is not None:
                gap = min(h - last_h, MAX_SHIFT)
                score = score >> gap if gap > 0 else score
            score += int(v) * scale
            last_h = h
        state.update((last_h, score))
        if idle_ttl_s is not None:
            state.setTimeoutDuration(idle_ttl_s * 1000)
        yield pd.DataFrame({"k": [key[0]], "last_h": [last_h],
                            "score_fp": [score]})

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if idle_ttl_s is not None else GroupStateTimeout.NoTimeout)
    return events.groupBy("k").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Streaming EWMA control chart — the stateful twin of the batch
# ewma_control_chart query (queries/analytics_sketch.py).
# ---------------------------------------------------------------------------

EWMA_OUT_SCHEMA = "event_type string, h bigint, x bigint, s_prev_fp bigint"
EWMA_STATE_SCHEMA = "last_h bigint, s_fp bigint"
EWMA_SCALE = 1_000_000
# (3/4)^400 ~ 1e-50: after this many empty hours any bigint state is 0,
# so the zero-fold loop is bounded regardless of gap size
_EWMA_MAX_GAP = 400


def ewma_alerts_stream(
    events: DataFrame,
    lo_hour: int,
    idle_ttl_s: int | None = None,
) -> DataFrame:
    """Per-type EWMA (alpha=1/4) spike alerts over (event_type, h, x)
    HOURLY AGGREGATES, carried across micro-batches in exact fixed
    point. Fold per hour: s' = (3s) DIV 4 + (x*SCALE) DIV 4, with empty
    spine hours folding x=0 — bit-identical to the batch query's
    recursive walk, because every step is non-negative integer floor
    division.

    The input is pre-counted, not raw events, on purpose: per-hour
    counting is a JVM partial aggregate (map-side combine) the upstream
    micro-batch computes for free, so the Python state fold sees
    |types| x |hours| rows instead of every raw event — at 100 TB that
    is the difference between an Arrow transfer of a few thousand rows
    per trigger and shipping the whole stream through Python. Rows for
    the same (type, hour) within a batch are summed, so a partially
    combined upstream is also legal.

    ``lo_hour`` anchors the spine: the batch definition seeds hour lo
    with s = x_lo*SCALE (no alert possible there), and a key first seen
    later implicitly folded zeros from lo (s stays 0). Emission = alert
    rows only (x >= 5 AND x*SCALE > 2*s_prev), so quiet hours emit
    nothing and the bounded demo needs no watermark sentinel.

    Ordering contract: per-key hours arrive in event-time order across
    micro-batches and each micro-batch carries WHOLE hours (split input
    on hour boundaries) — same contract as decayed_counters_stream.
    State: two bigints per event type; optional processing-time TTL for
    retired types (a type idle past the TTL restarts from the zero fold,
    exact whenever the idle gap exceeds _EWMA_MAX_GAP hours).
    """

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        frames = [p for p in pdfs if not p.empty]
        if not frames:
            if idle_ttl_s is not None:
                state.setTimeoutDuration(idle_ttl_s * 1000)
            return
        rows = (pd.concat(frames, ignore_index=True)
                if len(frames) > 1 else frames[0])
        counts = rows.groupby("h")["x"].sum().sort_index()
        last_h, s = tuple(state.get) if state.exists else (lo_hour - 1, 0)
        out_h, out_x, out_s = [], [], []
        for h, x in counts.items():
            h, x = int(h), int(x)
            gap = min(h - last_h - 1, _EWMA_MAX_GAP)
            for _ in range(gap):
                s = (3 * s) >> 2
            if h == lo_hour:
                s = x * EWMA_SCALE  # the batch walk's rn=1 seed
            else:
                if x >= 5 and x * EWMA_SCALE > 2 * s:
                    out_h.append(h); out_x.append(x); out_s.append(s)
                s = ((3 * s) >> 2) + ((x * EWMA_SCALE) >> 2)
            last_h = h
        state.update((last_h, s))
        if idle_ttl_s is not None:
            state.setTimeoutDuration(idle_ttl_s * 1000)
        if out_h:
            yield pd.DataFrame({"event_type": key[0], "h": out_h,
                                "x": out_x, "s_prev_fp": out_s})

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if idle_ttl_s is not None else GroupStateTimeout.NoTimeout)
    # eviction: unbounded-by-design when no TTL is passed — state is two
    # bigints per EVENT TYPE (a bounded domain, unlike per-user keys);
    # the bounded demo runs without TTL, production passes one.
    return events.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=EWMA_OUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Streaming TWAP steps — LOCF step-integral increments carried across
# micro-batches. Batch twin: queries/analytics_ext.py twap_locf_per_user
# (its `stepped` CTE is exactly this operator's emission).
# ---------------------------------------------------------------------------

TWAP_OUT_SCHEMA = ("user_id bigint, event_id bigint, s bigint, "
                   "next_s bigint, cents bigint, area_inc bigint")
TWAP_STATE_SCHEMA = "last_s bigint, last_eid bigint, last_cents bigint"


def twap_steps_stream(
    events: DataFrame,
    idle_ttl_s: int | None = None,
) -> DataFrame:
    """Emit one CLOSED LOCF step per observation after the first: when a
    new (s, event_id, cents) arrives for a user, the PREVIOUS observation's
    step closes and its exact step integral ``last_cents * (s - last_s)``
    cent-seconds is emitted. The open tail step is never emitted (a live
    meter cannot bill an unfinished interval); the batch query closes it
    the same way, so stream and batch emit the identical step multiset.

    Ordering contract: per-key rows arrive in event-time order across
    micro-batches and same-second rows stay within one batch; inside a
    batch rows sort by (s, event_id), so duplicate-second observations
    close zero-duration steps deterministically.

    State: THREE bigints per user (last_s, last_eid, last_cents).
    Optional processing-time TTL retires idle meters; without it the
    operator is unbounded-by-design only in the sense of one tuple per
    live entity — pass a TTL in production.
    """

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        frames = [p for p in pdfs if not p.empty]
        if not frames:
            if idle_ttl_s is not None:
                state.setTimeoutDuration(idle_ttl_s * 1000)
            return
        rows = (pd.concat(frames, ignore_index=True)
                if len(frames) > 1 else frames[0])
        rows = rows.sort_values(["s", "event_id"], kind="mergesort")
        out_eid, out_s, out_ns, out_c, out_a = [], [], [], [], []
        carry = tuple(state.get) if state.exists else None
        for s, eid, cents in zip(rows["s"], rows["event_id"],
                                 rows["cents"]):
            s, eid, cents = int(s), int(eid), int(cents)
            if carry is not None:
                ls, leid, lc = carry
                out_eid.append(leid)
                out_s.append(ls)
                out_ns.append(s)
                out_c.append(lc)
                out_a.append(lc * (s - ls))
            carry = (s, eid, cents)
        state.update(carry)
        if idle_ttl_s is not None:
            state.setTimeoutDuration(idle_ttl_s * 1000)
        if out_s:
            yield pd.DataFrame({
                "user_id": key[0], "event_id": out_eid, "s": out_s,
                "next_s": out_ns, "cents": out_c, "area_inc": out_a,
            })

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if idle_ttl_s is not None else GroupStateTimeout.NoTimeout)
    # eviction: unbounded-by-design when no TTL is passed — one 3-bigint
    # tuple per live entity, the irreducible floor for LOCF; production
    # passes idle_ttl_s and dormant meters evict.
    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=TWAP_OUT_SCHEMA,
        stateStructType=TWAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
