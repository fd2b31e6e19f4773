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
