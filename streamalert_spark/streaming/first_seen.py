"""First-seen detection — the classic security streaming primitive (new
device per user, new IP per account, new binary per host): emit a key's
FIRST occurrence, suppress every later one.

Why not dropDuplicatesWithinWatermark: first-seen state must outlive any
watermark horizon (a device seen last month is still "seen"), so this
uses arbitrary stateful processing with a per-key boolean state and no
timeout (state lives until the operator is reset; at 100 TB/day key
cardinality run it on the RocksDB state-store provider — off-heap and
spillable — exactly like the stateful merge).

API note: Spark 4's transformWithStateInPandas is the forward-looking
API for this operator (per-key ValueState + native TTL), but its Python
state server requires google.protobuf, which this environment does not
provide — so the operator is built on applyInPandasWithState, the same
API as streaming/merge.py. The semantics are identical; a TTL would map
to a processing-time timeout clearing the state row.

Scale: one shuffle keyed by the entity key; state is one boolean row per
distinct key.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "seen boolean"


def first_seen(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming first-seen filter: one output row per distinct key — its
    earliest row (by ``ts_col``) in the first micro-batch containing it."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    out_schema = events.schema

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            return
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            cand = pdf.sort_values(ts_col).head(1)
            if first is None or (cand[ts_col].iloc[0]
                                 < first[ts_col].iloc[0]):
                first = cand
        if first is not None:
            state.update((True,))
            yield first

    return events.groupBy(*[events[c] for c in key_cols]).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        # eviction: unbounded-by-design — the operator's contract IS the
        # eternal set of keys ever seen (one boolean per key); expiring a
        # key would re-alert on its next event. Production bounds the
        # domain upstream (key scoping / roll the checkpoint per epoch).
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
