"""SCD Type-2 dimension maintenance: changelog -> validity intervals,
plus the point-in-time (temporal) join that reads them back.

The warehouse-standard way to keep history for a mutable dimension:
every attribute change opens a new row [valid_from, valid_to) and closes
the previous one; the current row has valid_to NULL. ``scd2_from_changelog``
builds that table from a raw keyed change stream in two window passes —
consecutive-duplicate compression first (a change record that doesn't
actually change the tracked attributes must NOT open a new version),
then lead(ts) to close each interval.

Scale: both windows partition by the dimension key — one shuffle of the
changelog, state O(1) per row. The dimension is typically tiny next to
facts, so the point-in-time join broadcasts the history and evaluates
the interval predicate fact-side (a broadcast range join); for a large
history, bucket both sides on the key and the interval predicate stays
within co-located partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from streamalert_spark.ops.hints import gated_broadcast


def scd2_from_changelog(
    changes: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Compress a changelog into SCD2 rows: keys + value_cols +
    (valid_from, valid_to, is_current). Requires a unique ``ts_col`` per
    key (CDC offset semantics)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    cur = F.struct(*[F.col(c) for c in value_cols])
    prev = F.lag(cur).over(w)
    changed = (
        changes.withColumn("_prev", prev)
        # null-safe: the first row per key (prev NULL) always opens
        .filter(F.col("_prev").isNull() | ~cur.eqNullSafe(F.col("_prev")))
        .drop("_prev")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(ts_col)
    return (
        changed.select(
            *key_cols, *value_cols,
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(w2).alias("valid_to"),
        )
        .withColumn("is_current",
                    F.col("valid_to").isNull().cast("bigint"))
    )


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    key_cols: list[str],
    fact_ts_col: str,
    how: str = "inner",
) -> DataFrame:
    """Attach the dimension version valid AT each fact's timestamp:
    key equality + valid_from <= ts < valid_to (NULL valid_to = open).
    Each fact matches at most one version because intervals partition the
    timeline per key.

    The history side is SIZE-GATED broadcast (``gated_broadcast``): a
    dimension history usually fits, but an SCD2 history of a large
    dimension (customer at the 100 TB design point) is multi-TB, and a
    hard hint there is an executor/driver OOM that also blocks AQE from
    ever choosing a shuffle join. Over the gate the join condition's key
    equality lets Catalyst plan a sort-merge join on the keys with the
    interval predicate as a post-join filter — the correct large-history
    plan (or bucket both sides on the key to remove the shuffle)."""
    cond = F.lit(True)
    for c in key_cols:
        cond = cond & (facts[c] == history[c])
    cond = cond & (history["valid_from"] <= facts[fact_ts_col])
    cond = cond & (history["valid_to"].isNull()
                   | (facts[fact_ts_col] < history["valid_to"]))
    joined = facts.join(gated_broadcast(history), cond, how)
    drop = [history[c] for c in key_cols]
    for c in drop:
        joined = joined.drop(c)
    return joined
