"""Backward as-of join — attach to each left row the most recent right
row with right.ts <= left.ts, per key (prices as-of trade time, config
as-of event time, label as-of snapshot time).

Spark has no native ASOF JOIN; the idiomatic composition is union +
window instead of a custom mapPartitions merge: tag both sides, union,
and take last_value(right payload IGNORE NULLS) over (key ORDER BY ts,
right-before-left at ties). This is ONE shuffle keyed by the join key
with a per-key local sort (hashpartitioning — never a global range
sort), so it scales exactly like any keyed window. A range-interval
tolerance maps to a post-filter on the attached timestamp.

Ties: a right row at exactly left.ts IS visible to that left row (<=
semantics, matching DuckDB/kdb ASOF); multiple right rows at the same
(key, ts) resolve to the one with the highest order_col.

Atomicity: ALL value columns are attached from the SAME right row — the
right payload travels as a single struct through one last(ignorenulls),
so a right row with a NULL in one value column cannot mix with an older
row's value for that column (matching native ASOF JOIN semantics, where
a NULL field in the matched row stays NULL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    order_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Left rows + columns ``asof_<v>`` holding the latest right values
    at-or-before each left row's ``ts``. ``order_col`` breaks exact-ts
    ties among right rows (highest wins) and must order left rows
    uniquely within a key."""
    l_tag = left.withColumn("_r", F.lit(0))
    # the whole right payload rides as ONE struct so a single
    # last(ignorenulls) attaches every value column from the same right
    # row; left rows get a NULL struct via allowMissingColumns
    r_tag = right.select(
        key, ts, order_col,
        F.struct(*[F.col(v).alias(v) for v in value_cols]).alias("_rv"),
    ).withColumn("_r", F.lit(1))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows sort BEFORE left rows at equal ts (asof <= semantics);
    # among right rows at one ts, higher order_col sorts later and wins
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col("_r").desc(),
                 F.when(F.col("_r") == 1, F.col(order_col)).otherwise(F.lit(None)))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    attached = u.select("*", F.last("_rv", ignorenulls=True).over(w).alias("_asof"))
    return (
        attached.filter(F.col("_r") == 0)
        .select(
            *left.columns,
            *[F.col(f"_asof.{v}").alias(f"asof_{v}") for v in value_cols],
        )
    )
