"""CDC changelog application — MERGE INTO semantics as a batch operator.

The lakehouse upsert primitive: given a base snapshot and a stream/batch
of keyed change records (upserts and deletes with a per-key sequence
order), produce the next snapshot — latest change per key wins, deletes
drop the key, upserts replace or insert, untouched base rows carry
through. This is what Delta's ``MERGE INTO`` / Iceberg's upsert and every
warehouse CDC ingest (Debezium -> table) computes.

Plan shape (the part that matters at 100 TB): ONE shuffle of the
CHANGELOG by key for the last-write-wins window — the changelog is
typically orders of magnitude smaller than the base — then a single
left-anti join of the base against the touched-key set (keys-only
projection; AQE broadcasts it when small, so the base is never
shuffled), and a union with the winning upserts. The base table is read
once and moved zero times.

Requires a unique sequence value per (key, change) — standard CDC offset
semantics; ties would make "latest" ill-defined on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """The INVERSE of ``apply_changelog``: diff two snapshots into a
    change feed — 'I' rows exist only in ``new``, 'D' only in ``old``,
    'U' exist in both with any non-key column changed (null-safe
    comparison). Unchanged rows emit nothing. Round-trip theorem
    (pinned in tests): applying the diff of (old, new) onto ``old``
    reproduces ``new`` exactly.

    One full-outer join on the key — both sides shuffle once; at 100 TB
    bucket both snapshots on the key and the join is exchange-free.
    This is how you bootstrap CDC for a source that only hands you
    periodic full dumps."""
    val_cols = [c for c in old.columns if c not in key_cols]
    if not val_cols:
        # key-only snapshots (pure membership sets): no payload means no
        # 'U' rows can exist — the diff is two anti-joins, and the
        # F.struct(*[]) the general path would build is illegal anyway
        ins = new.join(old, key_cols, "left_anti").withColumn("op", F.lit("I"))
        dels = old.join(new, key_cols, "left_anti").withColumn("op", F.lit("D"))
        return ins.unionByName(dels).select(*key_cols, "op")
    o = old.select(*key_cols, F.struct(*val_cols).alias("_old"))
    n = new.select(*key_cols, F.struct(*val_cols).alias("_new"))
    j = o.join(n, key_cols, "full_outer")
    op = (
        F.when(F.col("_old").isNull(), "I")
        .when(F.col("_new").isNull(), "D")
        .when(~F.col("_old").eqNullSafe(F.col("_new")), "U")
    )
    out = j.withColumn("op", op).filter(F.col("op").isNotNull())
    cols = [F.col(c) for c in key_cols] + [F.col("op")]
    for c in val_cols:
        cols.append(F.col(f"_old.{c}").alias(f"old_{c}"))
        cols.append(F.col(f"_new.{c}").alias(f"new_{c}"))
    return out.select(*cols)


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """Next snapshot of ``base`` after applying ``changes``. ``changes``
    must carry the key columns, ``seq_col``, ``op_col``, and the full
    payload (same non-key columns as ``base``)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    touched = latest.select(*key_cols)
    survivors = base.join(touched, key_cols, "left_anti")
    # null-safe: only an EXPLICIT delete_op removes the key — a
    # malformed change with op NULL must not silently drop it (the key
    # is already in `touched`, so a null-rejecting != would delete it)
    upserts = (
        latest.filter(~F.col(op_col).eqNullSafe(delete_op))
        .select(*base.columns)
    )
    return survivors.unionByName(upserts)
