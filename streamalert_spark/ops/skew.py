"""Skew mitigation: salted joins and salted heavy aggregation.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin, on by default in
session.py) handles most sort-merge skew at runtime; these utilities cover
the cases AQE cannot touch:

- a shuffle feeding a NON-join operator with a hot key (e.g. a
  collect_list/applyInPandas group where one key holds a large share of
  rows) — ``salted_two_stage_agg``;
- a join the planner cannot split because one side must stay intact
  (pre-bucketed tables, streaming-static joins) — ``salted_join``.

Both are pure plan rewrites: results are identical to the unsalted form
(verified against the plain plan in tests), only the shuffle key gains
entropy. The engine's own joins are broadcast (IOC, lookups) or bucketed
(historical), so these are user-query tools, exported for the SQL surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SALT = "_sa_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys on ``left``: the left side gets a
    uniform random salt in [0, salt), the right side is replicated once per
    salt value, and the join key becomes (on, salt) — a hot key spreads
    over ``salt`` reducers instead of one. Right-side replication costs
    |right| * salt rows, so use for small-to-medium right sides (a big-big
    skewed join should lean on AQE skew splitting instead)."""
    salted_left = left.withColumn(_SALT, (F.rand() * salt).cast("int"))
    salted_right = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_left.join(salted_right, [on, _SALT], how)
    return out.drop(_SALT)


def salted_two_stage_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation for hot grouping keys with combinable
    aggregates: stage 1 aggregates on (keys + salt) — spreading a hot key
    over ``salt`` partial groups — stage 2 merges the partials on keys.

    ``aggs`` maps output column name -> (partial_agg_expr, merge_agg_expr),
    e.g. {"cnt": (F.count(F.lit(1)), F.sum("cnt"))}. For plain
    count/sum/min/max Spark's map-side partial aggregation already bounds
    skew; this matters when stage 1 must materialize per-group state too
    big for a single reducer (distinct sets, sketches, collect_list caps).
    """
    partial_exprs = [expr.alias(name) for name, (expr, _) in aggs.items()]
    merge_exprs = [expr.alias(name) for name, (_, expr) in aggs.items()]
    staged = (
        df.withColumn(_SALT, (F.rand() * salt).cast("int"))
        .groupBy(*keys, _SALT)
        .agg(*partial_exprs)
    )
    return staged.groupBy(*keys).agg(*merge_exprs)


def topk_salt_parts(order_cols, payload_cols, salt):
    """(ordered struct, payload struct, salt column) used by salted_topk —
    exposed so skew fixtures can assert a hot key's rows really spread
    across salt buckets with the op's own derivation."""
    ordered = F.struct(*[F.col(c) for c in order_cols])
    extra = [F.col(c) for c in payload_cols if c not in order_cols]
    # F.struct() with zero fields is illegal — a constant stands in when
    # every payload column already rides in the ordering struct
    payload = F.struct(*extra) if extra else F.struct(F.lit(0).alias("_"))
    salt_col = F.pmod(
        F.conv(F.substring(F.md5(F.to_json(F.struct(ordered, payload))),
                           1, 4), 16, 10)
        .cast("bigint"),
        F.lit(salt),
    )
    return ordered, payload, salt_col


def salted_topk(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    payload_cols: list[str],
    k: int,
    salt: int = 16,
) -> DataFrame:
    """EXACT top-k rows per key group, skew-safe: the hot-key hazard of
    plain window ``row_number() <= k`` is that EVERY row of a key lands
    on ONE reducer's sort; here stage 1 ranks within (key, salt) — a hot
    key's sort work spreads over ``salt`` buckets running in parallel,
    each an EXTERNAL (spill-able) window sort, never an in-memory
    collect_list buffer — and stage 2 re-ranks the surviving salt*k rows
    per key. Top-k of a union of per-bucket top-ks IS the global top-k,
    so the result is identical to the window form. Ordering is
    descending over ``order_cols`` lexicographically and over NOTHING
    else — payload columns never participate in the sort — so
    ``order_cols`` must totally order rows within a key (include a
    unique tie-break column) or which tied row survives the k boundary
    is nondeterministic, exactly as with the plain window form.
    Output: keys + payload_cols + rank (1-based)."""
    ordered, payload, salt_col = topk_salt_parts(
        order_cols, payload_cols, salt)
    staged = df.select(*keys, salt_col.alias(_SALT),
                       ordered.alias("_ord"), payload.alias("_pay"))
    w1 = Window.partitionBy(*keys, _SALT).orderBy(F.col("_ord").desc())
    stage1 = (
        staged.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", _SALT)
    )
    # stage 2 sees at most salt*k rows per key
    w2 = Window.partitionBy(*keys).orderBy(F.col("_ord").desc())
    out = (stage1.withColumn("rank", F.row_number().over(w2))
           .filter(F.col("rank") <= k))
    cols = [F.col(c) for c in keys]
    cols += [
        F.col(f"_ord.{c}").alias(c) if c in order_cols
        else F.col(f"_pay.{c}").alias(c)
        for c in payload_cols
    ]
    cols.append(F.col("rank").cast("bigint").alias("rank"))
    return out.select(*cols)


def salted_exact_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    out_name: str = "n_distinct",
    salt: int = 16,
) -> DataFrame:
    """EXACT distinct count per key group, skew-safe: the salt is derived
    from the VALUE (md5 prefix mod salt), so every occurrence of a value
    lands in the same salt bucket — per-bucket distinct counts are
    disjoint and their sum is exact (a random salt would double-count a
    value split across buckets). A hot grouping key's distinct state
    spreads over ``salt`` reducers instead of one; stage 2 merges
    ``salt`` scalars per group."""
    salt_col = F.pmod(
        F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 4),
               16, 10).cast("bigint"),
        F.lit(salt),
    )
    staged = (
        df.groupBy(*keys, salt_col.alias(_SALT))
        .agg(F.count_distinct(value_col).alias("_partial"))
    )
    return staged.groupBy(*keys).agg(
        F.sum("_partial").cast("bigint").alias(out_name))


def skew_diagnostics(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Hot-key diagnostics for a prospective shuffle key — the measurement
    step BEFORE deciding to salt (ops/skew.salted_skew_join_agg) or rely
    on AQE skew splitting: per-key counts, each top key's exact share in
    ppm, and its ratio to the average key (x1000, integer fixed point).

    Plan: one partial-aggregated groupBy(key) count, a 1-row global
    aggregate attached by broadcast (scalar, never collected), and a
    TakeOrderedAndProject for the top-N — no global sort, no driver loop.
    Fixed-point terms stay in BIGINT; cnt*1e6 and cnt*n_keys*1000 bound
    the exact range (documented: overflows past ~9e12 rows per key —
    far above any real per-key count).
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").cast("bigint").alias("total_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("key")).limit(top_n)
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            "key", "cnt", "total_rows", "n_keys",
            F.expr("(cnt * CAST(1000000 AS BIGINT)) DIV total_rows")
             .alias("share_ppm"),
            F.expr("(cnt * n_keys * CAST(1000 AS BIGINT)) DIV total_rows")
             .alias("ratio_to_avg_x1000"),
        )
    )
