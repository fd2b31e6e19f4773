"""Incremental view maintenance for JOINs (insert-only delta rule).

A materialized join J = A ⋈ B updates under insert batches (ΔA, ΔB)
without recomputing either side:

    ΔJ = (ΔA ⋈ B_old) ∪ (A_old ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

— the classic distributivity-of-join-over-union rule; J_new = J_old ∪ ΔJ
exactly (bag semantics: no dedup anywhere, duplicates multiply the same
way they would in the full recompute). Deletes need the counting
algorithm (multiplicity columns) — out of scope here and documented,
matching the insert-only shape of an append-only log pipeline.

Scale: this is THE reason to maintain instead of recompute — each term
joins a DELTA against a stored side, so with delta-side broadcast
(size-gated) the big stored relations are scanned but never shuffled,
and maintenance cost is O(|Δ| + matches), independent of |J|. At 100 TB
the stored sides should additionally be bucketed on the join key so even
the over-gate fallback shuffles only the delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from streamalert_spark.ops.hints import gated_broadcast


def delta_join(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str],
) -> DataFrame:
    """ΔJ for J = A ⋈ B under insert-only deltas. Column layout follows
    Spark's ``join(..., on)``: join keys once, then A-side, then B-side
    columns — identical to what the full recompute produces, so
    J_old ∪ ΔJ and the recompute are row-for-row interchangeable."""
    parts = [
        a_delta.join(gated_broadcast(b_old), on),
        gated_broadcast(a_delta).join(b_delta, on),
    ]
    # a_old ⋈ Δb: keep the big stored side on the left so the plan reads
    # scan(A) + broadcast(Δb) — A is never shuffled under the gate
    parts.append(a_old.join(gated_broadcast(b_delta), on))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def maintain_join(
    j_old: DataFrame,
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str],
) -> DataFrame:
    """J_new = J_old ∪ ΔJ (bag union — the maintained view)."""
    return j_old.unionByName(delta_join(a_old, a_delta, b_old, b_delta, on))
