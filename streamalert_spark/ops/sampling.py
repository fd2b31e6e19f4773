"""Deterministic weighted sampling (Efraimidis–Spirakis) as a DataFrame op.

E-S assigns each item the key ``u^(1/w)`` (u uniform) and takes the top-k
keys — a weighted sample WITHOUT replacement whose selection probabilities
are exactly proportional to the weights. Computing ``u^(1/w)`` directly
needs pow()/log(), whose low bits differ across engines and libm versions
(a reproducibility hazard this repo's parity gate would catch); instead the
key is the MAX of ``w`` portable md5 draws — max of w uniforms has CDF
``u^w``, i.e. the same distribution as the E-S key — so the sample is
bit-reproducible across engines, runs, and cluster sizes with no RNG state.

Scale contract: the draw EXPLODES each row into ``weight`` hash rows —
O(Σ weights) — with a map-side max-combine, so the shuffle carries one row
per item; the scan multiplier is the mean weight. That is the documented
hard bound: ``max_weight`` (default 1024) caps the per-row explosion, and
a row whose weight exceeds it fails fast with a runtime error rather than
silently multiplying the scan. For genuinely large weights (item weights in
the millions — e.g. popularity counts) pre-bucket the weight into a coarser
unit upstream, or use the A-ExpJ single-pass variant with engine-pinned
float math; don't raise the cap past what an executor's explode can hold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Hard per-row explosion bound. 1024 hash rows per item keeps the explode
# a small constant factor over the scan; raise deliberately, never blindly.
MAX_SAMPLE_WEIGHT = 1024


def weighted_sample_keys(
    df: DataFrame,
    id_col: str,
    weight_col: str | Column,
    salt: str = "ws",
    max_weight: int = MAX_SAMPLE_WEIGHT,
) -> DataFrame:
    """Append a deterministic E-S sampling key ``draw`` per row.

    ``ORDER BY draw DESC LIMIT k`` over the result is a weighted sample
    without replacement. Weights must be integers in [1, max_weight];
    out-of-range weights raise at execution time (the guard is a Column
    expression, so it rides the distributed scan — no driver-side pass).

    Contract: ``id_col`` identifies the sampled ITEM — rows sharing an id
    are one item (the groupBy merges them, non-id columns via first());
    dedupe upstream if duplicate ids are not intended. Reserved column
    names (_w/_j/_h/draw) must not exist on the input — collisions fail
    fast here rather than silently clobbering data.
    """
    reserved = {"_w", "_j", "_h", "draw"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"weighted_sample_keys: input columns collide with reserved "
            f"names: {sorted(reserved)}")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    guarded = F.when(
        (w >= 1) & (w <= F.lit(max_weight)), w,
    ).otherwise(
        F.raise_error(F.concat(
            F.lit(f"weighted_sample_keys: weight out of [1, {max_weight}]: "),
            # a NULL weight must fail with a READABLE message — bare
            # concat(..., NULL) would null the whole error string
            F.coalesce(w.cast("string"), F.lit("NULL")),
        ))
    )
    draws = (
        df.withColumn("_w", guarded)
        .withColumn("_j", F.explode(F.sequence(F.lit(1), F.col("_w"))))
        .withColumn(
            "_h",
            F.md5(F.concat(
                F.lit(salt), F.lit(":"),
                F.col(id_col).cast("string"),
                F.lit(":"), F.col("_j").cast("string"))),
        )
    )
    others = [c for c in df.columns if c != id_col]
    return (
        draws.groupBy(id_col)
        .agg(F.max("_h").alias("draw"),
             *[F.first(c).alias(c) for c in others])
        .select(*df.columns, "draw")
    )
