"""Data-layout optimization: Z-order (Morton) clustering keys and the
file-pruning ledger that proves why they matter.

At 100 TB the cheapest predicate is the one that never reads the file:
engines skip whole files/row-groups whose min/max column stats exclude
the query box. A single-column sort gives perfect pruning on that column
and none on any other; a Z-ORDER layout interleaves the bits of two (or
more) dimensions so files cover small HYPER-RECTANGLES — a box predicate
on ANY participating dimension prunes. This is what Delta/Iceberg
``OPTIMIZE ZORDER BY`` does; here the curve itself is implemented as pure
integer Column arithmetic (bit interleave = shift/mask/scale — exact and
engine-portable), so the whole ledger is oracle-checkable.

``z_value`` is the write-path operator (compute the clustering key, then
``df.repartitionByRange(F.col("z")).sortWithinPartitions("z")`` before the
parquet write — each output file then holds one compact z-range).
``layout_ledger`` is the read-path audit: per-file min/max stats plus the
candidate verdict for a query box — exactly the metadata a scan planner
consults, so "how many files survive pruning" is a first-class, testable
number rather than folklore.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

Z_BITS = 8  # bits per dimension; z in [0, 2^(2*Z_BITS))


def z_value(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of two non-negative ints in [0, 2^bits):
    bit i of x lands at position 2i, bit i of y at 2i+1. Pure
    shift/mask/multiply — whole-stage codegen, no UDF."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + F.shiftright(x.cast("bigint"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        z = z + F.shiftright(y.cast("bigint"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
    return z


def z_value_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    """The identical interleave as engine-portable SQL text."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({y} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"


def compaction_plan(
    files: DataFrame,
    partition_col: str,
    order_col: str,
    size_col: str,
    target: int,
) -> DataFrame:
    """Bin-packing plan for small-file compaction (the OPTIMIZE /
    auto-compaction primitive): within each table partition, files pack
    sequentially in ``order_col`` order and a file opens a new output bin
    whenever the bytes accumulated BEFORE it cross a target-size
    boundary — bin = floor(cum_before / target). Deterministic, one
    window pass per partition (no global sort — the window partitions by
    the table partition), and sequential packing preserves any ordering
    the partition already has (z-order, time), unlike first-fit-decreasing
    which shuffles file contents arbitrarily.

    Output: partition, file order key, file size, and the assigned bin.
    The small-files problem this solves is real at 100 TB: streaming
    ingest writes minute-sized files; metadata and open() overhead then
    dominate scans until compaction rewrites them at target size.
    """
    w = (Window.partitionBy(partition_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(size_col).over(w)
    return files.select(
        partition_col, order_col, F.col(size_col).cast("bigint").alias(size_col),
        F.floor((cum - F.col(size_col)) / F.lit(target))
        .cast("bigint").alias("bin"),
    )


def layout_ledger(
    assigned: DataFrame,
    box: tuple[int, int, int, int],
) -> DataFrame:
    """Per-(layout, file) min/max stats and the pruning verdict for a
    query box (x_lo, x_hi, y_lo, y_hi): a file is a CANDIDATE iff its
    [min,max] envelopes intersect the box on both dimensions — the same
    test a parquet/Delta scan planner runs against footer stats.
    ``assigned`` needs columns (layout, file_id, x, y)."""
    x_lo, x_hi, y_lo, y_hi = box
    box_hit = ~((F.max("x") < x_lo) | (F.min("x") > x_hi)
                | (F.max("y") < y_lo) | (F.min("y") > y_hi))
    # the discriminating case: a predicate ONLY on the secondary dimension
    # — a single-column x-sort layout can never prune it, z-order can
    yband_hit = ~((F.max("y") < y_lo) | (F.min("y") > y_hi))
    return (
        assigned.groupBy("layout", "file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_x"), F.max("x").alias("max_x"),
            F.min("y").alias("min_y"), F.max("y").alias("max_y"),
            box_hit.cast("bigint").alias("candidate"),
            yband_hit.cast("bigint").alias("candidate_yband"),
        )
    )
