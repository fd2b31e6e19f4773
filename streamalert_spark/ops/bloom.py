"""Portable Bloom-filter semi-join reduction.

The classic 100 TB shuffle-reduction move: when a huge fact table joins a
dimension subset too large (or too dynamic) for a plain broadcast-join of
the keys themselves, build a Bloom filter over the dim keys, broadcast the
BITMAP (m bits, independent of key count or key width), and pre-filter the
fact scan before the exact join — the shuffle then carries only true
matches plus a bounded false-positive fraction.

Spark can inject this automatically (runtime bloom-filter joins,
``spark.sql.optimizer.runtime.bloomFilter.enabled``, and its
``bloom_filter_agg`` / ``might_contain`` expressions), but the native
sketch is engine-specific (xxhash64-based) and therefore never
oracle-checkable. This module builds the filter from PORTABLE primitives —
bit i = hex12(md5("i:" || key)) % m — so a DuckDB oracle reproduces the
exact same bitmap, membership verdicts, and false-positive accounting,
bit for bit. Use the native runtime filter in production when
verifiability doesn't matter; use this when the filter must be exact
across engines, persisted, or applied outside Spark.

The dim->bitmap step collects at most m bit positions to the driver
(metadata-scale, like IVF centroids — m is a few hundred to a few
thousand bits regardless of data volume); the fact-side membership test
is a pure Column expression (substring into the broadcast bitmap
literal), fully codegen'd, no UDFs, no shuffle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streamalert_spark.ops.sketch import hex_prefix_int, hex_prefix_int_sql

BLOOM_M = 256  # bits — demo calibration; production sizes via bloom_calibrate
BLOOM_K = 3    # hash functions


def bloom_calibrate(n_expected: int, fpp: float) -> tuple[int, int]:
    """Production sizing: (m, k) for ``n_expected`` keys at target false-
    positive probability ``fpp`` — the standard optima
    m = ceil(-n*ln(p)/ln(2)^2) and k = round(m/n * ln 2). Size for the
    PRODUCTION key count: a filter built over fewer keys than n_expected
    just runs below the target fpp; one built over more keys degrades
    smoothly (fpp ~ (1-e^(-kn/m))^k). The m-bit broadcast state is what
    makes this the 100 TB semi-join move — 10M keys at 1% fpp is ~12 MB
    of bitmap, broadcastable where the raw key set is not."""
    if n_expected < 1 or not (0.0 < fpp < 1.0):
        raise ValueError(f"bad calibration: n={n_expected}, p={fpp}")
    m = math.ceil(-n_expected * math.log(fpp) / (math.log(2) ** 2))
    k = max(1, round(m / n_expected * math.log(2)))
    return m, k


def bloom_bit(key: Column, i: int, m: int = BLOOM_M) -> Column:
    """Bit position i for a key: hex12(md5("i:" || key)) % m."""
    return F.pmod(
        hex_prefix_int(F.md5(F.concat(F.lit(f"{i}:"), key.cast("string")))),
        F.lit(m),
    )


def bloom_bit_sql(key_expr: str, i: int, m: int = BLOOM_M) -> str:
    """The identical bit position as engine-portable SQL text."""
    h = f"md5('{i}:' || CAST({key_expr} AS VARCHAR))"
    return f"(({hex_prefix_int_sql(h)}) % {m})"


def bloom_bitmap(keys_df: DataFrame, key_col: str,
                 m: int = BLOOM_M, k: int = BLOOM_K) -> str:
    """Build the filter over ``keys_df[key_col]`` and return it as an
    m-character '0'/'1' string. Distributed bit computation, then a
    metadata-scale collect of <= m distinct positions."""
    bits = (
        keys_df.select(
            F.explode(F.array(*[bloom_bit(F.col(key_col), i, m)
                                for i in range(k)])).alias("pos"))
        .distinct()
    )
    positions = {row["pos"] for row in bits.collect()}
    return "".join("1" if p in positions else "0" for p in range(m))


def bloom_member(key: Column, bitmap: str, k: int = BLOOM_K) -> Column:
    """Membership test against a bitmap string: all k bits set. A pure
    whole-stage-codegen expression over the broadcast literal — the
    fact-side scan filter of the semi-join reduction."""
    m = len(bitmap)
    lit_map = F.lit(bitmap)
    cond = F.lit(True)
    for i in range(k):
        cond = cond & (F.substring(lit_map, bloom_bit(key, i, m) + 1, 1) == "1")
    return cond
