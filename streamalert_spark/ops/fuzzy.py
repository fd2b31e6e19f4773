"""Fuzzy string matching — typo-level near-duplicate detection via
character-q-gram blocking + edit-distance verification (the record-
linkage / data-cleaning companion to the token-level MinHash dedup in
ops/dedup.py: MinHash finds content overlap, this finds SPELLING
variants — entity aliases, OCR noise, typo'd hostnames).

Scale design mirrors the LSH pattern: candidates come from a q-gram
equi-join (shuffle O(strings x grams), never O(n^2)), and the quadratic
Levenshtein verifier touches candidate pairs only, with Spark's
threshold argument short-circuiting the DP once the bound is exceeded.

Completeness bound: two strings within edit distance k are GUARANTEED to
share a q-gram only when their length reaches q*(k+1) (each edit
destroys at most q grams, and a length-L string has L-q+1 of them).
Strings below that bound therefore pair exhaustively against the
(small) short-string set plus everything within k of it in length —
the short side is a skew-free broadcast at any corpus size, so the
guarantee holds at every length without an O(n^2) blowup.
All JVM expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_ngrams(col: Column, n: int = 3) -> Column:
    """Array of character n-grams (empty for strings shorter than n —
    guard required: Spark's sequence(1, 0) counts DOWN)."""
    idx = F.sequence(F.lit(1), F.length(col) - (n - 1))
    grams = F.transform(idx, lambda i: F.substring(col, i, F.lit(n)))
    return F.when(F.length(col) >= n, grams).otherwise(F.array().cast("array<string>"))


def edit_distance_pairs(
    df: DataFrame,
    text_col: str,
    max_distance: int = 2,
    n: int = 3,
) -> DataFrame:
    """(n1, n2, dist) for DISTINCT values of ``text_col`` within
    ``max_distance`` edits, n1 < n2 — COMPLETE at every string length:
    long strings (>= n*(max_distance+1)) pair via the q-gram block;
    shorter strings, where the q-gram guarantee does not hold, pair
    exhaustively against every name within max_distance in length
    (the short side broadcasts). The verifier is levenshtein with the
    threshold pushed into the JVM expression (early-exit DP returning -1
    past the bound)."""
    names = df.select(F.col(text_col).alias("name")).distinct()
    guarantee_len = n * (max_distance + 1)

    long_names = names.filter(F.length("name") >= guarantee_len)
    grams = long_names.select(
        "name", F.explode(char_ngrams(F.col("name"), n)).alias("g")
    ).distinct()
    a = grams.select(F.col("name").alias("n1"), "g")
    b = grams.select(F.col("name").alias("n2"), "g")
    blocked = (
        a.join(b, "g")
        .filter(F.col("n1") < F.col("n2"))
        .select("n1", "n2")
        .distinct()
    )
    # short strings: exhaustive against everything within k in length —
    # the SHORT side broadcasts (it is the small set by construction;
    # broadcasting all names would not survive a large corpus)
    shorts = names.filter(F.length("name") < guarantee_len)
    short_pairs = (
        names.select(F.col("name").alias("other"))
        .join(F.broadcast(shorts.select(F.col("name").alias("short"))),
              (F.col("short") != F.col("other"))
              & (F.abs(F.length("short") - F.length("other"))
                 <= max_distance))
        .select(F.least("short", "other").alias("n1"),
                F.greatest("short", "other").alias("n2"))
    )
    cand = blocked.unionByName(short_pairs).distinct()
    dist = F.levenshtein(F.col("n1"), F.col("n2"), max_distance)
    return (
        cand.select("n1", "n2", dist.cast("bigint").alias("dist"))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_distance))
    )
