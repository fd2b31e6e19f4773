"""Fuzzy string matching — typo-level near-duplicate detection via
character-q-gram blocking + edit-distance verification (the record-
linkage / data-cleaning companion to the token-level MinHash dedup in
ops/dedup.py: MinHash finds content overlap, this finds SPELLING
variants — entity aliases, OCR noise, typo'd hostnames).

Scale design mirrors the LSH pattern: candidates come from a q-gram
equi-join (shuffle O(strings x grams), never O(n^2) — any two strings
within edit distance k share at least one q-gram once their length
exceeds q*(k+1), the standard positional q-gram filter bound), and the
quadratic Levenshtein verifier touches candidate pairs only, with
Spark's threshold argument short-circuiting the DP once the bound is
exceeded. All JVM expressions — no UDFs.
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
    ``max_distance`` edits, n1 < n2. Candidates share at least one
    character n-gram; the verifier is levenshtein with the threshold
    pushed into the JVM expression (early-exit DP)."""
    names = df.select(F.col(text_col).alias("name")).distinct()
    grams = names.select(
        "name", F.explode(char_ngrams(F.col("name"), n)).alias("g")
    ).distinct()
    a = grams.select(F.col("name").alias("n1"), "g")
    b = grams.select(F.col("name").alias("n2"), "g")
    cand = (
        a.join(b, "g")
        .filter(F.col("n1") < F.col("n2"))
        .select("n1", "n2")
        .distinct()
    )
    dist = F.levenshtein(F.col("n1"), F.col("n2"))
    return (
        cand.select("n1", "n2", dist.cast("bigint").alias("dist"))
        .filter(F.col("dist") <= max_distance)
    )
