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

Frequent-gram (stop-gram) mitigation — prefix filtering (the Ed-Join
technique, Xiao et al. 2008): each string joins on only its q*k+1
RAREST grams under a global total order (document frequency ascending,
gram string as tie-break). Completeness: k edits destroy at most q*k
distinct grams of either string, so two strings within distance k share
at least max(|G(s)|,|G(t)|) - q*k grams; by the prefix-filter principle
their (q*k+1)-prefixes under ANY shared total order must then
intersect. A trigram occurring in half the corpus thus stops feeding
the candidate join entirely (it is kept only by strings with fewer than
q*k+1 rarer grams), turning the classic hot-gram near-quadratic bucket
into a bounded one. All JVM expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streamalert_spark.ops.hints import gated_broadcast


def char_ngrams(col: Column, n: int = 3) -> Column:
    """Array of character n-grams (empty for strings shorter than n —
    guard required: Spark's sequence(1, 0) counts DOWN)."""
    idx = F.sequence(F.lit(1), F.length(col) - (n - 1))
    grams = F.transform(idx, lambda i: F.substring(col, i, F.lit(n)))
    return F.when(F.length(col) >= n, grams).otherwise(F.array().cast("array<string>"))


def qgram_block_candidates(
    names: DataFrame,
    n: int = 3,
    max_distance: int = 2,
) -> DataFrame:
    """Candidate pairs (n1 < n2) from the prefix-filtered q-gram block,
    for names long enough for the q-gram guarantee (module docstring).
    Each name joins on only its n*max_distance+1 rarest grams under the
    global (document frequency, gram) order — complete by the
    prefix-filter principle, and a corpus-wide stop-gram contributes to
    no prefix, so no gram bucket goes quadratic."""
    from pyspark.sql import Window

    guarantee_len = n * (max_distance + 1)
    long_names = names.filter(F.length("name") >= guarantee_len)
    grams = long_names.select(
        "name", F.explode(char_ngrams(F.col("name"), n)).alias("g")
    ).distinct()
    prefix_len = n * max_distance + 1
    gram_df = grams.groupBy("g").agg(F.count(F.lit(1)).alias("gram_df"))
    prefix = (
        grams.join(gram_df, "g")
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("name").orderBy("gram_df", "g")))
        .filter(F.col("rn") <= prefix_len)
        .select("name", "g")
    )
    a = prefix.select(F.col("name").alias("n1"), "g")
    b = prefix.select(F.col("name").alias("n2"), "g")
    return (
        a.join(b, "g")
        .filter(F.col("n1") < F.col("n2"))
        .select("n1", "n2")
        .distinct()
    )


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

    blocked = qgram_block_candidates(names, n=n, max_distance=max_distance)
    # short strings: exhaustive against everything within k in length —
    # the SHORT side broadcasts (distinct strings shorter than n*(k+1)
    # chars: the universe is bounded by alphabet^(n*(k+1)), and in any
    # real corpus the distinct short-name set is tiny). The hint is still
    # size-gated — a pathological corpus of millions of distinct short
    # strings falls back to AQE's shuffle join instead of OOMing.
    shorts = names.filter(F.length("name") < guarantee_len)
    short_pairs = (
        names.select(F.col("name").alias("other"))
        .join(gated_broadcast(shorts.select(F.col("name").alias("short"))),
              (F.col("short") != F.col("other"))
              & (F.abs(F.length("short") - F.length("other"))
                 <= max_distance))
        .select(F.least("short", "other").alias("n1"),
                F.greatest("short", "other").alias("n2"))
    )
    cand = blocked.unionByName(short_pairs).distinct()
    dist = F.levenshtein(F.col("n1"), F.col("n2"), max_distance)
    out = (
        cand.select("n1", "n2", dist.cast("bigint").alias("dist"))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_distance))
    )
    # cache the verified pairs: downstream consumers iterate over them
    # (connected components) and sibling queries recompute the identical
    # plan — Spark's cache manager keys on the analyzed plan, so one
    # cached frame serves both (same swap discipline as the LSH family)
    from streamalert_spark.ops.dedup import _swap_cache

    return _swap_cache("fuzzy_pairs", out)
