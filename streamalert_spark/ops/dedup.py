"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design:
- exact dedup is a hash-groupBy — one shuffle on the 32-hex md5 key, which
  is uniformly distributed so never skewed;
- n-gram Jaccard's pairwise form is quadratic and exists as the *verifier*;
  candidate generation at scale is MinHash+LSH (shingle -> K min-hashes ->
  bands -> bucket join), which shuffles on band keys only, so cost is
  O(docs x bands), not O(docs^2);
- all hashing is md5-of-string: portable across engines (DuckDB oracle
  computes identical signatures) and stable across Spark versions, unlike
  xxhash64/hash which are not part of the result contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_HASHES = 16
DEFAULT_BAND_SIZE = 4


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5(text) -> canonical (min id) + count."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document, via a generated index
    sequence (single-space tokenization for oracle portability)."""
    w = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.size(w) - n)
    gram = F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(w, (i + j + 1).cast("int")) for j in range(n)]))
    return (
        df.select(F.col(id_col), F.explode(gram).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All-pairs n-gram Jaccard >= threshold. Quadratic verifier — at scale,
    feed it only LSH candidates (minhash_lsh_candidates + join)."""
    sh = shingles(df, text_col, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sz_b"))
    jac = F.col("inter").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.join(sz_a, "a").join(sz_b, "b")
        .select("a", "b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _minhash_expr(i: int) -> Column:
    """Portable hash family: lexicographic min of md5(i || ':' || shingle).
    md5 output is uniform, so the lexicographic min is a valid min-hash."""
    return F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh_{i}")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """(doc_id, mh_0..mh_{K-1}) — one aggregation pass over shingles."""
    sh = shingles(df, text_col, id_col, n)
    return sh.groupBy(id_col).agg(*[_minhash_expr(i) for i in range(num_hashes)])


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing any LSH band bucket.

    band key = md5(concat of the band's min-hashes); docs are joined on
    (band_idx, band_key) — the scale path that avoids the quadratic
    shingle self-join.
    """
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes)
    num_bands = num_hashes // band_size
    bands = []
    for bi in range(num_bands):
        cols = [F.col(f"mh_{bi * band_size + j}") for j in range(band_size)]
        bands.append(
            sig.select(
                F.col(id_col),
                F.lit(bi).alias("band_idx"),
                F.md5(F.concat_ws("|", *cols)).alias("band_key"),
            )
        )
    banded = bands[0]
    for b in bands[1:]:
        banded = banded.unionByName(b)
    left = banded.select(F.col(id_col).alias("a"), "band_idx", "band_key")
    right = banded.select(F.col(id_col).alias("b"), "band_idx", "band_key")
    return (
        left.join(right, ["band_idx", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def simhash_bits(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """SimHash over distinct tokens: per bit position j, majority vote of
    md5(token)'s j-th bit (+1/-1). Output (doc_id, simhash) with the hash as
    a 64-char bit string — portable across engines (no engine-native hash,
    no bigint bit ops).

    Bit j of an md5 hex digest = (hexdigit[j/4] >> (3 - j%4)) & 1, computed
    arithmetically: floor(digit / 2^(3-j%4)) % 2.
    """
    toks = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
        .withColumn("h", F.md5(F.col("w")))
    )
    j = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j")
    per_bit = toks.select(id_col, "h", j)
    hex_digit = F.substring(F.col("h"), (F.col("j") / 4).cast("int") + 1, 1)
    digit = F.position(hex_digit, F.lit("0123456789abcdef")) - 1
    shift = F.pow(F.lit(2.0), (3 - F.col("j") % 4).cast("double")).cast("bigint")
    bit = (digit.cast("bigint") / shift).cast("bigint") % 2
    votes = (
        per_bit.withColumn("vote", F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1)))
        .groupBy(id_col, "j")
        .agg(F.sum("vote").alias("v"))
        .withColumn("outbit", F.when(F.col("v") > 0, F.lit("1")).otherwise(F.lit("0")))
    )
    return (
        votes.groupBy(id_col)
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "outbit"))),
                    lambda s: s["outbit"],
                ),
            ).alias("simhash")
        )
    )
