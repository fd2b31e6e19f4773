"""BM25-family full-text retrieval scoring, engine-exact.

Standard BM25 is ``sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``
with ``idf = ln((N-df+0.5)/(df+0.5)+1)``. The ln is a reproducibility
hazard (libm low bits differ across engines — the same reason the E-S
sampler avoids pow/log), so this op uses the RATIONAL idf variant
``(N-df+0.5)/(df+0.5)`` — the same per-term monotonicity (rarer term ->
bigger weight, df ordering preserved), no transcendental functions. With
k1 = 1.2 and b = 0.75 the whole per-term score folds into one exact
integer fraction:

    score_t = (2N-2df+1) * 22 * tf * T
              -----------------------------------   (T = total tokens,
              (2df+1) * (10*tf*T + 3*T + 9*dl*N)     avgdl = T/N)

emitted as fixed-point ``floor(num/den * 1e6)`` — one IEEE division and
multiply, bit-identical on any engine — and the per-doc score is an exact
BIGINT SUM of per-term fixed-point values, immune to accumulation order.

Bounds: num <= 2N * 22 * tf * T must stay under 2^53 for the exact
int->double conversion — ~1e15 at corpus scale N=1e5/T=1e7/tf=1e2; for
web-scale corpora scale T down to thousands-of-tokens units first.

Scale plan: tokens are FILTERED to the query's terms before any shuffle,
so the (doc, term, tf) aggregate carries O(matching docs x |Q|) rows; df
is |Q| rows (broadcast); N/T ride a 1-row broadcast crossJoin. Nothing
here is proportional to the corpus vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_rational_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
) -> DataFrame:
    """Per-doc fixed-point BM25 (rational idf, k1=1.2, b=0.75) for docs
    matching >= 1 query term: (id_col, matched_terms, score_fp) where
    score_fp is the summed per-term micro-unit score."""
    toks = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).alias("dl"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term").isin(query_terms))
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("t"),
    )
    num = ((2 * F.col("n") - 2 * F.col("df") + 1)
           * 22 * F.col("tf") * F.col("t"))
    den = ((2 * F.col("df") + 1)
           * (10 * F.col("tf") * F.col("t") + 3 * F.col("t")
              + 9 * F.col("dl") * F.col("n")))
    fp = F.floor((num.cast("double") / den.cast("double"))
                 * F.lit(1000000.0)).cast("bigint")
    return (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("score_t", fp)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("matched_terms"),
             F.sum("score_t").cast("bigint").alias("score_fp"))
    )
