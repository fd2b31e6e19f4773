"""Data selection via hashed n-gram importance resampling (DSIR).

DSIR (Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling") scores every raw document by the likelihood ratio of a
TARGET bag-of-hashed-ngrams model over a SOURCE (raw-pool) model, then
resamples by that importance weight. The published estimator is
``log w(x) = sum_f c_f(x) * log(p_target(f) / p_source(f))`` over hashed
unigram+bigram features f.

The log is the same cross-engine reproducibility hazard BM25's idf was
(`ops/retrieval.py` — libm low bits differ between engines), so this op
uses the RATIONAL per-feature ratio with add-one smoothing,

    r_f = ((tgt_f + 1) * (S_tot + B)) / ((src_f + 1) * (T_tot + B)),

emitted as fixed point ``floor(num/den * 1e6)`` — exact integer
numerator/denominator, ONE IEEE division and multiply, bit-identical on
any engine — and the per-doc score is the exact BIGINT sum of
``c_f(x) * fp(r_f)``. Per-feature ordering (more-target-like feature ->
bigger weight) is preserved; the score is the linear-space analogue of
DSIR's log weight, monotone per feature. Bounds: num <= (tgt+1)*(S+B)
must stay under 2^53 for exact int->double conversion — ~1e6 gram
instances squared is 1e12; for web-scale corpora count grams in
thousands-of-instances units first (same contract as BM25's T).

Scale plan: features are hashed into B buckets (B = 256 here), so the
bucket-statistics relation is B rows BY CONSTRUCTION — a scale-free
broadcast regardless of corpus size. The only data-sized shuffle is the
(doc, bucket) tf aggregate, which partial-aggregates map-side. Nothing
is proportional to the corpus vocabulary — that is the point of hashed
DSIR and why it runs at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamalert_spark.ops.sketch import hex_prefix_int
from streamalert_spark.ops.text import ngram_array, tokens

DSIR_BUCKETS = 256


def hashed_gram_buckets(docs: DataFrame, id_col: str, text_col: str,
                        buckets: int = DSIR_BUCKETS) -> DataFrame:
    """(id, bucket) per gram INSTANCE (unigrams + bigrams), bucket =
    md5-prefix-int of the gram mod ``buckets`` — portable across engines."""
    toks = tokens(F.col(text_col))
    grams = F.concat(toks, ngram_array(toks, 2))
    return docs.select(
        F.col(id_col),
        F.explode(grams).alias("gram"),
    ).select(
        F.col(id_col),
        (hex_prefix_int(F.md5(F.col("gram"))) % buckets).alias("bucket"),
    )


def dsir_importance(docs: DataFrame, id_col: str, text_col: str,
                    target_filter, buckets: int = DSIR_BUCKETS) -> DataFrame:
    """Per-doc fixed-point DSIR importance score.

    ``target_filter`` is a boolean Column selecting the target exemplar
    docs (they stay in the source pool too, matching DSIR's raw/target
    split where the raw pool is the full corpus). Output:
    (id_col, n_grams, score_fp) — score_fp the summed micro-unit
    per-feature rational log-ratio analogue described in the module doc.
    """
    inst = hashed_gram_buckets(docs, id_col, text_col, buckets)
    tgt_ids = docs.filter(target_filter).select(id_col)
    # tf is the ONLY corpus-scale aggregate this op needs: the source and
    # target bucket frequencies are exact re-aggregations of it
    # (sum of per-doc counts == total instance count per bucket), so the
    # gram explode + md5 runs ONCE instead of three times (tf, src_b,
    # tgt_b each embedded the `inst` subtree pre-r13 — guide §2.4). tf
    # feeds three consumers (src_b, tgt_b, the weighted join), hence the
    # per-invocation cache.
    from streamalert_spark.ops.dedup import _swap_cache

    tf = _swap_cache("dsir_tf", inst.groupBy(id_col, "bucket")
                     .agg(F.count(F.lit(1)).alias("tf")))

    src_b = tf.groupBy("bucket").agg(F.sum("tf").alias("src_f"))
    # the target exemplar set is data-dependent (often small, but here it
    # is a corpus slice) — size-gate the hint rather than forcing it
    from streamalert_spark.ops.hints import gated_broadcast

    tgt_b = (
        tf.join(gated_broadcast(tgt_ids), id_col, "left_semi")
        .groupBy("bucket").agg(F.sum("tf").alias("tgt_f"))
    )
    stats = (
        src_b.join(tgt_b, "bucket", "left")
        .na.fill({"tgt_f": 0})
    )
    totals = stats.agg(F.sum("src_f").alias("s_tot"),
                       F.sum("tgt_f").alias("t_tot"))
    stats = stats.crossJoin(F.broadcast(totals))
    num = (F.col("tgt_f") + 1) * (F.col("s_tot") + buckets)
    den = (F.col("src_f") + 1) * (F.col("t_tot") + buckets)
    fp = F.floor((num.cast("double") / den.cast("double"))
                 * F.lit(1000000.0)).cast("bigint")
    weighted = tf.join(F.broadcast(stats.select("bucket", fp.alias("fp_r"))),
                       "bucket")
    return (
        weighted.groupBy(id_col)
        .agg(F.sum("tf").cast("bigint").alias("n_grams"),
             F.sum(F.col("tf") * F.col("fp_r")).cast("bigint")
             .alias("score_fp"))
    )
