"""Training-prep query surface: sequence packing, vocabulary induction,
and data-mixture reweighting — the batch-prep passes that sit between a
curated corpus and a training run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamalert_spark.ops import packing
from streamalert_spark.ops.text import tokens
from streamalert_spark.queries import query
from streamalert_spark.session import local_rows_df


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.session import read_table

    return read_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------

_PACK_ORACLE = """
WITH toked AS (
  SELECT source, CAST(doc_id % 8 AS BIGINT) AS shard, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
assigned AS (
  SELECT source, shard, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS start_tok
  FROM toked
)
SELECT source, shard,
       CAST(floor(start_tok / 512) AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM assigned
GROUP BY source, shard, CAST(floor(start_tok / 512) AS BIGINT)
ORDER BY source, shard, pack_id
"""


@query("pack_sequences", oracle=_PACK_ORACLE,
       doc="Fixed-length sequence packing (512-token windows) within "
           "deterministic (source, doc_id%8) shards — sharded window "
           "cumsum, no global sort, parallelism scales with shard count.")
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        packing.pack_sequences(_docs(spark, sf_dir), seq_len=512, n_shards=8)
        .repartition(1).sortWithinPartitions("source", "shard", "pack_id")
    )


# ---------------------------------------------------------------------------
# Vocabulary induction (word-level top-k)
# ---------------------------------------------------------------------------

_VOCAB_ORACLE = """
WITH toks AS (
  SELECT w FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
  WHERE w <> ''
),
counts AS (SELECT w AS token, COUNT(*) AS freq FROM toks GROUP BY w)
SELECT token, CAST(freq AS BIGINT) AS freq
FROM counts
ORDER BY freq DESC, token
LIMIT 50
"""


@query("vocab_topk", oracle=_VOCAB_ORACLE,
       doc="Word-level vocabulary induction: corpus token frequencies, "
           "top-50 — partial-aggregated count + TakeOrdered, never a "
           "global sort of the vocab.")
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .orderBy(F.col("freq").desc(), "token")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Data-mixture reweighting
# ---------------------------------------------------------------------------

_MIXTURE_ORACLE = """
WITH counts AS (
  SELECT source, lang,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents
  GROUP BY source, lang
),
total AS (SELECT SUM(n_tokens) AS total, COUNT(*) AS n_groups FROM counts)
SELECT source, lang, n_tokens,
       ROUND(CAST(n_tokens AS DOUBLE) / total, 6) AS current_share,
       ROUND(1.0 / n_groups, 6) AS target_share,
       ROUND((CAST(total AS DOUBLE) / n_groups) / n_tokens, 6)
         AS sample_weight
FROM counts, total
ORDER BY source, lang
"""


@query("mixture_reweight", oracle=_MIXTURE_ORACLE,
       doc="Data-mixture reweighting: per-(source, lang) token shares and "
           "the sampling weight that moves each stratum to a uniform "
           "target mix — one partial-aggregated groupBy plus a broadcast "
           "scalar total.")
def mixture_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    counts = (
        docs.groupBy("source", "lang")
        .agg(F.sum(F.size(tokens(F.col("text")))).cast("bigint")
             .alias("n_tokens"))
    )
    total = counts.agg(
        F.sum("n_tokens").alias("total"),
        F.count(F.lit(1)).alias("n_groups"),
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "source", "lang", "n_tokens",
            F.round(F.col("n_tokens") / F.col("total"), 6)
             .alias("current_share"),
            F.round(F.lit(1.0) / F.col("n_groups"), 6).alias("target_share"),
            F.round((F.col("total") / F.col("n_groups")) / F.col("n_tokens"), 6)
             .alias("sample_weight"),
        )
        .repartition(1).sortWithinPartitions("source", "lang")
    )


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------------

_TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, w AS term
  FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
  WHERE w <> ''
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(floor((tf.tf * 1000000.0) / df.df) AS BIGINT) AS score
  FROM tf JOIN df ON tf.term = df.term
),
ranked AS (
  SELECT doc_id, term, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rnk
  FROM scored
)
SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, score
FROM ranked WHERE rnk <= 3
ORDER BY doc_id, rnk
"""


@query("tfidf_top_terms", oracle=_TFIDF_ORACLE,
       doc="Per-doc top-3 keywords by an integer-exact tf/df score "
           "(floor(tf*1e6/df): IEEE division + floor is engine-portable "
           "where log-based idf is not). Shuffles are keyed by term (df) "
           "and doc (rank window) — no global sort.")
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    toks = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    scored = tf.join(df, "term").select(
        "doc_id", "term",
        F.floor((F.col("tf") * 1000000.0) / F.col("df")).cast("bigint")
         .alias("score"),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "term", "score")
        .repartition(1).sortWithinPartitions("doc_id", "rnk")
    )


# ---------------------------------------------------------------------------
# BPE first-merge pair statistics
# ---------------------------------------------------------------------------

_BPE_ORACLE = """
WITH words AS (
  SELECT w, COUNT(*) AS wc
  FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
  WHERE len(w) >= 2
  GROUP BY w
),
pairs AS (
  SELECT substr(w, i, 2) AS pair, wc
  FROM words, UNNEST(range(1, len(w))) AS r(i)
)
SELECT pair, CAST(SUM(wc) AS BIGINT) AS pair_count
FROM pairs
GROUP BY pair
ORDER BY pair_count DESC, pair
LIMIT 20
"""


@query("bpe_merge_pairs", oracle=_BPE_ORACLE,
       doc="BPE induction, first iteration: adjacent character-pair "
           "frequencies weighted by word count — the statistic the first "
           "BPE merge maximizes. Word-count aggregate shrinks the explode "
           "to vocab scale before the pair explode; top-20 by TakeOrdered.")
def bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = (
        _docs(spark, sf_dir)
        .select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w").agg(F.count(F.lit(1)).alias("wc"))
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.substr(F.col("w"), i, F.lit(2)),
            )
        ).alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").cast("bigint").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "pair")
        .limit(20)
    )


def _bpe_recursive_cte(n_merges: int = 10) -> str:
    """Shared WITH RECURSIVE prefix for the BPE oracles: the working
    table ``r`` holds (it, word, wc, syms) for every iteration 0..N.

    The merge inside the recursive term must reproduce ops/bpe.py's
    lookaround-regex semantics — greedy LEFT-TO-RIGHT non-overlapping
    pair merge — and DuckDB's RE2 has no lookarounds, while a
    sentinel-space replace diverges on runs of >= 5 identical symbols
    (pass 1 strands the middle token: 'b b b b b' -> 'bb b bb', greedy
    gives 'bb bb b'). So the merge is applied TOKEN-WISE via a closed
    form of the greedy scan: with p(i) = tokens (i, i+1) equal the pair,
    position i STARTS a merge iff p(i) and the run of consecutive
    p-positions ending at i has odd length (c = i - last_p0 is odd) —
    within any overlap run, greedy takes offsets 0, 2, 4, ...; token
    i+1 of a started merge is consumed. Pinned against the greedy
    list-scan by tests/test_properties.py and by a repeated-symbol
    corpus test in tests/test_training_ext.py.
    """
    return f"""
WITH RECURSIVE vocab0 AS (
  SELECT 0 AS it, w AS word, wc,
         array_to_string(list_transform(range(1, len(w) + 1), i -> w[i:i]),
                         ' ') AS syms
  FROM (
    SELECT w, COUNT(*) AS wc
    FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
    WHERE w <> ''
    GROUP BY w
  )
),
r AS (
  SELECT * FROM vocab0
  UNION ALL
  SELECT it + 1 AS it, word, wc,
         string_agg(emit, ' ' ORDER BY i) AS syms
  FROM (
    SELECT it, word, wc, i,
           CASE WHEN m THEN merged
                WHEN COALESCE(LAG(m) OVER (PARTITION BY word ORDER BY i),
                              FALSE) THEN NULL
                ELSE tok END AS emit
    FROM (
      SELECT it, word, wc, i, tok, merged,
             p AND ((i - COALESCE(MAX(CASE WHEN NOT p THEN i END)
                       OVER (PARTITION BY word ORDER BY i
                             ROWS UNBOUNDED PRECEDING), 0)) % 2 = 1) AS m
      FROM (
        SELECT rp.it, rp.word, rp.wc, u.i, rp.parts[u.i] AS tok,
               (u.i < len(rp.parts)
                AND rp.parts[u.i] = best.a
                AND rp.parts[u.i + 1] = best.b) AS p,
               best.merged AS merged
        FROM (SELECT it, word, wc, string_split(syms, ' ') AS parts
              FROM r WHERE it < {n_merges}) rp,
             UNNEST(range(1, len(rp.parts) + 1)) AS u(i),
             (SELECT pair,
                     string_split(pair, ' ')[1] AS a,
                     string_split(pair, ' ')[2] AS b,
                     replace(pair, ' ', '') AS merged
              FROM (SELECT pair, SUM(wc) AS pair_count
                    FROM (SELECT array_to_string(parts[i:i+1], ' ') AS pair,
                                 wc
                          FROM (SELECT string_split(syms, ' ') AS parts, wc
                                FROM r),
                               UNNEST(range(1, len(parts))) AS t(i))
                    GROUP BY pair
                    ORDER BY pair_count DESC, pair
                    LIMIT 1)
              WHERE pair_count >= 2) best
      )
    )
  )
  GROUP BY it, word, wc
)"""


_BPE_LEARNED_ORACLE = _bpe_recursive_cte() + """
SELECT CAST(it AS BIGINT) AS merge_idx, pair,
       CAST(pair_count AS BIGINT) AS pair_count
FROM (
  SELECT it, pair, SUM(wc) AS pair_count,
         ROW_NUMBER() OVER (PARTITION BY it
                            ORDER BY SUM(wc) DESC, pair) AS rn
  FROM (SELECT it, array_to_string(parts[i:i+1], ' ') AS pair, wc
        FROM (SELECT it, string_split(syms, ' ') AS parts, wc FROM r),
             UNNEST(range(1, len(parts))) AS t(i))
  GROUP BY it, pair
)
WHERE rn = 1 AND it < (SELECT MAX(it) FROM r)
ORDER BY merge_idx
"""


@query("bpe_learned_merges", oracle=_BPE_LEARNED_ORACLE,
       doc="Full iterative BPE merge loop (10 merges): per iteration one "
           "vocab-scale pair aggregate + a single-row argmax collect, "
           "merge applied as a projection; lineage checkpoint-truncated. "
           "Oracle: the same loop as a DuckDB RECURSIVE CTE (argmax in "
           "the recursive term, token-wise closed-form greedy merge — "
           "see _bpe_recursive_cte) — hash-checkable despite being "
           "iterative; also pinned against a pure-Python BPE reference "
           "in tests/test_training_ext.py.")
def bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.bpe import learn_bpe

    merges = learn_bpe(_docs(spark, sf_dir), n_merges=10)
    rows = [(i, pair, count) for i, (pair, count) in enumerate(merges)]
    return local_rows_df(
        spark, rows, "merge_idx bigint, pair string, pair_count bigint")


_COMPRESS_PROXY_ORACLE = """
WITH sh AS (
  SELECT doc_id, substr(text, CAST(i AS INT), 4) AS s
  FROM documents,
       UNNEST(range(1, greatest(length(text) - 2, 1))) AS t(i)
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(COUNT(DISTINCT s) AS BIGINT) AS n_distinct
  FROM sh GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(length(d.text) AS BIGINT) AS raw_len,
       COALESCE(a.n_shingles, 0) AS n_shingles,
       COALESCE(a.n_distinct, 0) AS n_distinct,
       CASE WHEN a.n_shingles IS NULL THEN NULL
            ELSE CAST((a.n_distinct * 1000000) // a.n_shingles AS BIGINT)
       END AS novelty_fp
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


@query("compression_ratio_signal", oracle=_COMPRESS_PROXY_ORACLE,
       doc="Per-doc compressibility signal for boilerplate/repetition "
           "screening, as a DETERMINISTIC engine-neutral statistic: the "
           "distinct-shingle novelty ratio (distinct char-4-grams / "
           "total char-4-grams, exact integer micro-units). Low novelty "
           "== a small LZ dictionary covers the text == highly "
           "compressible — the same decision variable the zlib ratio "
           "drove, minus the DEFLATE dependency no SQL engine shares "
           "(which kept this query rows-only through round 9). Spark "
           "side is a pure scan projection (transform over shingle "
           "offsets + array_distinct), zero shuffle, nothing leaves the "
           "JVM; the real zlib kernel remains available as "
           "ops.text.compression_signals, pinned bit-exact vs Python "
           "zlib in tests/test_training_ext.py.")
def compression_ratio_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    # guard: sequence(1, 0) counts DOWN in Spark, so short docs need an
    # explicit empty-array branch rather than an empty sequence
    shingled = docs.select(
        "doc_id",
        F.expr("CAST(length(text) AS BIGINT)").alias("raw_len"),
        F.expr(
            "CASE WHEN length(text) >= 4 THEN "
            "transform(sequence(1, length(text) - 3), "
            "i -> substring(text, i, 4)) "
            "ELSE array() END"
        ).alias("sh"))
    return (
        shingled.select(
            "doc_id", "raw_len",
            F.size("sh").cast("bigint").alias("n_shingles"),
            F.size(F.array_distinct("sh")).cast("bigint")
            .alias("n_distinct"))
        .withColumn(
            "novelty_fp",
            F.when(F.col("n_shingles") > 0,
                   F.expr("(n_distinct * 1000000) DIV n_shingles"))
            .cast("bigint"))
        .repartition(1).sortWithinPartitions("doc_id")
    )


_BPE_ENCODE_ORACLE = _bpe_recursive_cte() + """
SELECT sym AS token, CAST(SUM(wc) AS BIGINT) AS token_count
FROM (SELECT UNNEST(string_split(syms, ' ')) AS sym, wc
      FROM r WHERE it = (SELECT MAX(it) FROM r))
GROUP BY sym
ORDER BY token_count DESC, token
LIMIT 25
"""


@query("bpe_encode_tokens", oracle=_BPE_ENCODE_ORACLE,
       doc="Tokenizer ENCODE step: the 10 learned BPE merges applied to "
           "the corpus vocab in order as a single stack of projection "
           "regexp_replaces (one scan pass — the merge table is "
           "metadata), then token frequencies over the encoded corpus. "
           "Oracle: the same recursive-CTE BPE loop read at its FINAL "
           "state. Completes the learn->encode tokenizer pipeline.")
def bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.bpe import apply_merges, learn_bpe, word_vocab

    docs = _docs(spark, sf_dir)
    merges = learn_bpe(docs, n_merges=10)
    encoded = apply_merges(word_vocab(docs), merges)
    return (
        encoded.select(F.explode(F.split("syms", " ")).alias("token"), "wc")
        .groupBy("token").agg(F.sum("wc").cast("bigint").alias("token_count"))
        .orderBy(F.col("token_count").desc(), "token")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# DSIR hashed-ngram importance weights (data selection)
# ---------------------------------------------------------------------------

_DSIR_ORACLE_TMPL = """
WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT doc_id, lang, g
  FROM toks, UNNEST(list_concat(
       w, list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))) AS t(g)
),
inst AS (SELECT doc_id, lang, ({hex}) % 256 AS bucket
         FROM (SELECT doc_id, lang, md5(g) AS h FROM grams)),
src AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS src_f FROM inst GROUP BY bucket),
tgt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS tgt_f FROM inst
        WHERE lang = 'en' GROUP BY bucket),
stats AS (
  SELECT s.bucket, s.src_f, COALESCE(t.tgt_f, CAST(0 AS BIGINT)) AS tgt_f
  FROM src s LEFT JOIN tgt t ON s.bucket = t.bucket
),
tot AS (SELECT CAST(SUM(src_f) AS BIGINT) AS s_tot,
               CAST(SUM(tgt_f) AS BIGINT) AS t_tot FROM stats),
fp AS (
  SELECT bucket,
         CAST(floor(CAST((tgt_f + 1) * (s_tot + 256) AS DOUBLE)
                    / CAST((src_f + 1) * (t_tot + 256) AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS fp_r
  FROM stats, tot
),
tf AS (SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS tf
       FROM inst GROUP BY doc_id, bucket)
SELECT tf.doc_id,
       CAST(SUM(tf) AS BIGINT) AS n_grams,
       CAST(SUM(tf * fp_r) AS BIGINT) AS score_fp
FROM tf JOIN fp ON tf.bucket = fp.bucket
GROUP BY tf.doc_id
ORDER BY tf.doc_id
"""


def _dsir_oracle() -> str:
    from streamalert_spark.ops.sketch import hex_prefix_int_sql

    return _DSIR_ORACLE_TMPL.replace("{hex}", hex_prefix_int_sql("h"))


@query("dsir_importance_weights", oracle=_dsir_oracle(),
       doc="DSIR data selection (Xie et al. 2023): per-doc importance "
           "score of a hashed unigram+bigram TARGET model (lang='en' "
           "exemplars) over the SOURCE pool, with the log-ratio replaced "
           "by the rational per-feature ratio in exact integer fixed "
           "point (no libm -- the BM25 idf treatment; ordering per "
           "feature preserved). The 256-bucket statistics relation is "
           "scale-free by construction and broadcast; the only data-"
           "sized shuffle is the partial-aggregated (doc, bucket) tf. "
           "See ops/selection.py for bounds and the 100 TB plan.")
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.selection import dsir_importance

    docs = _docs(spark, sf_dir)
    out = dsir_importance(docs, "doc_id", "text",
                          target_filter=F.col("lang") == "en")
    return out.repartition(1).sortWithinPartitions("doc_id")


# ---------------------------------------------------------------------------
# Training shard manifest — seeded deterministic global shuffle.
# ---------------------------------------------------------------------------

_SHARD_ORACLE_TMPL = """
WITH hashed AS (
  SELECT doc_id, n_chars,
         md5('shard:42:' || doc_id) AS h
  FROM documents
),
placed AS (
  SELECT doc_id, n_chars, h, {hex} % 16 AS shard_id
  FROM hashed
)
SELECT doc_id, CAST(shard_id AS BIGINT) AS shard_id,
       CAST(row_number() OVER (PARTITION BY shard_id ORDER BY h, doc_id)
            AS BIGINT) AS pos,
       CAST(n_chars AS BIGINT) AS n_chars
FROM placed
ORDER BY shard_id, pos
"""


def _shard_oracle() -> str:
    from streamalert_spark.ops.sketch import hex_prefix_int_sql

    return _SHARD_ORACLE_TMPL.replace("{hex}", hex_prefix_int_sql("h"))


@query("training_shard_manifest", oracle=_shard_oracle(),
       doc="Deterministic seeded global shuffle into training shards: "
           "shard = keyed-md5 hash bucket, within-shard order = the hash "
           "itself — a reproducible corpus-wide permutation with NO "
           "global sort (the standard trick: a hash-bucketed writer "
           "gives every epoch the same shard files and intra-shard "
           "order from just the seed). One hash projection + one "
           "window per shard; shards are independent, so at 100 TB "
           "each shard's position sort is a writer-local sort over "
           "corpus_size/n_shards rows, embarrassingly parallel.")
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from streamalert_spark.ops.sketch import hex_prefix_int

    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    hashed = docs.withColumn(
        "h", F.md5(F.concat(F.lit("shard:42:"),
                            F.col("doc_id").cast("string"))))
    placed = hashed.withColumn("shard_id",
                               (hex_prefix_int(F.col("h")) % 16))
    w = W.partitionBy("shard_id").orderBy("h", "doc_id")
    return (
        placed.select(
            "doc_id",
            F.col("shard_id").cast("bigint").alias("shard_id"),
            F.row_number().over(w).cast("bigint").alias("pos"),
            F.col("n_chars").cast("bigint").alias("n_chars"))
        .repartition(1).sortWithinPartitions("shard_id", "pos")
    )


# ---------------------------------------------------------------------------
# OOV rate by source — vocabulary coverage audit against a learned top-V.
# ---------------------------------------------------------------------------

_OOV_ORACLE = """
WITH toks AS (
  SELECT source, w AS token
  FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
  WHERE w <> ''
),
freq AS (SELECT token, COUNT(*) AS freq FROM toks GROUP BY token),
vocab AS (
  SELECT token FROM freq
  ORDER BY freq DESC, token
  LIMIT 16
),
flagged AS (
  SELECT t.source,
         CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
  FROM toks t LEFT JOIN vocab v ON v.token = t.token
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(oov) AS BIGINT) AS n_oov,
       CAST((SUM(oov) * 1000000) // COUNT(*) AS BIGINT) AS oov_ppm
FROM flagged
GROUP BY source
ORDER BY source
"""


@query("oov_rate_by_source", oracle=_OOV_ORACLE,
       doc="Vocabulary-coverage audit: learn a top-16 token vocab from "
           "the corpus (freq desc, token tie-break), then measure each "
           "source's out-of-vocabulary token rate in exact ppm — the "
           "standard pre-tokenizer health check (a source with an "
           "outlier OOV rate inflates token counts and truncates "
           "effective context). The vocab is top-K by TakeOrdered "
           "(never a global sort) and joins back as a broadcast; the "
           "corpus-sized work is one partial-aggregated token count "
           "per source.")
def oov_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.hints import gated_broadcast

    docs = _docs(spark, sf_dir)
    toks = (docs.select("source", F.explode(tokens(F.col("text")))
                        .alias("token"))
            .filter(F.col("token") != ""))
    vocab = (toks.groupBy("token")
             .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
             .orderBy(F.col("freq").desc(), "token")
             .limit(16)
             .select("token", F.lit(1).alias("in_vocab")))
    flagged = toks.join(gated_broadcast(vocab), "token", "left")
    return (
        flagged.groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
             F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
             .cast("bigint").alias("n_oov"))
        .select("source", "n_tokens", "n_oov",
                F.expr("(n_oov * 1000000) DIV n_tokens").cast("bigint")
                .alias("oov_ppm"))
        .repartition(1).sortWithinPartitions("source")
    )


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth — corpus saturation audit.
# ---------------------------------------------------------------------------

_HEAPS_ORACLE = """
WITH toks AS (
  SELECT doc_id, t.tok
  FROM documents, UNNEST(string_split(text, ' ')) AS t(tok)
  WHERE t.tok <> ''
),
firsts AS (SELECT tok, MIN(doc_id) AS fd FROM toks GROUP BY tok),
jv AS (
  SELECT CASE WHEN fd // 32 = 0 THEN 0
              ELSE CAST(length(bin(fd // 32)) AS BIGINT) END AS j,
         CAST(COUNT(*) AS BIGINT) AS new_types
  FROM firsts GROUP BY 1
),
ji AS (
  SELECT CASE WHEN doc_id // 32 = 0 THEN 0
              ELSE CAST(length(bin(doc_id // 32)) AS BIGINT) END AS j,
         CAST(COUNT(*) AS BIGINT) AS toks_in
  FROM toks GROUP BY 1
)
SELECT CAST(32 << j AS BIGINT) AS checkpoint_docs,
       CAST(SUM(COALESCE(jv.new_types, 0))
            OVER (ORDER BY ji.j) AS BIGINT) AS vocab_cum,
       CAST(SUM(ji.toks_in) OVER (ORDER BY ji.j) AS BIGINT) AS tokens_cum
FROM ji LEFT JOIN jv USING (j)
ORDER BY checkpoint_docs
"""


@query("heaps_vocab_growth", oracle=_HEAPS_ORACLE,
       doc="Heaps'-law vocabulary growth curve: cumulative distinct "
           "token types and token instances at geometrically spaced "
           "document checkpoints (32, 64, 128, ... docs). Flat type "
           "growth = the corpus stopped teaching a tokenizer anything "
           "new; V(n) ~ K*n^beta on this log-spaced grid is a straight "
           "line, which is also what makes the operator scale: each "
           "token's FIRST occurrence maps to one checkpoint index via "
           "pure integer floor-log2 (length of the binary string — no "
           "float log2 crosses engines), so the cumulative spine is "
           "<= 64 rows at ANY corpus size and the single-partition "
           "cumulative window is bounded metadata, never data. One "
           "token explode + two partial-aggregated shuffles.")
def heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    toks = (_docs(spark, sf_dir)
            .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
            .filter(F.col("tok") != ""))
    jexpr = ("CASE WHEN {c} DIV 32 = 0 THEN CAST(0 AS BIGINT) "
             "ELSE CAST(length(bin({c} DIV 32)) AS BIGINT) END")
    firsts = (toks.groupBy("tok").agg(F.min("doc_id").alias("fd"))
              .select(F.expr(jexpr.format(c="fd")).alias("j"))
              .groupBy("j")
              .agg(F.count(F.lit(1)).cast("bigint").alias("new_types")))
    insts = (toks.select(F.expr(jexpr.format(c="doc_id")).alias("j"))
             .groupBy("j")
             .agg(F.count(F.lit(1)).cast("bigint").alias("toks_in")))
    # the spine is <= 64 rows (one per power-of-two checkpoint), so the
    # single-partition cumulative window is bounded regardless of scale
    w = (W.partitionBy(F.lit(0)).orderBy("j")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (
        insts.join(firsts, "j", "left")
        .select("j",
                F.coalesce("new_types", F.lit(0)).alias("new_types"),
                "toks_in")
        .select(F.expr("CAST(shiftleft(CAST(32 AS BIGINT), "
                       "CAST(j AS INT)) AS BIGINT)")
                .alias("checkpoint_docs"),
                F.sum("new_types").over(w).cast("bigint")
                .alias("vocab_cum"),
                F.sum("toks_in").over(w).cast("bigint").alias("tokens_cum"))
        .repartition(1).sortWithinPartitions("checkpoint_docs")
    )
