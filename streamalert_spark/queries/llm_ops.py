"""LLM-data-pipeline queries: dedup, similarity search, text analysis —
run through streamalert_spark.ops with DuckDB oracles.

Portability rules that make these hash-checkable: md5-string hashing (both
engines agree), single-space tokenization, rounded double ratios with
integer-derived operands, explicit tie-breaks on every ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamalert_spark.ops import dedup, similarity, text
from streamalert_spark.queries import query
from streamalert_spark.session import local_rows_df


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.session import read_table

    return read_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.session import read_table

    return read_table(spark, sf_dir, "embeddings")


# ---------------------------------------------------------------------------
# Exact dedup: hash-groupBy on md5(text).
# ---------------------------------------------------------------------------

_EXACT_ORACLE = """
SELECT md5(text) AS content_hash,
       MIN(doc_id) AS canonical_doc_id,
       COUNT(*) AS dup_count
FROM documents
GROUP BY md5(text)
ORDER BY content_hash
"""


@query("dedup_exact", oracle=_EXACT_ORACLE,
       doc="Exact dedup: md5 hash-groupBy with canonical id election.")
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(_docs(spark, sf_dir)).repartition(1).sortWithinPartitions("content_hash")


# ---------------------------------------------------------------------------
# N-gram Jaccard near-dup pairs (quadratic verifier; LSH below is the scale
# path producing candidates for it).
# ---------------------------------------------------------------------------

_JACCARD_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT a, b,
       ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = a
JOIN sizes sb ON sb.doc_id = b
WHERE ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) >= 0.5
ORDER BY a, b
"""


@query("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE,
       doc="3-gram shingle Jaccard similarity pairs >= 0.5.")
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.5).repartition(1).sortWithinPartitions("a", "b")


# ---------------------------------------------------------------------------
# Dedup RESOLUTION: verified near-dup pairs -> survivor set. Greedy min-id
# keep policy: any doc that is the larger side of a confirmed pair is
# dropped (single pass, deterministic — no transitive closure, so a chain
# a~b~c keeps a and c). The verifier runs over MinHash+LSH candidates only
# (the scale path) — never all pairs; the oracle mirrors the same
# candidate restriction so both engines verify the identical pair set.
# ---------------------------------------------------------------------------

def _lsh_resolution_oracle(num_hashes: int = 16, band_size: int = 4,
                           threshold: float = 0.5) -> str:
    bands = []
    for bi in range(num_hashes // band_size):
        cols = " || '|' || ".join(f"mh_{bi * band_size + j}" for j in range(band_size))
        bands.append(
            f"SELECT doc_id, {bi} AS band_idx, md5({cols}) AS band_key FROM sig"
        )
    bands_sql = "\nUNION ALL\n".join(bands)
    mh = ",".join(f"MIN(md5('{i}:' || shingle)) AS mh_{i}" for i in range(num_hashes))
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
sig AS (SELECT doc_id, {mh} FROM sh GROUP BY doc_id),
bands AS (
{bands_sql}
),
cands AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y ON x.band_idx = y.band_idx AND x.band_key = y.band_key
  WHERE x.doc_id < y.doc_id
),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
),
dropped AS (
  SELECT DISTINCT i.b AS doc_id
  FROM inter i
  JOIN cands c ON c.a = i.a AND c.b = i.b
  JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
  WHERE ROUND(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) >= {threshold}
)
SELECT d.doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
ORDER BY d.doc_id
"""


@query("dedup_resolution", oracle=_lsh_resolution_oracle(),
       doc="End-to-end near-dup dedup at scale: MinHash+LSH candidates -> "
           "exact-Jaccard verify -> greedy min-id survivor set via "
           "left-anti join.")
def dedup_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    pairs = dedup.lsh_verified_pairs(docs, threshold=0.5)
    dropped = pairs.select(F.col("b").alias("doc_id")).distinct()
    return (
        docs.join(dropped, "doc_id", "left_anti")
        .select("doc_id")
        .repartition(1).sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Dedup CONNECTED COMPONENTS: transitive closure over the LSH-verified
# pair graph — chain a~b~c collapses into one component labelled by its
# min doc id. Spark side is iterative min-label propagation
# (ops/dedup.connected_components); the oracle is a recursive CTE.
# ---------------------------------------------------------------------------

def _components_ctes(num_hashes: int = 16, band_size: int = 4,
                     threshold: float = 0.5, table: str = "documents",
                     lead_ctes: str = "") -> str:
    """The shared WITH-body (3-gram shingles -> minhash bands -> verified
    pairs -> recursive reachability) used by every component-consuming
    oracle — one fixture, no copy-paste drift (the r6 CDC lesson).
    ``table`` selects the corpus the shingles come from; ``lead_ctes``
    (must end with a comma) lets a caller define that corpus as its own
    CTE chain — e.g. the dedup cascade's exact-fingerprint survivors."""
    bands = []
    for bi in range(num_hashes // band_size):
        cols = " || '|' || ".join(f"mh_{bi * band_size + j}" for j in range(band_size))
        bands.append(
            f"SELECT doc_id, {bi} AS band_idx, md5({cols}) AS band_key FROM sig"
        )
    bands_sql = "\nUNION ALL\n".join(bands)
    mh = ",".join(f"MIN(md5('{i}:' || shingle)) AS mh_{i}" for i in range(num_hashes))
    return f"""
WITH RECURSIVE {lead_ctes}
toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM {table}),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
sig AS (SELECT doc_id, {mh} FROM sh GROUP BY doc_id),
bands AS (
{bands_sql}
),
cands AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y ON x.band_idx = y.band_idx AND x.band_key = y.band_key
  WHERE x.doc_id < y.doc_id
),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
),
vp AS (
  SELECT i.a, i.b
  FROM inter i
  JOIN cands c ON c.a = i.a AND c.b = i.b
  JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
  WHERE ROUND(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) >= {threshold}
),
edges AS (
  SELECT a AS src, b AS dst FROM vp UNION SELECT b, a FROM vp
),
reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
)
"""


def _components_oracle(**kw) -> str:
    return _components_ctes(**kw) + """
SELECT id AS doc_id, MIN(r) AS component_id
FROM reach GROUP BY id ORDER BY doc_id
"""


@query("dedup_components", oracle=_components_oracle(),
       doc="Transitive-closure dedup: connected components over the "
           "LSH-verified near-dup graph via iterative min-label "
           "propagation (recursive-CTE oracle).")
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup.lsh_verified_pairs(_docs(spark, sf_dir), threshold=0.5)
    return (
        dedup.connected_components(pairs)
        .repartition(1).sortWithinPartitions("doc_id")
    )


def _keep_best_oracle(**kw) -> str:
    return _components_ctes(**kw) + """
, comp AS (SELECT id AS doc_id, MIN(r) AS component_id
           FROM reach GROUP BY id),
base AS (
  SELECT d.doc_id, d.n_chars,
         COALESCE(c.component_id, d.doc_id) AS component_id
  FROM documents d LEFT JOIN comp c USING (doc_id)
),
ranked AS (
  SELECT doc_id, component_id,
         COUNT(*) OVER (PARTITION BY component_id) AS cluster_size,
         FIRST_VALUE(doc_id) OVER (
           PARTITION BY component_id
           ORDER BY n_chars DESC, doc_id) AS kept_doc_id
  FROM base
)
SELECT doc_id, component_id, CAST(cluster_size AS BIGINT) AS cluster_size,
       kept_doc_id, doc_id = kept_doc_id AS is_kept
FROM ranked ORDER BY doc_id
"""


@query("dedup_keep_best", oracle=_keep_best_oracle(),
       doc="Near-dup RETENTION policy: connected components over the "
           "LSH-verified pair graph, then keep ONE representative per "
           "cluster — the longest doc (n_chars, tie to lowest doc_id); "
           "singletons keep themselves. The standard corpus-dedup final "
           "step (cluster -> pick best -> drop the rest). Per-cluster "
           "window is hash-partitioned by component — no global sort.")
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = _docs(spark, sf_dir)
    pairs = dedup.lsh_verified_pairs(docs, threshold=0.5)
    comp = dedup.connected_components(pairs)
    base = (
        docs.select("doc_id", "n_chars")
        .join(comp, "doc_id", "left")
        .withColumn("component_id",
                    F.coalesce("component_id", "doc_id"))
    )
    w = W.partitionBy("component_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc())
    wp = W.partitionBy("component_id")
    return (
        base.select(
            "doc_id", "component_id",
            F.count(F.lit(1)).over(wp).cast("bigint").alias("cluster_size"),
            F.first("doc_id").over(w).alias("kept_doc_id"),
        )
        .withColumn("is_kept", F.col("doc_id") == F.col("kept_doc_id"))
        .repartition(1).sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination: training docs sharing any 3-gram shingle
# with the (hash-designated) eval subset are flagged with their overlap
# count — the standard pre-training contamination sweep.
# ---------------------------------------------------------------------------

_DECONTAMINATE_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
tr AS (SELECT * FROM sh WHERE doc_id % 97 <> 0)
SELECT tr.doc_id, COUNT(*) AS n_shared_shingles
FROM tr JOIN ev USING (shingle)
GROUP BY tr.doc_id
ORDER BY tr.doc_id
"""


@query("decontaminate_ngram_overlap", oracle=_DECONTAMINATE_ORACLE,
       doc="Benchmark decontamination: flag training docs sharing 3-gram "
           "shingles with the eval subset (broadcast semi-join).")
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops import curation

    docs = _docs(spark, sf_dir)
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return (
        curation.ngram_overlap_flags(train, eval_df)
        .repartition(1).sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling: per-language keep rates via md5
# hash-gating — identical row selection on every engine and every run.
# ---------------------------------------------------------------------------

def _stratified_oracle() -> str:
    from streamalert_spark.ops.curation import sample_threshold_hex

    en, zh = sample_threshold_hex(0.5), sample_threshold_hex(0.25)
    return f"""
SELECT doc_id, lang FROM documents
WHERE CASE
  WHEN lang = 'en' THEN substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8) < '{en}'
  WHEN lang = 'zh' THEN substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8) < '{zh}'
  ELSE TRUE END
ORDER BY doc_id
"""


@query("stratified_sample_langs", oracle=_stratified_oracle(),
       doc="Deterministic stratified sampling: en kept at 50%, zh at 25%, "
           "other languages untouched — md5 hash-gate, zero shuffle.")
def stratified_sample_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops import curation

    docs = _docs(spark, sf_dir)
    return (
        curation.stratified_sample(docs, {"en": 0.5, "zh": 0.25})
        .select("doc_id", "lang")
        .repartition(1).sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Per-source capping: keep at most k docs per source (domain over-
# representation control) — bounded two-phase top-k, never a full-corpus
# window shuffle.
# ---------------------------------------------------------------------------

_CAP_ORACLE = """
WITH ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rank
  FROM documents
)
SELECT source, doc_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
ORDER BY source, rank
"""


@query("cap_docs_per_source", oracle=_CAP_ORACLE,
       doc="Cap over-represented sources at 10 docs each (first-k by "
           "doc_id, bounded two-phase aggregate).")
def cap_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops import curation

    docs = _docs(spark, sf_dir)
    return (
        curation.cap_per_group(docs, "source", "doc_id", k=10)
        .repartition(1).sortWithinPartitions("source", "rank")
    )


# ---------------------------------------------------------------------------
# MinHash signatures + LSH candidate pairs. Hash family is lexicographic min
# of md5(seed:shingle) — portable, uniform; bands of 4 over 16 hashes.
# ---------------------------------------------------------------------------

def _minhash_oracle(num_hashes: int = 16) -> str:
    mh_cols = ",\n       ".join(
        f"MIN(md5('{i}:' || shingle)) AS mh_{i}" for i in range(num_hashes)
    )
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
)
SELECT doc_id,
       {mh_cols}
FROM sh GROUP BY doc_id ORDER BY doc_id
"""


@query("minhash_signatures", oracle=_minhash_oracle(),
       doc="16-permutation MinHash signatures from md5 hash family.")
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_signatures(_docs(spark, sf_dir)).repartition(1).sortWithinPartitions("doc_id")


def _lsh_oracle(num_hashes: int = 16, band_size: int = 4) -> str:
    bands = []
    for bi in range(num_hashes // band_size):
        cols = " || '|' || ".join(f"mh_{bi * band_size + j}" for j in range(band_size))
        bands.append(
            f"SELECT doc_id, {bi} AS band_idx, md5({cols}) AS band_key FROM sig"
        )
    bands_sql = "\nUNION ALL\n".join(bands)
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
),
sig AS (
  SELECT doc_id,
         {",".join(f"MIN(md5('{i}:' || shingle)) AS mh_{i}" for i in range(num_hashes))}
  FROM sh GROUP BY doc_id
),
bands AS (
{bands_sql}
)
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
FROM bands x JOIN bands y ON x.band_idx = y.band_idx AND x.band_key = y.band_key
WHERE x.doc_id < y.doc_id
ORDER BY a, b
"""


@query("minhash_lsh_candidates", oracle=_lsh_oracle(),
       doc="LSH candidate pairs: band-bucket join over MinHash signatures.")
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_candidates(_docs(spark, sf_dir)).repartition(1).sortWithinPartitions("a", "b")


def _lsh_verified_oracle(num_hashes: int = 16, band_size: int = 4,
                         threshold: float = 0.5) -> str:
    bands = []
    for bi in range(num_hashes // band_size):
        cols = " || '|' || ".join(f"mh_{bi * band_size + j}" for j in range(band_size))
        bands.append(
            f"SELECT doc_id, {bi} AS band_idx, md5({cols}) AS band_key FROM sig"
        )
    bands_sql = "\nUNION ALL\n".join(bands)
    mh = ",".join(f"MIN(md5('{i}:' || shingle)) AS mh_{i}" for i in range(num_hashes))
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
sig AS (SELECT doc_id, {mh} FROM sh GROUP BY doc_id),
bands AS (
{bands_sql}
),
cands AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y ON x.band_idx = y.band_idx AND x.band_key = y.band_key
  WHERE x.doc_id < y.doc_id
),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT i.a, i.b,
       ROUND(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) AS jaccard
FROM inter i
JOIN cands c ON c.a = i.a AND c.b = i.b
JOIN sizes sa ON sa.doc_id = i.a
JOIN sizes sb ON sb.doc_id = i.b
WHERE ROUND(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) >= {threshold}
ORDER BY i.a, i.b
"""


@query("lsh_verified_pairs", oracle=_lsh_verified_oracle(),
       doc="THE dedup scale path: MinHash+LSH candidates verified by exact "
           "Jaccard over the candidate-doc subset only.")
def lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.lsh_verified_pairs(
        _docs(spark, sf_dir), threshold=0.5
    ).repartition(1).sortWithinPartitions("a", "b")


# ---------------------------------------------------------------------------
# SimHash: 64-bit fingerprint as a bit string (portable md5-derived bits).
# ---------------------------------------------------------------------------

_SIMHASH_ORACLE = """
WITH toks AS (
  SELECT DISTINCT doc_id, w
  FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
  WHERE w <> ''
),
hashed AS (SELECT doc_id, md5(w) AS h FROM toks),
votes AS (
  SELECT doc_id, j,
    SUM(CASE WHEN
      (CAST(strpos('0123456789abcdef', substr(h, CAST(j // 4 AS INT) + 1, 1)) - 1 AS BIGINT)
       // CAST(pow(2, 3 - j % 4) AS BIGINT)) % 2 = 1
    THEN 1 ELSE -1 END) AS v
  FROM hashed, UNNEST(range(0, 64)) AS t(j)
  GROUP BY doc_id, j
)
SELECT doc_id,
       string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS simhash
FROM votes GROUP BY doc_id ORDER BY doc_id
"""


@query("simhash64", oracle=_SIMHASH_ORACLE,
       doc="64-bit SimHash fingerprint per document (majority-vote bits).")
def simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_bits(_docs(spark, sf_dir)).repartition(1).sortWithinPartitions("doc_id")


# ---------------------------------------------------------------------------
# Similarity search: brute-force cosine top-k vs the vec_id=0 query vector;
# all-pairs near-dup above 0.95. Scores rounded to 6 decimals with vec_id
# tie-breaks for cross-engine determinism.
# ---------------------------------------------------------------------------

_COSINE_EXPR = """
ROUND(
  list_sum(list_transform(range(1, len(e.embedding) + 1),
           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
  / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
     * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
6)
"""

_TOPK_ORACLE = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, {_COSINE_EXPR} AS score
FROM embeddings e, q
ORDER BY score DESC, e.vec_id
LIMIT 10
"""


@query("ann_cosine_topk", oracle=_TOPK_ORACLE,
       doc="Brute-force cosine top-10 against a query vector.")
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    scored = emb.crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.round(similarity.cosine(F.col("embedding"), F.col("qv")), 6).alias("score"),
    )
    return scored.repartition(1).sortWithinPartitions(F.col("score").desc(), "vec_id").limit(10)


_BATCH_TOPK_ORACLE = """
WITH q AS (
  SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
),
scored AS (
  SELECT q.q_id, e.vec_id,
    ROUND(
      list_sum(list_transform(range(1, len(e.embedding) + 1),
               i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
    6) AS score
  FROM embeddings e, q
),
ranked AS (
  SELECT q_id, vec_id, score,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
  FROM scored
)
SELECT q_id, vec_id, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 3
ORDER BY q_id, rank
"""


@query("ann_batch_topk", oracle=_BATCH_TOPK_ORACLE,
       doc="Batch ANN: exact top-3 for five query vectors in ONE corpus "
           "scan — broadcast probe set + two-phase per-partition top-k "
           "(shuffle carries q x partitions x k rows, never the corpus).")
def ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        similarity.batch_cosine_topk(_emb(spark, sf_dir), [0, 1, 2, 3, 4], k=3)
        .repartition(1).sortWithinPartitions("q_id", "rank")
    )


_NEARDUP_ORACLE = """
SELECT x.vec_id AS a, y.vec_id AS b,
  ROUND(
    list_sum(list_transform(range(1, len(x.embedding) + 1),
             i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(x.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
       * sqrt(list_sum(list_transform(y.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))),
  6) AS score
FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
WHERE ROUND(
    list_sum(list_transform(range(1, len(x.embedding) + 1),
             i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(x.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
       * sqrt(list_sum(list_transform(y.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))),
  6) >= 0.4
ORDER BY a, b
"""


@query("embedding_cosine_neardup", oracle=_NEARDUP_ORACLE,
       doc="All-pairs embedding cosine near-duplicates >= 0.4 (threshold "
           "exercises the verify path on this corpus, max pair ~0.6).")
def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.cosine_pairs(_emb(spark, sf_dir), threshold=0.4).repartition(1).sortWithinPartitions("a", "b")


# ---------------------------------------------------------------------------
# Text analysis: token counts, quality signals, language heuristic,
# fingerprint — one projection pass.
# ---------------------------------------------------------------------------

_TEXT_ORACLE = r"""
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  CAST(length(text) AS BIGINT) AS n_chars,
  ROUND(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
        / len(string_split(text, ' ')), 6) AS avg_token_len,
  ROUND(CAST(len(list_filter(string_split(text, ' '),
        w -> list_contains(['a','the','and','of','to','in','is','it'], w))) AS DOUBLE)
        / len(string_split(text, ' ')), 6) AS stopword_ratio,
  ROUND(CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
        / greatest(length(text), 1), 6) AS punct_ratio,
  CASE WHEN CAST(len(list_filter(string_split(text, ' '),
        w -> list_contains(['a','the','and','of','to','in','is','it'], w))) AS DOUBLE)
        / greatest(len(string_split(text, ' ')), 1) >= 0.05
       THEN 'en' ELSE 'unknown' END AS lang_pred,
  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
FROM documents
ORDER BY doc_id
"""


@query("text_stats", oracle=_TEXT_ORACLE,
       doc="Text quality/stats projection: tokens, ratios, lang-id, fingerprint.")
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.text_stats(_docs(spark, sf_dir)).repartition(1).sortWithinPartitions("doc_id")


_TOKEN_FREQ_ORACLE = """
WITH toks AS (
  SELECT doc_id, w
  FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
  WHERE w <> ''
),
cnt AS (SELECT w, COUNT(*) AS freq FROM toks GROUP BY w)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT toks.w) AS BIGINT) AS n_distinct,
       ROUND(CAST(SUM(freq) AS DOUBLE) / COUNT(*), 6) AS mean_token_freq,
       ROUND(CAST(COUNT(DISTINCT toks.w) AS DOUBLE) / COUNT(*), 6) AS distinct_ratio
FROM toks JOIN cnt ON cnt.w = toks.w
GROUP BY doc_id
ORDER BY doc_id
"""


@query("token_frequency_score", oracle=_TOKEN_FREQ_ORACLE,
       doc="Corpus-frequency quality scoring: mean token frequency + "
           "distinct-token ratio per doc (integer-exact LM-style signal).")
def token_frequency_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        text.token_frequency_stats(_docs(spark, sf_dir))
        .repartition(1).sortWithinPartitions("doc_id")
    )


_BPE_ORACLE = r"""
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_bpe_tokens
FROM documents
ORDER BY doc_id
"""


@query("token_counts", oracle=_BPE_ORACLE,
       doc="Whitespace and BPE-ish regex token counts.")
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        text.token_count(F.col("text")).cast("bigint").alias("n_ws_tokens"),
        text.bpe_ish_token_count(F.col("text")).cast("bigint").alias("n_bpe_tokens"),
    ).repartition(1).sortWithinPartitions("doc_id")


# ---- fixed-point k-means oracle: the 3-iteration Lloyd loop UNROLLED
# as chained CTEs. Components quantize once to integer micro-units
# (floor(x*1e6 + 0.5) — identical double ops in any IEEE engine);
# distances are exact integer sums; each centroid update is an exact
# integer floor-division via the posmod identity (both engines' % is
# C-style truncated remainder, so ((s % n) + n) % n is the positive
# residue and (s - that) is exactly divisible by n). No float
# accumulation anywhere -> the whole iterative loop is replayable.

_KM_ITERS = 3
_KM_SCALE = 1_000_000


def _km_assign_sql(cent: str) -> str:
    """Assignments under centroid table `cent`: argmin of exact integer
    squared L2, ties to the lowest cluster index."""
    return f"""(
  SELECT vec_id, cluster FROM (
    SELECT vd.vec_id, ct.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY vd.vec_id
             ORDER BY SUM((vd.x - ct.c) * (vd.x - ct.c)), ct.cluster
           ) AS rn
    FROM km_vd vd JOIN {cent} ct ON ct.dim = vd.dim
    GROUP BY vd.vec_id, ct.cluster
  ) WHERE rn = 1
)"""


def _km_update_sql(prev: str, asg: str) -> str:
    """New centroids: exact floor(sum/count) per (cluster, dim); empty
    clusters carry the previous centroid forward."""
    return f"""(
  SELECT p.cluster, p.dim,
         COALESCE((m.s - ((m.s % m.n) + m.n) % m.n) // m.n, p.c) AS c
  FROM {prev} p
  LEFT JOIN (
    SELECT a.cluster, vd.dim, SUM(vd.x) AS s, COUNT(*) AS n
    FROM {asg} a JOIN km_vd vd ON vd.vec_id = a.vec_id
    GROUP BY a.cluster, vd.dim
  ) m ON m.cluster = p.cluster AND m.dim = p.dim
)"""


def _kmeans_fixed_oracle() -> str:
    ctes = [f"""km_q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {_KM_SCALE} + 0.5)
                     AS BIGINT)) AS v
  FROM embeddings
)""", """km_vd AS (
  SELECT vec_id, i - 1 AS dim, v[i] AS x
  FROM km_q, UNNEST(range(1, 65)) AS t(i)
)""", """km_seeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster, vec_id
  FROM km_q ORDER BY vec_id LIMIT 8
)""", """km_cent0 AS (
  SELECT s.cluster, vd.dim, vd.x AS c
  FROM km_seeds s JOIN km_vd vd ON vd.vec_id = s.vec_id
)"""]
    for i in range(_KM_ITERS):
        ctes.append(f"km_asg{i} AS {_km_assign_sql(f'km_cent{i}')}")
        ctes.append(
            f"km_cent{i + 1} AS "
            f"{_km_update_sql(f'km_cent{i}', f'km_asg{i}')}")
    final_asg = _km_assign_sql(f"km_cent{_KM_ITERS}")
    return (
        "WITH " + ",\n".join(ctes) + f""",
km_final AS {final_asg}
SELECT cluster, COUNT(*) AS n_vecs
FROM km_final GROUP BY cluster ORDER BY cluster
""")


@query("embedding_kmeans_sizes", oracle=_kmeans_fixed_oracle(),
       doc="FIXED-POINT Lloyd's k-means (k=8, 3 iterations) over the "
           "embedding table, reporting cluster sizes. Components "
           "quantize once to integer micro-units, distances are exact "
           "BIGINT sums, centroid updates are exact integer floor "
           "divisions — so the full iterative loop is bit-reproducible "
           "and the DuckDB oracle replays all 3 unrolled iterations "
           "exactly (previously the float variant was rows-only: a "
           "float mean depends on reduction order). The float op "
           "(kmeans_lloyd) remains for callers preferring unquantized "
           "centroids and is NumPy-pinned in tests/test_skew.py.")
def embedding_kmeans_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.similarity import kmeans_lloyd_fixed
    from streamalert_spark.session import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    return (
        kmeans_lloyd_fixed(emb, k=8, iters=3)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
        .repartition(1).sortWithinPartitions("cluster")
    )


_CELL_NORM = ("sqrt(list_sum(list_transform(embedding, "
              "v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))")

_CELL_PAIRS_ORACLE = f"""
WITH seeds AS (
  SELECT vec_id AS sid, embedding AS sv, {_CELL_NORM} AS sn
  FROM embeddings ORDER BY vec_id LIMIT 8
),
vec AS (
  SELECT vec_id, embedding, {_CELL_NORM} AS vn FROM embeddings
),
scored AS (
  SELECT v.vec_id, v.embedding, v.vn, s.sid,
         ROW_NUMBER() OVER (
           PARTITION BY v.vec_id
           ORDER BY -ROUND(list_sum(list_transform(range(1, 65),
                      i -> CAST(v.embedding[i] AS DOUBLE)
                           * CAST(s.sv[i] AS DOUBLE))) / (v.vn * s.sn), 6),
                    s.sid
         ) AS rn
  FROM vec v CROSS JOIN seeds s
),
assigned AS (
  SELECT CAST(sid AS BIGINT) AS cell, vec_id, embedding, vn
  FROM scored WHERE rn = 1
)
SELECT x.cell, x.vec_id AS a, y.vec_id AS b,
       ROUND(list_sum(list_transform(range(1, 65),
             i -> CAST(x.embedding[i] AS DOUBLE)
                  * CAST(y.embedding[i] AS DOUBLE))) / (x.vn * y.vn), 6)
         AS score
FROM assigned x JOIN assigned y ON x.cell = y.cell AND x.vec_id < y.vec_id
WHERE ROUND(list_sum(list_transform(range(1, 65),
            i -> CAST(x.embedding[i] AS DOUBLE)
                 * CAST(y.embedding[i] AS DOUBLE))) / (x.vn * y.vn), 6) >= 0.4
ORDER BY a, b
"""


@query("semantic_cell_neardup", oracle=_CELL_PAIRS_ORACLE,
       doc="IVF-style semantic near-dup DEMO: coarse-cell assignment "
           "(max-cosine seed centroid, lowest-id tie-break) then exact "
           "cosine within cells only — one cell-keyed shuffle, centroids "
           "inlined as literals. SCOPE: with the cell count FIXED at 8, "
           "within-cell pairs grow n²/8 and join parallelism is the 8 "
           "cell keys — measured unfinished (>30 min) at 200k vectors "
           "(SCALE.md r12 third-decade section). The 100-TB near-dup "
           "paths are the bounded-output ones (ivf_topk, "
           "batch_cosine_topk, candidate+components dedup) and the "
           "staged banded-LSH pair op (ops/similarity."
           "banded_hyperplane_pairs).")
def semantic_cell_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.session import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    return (
        similarity.cell_bucketed_pairs(emb, n_cells=8, threshold=0.4)
        .withColumn("cell", F.col("cell").cast("bigint"))
        .repartition(1).sortWithinPartitions("a", "b")
    )


# ---------------------------------------------------------------------------
# Semantic decontamination: the embedding-space analogue of the n-gram
# sweep — training vectors ranked by their maximum cosine to ANY eval
# vector (the review queue of likeliest paraphrase contamination).
# ---------------------------------------------------------------------------

_SEMANTIC_DECON_ORACLE = f"""
WITH ev AS (SELECT embedding AS qv FROM embeddings WHERE vec_id % 97 = 0),
tr AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 97 <> 0),
scored AS (
  SELECT tr.vec_id, MAX({_COSINE_EXPR.replace('e.embedding', 'tr.embedding').replace('q.qv', 'ev.qv')}) AS max_eval_sim
  FROM tr CROSS JOIN ev
  GROUP BY tr.vec_id
)
SELECT vec_id, max_eval_sim FROM scored
ORDER BY max_eval_sim DESC, vec_id
LIMIT 20
"""


@query("semantic_decontamination", oracle=_SEMANTIC_DECON_ORACLE,
       doc="Semantic decontamination review queue: training vectors "
           "ranked by max cosine to ANY eval vector (the embedding-space "
           "analogue of n-gram decontamination — catches paraphrase "
           "contamination n-grams miss). Eval set broadcasts "
           "(benchmark-sized); one corpus scan, per-vector max is a "
           "partial-aggregated groupBy; per-pair cosines rounded before "
           "MAX so the ranking is engine-exact.")
def semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    # norms precomputed ONCE per vector before the cross join (the
    # cosine_pairs_exact pattern): bit-identical to per-pair
    # recomputation — same expression tree per norm — at ~3x less work
    # on the dominant |tr| x |ev| term
    ev = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("embedding").alias("qv"),
        similarity.norm(F.col("embedding")).alias("qn"))
    tr = emb.filter(F.col("vec_id") % 97 != 0).select(
        "vec_id", "embedding",
        similarity.norm(F.col("embedding")).alias("tn"))
    sim = similarity.dot(F.col("embedding"), F.col("qv"))         / (F.col("tn") * F.col("qn"))
    return (
        tr.crossJoin(F.broadcast(ev))
        .select("vec_id", F.round(sim, 6).alias("sim"))
        .groupBy("vec_id")
        .agg(F.max("sim").alias("max_eval_sim"))
        .orderBy(F.col("max_eval_sim").desc(), "vec_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Incremental dedup: a NEW batch (odd doc_ids) probed against the
# EXISTING corpus (even doc_ids) — the production ingest gate where the
# corpus band table is persisted and only the increment is processed.
# ---------------------------------------------------------------------------

def _incremental_dedup_oracle(num_hashes: int = 16, band_size: int = 4,
                              threshold: float = 0.5) -> str:
    bands = []
    for bi in range(num_hashes // band_size):
        cols = " || '|' || ".join(f"mh_{bi * band_size + j}" for j in range(band_size))
        bands.append(
            f"SELECT doc_id, {bi} AS band_idx, md5({cols}) AS band_key FROM sig"
        )
    bands_sql = "\nUNION ALL\n".join(bands)
    mh = ",".join(f"MIN(md5('{i}:' || shingle)) AS mh_{i}" for i in range(num_hashes))
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
sig AS (SELECT doc_id, {mh} FROM sh GROUP BY doc_id),
bands AS (
{bands_sql}
),
cands AS (
  SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS corpus_id
  FROM bands x JOIN bands y ON x.band_idx = y.band_idx AND x.band_key = y.band_key
  WHERE x.doc_id % 2 = 1 AND y.doc_id % 2 = 0
),
inter AS (
  SELECT x.doc_id AS new_id, y.doc_id AS corpus_id, COUNT(*) AS inter
  FROM sh x JOIN sh y ON x.shingle = y.shingle
  WHERE x.doc_id % 2 = 1 AND y.doc_id % 2 = 0
  GROUP BY x.doc_id, y.doc_id
)
SELECT i.new_id, i.corpus_id,
       ROUND(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) AS jaccard
FROM inter i
JOIN cands c ON c.new_id = i.new_id AND c.corpus_id = i.corpus_id
JOIN sizes sa ON sa.doc_id = i.new_id
JOIN sizes sb ON sb.doc_id = i.corpus_id
WHERE ROUND(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) >= {threshold}
ORDER BY i.new_id, i.corpus_id
"""


@query("incremental_dedup_pairs", oracle=_incremental_dedup_oracle(),
       doc="Incremental dedup gate: LSH bands of a NEW batch (odd "
           "doc_ids) probe the EXISTING corpus band table (even "
           "doc_ids), exact Jaccard verifies candidate pairs only — no "
           "corpus self-join, nothing quadratic in the corpus. The "
           "production shape: the corpus band table is precomputed and "
           "persisted; each arriving batch pays only its own signatures "
           "plus the probed buckets.")
def incremental_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    increment = docs.filter(F.col("doc_id") % 2 == 1)
    return (
        dedup.cross_corpus_neardup(corpus, increment, threshold=0.5)
        .repartition(1).sortWithinPartitions("new_id", "corpus_id")
    )


@query("stream_dedup_gate_bounded", oracle=_incremental_dedup_oracle(),
       doc="STREAMING ingest dedup gate under the hash gate: the NEW "
           "batch (odd doc_ids) arrives as a file stream consumed one "
           "file per micro-batch; foreachBatch LSH-probes each batch "
           "against the persisted corpus (even doc_ids) and appends "
           "verified pairs. The oracle is the ONE-SHOT incremental "
           "gate over the full increment — the union of per-batch "
           "probes must equal it exactly because each new doc's pairs "
           "depend only on that doc and the corpus (batch-decomposable), "
           "which is precisely why this gate can run at ingest time.")
def stream_dedup_gate_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    increment = docs.filter(F.col("doc_id") % 2 == 1)
    work = tempfile.mkdtemp(prefix="dedup_gate_q_")
    in_dir, out_dir, ckpt = f"{work}/in", f"{work}/out", f"{work}/ckpt"
    try:
        # land the increment as multiple files; maxFilesPerTrigger=1
        # then replays the drop as one micro-batch per file (2 files:
        # the cross-batch union is the property; each extra batch costs
        # a full LSH probe of pure demo overhead)
        increment.repartition(2).write.parquet(in_dir)

        # the production shape: the corpus band table is computed ONCE
        # and persisted; each micro-batch probes it. localCheckpoint
        # materializes it so the per-batch plan doesn't re-run the
        # corpus signature kernel (measured ~2s/batch at sf0.1).
        corp_bands = dedup.corpus_band_table(corpus).localCheckpoint()

        def probe(batch_df, epoch_id):
            # epoch-keyed overwrite: a retried micro-batch (foreachBatch
            # is at-least-once) replaces its own output instead of
            # double-appending duplicate pairs
            out = dedup.cross_corpus_neardup(corpus, batch_df, threshold=0.5,
                                             corpus_bands=corp_bands)
            out.write.mode("overwrite").parquet(f"{out_dir}/e{epoch_id}")

        src = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
        )
        q = (
            src.writeStream.foreachBatch(probe)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rows = (spark.read.schema("new_id bigint, corpus_id bigint, "
                                  "jaccard double")
                .option("recursiveFileLookup", "true")
                .parquet(out_dir).collect())
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return (
        local_rows_df(spark, rows, "new_id bigint, corpus_id bigint, "
                                   "jaccard double")
        .repartition(1).sortWithinPartitions("new_id", "corpus_id")
    )


from streamalert_spark.ops.sketch import hex_prefix_int_sql as _hex_sql

# 48-bit prefix: 2**48 % 100 = 76, so the %100 bucket bias is ~4e-13
# relative — an 8-bit prefix (256 % 100) would skew the split to
# ~92.2/3.9/3.9 instead of 90/5/5
_SPLIT_ORACLE_HEX = _hex_sql("h")

_SPLIT_ORACLE = f"""
WITH hashed AS (
  SELECT doc_id, length(text) AS chars,
         md5('split:' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
assigned AS (
  SELECT doc_id, chars,
         CASE WHEN ({_SPLIT_ORACLE_HEX}) % 100 < 90 THEN 'train'
              WHEN ({_SPLIT_ORACLE_HEX}) % 100 < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM hashed
)
SELECT split, COUNT(*) AS n_docs, CAST(SUM(chars) AS BIGINT) AS total_chars,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
         AS membership_md5
FROM assigned GROUP BY split
ORDER BY split
"""


@query("train_eval_split_manifest", oracle=_SPLIT_ORACLE,
       doc="Deterministic train/val/test split manifest (90/5/5 by "
           "md5(doc_id) bucket): membership depends only on the doc id, "
           "so the split is reproducible across runs, machines, and "
           "engines — no RNG state to serialize, disjoint and exhaustive "
           "by construction. The manifest emits an md5 over each "
           "split's sorted member list, so the driver check proves the "
           "EXACT membership, not just the counts. Zero shuffles before "
           "the 3-group aggregate; at 100 TB the split column is a "
           "pure codegen expression on the scan.")
def train_eval_split_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.sketch import hex_prefix_int

    docs = _docs(spark, sf_dir)
    # 48-bit hash prefix mod 100 — mirrored digit-for-digit by the
    # oracle's STRPOS arithmetic; see _SPLIT_ORACLE_HEX for the bias note
    h = F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
    bucket = F.pmod(hex_prefix_int(h), F.lit(100))
    assigned = docs.select(
        "doc_id", F.length("text").alias("chars"),
        F.when(bucket < 90, "train").when(bucket < 95, "val")
         .otherwise("test").alias("split"),
    )
    return (
        assigned.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("chars").cast("bigint").alias("total_chars"),
             F.md5(F.array_join(
                 F.transform(F.array_sort(F.collect_list("doc_id")),
                             lambda x: x.cast("string")), ",")
             ).alias("membership_md5"))
        .repartition(1).sortWithinPartitions("split")
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints — rolling-hash local fingerprinting (MOSS).
# ---------------------------------------------------------------------------

_WINNOW_N = 3   # tokens per k-gram
_WINNOW_W = 4   # winnowing window (k-gram hashes per window)

_WINNOW_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT doc_id, i AS pos,
         md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS h
  FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
),
hashed AS (
  SELECT doc_id, pos, ({{hex}}) AS hv FROM grams
),
wins AS (
  SELECT doc_id, pos,
         MIN(hv) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING)
           AS fp,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
  FROM hashed
),
fps AS (
  -- pos is 1-BASED here (range starts at 1); the last full-window start
  -- is n_grams - W + 1, unlike the Spark side's 0-based n_grams - W
  SELECT DISTINCT doc_id, fp FROM wins
  WHERE pos <= n_grams - {_WINNOW_W} + 1
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fps,
       md5(string_agg(CAST(fp AS VARCHAR), ',' ORDER BY fp)) AS fp_digest
FROM fps
GROUP BY doc_id
ORDER BY doc_id
"""


def _winnow_oracle() -> str:
    from streamalert_spark.ops.sketch import hex_prefix_int_sql

    return _WINNOW_ORACLE.replace("{hex}", hex_prefix_int_sql("h"))


@query("winnowing_fingerprints", oracle=_winnow_oracle(),
       doc="Winnowing document fingerprints (Schleimer et al., the MOSS "
           "local fingerprinting scheme): hash every 3-token k-gram "
           "(portable md5-prefix ints), slide a window of 4 hashes, keep "
           "each window's MINIMUM — guaranteed to share fingerprints "
           "with any document containing a sufficiently long identical "
           "passage, unlike whole-doc md5 (exact dedup) or MinHash "
           "(global similarity). One scan, one window over (doc, pos), "
           "distinct selected prints, then a per-doc sorted digest. "
           "State per doc is O(len/window); the shuffle key is doc_id.")
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from streamalert_spark.ops.sketch import hex_prefix_int

    toks = _docs(spark, sf_dir).select(
        "doc_id", F.split(F.col("text"), " ").alias("w"))
    grams = toks.filter(
        # sequence(0, size-3) counts DOWN when size(w) < 3 and the
        # transform then indexes past the array — ANSI crash; a doc too
        # short for one k-gram has no fingerprints on either engine
        # (the oracle's range(1, len-1) is simply empty)
        F.size("w") >= _WINNOW_N
    ).select(
        "doc_id",
        F.posexplode(F.expr(
            f"transform(sequence(0, size(w) - {_WINNOW_N}), "
            f"i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
        )).alias("pos", "sh"),
    ).filter(F.col("sh").isNotNull())
    hashed = grams.select(
        "doc_id", "pos", hex_prefix_int(F.md5(F.col("sh"))).alias("hv"))
    win = W.partitionBy("doc_id").orderBy("pos") \
        .rowsBetween(W.currentRow, _WINNOW_W - 1)
    n_grams = W.partitionBy("doc_id")
    wins = hashed.select(
        "doc_id", "pos",
        F.min("hv").over(win).alias("fp"),
        F.count(F.lit(1)).over(n_grams).alias("n_grams"),
    )
    fps = (
        wins.filter(F.col("pos") <= F.col("n_grams") - _WINNOW_W)
        .select("doc_id", "fp").distinct()
    )
    return (
        fps.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_fps"),
             F.md5(F.array_join(
                 F.transform(F.array_sort(F.collect_list("fp")),
                             lambda x: x.cast("string")),
                 ",")).alias("fp_digest"))
        .repartition(1).sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# LSH quality audit — precision/recall of the candidate generator vs truth.
# ---------------------------------------------------------------------------

def _lsh_quality_oracle(num_hashes: int = 16, band_size: int = 4,
                        threshold: float = 0.5) -> str:
    bands = []
    for bi in range(num_hashes // band_size):
        cols = " || '|' || ".join(
            f"mh_{bi * band_size + j}" for j in range(band_size))
        bands.append(
            f"SELECT doc_id, {bi} AS band_idx, md5({cols}) AS band_key FROM sig")
    bands_sql = "\nUNION ALL\n".join(bands)
    mh = ",".join(
        f"MIN(md5('{i}:' || shingle)) AS mh_{i}" for i in range(num_hashes))
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
sig AS (SELECT doc_id, {mh} FROM sh GROUP BY doc_id),
bands AS (
{bands_sql}
),
cands AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band_idx = y.band_idx AND x.band_key = y.band_key
  WHERE x.doc_id < y.doc_id
),
truth AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         COUNT(*) AS inter, sa.sz AS sza, sb.sz AS szb
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  JOIN sizes sa ON sa.doc_id = x.doc_id
  JOIN sizes sb ON sb.doc_id = y.doc_id
  GROUP BY x.doc_id, y.doc_id, sa.sz, sb.sz
  HAVING ROUND(CAST(COUNT(*) AS DOUBLE) / (sa.sz + sb.sz - COUNT(*)), 6)
         >= {threshold}
)
SELECT
  (SELECT COUNT(*) FROM cands) AS candidate_pairs,
  (SELECT COUNT(*) FROM truth) AS true_pairs,
  (SELECT COUNT(*) FROM truth t JOIN cands c ON c.a = t.a AND c.b = t.b)
    AS true_candidates,
  ROUND((SELECT COUNT(*) FROM truth t JOIN cands c ON c.a = t.a AND c.b = t.b)
        / CAST(GREATEST((SELECT COUNT(*) FROM cands), 1) AS DOUBLE), 6)
    AS precision_,
  ROUND((SELECT COUNT(*) FROM truth t JOIN cands c ON c.a = t.a AND c.b = t.b)
        / CAST(GREATEST((SELECT COUNT(*) FROM truth), 1) AS DOUBLE), 6)
    AS recall_
"""


@query("lsh_quality_audit", oracle=_lsh_quality_oracle(),
       doc="LSH candidate-generator QUALITY AUDIT: precision and recall "
           "of the 16-hash/4-band MinHash blocking against the exact "
           "Jaccard>=0.5 pair truth — the measured guarantee behind "
           "using LSH as the scale path (recall is what dedup "
           "completeness rests on; precision is the verify-stage cost "
           "multiplier). Truth restricted to shared-shingle pairs, so "
           "the audit itself never goes quadratic in the corpus.")
def lsh_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    # cands and truth each feed TWO consumers (their own count and the
    # intersection count): cache both so the band self-join + distinct
    # and the verify self-join + aggregate run once, not twice, inside
    # the single three-branch counts job (guide §2.4)
    cands = dedup._swap_cache(
        "audit_cands", dedup.minhash_lsh_candidates(docs).select("a", "b"))
    truth = dedup._swap_cache(
        "audit_truth",
        dedup.ngram_jaccard_pairs(docs, threshold=0.5).select("a", "b"))
    tc = truth.join(cands, ["a", "b"], "left_semi")
    counts = (
        cands.agg(F.count(F.lit(1)).alias("candidate_pairs"))
        .crossJoin(F.broadcast(
            truth.agg(F.count(F.lit(1)).alias("true_pairs"))))
        .crossJoin(F.broadcast(
            tc.agg(F.count(F.lit(1)).alias("true_candidates"))))
    )
    return counts.select(
        "candidate_pairs", "true_pairs", "true_candidates",
        F.round(F.col("true_candidates")
                / F.greatest(F.col("candidate_pairs"), F.lit(1))
                .cast("double"), 6).alias("precision_"),
        F.round(F.col("true_candidates")
                / F.greatest(F.col("true_pairs"), F.lit(1))
                .cast("double"), 6).alias("recall_"),
    )


@query("jaccard_prefix_pairs", oracle=_JACCARD_ORACLE,
       doc="EXACT Jaccard>=0.5 pairs via PREFIX FILTERING (SSJoin/"
           "PPJoin): candidates join only on each doc's rarest "
           "|d|-ceil(t|d|)+1 shingles under the global (df, shingle) "
           "order — a corpus-wide hot shingle enters almost no prefix, "
           "so the exact path survives skewed corpora where the "
           "all-shared-shingle join goes quadratic. No false negatives "
           "(prefix-filter lemma); the oracle is the brute-force "
           "DEFINITION, so the hash check proves completeness, not just "
           "agreement with the plan.")
def jaccard_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        dedup.jaccard_prefix_pairs(_docs(spark, sf_dir), threshold=0.5)
        .repartition(1).sortWithinPartitions("a", "b")
    )


# ---------------------------------------------------------------------------
# Corpus-filtering rules and classifier scoring (round 8): Gopher rule
# flags, a fixed-weight quality classifier, and the Lee-et-al cross-doc
# n-gram duplication signal.
# ---------------------------------------------------------------------------

_GOPHER_ORACLE = r"""
WITH base AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT)
           AS n_nospace,
         CAST(len(list_filter(string_split(text, ' '),
              w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT) AS n_alpha,
         CAST(len(list_filter(string_split(text, ' '),
              w -> list_contains(['a','the','and','of','to','in','is','it'],
                                 w))) AS BIGINT) AS n_stop
  FROM documents
), sig AS (
  SELECT doc_id, n_words,
         CAST(n_nospace AS DOUBLE) / greatest(n_words, 1) AS mwl,
         CAST(n_alpha AS DOUBLE) / greatest(n_words, 1) AS awr,
         n_stop
  FROM base
)
SELECT doc_id, n_words,
       ROUND(mwl, 6) AS mean_word_len,
       ROUND(awr, 6) AS alpha_word_ratio,
       n_stop AS n_stopword_hits,
       (n_words >= 50 AND n_words <= 100000) AS rule_word_count,
       (mwl >= 3.0 AND mwl <= 10.0) AS rule_mean_word_len,
       (awr >= 0.8) AS rule_alpha_words,
       (n_stop >= 2) AS rule_stopwords,
       (n_words >= 50 AND n_words <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
        AND awr >= 0.8 AND n_stop >= 2) AS passes_gopher
FROM sig
ORDER BY doc_id
"""


@query("gopher_quality_flags", oracle=_GOPHER_ORACLE,
       doc="Gopher-style (Rae et al. 2021) document quality rules as one "
           "projection pass: word-count bounds, mean-word-length bounds, "
           "alphabetic-word ratio, stop-word hits — per-rule flags plus "
           "the conjunction. Pure Column arithmetic, zero shuffle; rule "
           "comparisons run on UNROUNDED ratios in both engines.")
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        text.gopher_quality(_docs(spark, sf_dir))
        .repartition(1).sortWithinPartitions("doc_id")
    )


_LOGISTIC_ORACLE = r"""
WITH feats AS (
  SELECT doc_id,
         ROUND(CAST(len(list_filter(string_split(text, ' '),
           w -> list_contains(['a','the','and','of','to','in','is','it'],
                              w))) AS DOUBLE)
           / len(string_split(text, ' ')), 6) AS s,
         ROUND(CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
           / greatest(length(text), 1), 6) AS p,
         ROUND(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
           / len(string_split(text, ' ')), 6) AS a
  FROM documents
), scored AS (
  SELECT doc_id,
         (-1.0 + s * 8.0 + p * -6.0 + a * 0.25)
           / (1.0 + abs(-1.0 + s * 8.0 + p * -6.0 + a * 0.25)) AS score
  FROM feats
)
SELECT doc_id, ROUND(score, 6) AS quality_score, score >= 0 AS keep
FROM scored
ORDER BY doc_id
"""


@query("quality_logistic_score", oracle=_LOGISTIC_ORACLE,
       doc="Fixed-weight linear quality classifier (the seam where a "
           "trained fastText-style head loads) over projection-only "
           "signals, squashed with the RATIONAL fast-sigmoid x/(1+|x|) "
           "instead of exp so both engines agree bit-for-bit (libm exp "
           "is not ulp-stable across engines). keep = score >= 0.")
def quality_logistic_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        text.logistic_quality(_docs(spark, sf_dir))
        .repartition(1).sortWithinPartitions("doc_id")
    )


_CROSS_DOC_DUP_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
ng AS (
  SELECT DISTINCT doc_id, array_to_string(ws[i:i+3], ' ') AS shingle
  FROM toks, UNNEST(range(1, len(ws) - 4 + 2)) AS t(i)
  WHERE len(ws) >= 4
),
c AS (SELECT shingle, COUNT(*) AS nd FROM ng GROUP BY shingle)
SELECT ng.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_ngrams,
       CAST(SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared,
       ROUND(CAST(SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS dup_rate
FROM ng JOIN c USING (shingle)
GROUP BY ng.doc_id
ORDER BY doc_id
"""


@query("cross_doc_dup_rate", oracle=_CROSS_DOC_DUP_ORACLE,
       doc="Cross-document duplication signal (Lee et al. 2022): per doc, "
           "the fraction of its distinct word 4-grams appearing in >= 2 "
           "documents — template/boilerplate docs score high. One shingle "
           "explode + one uniform-key count + one join back; no "
           "broadcast, shingle vocab scale-free.")
def cross_doc_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        dedup.cross_doc_dup_rate(_docs(spark, sf_dir), n=4)
        .repartition(1).sortWithinPartitions("doc_id")
    )


_HARD_NEG_IDS = [1, 2, 3, 4, 5]

_HARD_NEG_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS qv, label AS q_label
  FROM embeddings WHERE vec_id IN (1, 2, 3, 4, 5)
),
scored AS (
  SELECT q.q_id, e.vec_id, {_COSINE_EXPR} AS score
  FROM embeddings e, q
  WHERE e.label <> q.q_label
),
ranked AS (
  SELECT q_id, vec_id, score,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY score DESC, vec_id) AS rnk
  FROM scored
)
SELECT q_id, vec_id, score, CAST(rnk AS BIGINT) AS rank
FROM ranked WHERE rnk <= 4
ORDER BY q_id, rank
"""


@query("hard_negative_mining", oracle=_HARD_NEG_ORACLE,
       doc="Hard-negative mining for retrieval/contrastive training: per "
           "query vector, the top-4 most-similar CROSS-label vectors "
           "(same-label hits are positives). Broadcast probe batch + "
           "two-phase top-k — the scored corpus never shuffles.")
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        similarity.hard_negatives(_emb(spark, sf_dir), _HARD_NEG_IDS, k=4)
        .repartition(1).sortWithinPartitions("q_id", "rank")
    )


# ---------------------------------------------------------------------------
# Dedup cascade: exact-hash pass THEN minhash/LSH keep-best on the
# survivors, with per-stage survivor accounting — the composition real
# corpus pipelines run (cheap exact pass first shrinks the candidate
# space the quadratic-ish near-dup stage sees).
# ---------------------------------------------------------------------------

def _cascade_oracle(**kw) -> str:
    lead = """
keepers AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
s1 AS (SELECT d.* FROM documents d JOIN keepers USING (doc_id)),"""
    return _components_ctes(table="s1", lead_ctes=lead, **kw) + """
, comp AS (SELECT id AS doc_id, MIN(r) AS component_id
           FROM reach GROUP BY id),
base AS (
  SELECT s1.doc_id, s1.n_chars,
         COALESCE(c.component_id, s1.doc_id) AS component_id
  FROM s1 LEFT JOIN comp c USING (doc_id)
),
ranked AS (
  SELECT doc_id,
         FIRST_VALUE(doc_id) OVER (
           PARTITION BY component_id
           ORDER BY n_chars DESC, doc_id) AS kept_doc_id
  FROM base
)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS stage,
         'exact_hash' AS stage_name,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_in,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_out
  UNION ALL
  SELECT CAST(2 AS BIGINT), 'minhash_keep_best',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s1),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM ranked
          WHERE doc_id = kept_doc_id)
) ORDER BY stage
"""


@query("dedup_cascade_stages", oracle=_cascade_oracle(),
       doc="Two-stage dedup cascade with per-stage survivor accounting: "
           "exact md5 keep-min-doc_id first (one uniform-key groupBy), "
           "then LSH-verified components + keep-longest on the SURVIVORS "
           "only — the near-dup stage's shingle/band work runs on the "
           "already-shrunk corpus, which is the whole point of "
           "cascading at 100 TB. Stage counts are 1-row aggregates "
           "attached by broadcast, never collected.")
def dedup_cascade_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = _docs(spark, sf_dir)
    keep = (docs.select(F.md5("text").alias("f"), "doc_id")
            .groupBy("f").agg(F.min("doc_id").alias("doc_id")))
    # s1 feeds four consumers (LSH pairs, the component base, and both
    # stage-count aggregates) — cache it so the md5 groupBy + semi-join
    # materializes once instead of once per consumer subtree
    s1 = dedup._swap_cache(
        "cascade_s1",
        docs.join(keep.select("doc_id"), "doc_id", "left_semi"))
    pairs = dedup.lsh_verified_pairs(s1, threshold=0.5)
    comp = dedup.connected_components(pairs)
    base = (
        s1.select("doc_id", "n_chars")
        .join(comp, "doc_id", "left")
        .withColumn("component_id",
                    F.coalesce("component_id", "doc_id"))
    )
    w = W.partitionBy("component_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc())
    kept = (base.withColumn("kept_doc_id", F.first("doc_id").over(w))
            .filter(F.col("doc_id") == F.col("kept_doc_id")))
    row1 = (
        docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_in"))
        .crossJoin(F.broadcast(
            s1.agg(F.count(F.lit(1)).cast("bigint").alias("n_out"))))
        .select(F.lit(1).cast("bigint").alias("stage"),
                F.lit("exact_hash").alias("stage_name"), "n_in", "n_out")
    )
    row2 = (
        s1.agg(F.count(F.lit(1)).cast("bigint").alias("n_in"))
        .crossJoin(F.broadcast(
            kept.agg(F.count(F.lit(1)).cast("bigint").alias("n_out"))))
        .select(F.lit(2).cast("bigint").alias("stage"),
                F.lit("minhash_keep_best").alias("stage_name"),
                "n_in", "n_out")
    )
    return (row1.unionByName(row2)
            .repartition(1).sortWithinPartitions("stage"))


# ---------------------------------------------------------------------------
# Containment decontamination (eval-side metric)
# ---------------------------------------------------------------------------

_CONTAINMENT_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
),
ev AS (SELECT doc_id AS eval_id, shingle FROM sh WHERE doc_id % 97 = 0),
tr AS (SELECT doc_id AS train_id, shingle FROM sh WHERE doc_id % 97 <> 0),
ev_sz AS (SELECT eval_id, CAST(COUNT(*) AS BIGINT) AS ev_sz
          FROM ev GROUP BY eval_id),
shared AS (
  SELECT tr.train_id, ev.eval_id, CAST(COUNT(*) AS BIGINT) AS shared
  FROM tr JOIN ev USING (shingle)
  GROUP BY tr.train_id, ev.eval_id
),
pair AS (
  SELECT s.eval_id, (s.shared * 1000000) // z.ev_sz AS containment_ppm,
         z.ev_sz
  FROM shared s JOIN ev_sz z USING (eval_id)
)
SELECT eval_id AS doc_id,
       CAST(MAX(ev_sz) AS BIGINT) AS n_shingles,
       CAST(MAX(containment_ppm) AS BIGINT) AS max_containment_ppm,
       CAST(SUM(CASE WHEN containment_ppm >= 800000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contaminating
FROM pair GROUP BY eval_id ORDER BY doc_id
"""


@query("decontaminate_containment", oracle=_CONTAINMENT_ORACLE,
       doc="Eval-side containment decontamination: an eval doc is dirty "
           "when |shared 3-gram shingles| / |its own shingles| is high — "
           "the metric Jaccard misses when a long training doc swallows "
           "a short eval doc. Exact integer ppm; distinct shingle sets "
           "partial-aggregate before the shingle-key join; no broadcast.")
def decontaminate_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops import curation

    docs = _docs(spark, sf_dir)
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return (
        curation.containment_decontamination(train, eval_df)
        .repartition(1).sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Quality-classifier calibration — reliability diagram vs the Gopher rules.
# ---------------------------------------------------------------------------

_CALIBRATION_ORACLE = r"""
WITH feats AS (
  SELECT doc_id,
         ROUND(CAST(len(list_filter(string_split(text, ' '),
           w -> list_contains(['a','the','and','of','to','in','is','it'],
                              w))) AS DOUBLE)
           / len(string_split(text, ' ')), 6) AS s,
         ROUND(CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
           / greatest(length(text), 1), 6) AS p,
         ROUND(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
           / len(string_split(text, ' ')), 6) AS a,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT)
           AS n_nospace,
         CAST(len(list_filter(string_split(text, ' '),
              w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT) AS n_alpha,
         CAST(len(list_filter(string_split(text, ' '),
              w -> list_contains(['a','the','and','of','to','in','is','it'],
                                 w))) AS BIGINT) AS n_stop
  FROM documents
),
scored AS (
  SELECT doc_id,
         CAST(floor(ROUND(
             (-1.0 + s * 8.0 + p * -6.0 + a * 0.25)
             / (1.0 + abs(-1.0 + s * 8.0 + p * -6.0 + a * 0.25)), 6)
           * 1000000 + 0.5) AS BIGINT) AS score_ppm,
         CASE WHEN n_words >= 50 AND n_words <= 100000
                   AND CAST(n_nospace AS DOUBLE) / greatest(n_words, 1)
                       >= 3.0
                   AND CAST(n_nospace AS DOUBLE) / greatest(n_words, 1)
                       <= 10.0
                   AND CAST(n_alpha AS DOUBLE) / greatest(n_words, 1)
                       >= 0.8
                   AND n_stop >= 2
              THEN 1 ELSE 0 END AS y
  FROM feats
),
binned AS (
  SELECT least(CAST(9 AS BIGINT), (score_ppm + 1000000) // 200000) AS bin,
         score_ppm, y
  FROM scored
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(score_ppm) // COUNT(*) AS BIGINT) AS mean_score_ppm,
       CAST((SUM(y) * 1000000) // COUNT(*) AS BIGINT) AS gopher_pass_ppm
FROM binned
GROUP BY bin
ORDER BY bin
"""


@query("calibration_reliability_bins", oracle=_CALIBRATION_ORACLE,
       doc="Reliability diagram for the fixed-weight quality classifier "
           "against the Gopher rule verdict as ground truth: score in "
           "(-1,1) maps to exact ppm, docs bucket into 10 equal-width "
           "bins, and each bin reports its mean score next to its "
           "Gopher pass rate — a monotone pass rate means the cheap "
           "classifier can replace the rule stack at some threshold; a "
           "flat one means it cannot (the standard pre-deployment check "
           "before a learned quality filter gates a 100 TB corpus). "
           "Both parents stay single projections; the doc_id-keyed "
           "join and one 10-row partial aggregate are the only "
           "shuffles. Signed bin means divide with Spark DIV / DuckDB "
           "// (both truncate toward zero).")
def calibration_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    lq = text.logistic_quality(_docs(spark, sf_dir)) \
        .select("doc_id", "quality_score")
    gq = text.gopher_quality(_docs(spark, sf_dir)) \
        .select("doc_id", "passes_gopher")
    scored = lq.join(gq, "doc_id").select(
        F.expr("CAST(floor(quality_score * 1000000 + 0.5) AS BIGINT)")
        .alias("score_ppm"),
        F.when(F.col("passes_gopher"), 1).otherwise(0).alias("y"))
    binned = scored.select(
        F.expr("least(CAST(9 AS BIGINT), (score_ppm + 1000000) DIV 200000)")
        .alias("bin"),
        "score_ppm", "y")
    return (
        binned.groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
             F.sum("score_ppm").alias("ssum"),
             F.sum("y").alias("ysum"))
        .select("bin", "n_docs",
                F.expr("ssum DIV n_docs").cast("bigint")
                .alias("mean_score_ppm"),
                F.expr("(ysum * 1000000) DIV n_docs").cast("bigint")
                .alias("gopher_pass_ppm"))
        .repartition(1).sortWithinPartitions("bin")
    )
