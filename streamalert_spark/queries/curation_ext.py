"""Corpus-curation queries round 2: URL/domain filtering, length
histograms, and quality-bucket (head/middle/tail) filtering.

The documents table has no URL column, so the URL query constructs a
deterministic url from (doc_id, source, lang) — same pattern as the
source-decode queries that build Kinesis/SNS payloads — and then runs the
REAL parsing + blocklist operators from ops/curation.py over it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamalert_spark.ops import curation, text
from streamalert_spark.queries import query
from streamalert_spark.session import local_rows_df


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.session import read_table

    return read_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# URL/domain blocklist filtering
# ---------------------------------------------------------------------------

def _with_urls(docs: DataFrame) -> DataFrame:
    """Deterministic URLs: most docs live on <w{id%7}>.<source>-cdn.example
    with a port and a 3-segment path; every 5th doc sits under a co.uk
    public-suffix host to exercise the 3-label registrable-domain rule."""
    base = F.concat(
        F.lit("https://w"), (F.col("doc_id") % 7).cast("string"),
        F.lit("."), F.col("source"), F.lit("-cdn.example:"),
        (F.lit(8000) + F.col("doc_id") % 3).cast("string"),
        F.lit("/p/"), F.col("doc_id").cast("string"),
        F.lit("/"), F.col("lang"),
    )
    suffixed = F.concat(
        F.lit("https://a.b."), F.col("source"),
        F.lit(".co.uk/p/"), F.col("doc_id").cast("string"),
    )
    return docs.withColumn(
        "url", F.when(F.col("doc_id") % 5 == 0, suffixed).otherwise(base))


_URL_FILTER_ORACLE = r"""
WITH urled AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN 'https://a.b.' || source || '.co.uk/p/' || doc_id
              ELSE 'https://w' || (doc_id % 7) || '.' || source
                   || '-cdn.example:' || (8000 + doc_id % 3)
                   || '/p/' || doc_id || '/' || lang
         END AS url
  FROM documents
),
parsed AS (
  SELECT doc_id, url,
         lower(regexp_replace(
             regexp_extract(url, '^[a-z]+://([^/?#]+)', 1),
             ':[0-9]+$', '')) AS host
  FROM urled
),
domained AS (
  SELECT doc_id, url, host,
         CASE WHEN len(string_split(host, '.')) >= 3
                   AND list_contains(['co','com','ac','gov','org','net','edu'],
                                     string_split(host, '.')[-2])
              THEN array_to_string(string_split(host, '.')[-3:], '.')
              WHEN len(string_split(host, '.')) >= 2
              THEN array_to_string(string_split(host, '.')[-2:], '.')
              ELSE host
         END AS domain,
         CAST(len(list_filter(
             string_split(regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1),
                          '/'), s -> s <> '')) AS BIGINT) AS path_depth
  FROM parsed
)
SELECT doc_id, host, domain, path_depth
FROM domained
WHERE domain NOT IN ('src3-cdn.example', 'src7.co.uk')
ORDER BY doc_id
"""


@query("url_domain_filter", oracle=_URL_FILTER_ORACLE,
       doc="URL parsing + registrable-domain blocklist sweep: host/port/"
           "public-suffix handling, broadcast anti-join, zero corpus shuffle.")
def url_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_urls(_docs(spark, sf_dir))
    blocked = local_rows_df(
        spark, [("src3-cdn.example",), ("src7.co.uk",)], "domain string")
    kept = curation.domain_blocklist_filter(docs, blocked)
    return (
        kept.withColumn("path_depth", curation.url_path_depth(F.col("url")))
        .select("doc_id", "host", "domain", "path_depth")
        .repartition(1).sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Document-length histogram
# ---------------------------------------------------------------------------

_LENGTH_HISTOGRAM_ORACLE = """
WITH binned AS (
  SELECT CAST(length(bin(greatest(n_chars, 1))) AS BIGINT) AS len_bin
  FROM documents
),
counts AS (SELECT len_bin, COUNT(*) AS n_docs FROM binned GROUP BY len_bin),
total AS (SELECT COUNT(*) AS total FROM binned)
SELECT len_bin,
       CAST(power(2.0, len_bin - 1) AS BIGINT) AS bin_lo,
       CAST(n_docs AS BIGINT) AS n_docs,
       ROUND(CAST(n_docs AS DOUBLE) / total, 6) AS share
FROM counts, total
ORDER BY len_bin
"""


@query("doc_length_histogram", oracle=_LENGTH_HISTOGRAM_ORACLE,
       doc="Log2-bucketed document-length histogram (integer-exact bins "
           "via binary-string length; two tiny aggregates, no sort).")
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        curation.length_histogram(_docs(spark, sf_dir), "n_chars")
        .repartition(1).sortWithinPartitions("len_bin")
    )


# ---------------------------------------------------------------------------
# Quality buckets (head/middle/tail over the corpus-frequency score)
# ---------------------------------------------------------------------------

_QUALITY_BUCKET_ORACLE = """
WITH toks AS (
  SELECT doc_id, w
  FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
  WHERE w <> ''
),
cnt AS (SELECT w, COUNT(*) AS freq FROM toks GROUP BY w),
scores AS (
  SELECT doc_id,
         ROUND(CAST(SUM(freq) AS DOUBLE) / COUNT(*), 6) AS mean_token_freq
  FROM toks JOIN cnt ON cnt.w = toks.w
  GROUP BY doc_id
),
binned AS (
  SELECT doc_id, mean_token_freq,
         CAST(floor(mean_token_freq / 5.0) AS BIGINT) AS score_bin
  FROM scores
),
bins AS (SELECT score_bin, COUNT(*) AS n FROM binned GROUP BY score_bin),
cum AS (
  SELECT score_bin,
         CAST(SUM(n) OVER (ORDER BY score_bin
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(n) OVER () AS BIGINT) AS total
  FROM bins
),
bucketed AS (
  SELECT score_bin,
         CASE WHEN 3 * cum <= total THEN 'head'
              WHEN 3 * cum <= 2 * total THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM cum
)
SELECT b.doc_id, b.mean_token_freq, b.score_bin, k.bucket
FROM binned b JOIN bucketed k USING (score_bin)
ORDER BY b.doc_id
"""


@query("quality_bucket_filter", oracle=_QUALITY_BUCKET_ORACLE,
       doc="CCNet-style head/middle/tail quality buckets via binned exact "
           "quantiles — no global sort of the corpus, bin map broadcasts.")
def quality_bucket_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    scores = text.token_frequency_stats(_docs(spark, sf_dir)) \
        .select("doc_id", "mean_token_freq")
    return (
        curation.quality_buckets(scores, "mean_token_freq", bin_width=5.0)
        .select("doc_id", "mean_token_freq", "score_bin", "bucket")
        .repartition(1).sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Context-window chunking
# ---------------------------------------------------------------------------

_CHUNK_ORACLE = """
WITH toked AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
),
starts AS (
  SELECT doc_id, toks, n,
         CAST(s AS BIGINT) AS chunk_start,
         CAST(s / 48 AS BIGINT) AS chunk_id
  FROM toked, UNNEST(range(0, greatest(n, 1), 48)) AS t(s)
)
SELECT doc_id, chunk_id, chunk_start,
       CAST(least(64, n - chunk_start) AS BIGINT) AS n_chunk_tokens,
       array_to_string(toks[chunk_start + 1 : chunk_start + 64], ' ')
         AS chunk_text
FROM starts
ORDER BY doc_id, chunk_id
"""


@query("chunk_context_windows", oracle=_CHUNK_ORACLE,
       doc="Overlapping 64-token context windows with stride 48 — one "
           "projection + offset explode, zero shuffle at any scale.")
def chunk_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        text.chunk_context_windows(_docs(spark, sf_dir), window=64, stride=48)
        .repartition(1).sortWithinPartitions("doc_id", "chunk_id")
    )


# ---------------------------------------------------------------------------
# End-to-end curation pipeline (compose the operators)
# ---------------------------------------------------------------------------

_PIPELINE_ORACLE = r"""
WITH cleaned AS (
  SELECT doc_id, source, lang,
         trim(regexp_replace(
             regexp_replace(nfc_normalize(text),
                            '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
             '\s+', ' ', 'g')) AS clean
  FROM documents
),
redacted AS (
  SELECT doc_id, source, lang,
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(clean,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
          '\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b|\b\d{16}\b', '<CC>', 'g'),
        '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
      '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS rtext
  FROM cleaned
),
gated AS (
  SELECT doc_id, source, lang, rtext,
         len(string_split(rtext, ' ')) AS n_tokens,
         CAST(len(list_filter(string_split(rtext, ' '),
              w -> list_contains(['a','the','and','of','to','in','is','it'], w)))
              AS DOUBLE) / len(string_split(rtext, ' ')) AS stop_ratio,
         CASE WHEN len(string_split(rtext, ' ')) >= 2 THEN
           1.0 - CAST(len(list_distinct(list_transform(
                   range(1, len(string_split(rtext, ' '))),
                   i -> string_split(rtext, ' ')[i] || ' '
                        || string_split(rtext, ' ')[i + 1]))) AS DOUBLE)
                 / (len(string_split(rtext, ' ')) - 1)
         ELSE 0.0 END AS dup_bigram_frac
  FROM redacted
),
kept AS (
  SELECT * FROM gated
  WHERE n_tokens >= 30 AND stop_ratio >= 0.01 AND dup_bigram_frac <= 0.2
),
canon AS (
  SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(rtext)
)
SELECT k.source, k.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(k.n_tokens) AS BIGINT) AS total_tokens
FROM kept k JOIN canon c ON k.doc_id = c.doc_id
GROUP BY k.source, k.lang
ORDER BY k.source, k.lang
"""


@query("curation_pipeline_e2e", oracle=_PIPELINE_ORACLE,
       doc="Capstone composition: clean_text -> PII redact -> quality "
           "gates (token count, stopword ratio, dup-bigram repetition) -> "
           "exact dedup (min-id survivor) -> per-(source, lang) corpus "
           "stats. One scan through the projection operators, one md5 "
           "dedup shuffle, one aggregate — the full curation pass a "
           "training run would consume.")
def curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops import pii

    docs = _docs(spark, sf_dir)
    rtext = pii.redact(text.clean_text(F.col("text")))
    # Generate barrier (same trick as the classifier): projection collapse
    # would otherwise re-inline the NFC UDF + 6-regex redact chain into
    # every downstream expression that references rtext — measured 20x
    # slower at sf0.1 without it
    docs = docs.select(
        "doc_id", "source", "lang",
        F.explode(F.array(rtext)).alias("rtext"),
    )
    toks = text.tokens(F.col("rtext"))
    n_tokens = F.size(toks)
    stop_ratio = (F.size(F.filter(toks, lambda w: w.isin(text.EN_STOPWORDS)))
                  .cast("double") / n_tokens)
    # denominator (n_tokens - 1) == bigram count; clamped for 1-token docs
    dup_frac = (
        F.lit(1.0)
        - F.size(F.array_distinct(text.ngram_array(toks, 2))).cast("double")
        / F.greatest(n_tokens - 1, F.lit(1))
    )
    gated = (
        docs
        .withColumn("n_tokens", n_tokens.cast("bigint"))
        .withColumn("stop_ratio", stop_ratio)
        .withColumn("dup_bigram_frac",
                    F.when(F.col("n_tokens") >= 2, dup_frac).otherwise(0.0))
        .filter((F.col("n_tokens") >= 30) & (F.col("stop_ratio") >= 0.01)
                & (F.col("dup_bigram_frac") <= 0.2))
    )
    # survivor election via a hash-partitioned window rather than a
    # min-per-hash semi join: the join form re-evaluates the whole
    # clean+redact subtree on BOTH branches (plan-asserted single chain)
    from pyspark.sql import Window as W

    w = W.partitionBy(F.md5("rtext"))
    return (
        gated.withColumn("_min_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("_min_id"))
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tokens").cast("bigint").alias("total_tokens"))
        .repartition(1).sortWithinPartitions("source", "lang")
    )


# ---------------------------------------------------------------------------
# Temperature-smoothed mixture sampling
# ---------------------------------------------------------------------------

_TEMPERATURE_ORACLE = """
WITH counts AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
  FROM documents GROUP BY source
),
rates AS (
  SELECT source, toks,
         sqrt(CAST(toks AS DOUBLE) / (SELECT SUM(toks) FROM counts))
         / (SELECT MAX(sqrt(CAST(toks AS DOUBLE)
                            / (SELECT SUM(toks) FROM counts))) FROM counts)
           AS rate
  FROM counts
),
thresholds AS (
  SELECT source, toks, rate,
         lpad(lower(hex(CAST(least(floor(rate * 4294967296.0),
                                   4294967295.0) AS BIGINT))), 8, '0')
           AS thr
  FROM rates
)
SELECT t.source, t.toks AS stratum_tokens,
       ROUND(t.rate, 6) AS keep_rate,
       COUNT(*) FILTER (
         substr(md5(t.source || ':' || d.doc_id), 1, 8) < t.thr
       ) AS n_kept,
       COUNT(*) AS n_docs
FROM documents d JOIN thresholds t USING (source)
GROUP BY t.source, t.toks, t.rate
ORDER BY t.source
"""


@query("temperature_mixture_sample", oracle=_TEMPERATURE_ORACLE,
       doc="Temperature-smoothed mixture sampling (tau=0.5): per-source "
           "keep rate proportional to sqrt(token share), normalized so the "
           "largest stratum keeps everything; the keep decision is the "
           "deterministic md5 hash-gate. Every arithmetic step (divide, "
           "sqrt, floor) is correctly-rounded IEEE => thresholds are "
           "bit-identical across engines. Zero driver collects: rates ride "
           "a broadcast join.")
def temperature_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    counts = docs.groupBy("source").agg(
        F.sum(F.size(text.tokens(F.col("text")))).cast("bigint").alias("toks"))
    tot = counts.agg(F.sum("toks").alias("total"))
    shares = counts.crossJoin(F.broadcast(tot)) \
        .withColumn("s", F.sqrt(F.col("toks") / F.col("total")))
    mx = shares.agg(F.max("s").alias("smax"))
    rates = shares.crossJoin(F.broadcast(mx)) \
        .withColumn("rate", F.col("s") / F.col("smax")) \
        .withColumn("thr", F.lpad(F.lower(F.hex(
            F.least(F.floor(F.col("rate") * 4294967296.0),
                    F.lit(4294967295.0)).cast("bigint"))), 8, "0")) \
        .select("source", "toks", "rate", "thr")
    key = F.concat_ws(":", F.col("source"), F.col("doc_id").cast("string"))
    return (
        docs.join(F.broadcast(rates), "source")
        .groupBy("source", F.col("toks").alias("stratum_tokens"),
                 F.round("rate", 6).alias("keep_rate"))
        .agg(
            F.sum(F.when(F.substring(F.md5(key), 1, 8) < F.col("thr"), 1)
                  .otherwise(0)).cast("bigint").alias("n_kept"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .repartition(1).sortWithinPartitions("source")
    )


# ---------------------------------------------------------------------------
# Integer PageRank over a deterministic doc graph
# ---------------------------------------------------------------------------

_PAGERANK_ORACLE = """
WITH n AS (SELECT COUNT(*) AS cnt FROM documents),
edges AS (
  SELECT doc_id AS src, (doc_id * 2 + 1) % (SELECT cnt FROM n) AS dst
  FROM documents
  UNION ALL
  SELECT doc_id, (doc_id * 3 + 7) % (SELECT cnt FROM n) FROM documents
),
nodes AS (SELECT DISTINCT src AS node FROM edges
          UNION SELECT DISTINCT dst FROM edges),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
m0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS mass FROM nodes),
c1 AS (
  SELECT e.dst AS node,
         CAST(SUM((m.mass * 85) // (100 * d.deg))
              AS BIGINT) AS in_mass
  FROM edges e JOIN m0 m ON e.src = m.node JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
m1 AS (SELECT n.node,
              CAST(150000000000 + COALESCE(c.in_mass, 0) AS BIGINT) AS mass
       FROM nodes n LEFT JOIN c1 c ON n.node = c.node),
c2 AS (
  SELECT e.dst AS node,
         CAST(SUM((m.mass * 85) // (100 * d.deg))
              AS BIGINT) AS in_mass
  FROM edges e JOIN m1 m ON e.src = m.node JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
m2 AS (SELECT n.node,
              CAST(150000000000 + COALESCE(c.in_mass, 0) AS BIGINT) AS mass
       FROM nodes n LEFT JOIN c2 c ON n.node = c.node),
c3 AS (
  SELECT e.dst AS node,
         CAST(SUM((m.mass * 85) // (100 * d.deg))
              AS BIGINT) AS in_mass
  FROM edges e JOIN m2 m ON e.src = m.node JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
m3 AS (SELECT n.node,
              CAST(150000000000 + COALESCE(c.in_mass, 0) AS BIGINT) AS mass
       FROM nodes n LEFT JOIN c3 c ON n.node = c.node)
SELECT node, mass FROM m3 ORDER BY mass DESC, node LIMIT 25
"""


@query("pagerank_top_nodes", oracle=_PAGERANK_ORACLE,
       doc="Integer-arithmetic PageRank (3 iterations, integer-DIV damping "
           "— exact, order-independent integer sums both engines) over a "
           "deterministic 2-out-regular doc graph; top-25 by mass. The "
           "oracle unrolls the identical three join+aggregate steps.")
def pagerank_top_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.pagerank import integer_pagerank

    docs = _docs(spark, sf_dir)
    n = docs.count()  # driver scalar: node-space size for the modulus
    e1 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") * 2 + 1) % n).alias("dst"))
    e2 = docs.select(F.col("doc_id").alias("src"),
                     ((F.col("doc_id") * 3 + 7) % n).alias("dst"))
    edges = e1.unionByName(e2)
    return (
        integer_pagerank(edges, iters=3)
        .orderBy(F.col("mass").desc(), "node")
        .limit(25)
    )


# ------------------------------------------------- winsorized value clipping

_WINSOR_ORACLE = """
WITH limits AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS p_lo,
         quantile_cont(value, 0.95) AS p_hi
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, ROUND(e.value, 6) AS value,
       ROUND(LEAST(GREATEST(e.value, l.p_lo), l.p_hi), 6) AS clipped
FROM events e JOIN limits l USING (event_type)
ORDER BY e.event_id
"""


@query("winsorize_event_values", oracle=_WINSOR_ORACLE,
       doc="Winsorization (percentile clipping) per event type: values "
           "clip to the exact [p5, p95] band — the outlier-taming "
           "normalization step before loss-weighting or feature "
           "extraction in a training pipeline. One partial-aggregated "
           "percentile shuffle for the 5-row limits table, broadcast "
           "back over the scan; Spark's percentile and DuckDB's "
           "quantile_cont share the rank = p*(n-1) interpolation, so "
           "the clipped values hash-match.")
def winsorize_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.queries.analytics_sketch import _events

    ev = _events(spark, sf_dir)
    limits = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05D)").alias("p_lo"),
        F.expr("percentile(value, 0.95D)").alias("p_hi"),
    )
    return (
        ev.join(F.broadcast(limits), "event_type")
        .select(
            "event_id", "event_type",
            F.round("value", 6).alias("value"),
            F.round(F.least(F.greatest(F.col("value"), F.col("p_lo")),
                            F.col("p_hi")), 6).alias("clipped"),
        )
        .repartition(1).sortWithinPartitions("event_id")
    )


# ------------------------------------------------ weighted corpus sampling

_WSAMPLE_ORACLE = """
WITH w AS (SELECT doc_id, 1 + doc_id % 5 AS weight FROM documents),
draws AS (
  SELECT doc_id, weight,
         MAX(md5('ws:' || CAST(doc_id AS VARCHAR) || ':'
                 || CAST(j AS VARCHAR))) AS draw
  FROM w, UNNEST(range(1, weight + 1)) AS t(j)
  GROUP BY doc_id, weight
)
SELECT doc_id, CAST(weight AS BIGINT) AS weight, draw
FROM draws
ORDER BY draw DESC, doc_id
LIMIT 50
"""


@query("weighted_sample_docs", oracle=_WSAMPLE_ORACLE,
       doc="Deterministic WEIGHTED sampling without replacement "
           "(Efraimidis-Spirakis): each doc's key is the max of `weight` "
           "portable md5 draws — max of w uniforms has CDF u^w, exactly "
           "the u^(1/weight) E-S key, but computed with NO pow()/log() "
           "(libm low bits differ across engines; hash max does not). "
           "Top-k by key = a quality-weighted corpus sample that is "
           "reproducible across runs, engines, and cluster sizes. "
           "Plan: explode by integer weight (guarded by the op's hard "
           "MAX_SAMPLE_WEIGHT cap — O(Σweights) is the documented "
           "contract), map-side max-combine, TakeOrderedAndProject — "
           "no global sort, no RNG state.")
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.sampling import weighted_sample_keys
    from streamalert_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", (1 + F.pmod(F.col("doc_id"), F.lit(5))).alias("weight"))
    draws = weighted_sample_keys(w, "doc_id", "weight")
    return (
        draws.select("doc_id", F.col("weight").cast("bigint").alias("weight"),
                     "draw")
        .orderBy(F.col("draw").desc(), "doc_id")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Corpus-wide first-occurrence span dedup (C4/RefinedWeb rewrite pass)
# ---------------------------------------------------------------------------

_SPAN_DEDUP_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sp AS (
  SELECT doc_id, CAST(s / 4 AS BIGINT) AS span_idx,
         array_to_string(w[s + 1 : s + 4], ' ') AS span_text
  FROM toks, UNNEST(range(0, len(w), 4)) AS u(s)
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY md5(span_text)
                               ORDER BY doc_id, span_idx) AS rn
  FROM sp
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN span_text END, ' '
                               ORDER BY span_idx), '')) AS scrubbed_md5,
       CAST(length(COALESCE(string_agg(CASE WHEN rn = 1 THEN span_text END,
                                       ' ' ORDER BY span_idx), ''))
            AS BIGINT) AS scrubbed_len
FROM rk GROUP BY doc_id ORDER BY doc_id
"""


@query("span_dedup_scrub", oracle=_SPAN_DEDUP_ORACLE,
       doc="Exact-substring dedup at aligned 4-token-span granularity "
           "(Lee et al.): keep the corpus-wide FIRST occurrence of every "
           "distinct span (by doc_id, position), rewrite each doc from "
           "its survivors, digest the result. One hash-partitioned "
           "row_number window on the span md5 — no global sort, no "
           "broadcast; complements boilerplate_span_scrub's df-floor "
           "(common-to-many) rule with a remove-every-repeat rule.")
def span_dedup_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = text.span_dedup_scrub(_docs(spark, sf_dir), span_len=4)
    return out.repartition(1).sortWithinPartitions("doc_id")


# ---------------------------------------------------------------------------
# Bigram-LM likelihood scoring (CCNet-style quality filter, fixed point)
# ---------------------------------------------------------------------------

_BIGRAM_LM_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bg AS (
  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
  FROM toks, UNNEST(range(1, len(w))) AS t(i)
),
c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY w1),
c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        FROM bg GROUP BY w1, w2),
lik AS (
  SELECT bg.doc_id, (c12.c12 * 1000000) // c1.c1 AS lik
  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(lik) AS BIGINT) AS sum_lik,
       CAST(SUM(lik) AS BIGINT) // COUNT(*) AS avg_lik
FROM lik GROUP BY doc_id ORDER BY doc_id
"""


@query("bigram_lm_doc_scores", oracle=_BIGRAM_LM_ORACLE,
       doc="Bigram-LM document likelihood (CCNet-style perplexity filter) "
           "in exact integer fixed point: MLE bigram table trained on the "
           "corpus, per-doc sum of floor(1e6*c12/c1). Two uniform-key "
           "count shuffles + token-key joins back — vocabulary-scale "
           "safe, no broadcast, no libm.")
def bigram_lm_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = text.bigram_lm_scores(_docs(spark, sf_dir))
    return out.repartition(1).sortWithinPartitions("doc_id")


# ---------------------------------------------------------------------------
# Cross-source duplication matrix (corpus forensics)
# ---------------------------------------------------------------------------

_CROSS_SOURCE_ORACLE = """
WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS w
              FROM documents),
gr AS (
  SELECT DISTINCT source,
         w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS gram
  FROM toks, UNNEST(range(1, len(w) - 2)) AS t(i)
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_grams
FROM gr a JOIN gr b ON a.gram = b.gram AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY source_a, source_b
"""


@query("cross_source_ngram_matrix", oracle=_CROSS_SOURCE_ORACLE,
       doc="Source-pair contamination matrix: distinct 4-grams shared by "
           "each pair of sources, in ONE corpus-scale shuffle: "
           "groupBy(gram).collect_set(source) (partial-aggregated, "
           "per-gram state bounded by |sources|), then each gram's "
           "sorted source set expands to its (a < b) pairs IN-ARRAY and "
           "the pair count shuffles at most |sources|² keys. Replaced "
           "the r6 distinct + gram self-join body (two corpus shuffles "
           "plus sort-merge sorts) in r12 — output-identity pinned, "
           "~1.5× faster at sf1. NOTE: the oracle is ORDER BY'd, so the "
           "wrapper's final 1-partition sort is part of the contract.")
def cross_source_ngram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.curation import cross_source_gram_matrix

    return (
        cross_source_gram_matrix(_docs(spark, sf_dir), n=4)
        .repartition(1).sortWithinPartitions("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# Corpus drift: total-variation distance between slices, per source
# ---------------------------------------------------------------------------

_DRIFT_ORACLE = """
WITH toks AS (
  SELECT source AS grp, (doc_id // 20) % 2 = 1 AS in_b, w AS tok
  FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
  WHERE w <> ''
),
counts AS (
  SELECT grp, tok,
         CAST(SUM(CASE WHEN in_b THEN 0 ELSE 1 END) AS BIGINT) AS c_a,
         CAST(SUM(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS c_b
  FROM toks GROUP BY grp, tok
),
totals AS (
  SELECT grp, CAST(SUM(c_a) AS BIGINT) AS n_a,
         CAST(SUM(c_b) AS BIGINT) AS n_b
  FROM counts GROUP BY grp
)
SELECT c.grp AS source,
       MAX(t.n_a) AS n_a, MAX(t.n_b) AS n_b,
       CASE WHEN MAX(t.n_a) = 0 OR MAX(t.n_b) = 0 THEN NULL
            ELSE CAST((SUM(abs(c.c_a * t.n_b - c.c_b * t.n_a)) * 1000000)
                      // (2 * MAX(t.n_a) * MAX(t.n_b)) AS BIGINT)
       END AS tvd_ppm
FROM counts c JOIN totals t USING (grp)
GROUP BY c.grp
ORDER BY source
"""


@query("token_drift_tvd", oracle=_DRIFT_ORACLE,
       doc="Corpus drift monitor: per source, the total-variation "
           "distance between the token distributions of two slices "
           "(here an interleaved doc split — in production, old vs new "
           "crawl) in exact integer ppm. TVD stays rational where "
           "chi-square/KL need libm; one (group, token) count shuffle "
           "and one division at the end.")
def token_drift_tvd_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    out = text.token_drift_tvd(
        docs, split_col=(F.expr("doc_id DIV 20") % 2 == 1),
        group_col="source")
    return (out.withColumnRenamed("grp", "source")
            .repartition(1).sortWithinPartitions("source"))


# ---------------------------------------------------------------------------
# Per-source quantile normalization of a quality score
# ---------------------------------------------------------------------------

_QNORM_ORACLE = """
WITH ranked AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) - 1 AS r,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT doc_id, source, n_chars,
       CAST(CASE WHEN n > 1 THEN (r * 1000000) // (n - 1)
                 ELSE 0 END AS BIGINT) AS pct_ppm,
       CAST(least(CASE WHEN n > 1 THEN (r * 1000000) // (n - 1)
                       ELSE 0 END // 100000, 9) AS BIGINT) AS decile
FROM ranked
ORDER BY doc_id
"""


@query("score_quantile_normalize", oracle=_QNORM_ORACLE,
       doc="Per-source quantile normalization of a quality score (CCNet "
           "does exactly this before head/middle/tail cuts): each "
           "source's score distribution maps to uniform [0,1e6] ppm via "
           "within-source rank, so one global threshold is fair across "
           "sources with very different score scales; decile = ppm DIV "
           "1e5 capped at 9. Integer-exact (ranks, not floats); the one "
           "shuffle is the per-source window partition — at 100 TB, "
           "source cardinality spreads the windows and no global sort "
           "exists.")
def score_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = _docs(spark, sf_dir).select("doc_id", "source",
                                       F.col("n_chars").cast("bigint")
                                       .alias("n_chars"))
    w = W.partitionBy("source").orderBy("n_chars", "doc_id")
    # row_number() is INT; the ppm scale-up must happen in BIGINT or
    # (r * 1000000) overflows 32 bits once a source holds >2148 docs —
    # ANSI Spark errors, DuckDB's BIGINT row_number sails on. Caught by
    # the round-11 full-registry sf1 parity sweep (sf0.1 sat within 2.1×
    # of the boundary); value-identical wherever the old expression ran.
    ranked = docs.select(
        "doc_id", "source", "n_chars",
        (F.row_number().over(w) - 1).cast("bigint").alias("r"),
        F.count(F.lit(1)).over(W.partitionBy("source")).alias("n"))
    pct = F.when(F.col("n") > 1,
                 F.expr("(r * 1000000) DIV (n - 1)")).otherwise(F.lit(0))
    return (
        ranked.withColumn("pct_ppm", pct.cast("bigint"))
        .select("doc_id", "source", "n_chars", "pct_ppm",
                F.least(F.expr("pct_ppm DIV 100000"), F.lit(9))
                .cast("bigint").alias("decile"))
        .repartition(1).sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Language-ID by corpus-learned trigram profiles — curation confusion audit.
# ---------------------------------------------------------------------------

_LANGID_PROFILE_K = 20

_LANGID_ORACLE = f"""
WITH tg AS (
  SELECT doc_id, lang, substr(text, CAST(i AS INT), 3) AS t
  FROM documents,
       UNNEST(range(1, greatest(length(text) - 1, 1))) AS s(i)
),
prof AS (
  SELECT lang AS lang_p, t FROM (
    SELECT lang, t, ROW_NUMBER() OVER (
      PARTITION BY lang ORDER BY COUNT(*) DESC, t) AS rn
    FROM tg GROUP BY lang, t) WHERE rn <= {_LANGID_PROFILE_K}
),
votes AS (
  SELECT tg.doc_id, prof.lang_p, CAST(COUNT(*) AS BIGINT) AS v
  FROM tg JOIN prof ON tg.t = prof.t
  GROUP BY tg.doc_id, prof.lang_p
),
pred AS (
  SELECT doc_id, lang_p FROM (
    SELECT doc_id, lang_p, ROW_NUMBER() OVER (
      PARTITION BY doc_id ORDER BY v DESC, lang_p) AS rn
    FROM votes) WHERE rn = 1
)
SELECT d.lang, COALESCE(p.lang_p, 'unk') AS pred_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents d LEFT JOIN pred p USING (doc_id)
GROUP BY d.lang, COALESCE(p.lang_p, 'unk')
ORDER BY lang, pred_lang
"""


@query("langid_trigram_confusion", oracle=_LANGID_ORACLE,
       doc="Language-ID confusion matrix from corpus-learned character "
           "trigram profiles (Cavnar-Trenkle n-gram classification, the "
           "pre-neural langid standard): each language's top-20 "
           "trigrams by count form its profile (ties broken "
           "lexicographically), every doc votes by counting trigram "
           "INSTANCES that hit each profile, argmax with min-language "
           "ties predicts, and the (true, predicted) matrix sizes the "
           "cross-lingual contamination risk before filtering by the "
           "lang column alone. Scale: the trigram explode is one scan "
           "(the shingle shape used across the dedup family), profiles "
           "are |langs| x 20 rows riding a broadcast join, votes are "
           "one (doc, lang) partial-aggregated shuffle, and the argmax "
           "is a per-doc window — nothing quadratic, nothing global.")
def langid_trigram_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = _docs(spark, sf_dir)
    tg = docs.select(
        "doc_id", "lang",
        F.explode(F.expr(
            "CASE WHEN length(text) >= 3 THEN "
            "transform(sequence(1, length(text) - 2), "
            "i -> substring(text, i, 3)) ELSE array() END")).alias("t"))
    wl = W.partitionBy("lang").orderBy(F.col("c").desc(), "t")
    prof = (tg.groupBy("lang", "t")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("rn", F.row_number().over(wl))
            .filter(F.col("rn") <= _LANGID_PROFILE_K)
            .select(F.col("lang").alias("lang_p"), "t"))
    votes = (tg.join(F.broadcast(prof), "t")
             .groupBy("doc_id", "lang_p")
             .agg(F.count(F.lit(1)).cast("bigint").alias("v")))
    wd = W.partitionBy("doc_id").orderBy(F.col("v").desc(), "lang_p")
    pred = (votes.withColumn("rn", F.row_number().over(wd))
            .filter(F.col("rn") == 1)
            .select("doc_id", "lang_p"))
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id", "left")
        .select("lang",
                F.coalesce("lang_p", F.lit("unk")).alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .repartition(1).sortWithinPartitions("lang", "pred_lang")
    )
