"""Text analysis operators over a document corpus.

All pure Column expressions (JVM-side, codegen'd): language-ID heuristic,
quality scoring, token counting (whitespace and BPE-ish regex), document
fingerprinting. Designed to run in the projection of a single scan pass —
zero shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# a small English stopword set; the heuristic is ratio-of-stopwords
EN_STOPWORDS = ["a", "the", "and", "of", "to", "in", "is", "it"]

# BPE-ish tokenizer: letter runs, digit runs, single punctuation
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens (single-space split to stay oracle-portable)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))


def stopword_count(text: Column) -> Column:
    return F.size(F.filter(tokens(text), lambda w: w.isin(EN_STOPWORDS)))


def quality_columns(text: Column) -> dict[str, Column]:
    """Quality-scoring signals: lengths, token stats, punctuation/stopword
    ratios. Ratios are double divisions of integer counts — deterministic
    across engines."""
    n_tok = token_count(text)
    n_chars = F.length(text)
    n_nospace = F.length(F.regexp_replace(text, r"\s+", ""))
    n_stop = F.size(F.filter(tokens(text), lambda w: w.isin(EN_STOPWORDS)))
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0))
    return {
        "n_tokens": n_tok.cast("bigint"),
        "n_chars": n_chars.cast("bigint"),
        "avg_token_len": F.round(n_nospace.cast("double") / n_tok, 6),
        "stopword_ratio": F.round(n_stop.cast("double") / n_tok, 6),
        "punct_ratio": F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6),
    }


def lang_id(text: Column) -> Column:
    """N-gram/stopword language heuristic: enough English stopwords -> 'en'.
    (A real model would be a broadcast n-gram table; the decision column
    shape is what matters for the pipeline.)"""
    n_tok = token_count(text)
    n_stop = F.size(F.filter(tokens(text), lambda w: w.isin(EN_STOPWORDS)))
    ratio = n_stop.cast("double") / F.greatest(n_tok, F.lit(1))
    return F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("unknown"))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    Portable (md5, not engine hash)."""
    return F.md5(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))))


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    text = F.col(text_col)
    cols = quality_columns(text)
    return df.select(
        F.col(id_col),
        *[c.alias(name) for name, c in cols.items()],
        lang_id(text).alias("lang_pred"),
        fingerprint(text).alias("fingerprint"),
    )


def token_frequency_stats(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Corpus-frequency quality signal — the integer-exact form of
    LM-likelihood scoring: a doc whose tokens are rare corpus-wide (low
    mean frequency) or highly repetitive (low distinct ratio) is a
    filter candidate. All aggregates are integer sums with a single
    final division + round, so both engines agree bit-for-bit (log-based
    perplexity would hang cross-engine equality on libm ulp behavior).

    Scale: one token explode, one groupBy(token) count (uniform key,
    partial-aggregated), one shuffle join back on token, one per-doc
    aggregate. No broadcast needed — vocab can be arbitrarily large.
    """
    toks = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    return (
        toks.join(counts, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.count_distinct("tok").cast("bigint").alias("n_distinct"),
            F.round(F.sum("freq").cast("double") / F.count(F.lit(1)), 6)
             .alias("mean_token_freq"),
            F.round(F.count_distinct("tok").cast("double") / F.count(F.lit(1)), 6)
             .alias("distinct_ratio"),
        )
    )


def _zlib_udf(level: int):
    """Arrow-batched zlib sizer: (raw_bytes, compressed_bytes) per text.
    zlib has no Spark builtin; the DEFLATE output for a fixed level and
    strategy is deterministic for a given zlib build, so results are
    stable within an engine but carry no cross-engine oracle (rows-only
    check; semantics pinned against the Python zlib reference in
    tests/test_training_ext.py)."""
    import zlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def sizes(s):
        raw, comp = [], []
        for x in s:
            if x is None:
                raw.append(None)
                comp.append(None)
            else:
                b = x.encode("utf-8")
                raw.append(len(b))
                comp.append(len(zlib.compress(b, level)))
        return pd.DataFrame({"raw_bytes": raw, "compressed_bytes": comp})

    # real annotation objects: the module's `from __future__ import
    # annotations` would stringify inline hints, which pandas_udf's
    # signature inference cannot resolve
    sizes.__annotations__ = {"s": pd.Series, "return": pd.DataFrame}
    return pandas_udf(sizes, "raw_bytes bigint, compressed_bytes bigint")


def compression_signals(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", level: int = 6) -> DataFrame:
    """Per-doc zlib compression ratio — the standard corpus-quality signal
    for boilerplate/repetition (highly compressible text is low-entropy:
    templated pages, repeated spans, generator output). One Arrow-batched
    projection inside the scan partition — zero shuffle at any scale.

    Output: (id, raw_bytes, compressed_bytes, compression_ratio) with
    ratio = compressed/raw rounded to 6 places (higher = closer to
    incompressible; typical prose lands ~0.4-0.6, degenerate repetition
    far below)."""
    sized = df.select(
        F.col(id_col), _zlib_udf(level)(F.col(text_col)).alias("_z")
    )
    return sized.select(
        id_col,
        F.col("_z.raw_bytes").alias("raw_bytes"),
        F.col("_z.compressed_bytes").alias("compressed_bytes"),
        F.round(
            F.col("_z.compressed_bytes").cast("double")
            / F.greatest(F.col("_z.raw_bytes"), F.lit(1)), 6,
        ).alias("compression_ratio"),
    )


def _nfc_udf():
    """Arrow-batched NFC normalizer. Unicode NFC has no Spark builtin, so
    this is the one deliberate Python step in the text-hygiene path — a
    vectorized pandas UDF (never per-row) whose output is defined by the
    Unicode standard, hence engine-portable (DuckDB's nfc_normalize
    produces byte-identical results)."""
    import unicodedata

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def nfc(s):
        return s.map(lambda x: None if x is None
                     else unicodedata.normalize("NFC", x))

    # real annotation objects: the module's `from __future__ import
    # annotations` would stringify inline hints, which pandas_udf's
    # signature inference cannot resolve
    nfc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(nfc, "string")


def clean_text(text: Column, lowercase: bool = False) -> Column:
    """Standard corpus text hygiene: NFC-normalize, strip C0/DEL control
    characters, collapse whitespace runs to single spaces, trim. All but
    the NFC step are JVM regexes; the NFC step is Arrow-batched."""
    c = _nfc_udf()(text)
    # strip C0 controls except \t \n \r, which are whitespace and must
    # collapse to spaces rather than vanish (tab-separated words would
    # otherwise fuse)
    c = F.regexp_replace(c, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return F.lower(c) if lowercase else c


def ngram_array(toks: Column, n: int) -> Column:
    """Array of space-joined word n-grams from a token array — pure
    expression (transform over start offsets), no explode. A doc with
    fewer than ``n`` tokens yields an empty array (the sequence guard
    matters: Spark's sequence(1, 0) would count DOWN)."""
    n_grams = F.size(toks) - (n - 1)
    return F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def dup_ngram_fraction(toks: Column, n: int) -> Column:
    """Within-document duplicate n-gram fraction — the Gopher-style
    repetition signal: 1 - distinct/total over the doc's n-grams. Zero
    shuffle (array expressions only); null for docs with no n-grams."""
    grams = ngram_array(toks, n)
    total = F.size(grams)
    return F.when(
        total > 0,
        F.round(1.0 - F.size(F.array_distinct(grams)).cast("double") / total, 6),
    )


def repetition_signals(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Repetition-based quality signals per document: duplicate bigram /
    trigram fractions (zero-shuffle array expressions) plus the top-bigram
    share (count of the most frequent bigram over all bigrams).

    Scale: the dup fractions ride the scan projection. The top share is
    explode -> groupBy(doc, gram) -> groupBy(doc) — both aggregates are
    partial-aggregated and keyed by doc_id, so the shuffle carries one row
    per distinct (doc, gram), never the corpus text. The per-doc array
    alternative (aggregate over distinct grams) would be O(len^2) per row
    — wrong for book-length docs.
    """
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col),
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
        dup_ngram_fraction(toks, 2).alias("dup_bigram_frac"),
        dup_ngram_fraction(toks, 3).alias("dup_trigram_frac"),
        ngram_array(toks, 2).alias("_bigrams"),
    )
    gram_counts = (
        base.select(id_col, F.explode("_bigrams").alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top_share = gram_counts.groupBy(id_col).agg(
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("top_bigram_share")
    )
    return base.drop("_bigrams").join(top_share, id_col, "left")


def chunk_context_windows(
    df: DataFrame,
    window: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token windows — the standard
    context-window chunking pass before embedding or sequence packing.
    Output: (id, chunk_id, chunk_start, n_chunk_tokens, chunk_text), one
    row per window of ``window`` tokens advancing by ``stride``.

    Scale: one projection + one explode of start offsets — zero shuffle
    at any corpus size. A doc with n tokens yields ceil(n/stride) chunks,
    so output size is bounded by (1 + window/stride) x input tokens and
    the explode never materializes the token list more than once per row
    (single split into a reused array column).
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    exploded = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        n.alias("_n"),
        F.posexplode(starts).alias("chunk_id", "chunk_start"),
    )
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("bigint"),
        F.col("chunk_start").cast("bigint"),
        F.least(F.lit(window), F.col("_n") - F.col("chunk_start"))
         .cast("bigint").alias("n_chunk_tokens"),
        F.array_join(F.slice("_toks", F.col("chunk_start") + 1, window), " ")
         .alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# Document-level quality RULES (Gopher-style) and a fixed-weight quality
# classifier score — the two standard corpus-filtering shapes.
# ---------------------------------------------------------------------------

# Gopher (Rae et al. 2021, table A1) rule thresholds, adapted to the
# whitespace tokenizer above. Pure Column arithmetic — one scan pass.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_ALPHA_WORD_RATIO = 0.80
GOPHER_MIN_STOPWORDS = 2


def gopher_quality(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Gopher-style document quality rules as one projection pass: word
    count bounds, mean word length bounds, fraction of words containing
    an alphabetic character, and minimum stop-word hits. Every signal is
    an integer count or a single double division of integer counts —
    deterministic across engines. Zero shuffle at any scale."""
    text = F.col(text_col)
    toks = tokens(text)
    n_words = token_count(text).cast("bigint")
    n_nospace = F.length(F.regexp_replace(text, r"\s+", ""))
    mean_wl = n_nospace.cast("double") / F.greatest(n_words, F.lit(1))
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[a-zA-Z]")))
    alpha_ratio = n_alpha.cast("double") / F.greatest(n_words, F.lit(1))
    n_stop = stopword_count(text).cast("bigint")
    r_words = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    r_mwl = ((mean_wl >= GOPHER_MIN_MEAN_WORD_LEN)
             & (mean_wl <= GOPHER_MAX_MEAN_WORD_LEN))
    r_alpha = alpha_ratio >= GOPHER_MIN_ALPHA_WORD_RATIO
    r_stop = n_stop >= GOPHER_MIN_STOPWORDS
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        n_stop.alias("n_stopword_hits"),
        r_words.alias("rule_word_count"),
        r_mwl.alias("rule_mean_word_len"),
        r_alpha.alias("rule_alpha_words"),
        r_stop.alias("rule_stopwords"),
        (r_words & r_mwl & r_alpha & r_stop).alias("passes_gopher"),
    )


# Fixed classifier weights — the deployment seam where a trained quality
# model's (e.g. fastText CCNet/FineWeb-edu style) linear head would load.
# Deterministic stand-in weights so the pipeline shape is testable.
QUALITY_WEIGHTS = {
    "bias": -1.0,
    "stopword_ratio": 8.0,     # English-like prose scores up
    "punct_ratio": -6.0,       # symbol soup scores down
    "avg_token_len": 0.25,     # longer words, mildly up
}


def logistic_quality(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Fixed-weight linear quality classifier over the projection-only
    quality signals, squashed with the RATIONAL fast-sigmoid
    ``x / (1 + |x|)`` instead of the logistic exp form: plain +*/ and
    abs are bit-identical across engines, while libm exp() is not
    guaranteed to agree in the last ulp between the JVM and DuckDB.
    Score is in (-1, 1); keep = score >= 0 (the 0.5 analogue)."""
    cols = quality_columns(F.col(text_col))
    w = QUALITY_WEIGHTS
    feats = df.select(
        F.col(id_col),
        cols["stopword_ratio"].alias("stopword_ratio"),
        cols["punct_ratio"].alias("punct_ratio"),
        cols["avg_token_len"].alias("avg_token_len"),
    )
    wsum = (F.lit(w["bias"])
            + F.col("stopword_ratio") * F.lit(w["stopword_ratio"])
            + F.col("punct_ratio") * F.lit(w["punct_ratio"])
            + F.col("avg_token_len") * F.lit(w["avg_token_len"]))
    score = wsum / (F.lit(1.0) + F.abs(wsum))
    return feats.select(
        F.col(id_col),
        F.round(score, 6).alias("quality_score"),
        (score >= 0).alias("keep"),
    )


def span_dedup_scrub(df: DataFrame, span_len: int = 4,
                     text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide first-occurrence span deduplication — the C4/RefinedWeb
    rewrite pass: split every document into consecutive ``span_len``-token
    spans, keep only the FIRST occurrence of each distinct span corpus-wide
    (ordered by doc_id, span position), and rebuild each document from its
    surviving spans. Unlike the df-floor boilerplate scrub (which removes
    spans common to MANY docs), this removes every repeat — the exact-
    substring dedup signal of Lee et al. "Deduplicating Training Data
    Makes Language Models Better", at aligned-span granularity.

    Scale: one explode to spans, ONE hash-partitioned window keyed by the
    span digest (row_number — no global sort), one groupBy(doc) rebuild.
    State per key = occurrences of one span; no broadcast, no collect.
    """
    toks = F.split(F.col(text_col), " ")
    spans = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 1, F.lit(span_len)),
        lambda s: F.struct(
            (s / span_len).cast("bigint").alias("span_idx"),
            F.array_join(F.slice(toks, s + 1, span_len), " ").alias("span_text"),
        ),
    )
    exploded = (
        df.select(F.col(id_col), F.explode(spans).alias("sp"))
        .select(id_col, F.col("sp.span_idx").alias("span_idx"),
                F.col("sp.span_text").alias("span_text"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy(F.md5("span_text")).orderBy(id_col, "span_idx")
    ranked = exploded.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("rn") == 1, F.struct("span_idx", "span_text"))
    return (
        ranked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
             .cast("bigint").alias("n_kept"),
            F.array_join(
                F.transform(F.sort_array(F.collect_list(kept_struct)),
                            lambda s: s["span_text"]),
                " ").alias("_scrubbed"),
        )
        .select(
            id_col, "n_spans", "n_kept",
            F.md5("_scrubbed").alias("scrubbed_md5"),
            F.length("_scrubbed").cast("bigint").alias("scrubbed_len"),
        )
    )


def bigram_lm_scores(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", scale: int = 1_000_000) -> DataFrame:
    """Bigram-LM document scoring — the CCNet-style likelihood filter in
    exact integer arithmetic: train MLE bigram probabilities on the corpus
    itself (count(w1,w2) / count(w1-as-prefix)), score each document by the
    fixed-point per-bigram likelihood floor(scale * c12 / c1) summed as
    exact BIGINTs. No log/exp anywhere, so both engines agree bit-for-bit
    (true log-perplexity would hang equality on libm ulp behavior; the
    MONOTONIC ordering of documents — what a filter consumes — is
    preserved by the rational form for any fixed bigram count table).

    Scale: one explode to bigram positions, two uniform-key groupBy counts
    (partial-aggregated), two shuffle joins back on the token key, one
    per-doc aggregate. Vocabulary can be arbitrarily large — no broadcast.
    """
    toks = F.split(F.col(text_col), " ")
    # sequence(1, 0) counts DOWN — guard docs with fewer than 2 tokens
    idx = F.when(F.size(toks) >= 2,
                 F.sequence(F.lit(1), F.size(toks) - 1)).otherwise(
                     F.array().cast("array<int>"))
    base = df.select(F.col(id_col), toks.alias("w"), idx.alias("idx"))
    bg = (
        base.select(id_col, F.explode("idx").alias("i"),
                    F.col("w"))
        .select(id_col,
                F.element_at("w", F.col("i")).alias("w1"),
                F.element_at("w", F.col("i") + 1).alias("w2"))
    )
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    c12 = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12"))
    lik = (
        bg.join(c12, ["w1", "w2"]).join(c1, "w1")
        .withColumn("lik", F.expr(f"(c12 * CAST({scale} AS BIGINT)) DIV c1"))
    )
    return (
        lik.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("lik").cast("bigint").alias("sum_lik"),
        )
        .withColumn("avg_lik", F.expr("sum_lik DIV n_bigrams"))
    )


def token_drift_tvd(df: DataFrame, split_col: Column,
                    group_col: str = "source", text_col: str = "text",
                    scale: int = 1_000_000) -> DataFrame:
    """Distribution drift between two corpus slices, per group: the total
    variation distance TVD = 1/2 * sum_t |p_a(t) - p_b(t)| over token
    unigram distributions, in EXACT integer arithmetic — per token the
    term |c_a*N_b - c_b*N_a| is an exact BIGINT (chi-square and KL need
    libm; TVD is the drift metric that stays rational), summed exactly,
    with ONE integer division at the end:
    tvd_ppm = sum * scale DIV (2*N_a*N_b).

    ``split_col`` is a boolean Column naming the slice (old/new crawl,
    last week/this week, train/holdout). Output per group: token totals
    of both slices and tvd_ppm in [0, scale].

    Scale: one token explode, one (group, token) count shuffle
    (partial-aggregated), a 1-row-per-group totals join, one final
    aggregate. Exact-range bound: c*N products overflow past ~3e9 tokens
    per (group, slice) — switch the sum column to DECIMAL(38,0) past
    that (documented, same plan).
    """
    toks = (
        df.select(F.col(group_col).alias("grp"),
                  split_col.alias("in_b"),
                  F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
    )
    counts = toks.groupBy("grp", "tok").agg(
        F.sum(F.when(F.col("in_b"), 0).otherwise(1)).cast("bigint")
         .alias("c_a"),
        F.sum(F.when(F.col("in_b"), 1).otherwise(0)).cast("bigint")
         .alias("c_b"),
    )
    totals = counts.groupBy("grp").agg(
        F.sum("c_a").cast("bigint").alias("n_a"),
        F.sum("c_b").cast("bigint").alias("n_b"))
    return (
        counts.join(totals, "grp")
        .withColumn("term", F.abs(F.col("c_a") * F.col("n_b")
                                  - F.col("c_b") * F.col("n_a")))
        .groupBy("grp")
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.expr(f"CASE WHEN MAX(n_a) = 0 OR MAX(n_b) = 0 THEN NULL "
                   f"ELSE (SUM(term) * CAST({scale} AS BIGINT)) "
                   f"DIV (2 * MAX(n_a) * MAX(n_b)) END").alias("tvd_ppm"),
        )
    )
