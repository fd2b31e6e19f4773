"""Training-data curation operators: benchmark decontamination and
deterministic stratified sampling.

Both are single-join / single-projection plans designed for the 100 TB
regime:
- decontamination is a broadcast semi-join of the (small) benchmark
  shingle set against the training corpus's shingles — shuffle-free on
  the big side when the eval set broadcasts;
- sampling is a pure projection: the keep decision is a lexicographic
  compare of an md5 prefix against a precomputed hex threshold, so it is
  deterministic, engine-portable (identical in DuckDB), resumable, and
  needs no RNG state or global count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streamalert_spark.ops.dedup import shingles


def ngram_overlap_flags(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Flag training docs sharing any n-gram shingle with the eval set —
    the classic benchmark-decontamination sweep. Output: (doc_id,
    n_shared_shingles) for flagged docs only.

    Scale: the eval side is benchmark-sized (thousands of docs), so its
    distinct shingle set broadcasts; the train side is one raw shingle
    projection (no pre-distinct — that would shuffle the whole corpus)
    filtered by the broadcast join FIRST, then a count_distinct over the
    matched survivors only. The only shuffle carries shingles that
    actually hit the benchmark set.
    """
    # rebalance the corpus across cores before the explode (same
    # local-vs-cluster note as the Arrow kernels: at scale the scan
    # already has more splits than cores and this only matters when the
    # input arrives as a handful of files)
    par = train.sparkSession.sparkContext.defaultParallelism
    if train.rdd.getNumPartitions() < par:
        train = train.repartition(par)
    train_sh = shingles(train, text_col, id_col, n, distinct=False)
    eval_sh = shingles(eval_df, text_col, id_col, n).select("shingle").distinct()
    return (
        train_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count_distinct("shingle").alias("n_shared_shingles"))
    )


def sample_threshold_hex(rate: float) -> str:
    """8-hex-char threshold such that md5(key)[:8] < threshold keeps
    ~rate of uniformly-hashed keys. Lowercase-hex string comparison is
    lexicographic == numeric at fixed width, identically in Spark and
    DuckDB."""
    rate = min(max(rate, 0.0), 1.0)
    return format(min(int(rate * 16 ** 8), 16 ** 8 - 1), "08x")


def deterministic_keep(key: Column, rate: float) -> Column:
    """Hash-gate: keep iff the md5 prefix of the key falls below the
    rate's threshold. Same rows survive on every run and every engine."""
    if rate >= 1.0:
        return F.lit(True)
    return F.substring(F.md5(key), 1, 8) < F.lit(sample_threshold_hex(rate))


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
) -> DataFrame:
    """Keep-set for capping over-represented groups (e.g. at most k docs
    per source domain): the first k rows of each group by ``order_col``
    ascending (must be unique within the group, e.g. a doc id). Returns
    (group_col, order_col, rank) — compose with a semi-join to filter
    the corpus.

    Same bounded two-phase shape as the batch top-k: every scan
    partition keeps at most k order values per group, so the shuffle
    carries groups x partitions x k scalars — a plain window
    row_number would instead shuffle the whole corpus to per-group
    tasks and melt on hot groups.
    """
    local = (
        df.groupBy(group_col, F.spark_partition_id().alias("p"))
        .agg(F.slice(F.sort_array(F.collect_list(F.col(order_col))), 1, k).alias("tk"))
    )
    merged = (
        local.select(group_col, F.explode("tk").alias("o"))
        .groupBy(group_col)
        .agg(F.slice(F.sort_array(F.collect_list("o")), 1, k).alias("tk"))
    )
    return (
        merged.select(group_col, F.posexplode("tk").alias("rank0", order_col))
        .select(
            group_col, order_col,
            (F.col("rank0") + 1).cast("bigint").alias("rank"),
        )
    )


# Second-level labels under which the registrable domain needs three
# labels (host mail.example.co.uk -> example.co.uk, not co.uk). A tiny,
# deliberately-incomplete public-suffix approximation: production swaps in
# the full public-suffix list as a broadcast lookup.
_PUBLIC_SECOND_LEVELS = ("co", "com", "ac", "gov", "org", "net", "edu")


def url_host(url: Column) -> Column:
    """Hostname of a URL: strip scheme, userinfo, port, path/query. One
    regexp per row, no shuffle; identical regex runs in the oracle."""
    host = F.regexp_extract(url, r"^[a-z]+://([^/?#]+)", 1)
    host = F.regexp_replace(host, r"^[^@]*@", "")     # userinfo
    return F.lower(F.regexp_replace(host, r":\d+$", ""))  # port


def registrable_domain(host: Column) -> Column:
    """Registrable-domain approximation: the last two host labels, or the
    last three when the second-to-last is a public second-level label
    (co/com/ac/...) and at least three labels exist."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    second = F.element_at(labels, -2)
    take3 = (n >= F.lit(3)) & second.isin(*_PUBLIC_SECOND_LEVELS)
    return F.when(take3, F.concat_ws(".", F.slice(labels, n - 2, 3))) \
            .when(n >= 2, F.concat_ws(".", F.slice(labels, n - 1, 2))) \
            .otherwise(host)


def url_path_depth(url: Column) -> Column:
    """Number of non-empty path segments after the authority."""
    path = F.regexp_extract(url, r"^[a-z]+://[^/?#]+(/[^?#]*)", 1)
    return F.size(F.filter(F.split(path, "/"), lambda seg: seg != "")) \
            .cast("bigint")


def domain_blocklist_filter(
    df: DataFrame,
    blocked: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Drop rows whose URL's registrable domain is on the blocklist — the
    standard source-quality sweep over a crawl. Adds host/domain columns
    and left-anti joins the (small) blocklist, broadcast so the corpus
    side never shuffles. ``blocked`` must have a ``domain`` column."""
    parsed = df.withColumn("host", url_host(F.col(url_col))) \
               .withColumn("domain", registrable_domain(F.col("host")))
    return parsed.join(F.broadcast(blocked.select("domain")), "domain", "left_anti")


def length_histogram(df: DataFrame, length_col: str = "n_chars") -> DataFrame:
    """Log2-bucketed length histogram — the standard corpus-shape
    diagnostic before truncation/packing decisions. The bin id is
    length(bin(n)) == floor(log2(n))+1, an integer-exact formulation
    (float log2 at bin boundaries is engine-dependent; string length of
    the binary representation is not). One partial-aggregated groupBy on
    ~60 possible keys; share is computed from a scalar subtotal via a
    single-row cross join, so the plan is two tiny aggregates — no sort,
    no driver collect."""
    n = F.greatest(F.col(length_col).cast("bigint"), F.lit(1))
    binned = df.select(F.length(F.bin(n)).cast("bigint").alias("len_bin"))
    counts = binned.groupBy("len_bin").agg(F.count(F.lit(1)).alias("n_docs"))
    total = binned.agg(F.count(F.lit(1)).alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "len_bin",
            F.pow(F.lit(2.0), F.col("len_bin") - 1).cast("bigint").alias("bin_lo"),
            "n_docs",
            F.round(F.col("n_docs") / F.col("total"), 6).alias("share"),
        )
    )


def quality_buckets(
    scored: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    bin_width: float = 1.0,
) -> DataFrame:
    """CCNet-style head/middle/tail bucketing of a quality/likelihood
    score, computed with binned exact quantiles instead of a global sort:

    1. bin each score into fixed-width integer bins (projection);
    2. aggregate doc counts per bin — tiny result (O(score range / width));
    3. running-total the bins on a single partition (bins are metadata
       scale, so the one-partition window is O(100) rows, not the corpus)
       and assign each bin to head/middle/tail by integer-exact
       cumulative thirds (3*cum <= total, 3*cum <= 2*total);
    4. broadcast the bin->bucket map back onto the corpus.

    The corpus is never globally sorted and never shuffled on score — the
    only wide op is the per-bin count. Bucket boundaries land on bin
    edges (quantile resolution = bin_width), which is the same trade
    t-digest/GK sketches make, but deterministically."""
    from pyspark.sql import Window

    binned = scored.withColumn(
        "score_bin",
        F.floor(F.col(score_col) / F.lit(bin_width)).cast("bigint"))
    bins = binned.groupBy("score_bin").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("score_bin").rowsBetween(Window.unboundedPreceding, 0)
    bin_map = (
        bins.coalesce(1)
        .withColumn("cum", F.sum("n").over(w))
        .withColumn("total", F.sum("n").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(
            "score_bin",
            F.when(3 * F.col("cum") <= F.col("total"), F.lit("head"))
             .when(3 * F.col("cum") <= 2 * F.col("total"), F.lit("middle"))
             .otherwise(F.lit("tail")).alias("bucket"),
        )
    )
    return binned.join(F.broadcast(bin_map), "score_bin")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
) -> DataFrame:
    """Per-stratum deterministic downsampling (e.g. rebalance languages
    in a training mix): each stratum keeps ~rates[stratum] of its rows,
    chosen by hash of (stratum, id) — zero shuffle, one projection."""
    key = F.concat_ws(":", F.col(strata_col), F.col(id_col).cast("string"))
    keep = None
    for stratum, rate in sorted(rates.items()):
        cond = (F.col(strata_col) == stratum) & deterministic_keep(key, rate)
        keep = cond if keep is None else (keep | cond)
    others = ~F.col(strata_col).isin(list(rates)) & deterministic_keep(key, default_rate)
    keep = others if keep is None else (keep | others)
    return df.filter(keep)


def containment_decontamination(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    threshold_ppm: int = 800_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Containment-based decontamination — the EVAL-side metric: an eval
    document is contaminated when some training document contains most of
    it, i.e. containment = |shared n-gram shingles| / |eval's shingles|
    is high (Jaccard misses a short eval doc swallowed by a long train
    doc; containment is what benchmark leakage actually is). Exact
    integer fixed point: containment_ppm = shared * 1e6 DIV eval_size.

    Output per eval doc: its shingle count, max containment over all
    training docs (ppm), and how many training docs cross the threshold.

    Scale: distinct (doc, shingle) sets partial-aggregate before the
    shingle-key equi-join; the join fans out only on shingles the eval
    set actually has (eval corpora are small), then one (train, eval)
    pair count and one per-eval aggregate. No broadcast required.
    """
    def shingles(df: DataFrame, out_id: str) -> DataFrame:
        toks = F.split(F.col(text_col), " ")
        idx = F.when(F.size(toks) >= n,
                     F.sequence(F.lit(1), F.size(toks) - (n - 1))).otherwise(
                         F.array().cast("array<int>"))
        parts = [F.element_at("w", F.col("i") + j) for j in range(n)]
        return (
            df.select(F.col(id_col).alias(out_id), toks.alias("w"),
                      F.explode(idx).alias("i"))
            .select(out_id, F.concat_ws(" ", *parts).alias("shingle"))
            .distinct()
        )

    ev = shingles(eval_df, "eval_id")
    tr = shingles(train, "train_id")
    ev_sz = ev.groupBy("eval_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("ev_sz"))
    shared = (
        tr.join(ev, "shingle")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared"))
    )
    pair = shared.join(ev_sz, "eval_id").withColumn(
        "containment_ppm",
        F.expr("(shared * CAST(1000000 AS BIGINT)) DIV ev_sz"))
    return (
        pair.groupBy(F.col("eval_id").alias(id_col))
        .agg(
            F.max("ev_sz").alias("n_shingles"),
            F.max("containment_ppm").alias("max_containment_ppm"),
            F.sum(F.when(F.col("containment_ppm") >= threshold_ppm, 1)
                   .otherwise(0)).cast("bigint").alias("n_contaminating"),
        )
    )


def cross_source_gram_matrix(
    docs: DataFrame,
    n: int = 4,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Source-pair contamination matrix (distinct n-grams shared by each
    pair of sources) in ONE corpus-scale shuffle — the registered
    ``cross_source_ngram_matrix`` body since round 12, replacing the r6
    distinct + gram self-join (two corpus shuffles plus sort-merge
    sorts). The registered oracle is ORDER BY'd: callers that need
    oracle parity must sort (source_a, source_b) themselves — output
    here is an unordered aggregate.

    Shape: explode n-grams, ``groupBy(gram).agg(array_sort(
    collect_set(source)))`` (partial-aggregated; per-gram state is
    bounded by |sources|, never by row count), then expand each gram's
    sorted source set into its (a < b) pairs IN-ARRAY and count per pair.
    The second shuffle carries at most |sources|² keys — constant, not
    corpus-scale. Output-identity against the legacy self-join shape is
    pinned by tests/test_round11_ops.py; measured ~1.5× faster at sf1.
    """
    toks = F.split(F.col(text_col), " ")
    idx = F.when(F.size(toks) >= n,
                 F.sequence(F.lit(1), F.size(toks) - (n - 1))).otherwise(
                     F.array().cast("array<int>"))
    parts = [F.element_at("w", F.col("i") + j) for j in range(n)]
    grams = (
        docs.select(F.col(source_col).alias("source"), toks.alias("w"),
                    F.explode(idx).alias("i"))
        .select("source", F.concat_ws(" ", *parts).alias("gram"))
    )
    per_gram = (
        grams.groupBy("gram")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
        .filter(F.size("srcs") >= 2)
    )
    srcs = F.col("srcs")
    pairs = F.flatten(F.transform(
        srcs,
        lambda x, i: F.transform(
            F.slice(srcs, i + F.lit(2), F.size(srcs)),
            lambda y: F.struct(x.alias("source_a"), y.alias("source_b")))))
    return (
        per_gram.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.source_a").alias("source_a"),
                 F.col("p.source_b").alias("source_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_grams"))
    )
