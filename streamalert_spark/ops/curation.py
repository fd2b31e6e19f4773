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
