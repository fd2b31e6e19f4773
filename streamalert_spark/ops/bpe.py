"""Iterative BPE merge learning — the classic byte-pair-encoding vocab
induction loop (Sennrich et al., ACL 2016), distributed.

Shape per iteration: one partial-aggregated pair count over the vocab +
a single-row collect of the argmax pair (metadata-scale driver traffic:
one (pair, count) row per merge), then a projection applying the merge.
The corpus is touched ONCE up front (word-count aggregate); every
iteration runs over the VOCAB (distinct words), which is orders of
magnitude smaller — the same trick the reference BPE implementations use
with their in-memory vocab dicts, here kept as a DataFrame so a 100
M-word vocab still distributes.

Lineage is truncated with localCheckpoint every few merges — 1000
iterations of withColumn would otherwise build an unplannably deep tree.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamalert_spark.ops.text import tokens


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc, syms) vocab: corpus word counts with each word exploded
    into a space-separated character-symbol string — the BPE working
    representation."""
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    )
    # split into single chars: insert spaces between every character
    syms = F.trim(F.regexp_replace(F.col("word"), "(.)", "$1 "))
    return words.withColumn("syms", syms)


def _pair_counts(vocab: DataFrame) -> DataFrame:
    parts = F.split(F.col("syms"), " ")
    n = F.size(parts)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.slice(parts, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        vocab.select(F.explode(pairs).alias("pair"), "wc")
        .groupBy("pair").agg(F.sum("wc").alias("pair_count"))
    )


def apply_merges(vocab: DataFrame, merges: list[tuple[str, int]]) -> DataFrame:
    """Apply learned merges to a (word, wc, syms) vocab IN ORDER — the
    encode step of the tokenizer. Each merge is one projection-level
    regexp_replace (same boundary-delimited left-to-right semantics as
    the learning loop), so the whole merge table composes into a single
    scan pass over the vocab."""
    syms = F.col("syms")
    for pair, _count in merges:
        a, b = pair.split(" ")
        pattern = f"(?<= |^){re.escape(a)} {re.escape(b)}(?= |$)"
        merged = (a + b).replace("\\", "\\\\").replace("$", "\\$")
        syms = F.regexp_replace(syms, pattern, merged)
    return vocab.withColumn("syms", syms)


def learn_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 5,
) -> list[tuple[str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(pair, count), ...] in
    merge order. Ties break lexicographically on the pair (deterministic
    across partitionings — a plain max would be partition-order-dependent).
    """
    vocab = word_vocab(df, text_col).persist()
    # NOTE (r13, measured): do NOT size-coalesce the loop frame. A
    # vocab-row-count-adaptive coalesce(1) of the tiny bench vocab was
    # built and A/B'd at 32 AND 8 cores: flat-to-worse both times — the
    # two extra materialization jobs cost more than the ~2x32 near-empty
    # task launches per merge they remove (task launch ≈ 1-2 ms; an AQE
    # job round ≈ 150+ ms). Per-iteration cost here is plan/codegen/
    # schedule, not tasks or shuffled bytes.
    merges: list[tuple[str, int]] = []
    # deferred-unpersist ring: a parent vocab may only be dropped once a
    # job has MATERIALIZED its child (the next iteration's argmax, or the
    # eager checkpoint) — this replaces the old per-iteration count()
    # materialize, which cost one extra vocab pass per merge (guide §1.2:
    # don't compute things you throw away; the argmax pass populates the
    # child's cache for free)
    pending_unpersist: DataFrame | None = None
    for it in range(n_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("pair_count").desc(), "pair")
            .limit(1)
            .collect()
        )
        # the argmax job just materialized `vocab`'s cache — its parent
        # (if any) is no longer needed by any future recompute
        if pending_unpersist is not None:
            pending_unpersist.unpersist()
            pending_unpersist = None
        if not best or best[0]["pair_count"] < 2:
            break
        pair, count = best[0]["pair"], int(best[0]["pair_count"])
        merges.append((pair, count))
        a, b = pair.split(" ")
        # replace the symbol-boundary-delimited pair, left to right,
        # non-overlapping — the same semantics as the reference re.sub
        pattern = f"(?<= |^){re.escape(a)} {re.escape(b)}(?= |$)"
        # escape Java-regex replacement metacharacters ($, \)
        merged = (a + b).replace("\\", "\\\\").replace("$", "\\$")
        old = vocab
        vocab = vocab.withColumn(
            "syms", F.regexp_replace("syms", pattern, merged))
        if (it + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)  # materializes now
            old.unpersist()
        else:
            vocab = vocab.persist()
            pending_unpersist = old
    if pending_unpersist is not None:
        pending_unpersist.unpersist()
    vocab.unpersist()
    return merges
