"""Sequence packing — concatenating documents into fixed-length training
sequences (the standard pre-training batch-prep pass).

Greedy global first-fit packing is inherently sequential, so the
distributed form packs within deterministic shards: docs are sharded by
(source, doc_id % n_shards), ordered by doc_id inside the shard, and a
running token total assigns each doc to the pack whose window its FIRST
token falls in (document-concatenation packing: a doc whose tokens cross
the window boundary stays assigned to the pack its first token falls in
and straddles into the next window — the concat-then-slice variant,
locked by test_pack_boundary_doc_starts_new_pack).

Scale: one shuffle keyed by (source, shard) — shard count scales
parallelism with the corpus, not with the number of sources — then a
per-shard window cumsum and one partial-aggregated groupBy. Shards are
bounded (docs/n_shards per task), so no task ever sees the corpus, and
the window never range-partitions globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from streamalert_spark.ops.text import token_count


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Assign docs to fixed-length packs and summarize each pack.

    Output: (source, shard, pack_id, n_docs, total_tokens, first_doc,
    last_doc), one row per pack. pack_id is the 0-based window index of
    the doc's first token in the shard's concatenated token stream.
    """
    if seq_len <= 0 or n_shards <= 0:
        raise ValueError("seq_len and n_shards must be positive")
    shard = (F.col(id_col) % n_shards).cast("bigint")
    toks = token_count(F.col(text_col)).cast("bigint")
    w = Window.partitionBy(group_col, "shard").orderBy(id_col)
    assigned = (
        df.select(
            F.col(group_col), shard.alias("shard"),
            F.col(id_col), toks.alias("n_tokens"),
        )
        .withColumn("start_tok", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .withColumn("pack_id", F.floor(F.col("start_tok") / seq_len)
                    .cast("bigint"))
    )
    return (
        assigned.groupBy(group_col, "shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
    )
