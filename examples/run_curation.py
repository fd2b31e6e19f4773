"""Runnable example: the training-data curation pipeline as a library.

    python examples/run_curation.py [sf_dir]   # default /root/testdata/sf0.001

Composes the corpus operators end to end over the documents table:
clean -> quality gates (Gopher rules + repetition) -> exact+near dedup
cascade (keep the best doc per near-dup cluster) -> first-occurrence
span scrub -> token stats for the survivors. Prints one JSON line per
stage with row counts, then a sample of surviving docs.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from streamalert_spark.ops import dedup, text  # noqa: E402
from streamalert_spark.session import get_spark, read_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="curation_example")
    docs = read_table(spark, sf_dir, "documents")

    def stage(name: str, df, prev_n: int | None = None) -> int:
        n = df.count()
        print(json.dumps({"stage": name, "rows": n,
                          "dropped": (prev_n - n) if prev_n is not None
                          else 0}))
        return n

    n0 = stage("input", docs)

    # 1. hygiene + quality gates: Gopher rules on the cleaned text
    cleaned = docs.withColumn("clean_text", text.clean_text(F.col("text")))
    quality = text.gopher_quality(cleaned, text_col="clean_text")
    good_ids = quality.filter(F.col("passes_gopher")).select("doc_id")
    gated = docs.join(good_ids, "doc_id", "left_semi")
    n1 = stage("quality_gate", gated, n0)

    # 2. dedup cascade: exact md5 first, then near-dup keep-best
    keep = (gated.select(F.md5("text").alias("f"), "doc_id")
            .groupBy("f").agg(F.min("doc_id").alias("doc_id")))
    s1 = gated.join(keep.select("doc_id"), "doc_id", "left_semi")
    n2 = stage("exact_dedup", s1, n1)

    pairs = dedup.lsh_verified_pairs(s1, threshold=0.5)
    comp = dedup.connected_components(pairs)
    from pyspark.sql import Window as W

    base = (s1.select("doc_id", "n_chars")
            .join(comp, "doc_id", "left")
            .withColumn("component_id", F.coalesce("component_id", "doc_id")))
    w = W.partitionBy("component_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc())
    kept_ids = (base.withColumn("kept", F.first("doc_id").over(w))
                .filter(F.col("doc_id") == F.col("kept"))
                .select("doc_id"))
    s2 = s1.join(kept_ids, "doc_id", "left_semi")
    n3 = stage("neardup_keep_best", s2, n2)

    # 3. first-occurrence span scrub (rewrite repeated spans away)
    scrub = text.span_dedup_scrub(s2, span_len=4)
    survivors = scrub.filter(F.col("n_kept") > 0)
    stage("span_scrub", survivors, n3)

    # 4. token stats of the surviving corpus
    stats = (text.text_stats(s2)
             .join(survivors.select("doc_id", "n_kept", "n_spans"), "doc_id"))
    sample = (stats.orderBy("doc_id").limit(5)
              .select("doc_id", "n_tokens", "stopword_ratio", "lang_pred",
                      "n_kept", "n_spans").collect())
    for r in sample:
        print(json.dumps(r.asDict()))
    spark.stop()


if __name__ == "__main__":
    main()
