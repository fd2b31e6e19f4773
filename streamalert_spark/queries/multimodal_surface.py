"""Multimodal-column queries: binary payload metadata + (stubbed) image
feature extraction via Arrow-batched mapInPandas, and the video
frame-sampling plan. Oracle-checked — the decode stub is deterministic
(md5-derived), so DuckDB can reproduce it in SQL.

The binary plumbing (schema, Arrow batch shape, column pruning for
metadata-only reads) is the real deliverable; on a cluster with codec
libraries only the decode kernel body changes (ops/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamalert_spark.ops.multimodal import extract_image_features, frame_sample_plan
from streamalert_spark.queries import query
from streamalert_spark.session import read_table


def _md5_byte(i: int) -> str:
    """DuckDB expression for byte i of md5(text)'s digest (two hex chars)."""
    hi = f"(strpos('0123456789abcdef', substr(md5(text), {2 * i + 1}, 1)) - 1)"
    lo = f"(strpos('0123456789abcdef', substr(md5(text), {2 * i + 2}, 1)) - 1)"
    return f"({hi} * 16 + {lo})"


_IMAGE_ORACLE = f"""
SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha,
       CAST(64 + {_md5_byte(0)} % 192 AS INT) AS width,
       CAST(64 + {_md5_byte(1)} % 192 AS INT) AS height,
       ROUND({_md5_byte(2)} / 255.0, 6) AS mean_luma
FROM documents
ORDER BY media_id
"""


@query("multimodal_image_features", oracle=_IMAGE_ORACLE,
       doc="Binary media column -> Arrow-batched feature extraction "
           "(deterministic decode stub; real codec drops into the same kernel).")
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    media = docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("media_id"),
        F.lit("image").alias("modality"),
        F.encode(F.col("text"), "utf-8").alias("content"),
    )
    return extract_image_features(media).repartition(1).sortWithinPartitions("media_id")


_FRAMES_ORACLE = """
SELECT o_orderkey, CAST(i * 10 AS BIGINT) AS frame_ts
FROM orders,
     UNNEST(range(0, greatest((o_orderkey % 60 + 5) // 10, 1))) AS t(i)
ORDER BY o_orderkey, frame_ts
"""


@query("multimodal_frame_sample", oracle=_FRAMES_ORACLE,
       doc="Video frame-sampling plan: one row per frame to extract, "
           "native explode (decode itself stays out of the plan).")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    vids = orders.select(
        "o_orderkey",
        (F.col("o_orderkey") % 60 + 5).alias("duration_s"),
    )
    return (
        frame_sample_plan(vids, every_n_seconds=10)
        .select("o_orderkey", F.col("frame_ts").cast("bigint").alias("frame_ts"))
        .repartition(1).sortWithinPartitions("o_orderkey", "frame_ts")
    )


@query("multimodal_resize_audio", oracle=None,
       doc="Resize + audio-feature mapInPandas kernels over synthesized "
           "binary columns — rows-only check by design: the audio stub's "
           "Python round() lands on exact decimal halves where engine "
           "rounding modes legitimately differ; kernel values are pinned "
           "by tests/test_scheduled_and_ops.py instead.")
def multimodal_resize_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamalert_spark.ops.multimodal import (
        extract_audio_features,
        resize_images,
    )

    docs = read_table(spark, sf_dir, "documents")
    media = docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string"))
         .alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
    )
    resized = resize_images(media, max_side=128).select(
        "media_id", "width", "height", "src_width", "src_height")
    audio = extract_audio_features(media).select(
        "media_id", "n_bytes", "duration_s", "rms")
    return (
        resized.join(audio, "media_id")
        .repartition(1).sortWithinPartitions("media_id")
    )
