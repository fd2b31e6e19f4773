"""Source payload decoding: Kinesis base64(+gzip), SNS envelope, S3 object
record-splitting — the pre-parse stage of SURVEY.md §2.1.

Reference behavior:
- Kinesis (classifier/payload/kinesis.py:33-59): base64-decode the record
  data, transparently zlib/gzip-decompress when compressed, yield one raw
  record string.
- SNS (classifier/payload/sns.py:31-51): extract the Sns.Message string.
- S3 (classifier/payload/s3.py:139-174): whole-object JSON (dict -> one
  record, list -> one per element), falling back to one record per line.

Spark strategy: everything native except the gzip fallback — unbase64,
decode, get_json_object, json_object_keys, from_json(array<variant>) are
all codegen'd; gunzip has no native expression, so it is an Arrow-batched
pandas UDF applied ONLY to rows carrying the 1f8b magic (the uncompressed
common path never leaves the JVM).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

GZIP_MAGIC_HEX = "1F8B"

_GUNZIP_UDF = None


def _gunzip_udf():
    """Lazily-built pandas UDF — pandas_udf needs an active session, so it
    cannot be created at import time."""
    global _GUNZIP_UDF
    if _GUNZIP_UDF is not None:
        return _GUNZIP_UDF

    @pandas_udf("string")
    def _gunzip_text(raw: pd.Series) -> pd.Series:
        """zlib/gzip-decompress binary payloads to utf-8 text
        (kinesis.py:43-55). Defensive: non-gzip bytes pass through decoded,
        bad streams yield null — a poisoned record must never fail the task
        (classifier semantics)."""
        import zlib

        def one(b):
            if b is None:
                return None
            try:
                if len(b) >= 2 and b[0] == 0x1F and b[1] == 0x8B:
                    return zlib.decompress(b, 47).decode("utf-8", "replace")
                return bytes(b).decode("utf-8", "replace")
            except Exception:  # noqa: BLE001
                return None

        return raw.map(one)

    _GUNZIP_UDF = _gunzip_text
    return _GUNZIP_UDF


def kinesis_decode(df: DataFrame, data_col: str = "data", out_col: str = "value") -> DataFrame:
    """base64-decode Kinesis record data with transparent gzip fallback.

    Adds ``out_col`` (raw record text) and ``was_compressed``. Only rows
    whose decoded bytes start with the gzip magic take the Python path.
    """
    raw = F.unbase64(F.col(data_col))
    is_gzip = F.hex(F.substring(raw, 1, 2)) == GZIP_MAGIC_HEX
    return df.withColumns({
        out_col: F.when(is_gzip, _gunzip_udf()(raw)).otherwise(F.decode(raw, "UTF-8")),
        "was_compressed": is_gzip,
    })


def sns_extract(df: DataFrame, record_col: str = "value", out_col: str = "message") -> DataFrame:
    """Extract the SNS message string from a notification record
    (sns.py:31-51: record['Sns']['Message'])."""
    return df.withColumn(out_col, F.get_json_object(F.col(record_col), "$.Sns.Message"))


def s3_event_objects(df: DataFrame, message_col: str = "message") -> DataFrame:
    """S3-via-SNS unwrap (payload_base.py:264-273): an SNS message that is
    an S3 event notification re-routes to the S3 source. Extracts one
    (bucket, key) row per notification record; rows without the S3 shape
    drop out. Feed the keys to a file source / readStream listing."""
    recs = F.from_json(
        F.col(message_col),
        "Records array<struct<s3:struct<bucket:struct<name:string>,`object`:struct<`key`:string>>>>",
    )["Records"]
    return (
        df.withColumn("_sa_rec", F.explode(F.coalesce(recs, F.array())))
        .select(
            F.col("_sa_rec.s3.bucket.name").alias("bucket"),
            F.col("_sa_rec.s3.object.key").alias("key"),
        )
        .filter(F.col("bucket").isNotNull() & F.col("key").isNotNull())
    )


def s3_records(df: DataFrame, content_col: str = "content", out_col: str = "value") -> DataFrame:
    """Split one S3 object's text into raw record strings (s3.py:139-174).

    whole-object JSON dict -> 1 record; JSON array -> one per element
    (re-serialized canonically via VARIANT); anything else -> one per
    non-empty line. One explode, no Python.
    """
    trimmed = F.trim(F.col(content_col))
    as_array = F.transform(
        F.from_json(trimmed, "array<variant>"), lambda v: F.to_json(v)
    )
    # Spark's JSON parsers are prefix-lenient (a JSON-lines file "parses" as
    # its first object), unlike the reference's strict json.loads — so the
    # whole-object branch additionally requires single-line content.
    # Multi-line pretty-printed single objects fall to the line-split path
    # (matching how such a file would actually misclassify per-line there,
    # as in the reference when the object spans lines it still json.loads —
    # deviation documented: rare shape, classifier quarantines the lines).
    whole_object = (
        F.try_parse_json(trimmed).isNotNull()
        & F.startswith(trimmed, F.lit("{"))
        & ~F.contains(trimmed, F.lit("\n"))
    )
    records: Column = (
        F.when(whole_object, F.array(trimmed))
        .when(as_array.isNotNull(), as_array)
        .otherwise(F.split(F.col(content_col), "\n"))
    )
    return (
        df.withColumn(out_col, F.explode(records))
        .filter(F.trim(F.col(out_col)) != "")
    )
