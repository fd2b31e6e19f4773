"""Streaming source wiring: readStream entry points for each reference
service, composed with the decode layer (sources/decode.py).

Reference source-routing (payload_base.py:230-280): the Lambda event's
service (kinesis / s3 / sns) picks the payload class, and the resource
(stream/bucket/topic name) routes to candidate schemas. Here each helper
returns a streaming DataFrame with a ``value`` raw-record column plus
``service``/``resource`` literals, ready for Classifier.classify — the
cluster conf's (service, resource) -> log-types routing applies unchanged.

Kafka stands in for Kinesis as the message-bus source (same record model:
opaque bytes + partition key); the kafka jar ships with Spark distributions
but not every test image, so the builder raises a clear error if absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamalert_spark.sources.decode import kinesis_decode, s3_records, sns_extract


def kafka_source_options(bootstrap: str, topic: str, starting: str = "latest") -> dict[str, str]:
    """Options dict for the kafka reader (pure — unit-testable without a
    broker)."""
    return {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topic,
        "startingOffsets": starting,
        # poisoned payloads must quarantine, not kill the query
        "failOnDataLoss": "false",
    }


def kafka_stream(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    resource: str | None = None,
    base64_gzip: bool = False,
    starting: str = "latest",
) -> DataFrame:
    """Kafka topic -> (value, service='kinesis', resource) raw stream.

    ``base64_gzip=True`` applies the Kinesis wire decode (base64 +
    transparent gzip, kinesis.py:33-59) for producers that ship
    Kinesis-style payloads over Kafka.
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(bootstrap, topic, starting).items():
        reader = reader.option(k, v)
    raw = reader.load()
    if base64_gzip:
        # kafka value is binary; kinesis_decode expects the base64 text
        df = kinesis_decode(raw.select(F.col("value").cast("string").alias("data")))
    else:
        df = raw.select(F.col("value").cast("string").alias("value"))
    return df.select(
        "value",
        F.lit("kinesis").alias("service"),
        F.lit(resource or topic).alias("resource"),
    )


def file_stream(
    spark: SparkSession,
    path: str,
    resource: str,
    fmt: str = "text",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Directory-watched file stream -> (value, service='s3', resource).

    The S3-notification -> download path (s3.py:49-228) becomes native
    directory listing; gzip objects decompress transparently in the text
    source; per-line records match the reference's line fallback
    (s3.py:160-174). ``max_files_per_trigger`` bounds micro-batch size the
    way the 128MB object cap bounded a Lambda invoke.
    """
    reader = spark.readStream.format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.load(path)
    value = F.col("value") if "value" in df.columns else F.col(df.columns[0]).alias("value")
    return df.select(
        value,
        F.lit("s3").alias("service"),
        F.lit(resource).alias("resource"),
    )


def sns_stream(df: DataFrame, resource: str) -> DataFrame:
    """Wrap an already-read notification stream (any bus): extract the
    Sns.Message envelope (sns.py:31-51) -> (value, service='sns', resource)."""
    out = sns_extract(df, record_col="value", out_col="message")
    return out.select(
        F.col("message").alias("value"),
        F.lit("sns").alias("service"),
        F.lit(resource).alias("resource"),
    )


def s3_object_stream(df: DataFrame, resource: str, content_col: str = "content") -> DataFrame:
    """Whole-object stream (e.g. binaryFile source or fetched objects):
    split into records with the reference's JSON -> JSON-lines -> raw-lines
    fallback (s3.py:139-174)."""
    out = s3_records(df, content_col=content_col, out_col="value")
    return out.select(
        "value",
        F.lit("s3").alias("service"),
        F.lit(resource).alias("resource"),
    )
