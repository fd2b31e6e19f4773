"""Source decode layer: Kinesis base64+gzip, SNS extraction, S3 splitting
(reference: classifier/payload/{kinesis,sns,s3}.py)."""

from __future__ import annotations

import base64
import gzip


def test_kinesis_decode_plain_and_gzip(spark):
    from streamalert_spark.sources.decode import kinesis_decode

    plain = base64.b64encode(b'{"a": 1}').decode()
    comp = base64.b64encode(gzip.compress(b'{"a": 2}', mtime=0)).decode()
    bad = base64.b64encode(b"\x1f\x8b\x00broken").decode()
    df = spark.createDataFrame([(plain,), (comp,), (bad,)], "data string")
    rows = {r["value"]: r["was_compressed"]
            for r in kinesis_decode(df).select("value", "was_compressed").collect()}
    assert rows['{"a": 1}'] is False
    assert rows['{"a": 2}'] is True
    assert None in rows  # poisoned gzip yields null, never a task failure


def test_sns_extract(spark):
    from streamalert_spark.sources.decode import sns_extract

    df = spark.createDataFrame(
        [('{"Sns": {"Message": "hello"}}',), ('{"other": 1}',)], "value string")
    out = [r["message"] for r in sns_extract(df).collect()]
    assert out == ["hello", None]


def test_s3_records_shapes(spark):
    from streamalert_spark.sources.decode import s3_records

    df = spark.createDataFrame(
        [('{"a":1}',), ("x\ny\n",), ('[{"a":1},{"a":2}]',), ("  ",)],
        "content string",
    )
    vals = sorted(r["value"] for r in s3_records(df).collect())
    assert vals == ["x", "y", '{"a":1}', '{"a":1}', '{"a":2}']


def test_s3_via_sns_unwrap(spark):
    """payload_base.py:264-273: SNS message carrying an S3 event routes to
    the S3 source — sns_extract composed with s3_event_objects."""
    import json

    from streamalert_spark.sources.decode import s3_event_objects, sns_extract

    notif = {"Sns": {"Message": json.dumps({
        "Records": [
            {"s3": {"bucket": {"name": "logs"}, "object": {"key": "a/b.json.gz"}}},
            {"s3": {"bucket": {"name": "logs"}, "object": {"key": "c.json"}}},
        ]})}}
    plain = {"Sns": {"Message": "just text"}}
    df = spark.createDataFrame(
        [(json.dumps(notif),), (json.dumps(plain),)], "value string")
    out = s3_event_objects(sns_extract(df))
    rows = sorted((r["bucket"], r["key"]) for r in out.collect())
    assert rows == [("logs", "a/b.json.gz"), ("logs", "c.json")]


def test_kafka_source_options_pure():
    from streamalert_spark.sources.streams import kafka_source_options

    opts = kafka_source_options("broker:9092", "logs", starting="earliest")
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["subscribe"] == "logs"
    assert opts["startingOffsets"] == "earliest"
    assert opts["failOnDataLoss"] == "false"


def test_file_stream_classifies_end_to_end(spark, tmp_path):
    """file_stream -> Classifier: the (service, resource) literals drive
    cluster routing, one streaming micro-batch classifies records."""
    import json as _json

    from streamalert_spark.classify.classifier import Classifier
    from streamalert_spark.schema.registry import LogSchema, SchemaRegistry
    from streamalert_spark.sources.streams import file_stream

    src = tmp_path / "in"
    src.mkdir()
    with open(src / "a.log", "w") as fh:
        fh.write(_json.dumps({"a": "x", "b": 1}) + "\n")
        fh.write(_json.dumps({"a": "y", "b": 2}) + "\n")

    reg = SchemaRegistry()
    reg.register(LogSchema(name="t:json", schema={"a": "string", "b": "integer"}))
    reg.route("s3", "logs-bucket", ["t:json"])

    stream = file_stream(spark, str(src), resource="logs-bucket")
    assert stream.isStreaming
    rows = []

    def sink(batch_df, _bid):
        batch = Classifier(reg).classify(
            batch_df, raw_col="value", service="s3", resource="logs-bucket")
        rows.extend(batch.by_log_type["t:json"].collect())

    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    assert sorted(r["record"]["a"] for r in rows) == ["x", "y"]


def test_sns_stream_wraps_batch(spark):
    from streamalert_spark.sources.streams import sns_stream

    df = spark.createDataFrame(
        [('{"Type": "Notification", "Sns": {"Message": "hello"}}',)], "value string")
    # batch DataFrames flow through the same wrapper
    import json as _json  # noqa: F401
    out = sns_stream(df, resource="alerts-topic").collect()
    assert out[0]["value"] == "hello"
    assert out[0]["service"] == "sns" and out[0]["resource"] == "alerts-topic"
