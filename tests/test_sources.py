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
