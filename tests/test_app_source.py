"""App-source poller tests: the Python DataSource port of the reference's
apps/ subsystem (app_base.py gather loop, duo.py signed requests,
parameter-store checkpoint -> Spark offset log)."""

from __future__ import annotations

import json

import pytest

from streamalert_spark.sources.app_source import (
    APP_REGISTRY,
    DuoAdminApp,
    SyntheticApp,
    duo_signed_headers,
    register_app_source,
)

DUO_AUTH = {
    "api_hostname": "api-abcdef12.duosecurity.com",
    "integration_key": "DIABCDEFGHIJKLMN1234",
    "secret_key": "a" * 40,
}


def test_registry_and_auth_validation():
    """apps/_apps/__init__.py registry + duo.py:166-185 auth formats."""
    assert APP_REGISTRY["synthetic"] is SyntheticApp
    assert APP_REGISTRY["duo_admin"] is DuoAdminApp
    with pytest.raises(ValueError, match="missing auth key"):
        DuoAdminApp({})
    bad = dict(DUO_AUTH, api_hostname="not-a-duo-host")
    with pytest.raises(ValueError, match="invalid format"):
        DuoAdminApp(bad)
    DuoAdminApp(DUO_AUTH)  # valid


def test_duo_signature_matches_reference_construction():
    """duo.py:55-84: hmac-sha1 over date/GET/host/endpoint/params, shipped
    as basic auth ikey:hexdigest — recomputed here independently."""
    import hashlib
    import hmac
    from base64 import b64encode
    from urllib.parse import urlencode

    date = "Tue, 01 Jan 2030 00:00:00 -0000"
    params = {"mintime": "101"}
    headers = duo_signed_headers(
        DUO_AUTH["api_hostname"], "/admin/v1/logs/administrator", params,
        DUO_AUTH["integration_key"], DUO_AUTH["secret_key"], date)
    auth_string = "\n".join([
        date, "GET", DUO_AUTH["api_hostname"], "/admin/v1/logs/administrator",
        urlencode(sorted(params.items())),
    ]).encode()
    sig = hmac.new(DUO_AUTH["secret_key"].encode(), auth_string, hashlib.sha1)  # noqa: S324
    expect = b64encode(
        f"{DUO_AUTH['integration_key']}:{sig.hexdigest()}".encode()).decode()
    assert headers["Authorization"] == f"Basic {expect}"
    assert headers["Date"] == date
    assert headers["Host"] == DUO_AUTH["api_hostname"]


def test_duo_poll_with_injected_transport():
    """duo.py:129-161 semantics: mintime = last+1, checkpoint = last
    record's timestamp, more_to_poll on a full page; transport absent ->
    NotImplementedError (env-dependent by design)."""
    seen = {}

    def fetch(url, headers, params):
        seen["url"], seen["params"] = url, dict(params)
        return {"response": [
            {"timestamp": 120, "eventtype": "admin_login"},
            {"timestamp": 130, "eventtype": "admin_create"},
        ]}

    app = DuoAdminApp(DUO_AUTH, fetch=fetch)
    records, last, more = app.poll(100)
    assert seen["params"] == {"mintime": "101"}
    assert seen["url"].endswith("/admin/v1/logs/administrator")
    assert [r["timestamp"] for r in records] == [120, 130]
    assert last == 130
    assert more is False  # 2 < MAX_RESPONSE_LOGS

    with pytest.raises(NotImplementedError):
        DuoAdminApp(DUO_AUTH).poll(0)


def test_synthetic_poll_pagination():
    app = SyntheticApp({}, end_timestamp=250)
    records, last, more = app.poll(0)
    assert len(records) == 100 and last == 100 and more
    records, last, more = app.poll(last)
    assert len(records) == 100 and last == 200 and more
    records, last, more = app.poll(last)
    assert len(records) == 50 and last == 250 and not more
    records, last, more = app.poll(last)
    assert records == [] and last == 250 and not more


def test_batch_backfill_reads_all(spark):
    """Batch read = the successive-invocation chain run to exhaustion
    (app_base.py:236-258)."""
    register_app_source(spark)
    df = (
        spark.read.format("streamalert_app")
        .option("app", "synthetic").option("end_timestamp", "250")
        .load()
    )
    rows = df.collect()
    assert len(rows) == 250
    assert {r["log_type"] for r in rows} == {"synthetic:synthetic"}
    first = json.loads(rows[0]["record"])
    assert first["event_id"] == f"ev-{first['timestamp']}"
    assert sorted(r["event_timestamp"] for r in rows) == list(range(1, 251))


def test_streaming_poll_offsets_and_restart(spark, tmp_path):
    """Streaming read: one poll per microbatch, offset log = the
    parameter-store checkpoint (app_base.py:222-247). A restart with a
    LARGER end (more data available) resumes from the committed offset —
    no duplicates, only the new window."""
    register_app_source(spark)
    out_dir = str(tmp_path / "out")

    def run(end_ts):
        src = (
            spark.readStream.format("streamalert_app")
            .option("app", "synthetic").option("end_timestamp", str(end_ts))
            .load()
        )
        q = (
            src.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return sorted(
            r["event_timestamp"]
            for r in spark.read.parquet(out_dir).collect()
        )

    assert run(250) == list(range(1, 251))
    # restart: the service now has events up to 300 — the committed offset
    # must resume at 250 (the new window appends, nothing replays)
    assert run(300) == list(range(1, 301)), "restart must resume, not replay"


def test_app_source_feeds_classifier(spark):
    """The handoff the reference does via Kinesis (batcher.py -> classifier
    Lambda): app-source records classify directly under an app schema."""
    from streamalert_spark.classify.classifier import Classifier
    from streamalert_spark.schema.registry import LogSchema, SchemaRegistry

    register_app_source(spark)
    df = (
        spark.read.format("streamalert_app")
        .option("app", "synthetic").option("end_timestamp", "50")
        .load()
    )
    reg = SchemaRegistry()
    reg.register(LogSchema(
        name="synthetic:synthetic",
        schema={"timestamp": "integer", "event_id": "string", "result": "string"},
    ))
    batch = Classifier(reg).classify(df, raw_col="record")
    out = batch.by_log_type["synthetic:synthetic"]
    assert out.count() == 50
    assert batch.invalid.count() == 0
