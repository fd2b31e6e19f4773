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
    records, state, more = app.poll({"last_timestamp": 100})
    assert seen["params"] == {"mintime": "101"}
    assert seen["url"].endswith("/admin/v1/logs/administrator")
    assert [r["timestamp"] for r in records] == [120, 130]
    assert state == {"last_timestamp": 130}
    assert more is False  # 2 < MAX_RESPONSE_LOGS

    with pytest.raises(NotImplementedError):
        DuoAdminApp(DUO_AUTH).poll({"last_timestamp": 0})


def test_synthetic_poll_pagination():
    app = SyntheticApp({}, end_timestamp=250)
    records, st, more = app.poll({"last_timestamp": 0})
    assert len(records) == 100 and st["last_timestamp"] == 100 and more
    records, st, more = app.poll(st)
    assert len(records) == 100 and st["last_timestamp"] == 200 and more
    records, st, more = app.poll(st)
    assert len(records) == 50 and st["last_timestamp"] == 250 and not more
    records, st, more = app.poll(st)
    assert records == [] and st["last_timestamp"] == 250 and not more


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


def test_slack_access_pagination_and_filtering():
    """slack.py:82-205: bearer header, count/page form data, date_last
    client-side filtering, page-cap reset with before=oldest date_first,
    last_timestamp advances to the poll's wall clock."""
    from streamalert_spark.sources.app_source import SlackAccessApp

    auth = {"auth_token": "xoxp-abc-123"}
    calls = []

    def fetch(url, headers, data):
        calls.append((url, dict(headers), dict(data)))
        return {
            "ok": True,
            "logins": [
                {"user_id": "U1", "date_first": 90, "date_last": 150},
                {"user_id": "U2", "date_first": 80, "date_last": 100},  # old
            ],
            "paging": {"count": 1000, "page": 1, "pages": 3},
        }

    app = SlackAccessApp(auth, fetch=fetch, clock=lambda: 777.9)
    records, state, more = app.poll({"last_timestamp": 120, "next_page": 1})
    url, headers, data = calls[0]
    assert url.endswith("team.accessLogs")
    assert headers["Authorization"] == "Bearer xoxp-abc-123"
    assert data == {"count": 1000, "page": 1}
    assert [r["user_id"] for r in records] == ["U1"]  # date_last filter
    assert more is True and state["next_page"] == 2
    # mid-pagination the checkpoint HOLDS at the run-start value so pages
    # 2..N still filter against it (deliberate delta from slack.py:128-130,
    # which clock-advances after every page and silently drops later pages)
    assert state["last_timestamp"] == 120

    # a completed (single-page) run advances the checkpoint to the clock
    def fetch_one_page(url, headers, data):
        return {
            "ok": True,
            "logins": [{"user_id": "U3", "date_first": 130, "date_last": 140}],
            "paging": {"count": 1000, "page": 1, "pages": 1},
        }

    app_done = SlackAccessApp(auth, fetch=fetch_one_page, clock=lambda: 777.9)
    records, state, more = app_done.poll({"last_timestamp": 120})
    assert [r["user_id"] for r in records] == ["U3"]
    assert more is False
    assert state["last_timestamp"] == 777  # clock checkpoint (slack.py:128)
    assert state["next_page"] == 1  # cursors reset for the next run

    # page-cap reset: page 100 full -> before = oldest date_first, page 1
    def fetch_cap(url, headers, data):
        return {
            "ok": True,
            "logins": [{"user_id": "U9", "date_first": 55, "date_last": 60}],
            "paging": {"count": 1000, "page": 100, "pages": 200},
        }

    app = SlackAccessApp(auth, fetch=fetch_cap, clock=lambda: 888)
    _, state, more = app.poll({"last_timestamp": 0, "next_page": 100})
    assert more is True
    assert state["next_page"] == 1 and state["before"] == 55

    # API error ends the run (slack.py:121-124)
    app = SlackAccessApp(auth, fetch=lambda u, h, d: {"ok": False, "error": "ratelimited"})
    records, state, more = app.poll({"last_timestamp": 5})
    assert records == [] and more is False and state["last_timestamp"] == 5


def test_slack_integrations_filtering():
    """slack.py:256-259: team.integrationLogs filters on date field."""
    from streamalert_spark.sources.app_source import SlackIntegrationsApp

    def fetch(url, headers, data):
        assert url.endswith("team.integrationLogs")
        return {
            "ok": True,
            "logs": [{"date": "200", "service_type": "bot"},
                     {"date": "90", "service_type": "bot"}],
            "paging": {"count": 1000, "page": 1, "pages": 1},
        }

    app = SlackIntegrationsApp({"auth_token": "xoxp-1"}, fetch=fetch, clock=lambda: 300)
    records, state, more = app.poll({"last_timestamp": 100})
    assert [r["date"] for r in records] == ["200"]
    assert more is False


def test_aliyun_window_and_next_token():
    """aliyun.py:129-155: StartTime from the checkpoint, EndTime = now,
    NextToken continuation; checkpoint advances to response EndTime."""
    from streamalert_spark.sources.app_source import AliyunActionTrailApp

    auth = {"access_key_id": "LTAI4Fabc", "access_key_secret": "s3cr3t",
            "region_id": "cn-hangzhou"}
    calls = []

    def fetch(params):
        calls.append(dict(params))
        resp = {
            "EndTime": "2024-02-01T00:00:00Z",
            "StartTime": params["StartTime"],
            "Events": [{"eventId": "e1", "eventTime": "2024-01-15T10:00:00Z"}],
        }
        if "NextToken" not in params:
            resp["NextToken"] = "2"
        return resp

    app = AliyunActionTrailApp(auth, fetch=fetch,
                               now_fn=lambda: "2024-02-01T00:00:00Z")
    state = app.initial_state({"start_time": "2024-01-01T00:00:00Z"})
    records, state, more = app.poll(state)
    assert calls[0]["StartTime"] == "2024-01-01T00:00:00Z"
    assert calls[0]["EndTime"] == "2024-02-01T00:00:00Z"
    assert more is True and state["next_token"] == "2"
    # mid-pagination the checkpoint HOLDS at the window start (a crash
    # replays the window — at-least-once; a NextToken is only valid for
    # the window that issued it, so the window is pinned in the state)
    assert state["last_timestamp"] == "2024-01-01T00:00:00Z"
    assert state["window_end"] == "2024-02-01T00:00:00Z"
    # continuation carries NextToken against the SAME fixed window
    records, state, more = app.poll(state)
    assert calls[1]["NextToken"] == "2"
    assert calls[1]["StartTime"] == "2024-01-01T00:00:00Z"
    assert calls[1]["EndTime"] == "2024-02-01T00:00:00Z"
    # completion advances the checkpoint to the window end, clears token
    assert more is False and "next_token" not in state
    assert state["last_timestamp"] == "2024-02-01T00:00:00Z"
    # eventTime -> epoch for the source's event_timestamp column
    assert AliyunActionTrailApp.record_timestamp(records[0]) == 1705312800
    # streaming replay of the committed window re-pages it exactly
    calls.clear()
    replay = app.poll_between({"last_timestamp": "2024-01-01T00:00:00Z"},
                              {"last_timestamp": "2024-02-01T00:00:00Z"})
    assert len(replay) == 2  # both pages
    assert calls[0]["EndTime"] == "2024-02-01T00:00:00Z"
    assert calls[1]["EndTime"] == "2024-02-01T00:00:00Z"


def test_transport_registry_streaming(spark, tmp_path):
    """TRANSPORTS injection: a transport app streams through the
    DataSource with its fetcher registered (driver-side reads)."""
    from streamalert_spark.sources import app_source

    def fetch(url, headers, data):
        return {
            "ok": True,
            "logs": [{"date": "150", "service_type": "bot"}],
            "paging": {"count": 1000, "page": 1, "pages": 1},
        }

    app_source.TRANSPORTS["slack_integration"] = {
        "fetch": fetch, "clock": lambda: 500}
    try:
        register_app_source(spark)
        src = (
            spark.readStream.format("streamalert_app")
            .option("app", "slack_integration")
            .option("auth_auth_token", "xoxp-test-1")
            .load()
        )
        q = (
            src.writeStream.format("memory").queryName("slack_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_slack"))
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM slack_out").collect()
        finally:
            q.stop()
    finally:
        del app_source.TRANSPORTS["slack_integration"]
    assert len(rows) >= 1
    assert rows[0]["log_type"] == "slack:slack_integration"
    assert json.loads(rows[0]["record"])["date"] == "150"
    assert rows[0]["event_timestamp"] == 150


def test_onelogin_token_pagination_and_checkpoint():
    """onelogin.py:77-223: client-credentials token per run, since param
    on fresh queries, next_link pagination with params=None, checkpoint =
    last event's created_at."""
    from streamalert_spark.sources.app_source import OneLoginEventsApp

    auth = {"region": "us", "client_secret": "a" * 64, "client_id": "b" * 64}
    tokens, gets = [], []

    def token_fetch(url, cid, secret):
        tokens.append((url, cid, secret))
        return "tok-123"

    def fetch(url, headers, params):
        gets.append((url, dict(headers), params))
        if params is not None:  # fresh query
            return {"data": [{"id": 1, "created_at": "2024-01-01T00:10:00Z"}],
                    "pagination": {"next_link": "https://api.us.onelogin.com/api/1/events?after=x"}}
        return {"data": [{"id": 2, "created_at": "2024-01-01T00:20:00Z"}],
                "pagination": {"next_link": None}}

    app = OneLoginEventsApp(auth, fetch=fetch, token_fetch=token_fetch)
    state = app.initial_state({"start_time": "2024-01-01T00:00:00Z"})
    records, state, more = app.poll(state)
    assert tokens[0][0] == "https://api.us.onelogin.com/auth/oauth2/v2/token"
    assert gets[0][1]["Authorization"] == "bearer:tok-123"  # onelogin.py:106
    assert gets[0][2] == {"since": "2024-01-01T00:00:00Z"}
    assert more is True and state["next_page_url"].endswith("after=x")
    assert state["last_timestamp"] == "2024-01-01T00:10:00Z"
    records, state, more = app.poll(state)
    assert gets[1][0].endswith("after=x") and gets[1][2] is None
    assert more is False and state == {"last_timestamp": "2024-01-01T00:20:00Z"}
    assert OneLoginEventsApp.record_timestamp(records[0]) == 1704068400


def test_intercom_filter_and_run_max_checkpoint():
    """intercom.py:54-104: created_at window params, pages.next
    continuation, value-level created_at filter; checkpoint advances to
    the run's max created_at on completion (filter held at run start
    during pagination — deliberate delta from the per-page max)."""
    from streamalert_spark.sources.app_source import IntercomAdminApp

    auth = {"token": "dG9rABC123=="}
    calls = []

    def fetch(url, headers, params):
        calls.append((url, params))
        if params is not None:
            return {"activity_logs": [
                        {"id": "a", "created_at": 500},
                        {"id": "b", "created_at": 90},   # older than checkpoint
                    ],
                    "pages": {"next": "https://api.intercom.io/admins/activity_logs?page=2"}}
        return {"activity_logs": [{"id": "c", "created_at": 300}],
                "pages": {"next": None}}

    app = IntercomAdminApp(auth, fetch=fetch, clock=lambda: 1000)
    records, state, more = app.poll({"last_timestamp": 100})
    assert calls[0][1] == {"created_at_before": 1000, "created_at_after": 100}
    assert [r["id"] for r in records] == ["a"]  # 90 filtered out
    assert more is True
    assert state["last_timestamp"] == 100  # held during pagination
    assert state["run_max"] == 500
    records, state, more = app.poll(state)
    assert calls[1][1] is None and calls[1][0].endswith("page=2")
    assert [r["id"] for r in records] == ["c"]  # 300 > run-start 100
    assert more is False
    assert state == {"last_timestamp": 500}  # run max committed


def test_box_stream_position_and_chunk_gate():
    """box.py:108-195: created_after on fresh runs, stream_position
    continuation, more while chunk_size fills, checkpoint = last entry's
    created_at."""
    from streamalert_spark.sources.app_source import BoxAdminEventsApp

    calls = []

    def fetch(params):
        calls.append(dict(params))
        if "stream_position" not in params:
            return {"chunk_size": 500, "next_stream_position": "sp-2",
                    "entries": [{"event_id": "e1",
                                 "created_at": "2024-01-10T00:00:00Z"}] * 500}
        return {"chunk_size": 1, "next_stream_position": "sp-3",
                "entries": [{"event_id": "e2",
                             "created_at": "2024-01-11T00:00:00Z"}]}

    app = BoxAdminEventsApp({"keyfile": "{}"}, fetch=fetch)
    state = app.initial_state({"start_time": "2024-01-01T00:00:00Z"})
    records, state, more = app.poll(state)
    assert calls[0] == {"limit": 500, "created_after": "2024-01-01T00:00:00Z"}
    assert more is True and state["stream_position"] == "sp-2"
    assert state["last_timestamp"] == "2024-01-10T00:00:00Z"
    records, state, more = app.poll(state)
    assert calls[1] == {"limit": 500, "stream_position": "sp-2"}
    assert more is False and "stream_position" not in state
    assert state["last_timestamp"] == "2024-01-11T00:00:00Z"
    # empty response holds the checkpoint
    app2 = BoxAdminEventsApp({"keyfile": "{}"},
                             fetch=lambda p: {"chunk_size": 0, "entries": []})
    records, st, more = app2.poll({"last_timestamp": "2024-01-11T00:00:00Z"})
    assert records == [] and more is False
    assert st == {"last_timestamp": "2024-01-11T00:00:00Z"}


def test_gsuite_reverse_chron_and_boundary_dedup():
    """gsuite.py:132-195: startTime held for the run, nextPageToken
    pagination, checkpoint from the FIRST page (reverse-chron), boundary
    uniqueQualifiers carried to de-duplicate the next run."""
    from streamalert_spark.sources.app_source import GSuiteAdminReportsApp

    calls = []

    def fetch(application, start_time, page_token):
        calls.append((application, start_time, page_token))
        if page_token is None:
            return {"items": [
                {"id": {"time": "2024-01-20T00:00:00.000Z", "uniqueQualifier": "q9"}},
                {"id": {"time": "2024-01-19T00:00:00.000Z", "uniqueQualifier": "q8"}},
                # boundary event from the LAST run — must be filtered
                {"id": {"time": "2024-01-15T00:00:00.000Z", "uniqueQualifier": "q1"}},
            ], "nextPageToken": "tok2"}
        return {"items": [
            {"id": {"time": "2024-01-16T00:00:00.000Z", "uniqueQualifier": "q5"}},
        ]}

    app = GSuiteAdminReportsApp(
        {"keyfile": "{}", "delegation_email": "a@b.c"}, fetch=fetch)
    state = {"last_timestamp": "2024-01-15T00:00:00.000Z", "event_ids": ["q1"]}
    records, state, more = app.poll(state)
    assert calls[0] == ("admin", "2024-01-15T00:00:00.000Z", None)
    assert [r["id"]["uniqueQualifier"] for r in records] == ["q9", "q8"]  # q1 deduped
    assert more is True and state["next_page_token"] == "tok2"
    # checkpoint not yet advanced; pending carries the first page's newest
    assert state["last_timestamp"] == "2024-01-15T00:00:00.000Z"
    assert state["pending_last"] == "2024-01-20T00:00:00.000Z"
    assert state["pending_ids"] == ["q9"]
    records, state, more = app.poll(state)
    assert calls[1] == ("admin", "2024-01-15T00:00:00.000Z", "tok2")
    assert [r["id"]["uniqueQualifier"] for r in records] == ["q5"]
    assert more is False
    assert state == {"last_timestamp": "2024-01-20T00:00:00.000Z",
                     "event_ids": ["q9"]}


def test_replay_paths_for_string_and_held_checkpoints():
    """Streaming-recovery regressions: mid-run end offsets hold the
    checkpoint (intercom/gsuite) and several apps use ISO-string
    checkpoints (box/gsuite/onelogin) — poll_between must re-page the
    committed window instead of returning [] or crashing on int()."""
    from streamalert_spark.sources.app_source import (
        BoxAdminEventsApp,
        GSuiteAdminReportsApp,
        IntercomAdminApp,
    )

    # intercom: committed mid-run offset {last: 100, run_max: 500} —
    # replay must re-fetch the page-1 records, not return []
    def ic_fetch(url, headers, params):
        return {"activity_logs": [{"id": "a", "created_at": 500},
                                  {"id": "z", "created_at": 900}],  # beyond end
                "pages": {"next": None}}

    ic = IntercomAdminApp({"token": "dG9rAB=="}, fetch=ic_fetch, clock=lambda: 1000)
    replay = ic.poll_between({"last_timestamp": 100},
                             {"last_timestamp": 100, "run_max": 500,
                              "next_page_url": "u"})
    assert [r["id"] for r in replay] == ["a"]  # 900 clipped at run_max

    # box: ISO checkpoints — replay must not int()-crash and must clip
    def box_fetch(params):
        return {"chunk_size": 1, "next_stream_position": "sp",
                "entries": [{"event_id": "e1", "created_at": "2024-01-05T00:00:00Z"},
                            {"event_id": "e2", "created_at": "2024-01-20T00:00:00Z"}]}

    box = BoxAdminEventsApp({"keyfile": "{}"}, fetch=box_fetch)
    replay = box.poll_between({"last_timestamp": "2024-01-01T00:00:00Z"},
                              {"last_timestamp": "2024-01-10T00:00:00Z"})
    assert [r["event_id"] for r in replay] == ["e1"]

    # gsuite: ISO checkpoints + held-during-pagination last_timestamp
    def gs_fetch(application, start_time, page_token):
        return {"items": [
            {"id": {"time": "2024-01-18T00:00:00.000Z", "uniqueQualifier": "q7"}},
            {"id": {"time": "2024-01-25T00:00:00.000Z", "uniqueQualifier": "q8"}},
        ]}

    gs = GSuiteAdminReportsApp({"keyfile": "{}", "delegation_email": "a@b.c"},
                               fetch=gs_fetch)
    replay = gs.poll_between(
        {"last_timestamp": "2024-01-15T00:00:00.000Z", "event_ids": []},
        {"last_timestamp": "2024-01-15T00:00:00.000Z",
         "pending_last": "2024-01-20T00:00:00.000Z", "next_page_token": "t"})
    assert [r["id"]["uniqueQualifier"] for r in replay] == ["q7"]  # q8 clipped


def test_onelogin_token_cached_per_run():
    """onelogin.py:86-88: one token per gather run — continuation pages
    reuse it; a fresh run requests a new one."""
    from streamalert_spark.sources.app_source import OneLoginEventsApp

    auth = {"region": "us", "client_secret": "a" * 64, "client_id": "b" * 64}
    tokens = []

    def token_fetch(url, cid, secret):
        tokens.append(1)
        return f"tok-{len(tokens)}"

    def fetch(url, headers, params):
        if params is not None:
            return {"data": [{"id": 1, "created_at": "2024-01-01T00:10:00Z"}],
                    "pagination": {"next_link": "https://next"}}
        return {"data": [{"id": 2, "created_at": "2024-01-01T00:20:00Z"}],
                "pagination": {"next_link": None}}

    app = OneLoginEventsApp(auth, fetch=fetch, token_fetch=token_fetch)
    state = app.initial_state({})
    _, state, more = app.poll(state)        # fresh run -> token 1
    _, state, more = app.poll(state)        # continuation -> reuse token 1
    assert len(tokens) == 1
    _, state, more = app.poll(state)        # next fresh run -> token 2
    assert len(tokens) == 2


# --------------------------------------------------------------- salesforce

SF_AUTH = {
    "client_id": "c" * 85,
    "client_secret": "1" * 19,
    "username": "auditor@example.com",
    "password": "hunter2",
    "security_token": "T" * 24,
}


def _sf_fake_service(calls):
    """A recording fake of the salesforce REST surface: 2 log files
    (2024-01-02 and 2024-01-03), 2 CSV data rows each."""

    def fetch(method, url, headers, data):
        calls.append((method, url))
        if method == "POST":
            assert data["grant_type"] == "password"
            assert data["password"] == "hunter2" + "T" * 24  # concatenated
            assert data["client_id"] == SF_AUTH["client_id"]
            return {"access_token": "tok-9", "instance_url": "https://inst.example"}
        if url.endswith("/services/data/"):
            assert headers["Authorization"] == "Bearer tok-9"
            return [{"version": "20.0"}, {"version": "47.0"}, {"version": "46.0"}]
        if "query?q=" in url:
            assert "/services/data/v47.0/" in url  # latest version discovered
            import re as _re

            last = _re.search(r"LogDate\+>\+([^+]+)\+", url).group(1)
            assert "EventType+=+'login'" in url
            records = [
                {"Id": f"0AT{d}", "EventType": "Login",
                 "LogFile": f"services/data/v47.0/sobjects/EventLogFile/0AT{d}/LogFile",
                 "LogDate": f"2024-01-0{d}T00:00:00.000+0000"}
                for d in (2, 3)
                if f"2024-01-0{d}T00:00:00Z" > last
            ]
            return {"records": records, "done": True, "totalSize": len(records)}
        # log file content: header + 2 data lines
        d = url[-9]
        return "\n".join([
            '"EVENT_TYPE","TIMESTAMP","USER_ID"',
            f'"Login","2024-01-0{d}T01:00:00Z","u{d}a"',
            f'"Login","2024-01-0{d}T02:00:00Z","u{d}b"',
        ])

    return fetch


def test_salesforce_protocol_full_run():
    """salesforce.py:103-404: token POST -> version discovery -> filtered
    EventLogFile query -> per-file CSV fetch (header dropped) -> checkpoint
    advances to the run-start wall clock in salesforce date format."""
    from streamalert_spark.sources.app_source import APP_REGISTRY

    calls = []
    app = APP_REGISTRY["salesforce_login"](
        SF_AUTH, fetch=_sf_fake_service(calls),
        clock=lambda: 1704412800.0)  # 2024-01-05T00:00:00Z
    state = app.initial_state({})
    assert state == {"last_timestamp": "1970-01-01T00:00:00Z"}

    records, state, more = app.poll(state)
    assert not more  # daily log files: one poll == one full run
    assert state == {"last_timestamp": "2024-01-05T00:00:00Z"}
    # 2 files x 2 data lines, headers dropped
    assert [app.record_payload(r) for r in records] == [
        '"Login","2024-01-02T01:00:00Z","u2a"',
        '"Login","2024-01-02T02:00:00Z","u2b"',
        '"Login","2024-01-03T01:00:00Z","u3a"',
        '"Login","2024-01-03T02:00:00Z","u3b"',
    ]
    # record timestamp = the file's LogDate (daily batch)
    assert app.record_timestamp(records[0]) == 1704153600  # 2024-01-02
    # call order: token, versions, query, file GETs
    assert [c[0] for c in calls] == ["POST", "GET", "GET", "GET", "GET"]

    # second run from the advanced checkpoint: LogDate > 2024-01-05 -> no
    # files, state holds the new wall clock
    records2, state2, more2 = app.poll(dict(state))
    assert records2 == [] and not more2
    assert state2 == {"last_timestamp": "2024-01-05T00:00:00Z"}


def test_salesforce_token_failure_holds_state():
    """salesforce.py:122-128: an invalid token response aborts the run
    without advancing the checkpoint."""
    from streamalert_spark.sources.app_source import APP_REGISTRY

    def fetch(method, url, headers, data):
        return {"error": "invalid_grant"}

    app = APP_REGISTRY["salesforce_console"](SF_AUTH, fetch=fetch)
    state = {"last_timestamp": "2024-01-01T00:00:00Z"}
    records, new_state, more = app.poll(dict(state))
    assert records == [] and new_state == state and not more


def test_salesforce_replay_clips_at_end_checkpoint():
    """poll_between replays the committed window: files dated at or
    before the end checkpoint only."""
    from streamalert_spark.sources.app_source import APP_REGISTRY

    calls = []
    app = APP_REGISTRY["salesforce_login"](
        SF_AUTH, fetch=_sf_fake_service(calls), clock=lambda: 1704412800.0)
    replay = app.poll_between(
        {"last_timestamp": "1970-01-01T00:00:00Z"},
        {"last_timestamp": "2024-01-02T12:00:00Z"})
    # the 2024-01-03 file is beyond the committed end -> clipped
    assert [app.record_payload(r) for r in replay] == [
        '"Login","2024-01-02T01:00:00Z","u2a"',
        '"Login","2024-01-02T02:00:00Z","u2b"',
    ]


def test_salesforce_types_and_auth_validation():
    """salesforce.py:143-174 auth formats + the 5 EventType subclasses
    (salesforce.py:408-460)."""
    from streamalert_spark.sources.app_source import APP_REGISTRY, SalesforceApp

    for t in ("console", "login", "loginas", "report", "reportexport"):
        cls = APP_REGISTRY[f"salesforce_{t}"]
        assert issubclass(cls, SalesforceApp)
        assert cls._type() == t
        assert cls.service() == "salesforce"
    with pytest.raises(ValueError):
        APP_REGISTRY["salesforce_login"]({**SF_AUTH, "client_secret": "nope"})
    with pytest.raises(ValueError):
        bad = dict(SF_AUTH)
        del bad["security_token"]
        APP_REGISTRY["salesforce_login"](bad)


def test_duo_auth_endpoint_and_shared_protocol():
    """duo.py:200-233: auth/admin differ only in endpoint; both share the
    signed-request mintime protocol."""
    from streamalert_spark.sources.app_source import DuoAdminApp, DuoAuthApp

    assert DuoAuthApp._endpoint() == "/admin/v1/logs/authentication"
    assert DuoAdminApp._endpoint() == "/admin/v1/logs/administrator"
    urls = []

    def fetch(url, headers, params):
        urls.append(url)
        return {"response": [{"timestamp": 42, "action": "login"}]}

    app = DuoAuthApp(DUO_AUTH, fetch=fetch)
    records, state, more = app.poll({"last_timestamp": 0})
    assert urls[0].endswith("/admin/v1/logs/authentication")
    assert state == {"last_timestamp": 42}
    assert records[0]["action"] == "login"


def test_gsuite_report_subtypes_registered():
    """gsuite.py:245-371: all 15 applicationName subtypes registered,
    each sharing the reverse-chronological pagination protocol."""
    from streamalert_spark.sources.app_source import (
        APP_REGISTRY,
        GSuiteReportsApp,
        _GSUITE_REPORT_TYPES,
    )

    assert len(_GSUITE_REPORT_TYPES) == 15
    for t in _GSUITE_REPORT_TYPES:
        cls = APP_REGISTRY[f"gsuite_{t}"]
        assert issubclass(cls, GSuiteReportsApp)
        assert cls.application_name() == t

    # a subtype polls with ITS application name
    apps_seen = []

    def fetch(application, start_time, token):
        apps_seen.append(application)
        return {"items": [{"id": {"time": "2024-01-01T00:00:00.000Z",
                                  "uniqueQualifier": "q1"}}]}

    app = APP_REGISTRY["gsuite_drive"]({"keyfile": "k", "delegation_email": "e"},
                                       fetch=fetch)
    app.poll(app.initial_state({}))
    assert apps_seen == ["drive"]
