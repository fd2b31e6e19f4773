"""Threat-intel feed ingester parity tests (reference
streamalert/threat_intel_downloader/main.py:41-347): query grammar,
pagination/threshold stop, retry classification, source filtering,
ioc_keys projection, expiry epoch conversion, and the snapshot write
consumed by the ThreatIntel join."""

from __future__ import annotations

import calendar
from datetime import datetime

import pytest

from streamalert_spark.enrich.ti_downloader import (
    API_MAX_INDEX,
    API_MAX_LIMIT,
    FeedRequestError,
    FeedRetryError,
    ThreatStreamFeed,
    fake_feed_transport,
    ingest_feed,
    load_ioc_table,
)


def _feed(**kw) -> ThreatStreamFeed:
    defaults = dict(
        api_user="user",
        api_key="key",
        ioc_types=["domain", "ip"],
        excluded_sub_types=["bot_ip", "brute_ip"],
        ioc_sources=["crowdstrike", "abuse.ch"],
        now_epoch=1_700_000_000,
    )
    defaults.update(kw)
    return ThreatStreamFeed(**defaults)


def test_query_string_grammar():
    """main.py:298-302: status AND (type OR ...) AND NOT (itype OR ...)."""
    q = _feed().query_string()
    assert q == ('(status="active")+AND+(type="domain"+OR+type="ip")'
                 '+AND+NOT+(itype="bot_ip"+OR+itype="brute_ip")')


def test_initial_url_shape():
    """main.py:303-312: resource path, creds, limit, query."""
    url = _feed().initial_url()
    assert url.startswith("/api/v2/intelligence/?username=user&api_key=key")
    assert f"limit={API_MAX_LIMIT}" in url
    assert url.endswith("&q=" + _feed().query_string())


def test_epoch_time_parses_and_defaults():
    """main.py:184-206: explicit expiry parses as UTC; missing expiry
    defaults to now + 90 days; malformed raises."""
    f = _feed()
    explicit = f.epoch_time("2017-12-19T04:45:18.412Z")
    assert explicit == calendar.timegm(
        datetime(2017, 12, 19, 4, 45, 18).timetuple())
    assert f.epoch_time(None) == 1_700_000_000 + 90 * 86400
    assert f.epoch_time("") == 1_700_000_000 + 90 * 86400
    with pytest.raises(ValueError):
        f.epoch_time("not-a-date")


def test_process_objects_source_filter_and_projection():
    """main.py:208-257: substring match on lowered source; only ioc_keys
    survive; expiration_ts converted to epoch."""
    f = _feed()
    rows = f.process_objects([
        {"value": "evil.com", "itype": "c2_domain", "type": "domain",
         "source": "CrowdStrike Intel", "confidence": 90,
         "expiration_ts": "2017-12-19T04:45:18.412Z"},
        {"value": "benign.com", "itype": "c2_domain", "type": "domain",
         "source": "someone-else", "expiration_ts": None},
    ])
    assert len(rows) == 1
    row = rows[0]
    assert row["value"] == "evil.com"
    assert "confidence" not in row  # projected away by ioc_keys
    assert row["expiration_ts"] == calendar.timegm(
        datetime(2017, 12, 19, 4, 45, 18).timetuple())


def test_pagination_follows_next_until_empty():
    pages = [
        {"objects": [{"value": "a.com", "itype": "c2_domain",
                      "type": "domain", "source": "crowdstrike",
                      "expiration_ts": None}],
         "meta": {"next": "/page/1", "offset": 1000}},
        {"_url": "/page/1",
         "objects": [{"value": "b.com", "itype": "c2_domain",
                      "type": "domain", "source": "crowdstrike",
                      "expiration_ts": None}],
         "meta": {"next": "/page/2", "offset": 2000}},
        {"_url": "/page/2",
         "objects": [{"value": "c.com", "itype": "c2_domain",
                      "type": "domain", "source": "crowdstrike",
                      "expiration_ts": None}],
         "meta": {"next": None, "offset": 3000}},
    ]
    f = _feed(fetch=fake_feed_transport(pages))
    rows = f.run()
    assert [r["value"] for r in rows] == ["a.com", "b.com", "c.com"]
    assert f.last_cursor is None


def test_pagination_stops_at_offset_threshold():
    """main.py:134-138: a non-empty next cursor is DISCARDED once offset
    reaches API_MAX_INDEX - API_MAX_LIMIT."""
    threshold = API_MAX_INDEX - API_MAX_LIMIT
    pages = [
        {"objects": [{"value": "a.com", "itype": "x", "type": "domain",
                      "source": "crowdstrike", "expiration_ts": None}],
         "meta": {"next": "/page/1", "offset": threshold}},
        {"_url": "/page/1", "objects": [], "meta": {}},
    ]
    f = _feed(fetch=fake_feed_transport(pages))
    rows = f.run()
    assert [r["value"] for r in rows] == ["a.com"]  # page 1 never fetched


def test_max_pages_bounds_run_and_cursor_resumes():
    """The Lambda re-invocation seam: a bounded run exposes the cursor;
    resuming from it completes the chain with no dup/drop."""
    pages = [
        {"objects": [{"value": f"{i}.com", "itype": "x", "type": "domain",
                      "source": "crowdstrike", "expiration_ts": None}],
         "meta": {"next": f"/page/{i+1}" if i < 3 else None,
                  "offset": (i + 1) * 1000},
         "_url": f"/page/{i}" if i else None}
        for i in range(4)
    ]
    f = _feed(fetch=fake_feed_transport(pages))
    first = f.run(max_pages=2)
    assert [r["value"] for r in first] == ["0.com", "1.com"]
    cursor = f.last_cursor
    assert cursor == "/page/2"
    rest = f.run(next_url=cursor)
    assert [r["value"] for r in rest] == ["2.com", "3.com"]


def test_retry_on_500_then_success():
    pages = [
        {"_status": 500, "_then_ok": True,
         "objects": [{"value": "a.com", "itype": "x", "type": "domain",
                      "source": "crowdstrike", "expiration_ts": None}],
         "meta": {"next": None, "offset": 1000}},
    ]
    f = _feed(fetch=fake_feed_transport(pages))
    assert [r["value"] for r in f.run()] == ["a.com"]


def test_401_and_unknown_status_retried_then_fail():
    """Reference quirk ported as-is: the 401/unknown messages say 'do not
    retry', but ThreatStreamRequestsError is in EXCEPTIONS_TO_BACKOFF, so
    the @backoff wiring retries them up to the same cap as 5xx."""
    calls = []

    def fetch(url):
        calls.append(url)
        return 401, {}

    with pytest.raises(FeedRequestError):
        _feed(fetch=fetch).run()
    assert len(calls) == 3  # BACKOFF_MAX_RETRIES, same as 5xx

    calls.clear()

    def fetch404(url):
        calls.append(url)
        return 404, {}

    with pytest.raises(FeedRequestError):
        _feed(fetch=fetch404).run()
    assert len(calls) == 3


def test_500_exhausts_retries():
    calls = []

    def fetch(url):
        calls.append(url)
        return 500, {}

    with pytest.raises(FeedRetryError):
        _feed(fetch=fetch).run()
    assert len(calls) == 3  # BACKOFF_MAX_RETRIES


def test_no_transport_raises():
    with pytest.raises(NotImplementedError):
        _feed().run()


def test_ingest_writes_deduped_snapshot_and_expiry_filter(spark, tmp_path):
    """ingest → parquet → load_ioc_table: ARRIVAL-ORDER last-write-wins
    dedup on ioc_value (DynamoDB put_item: the last-arrived row wins even
    when its expiration is SMALLER) and the TTL-style expiry filter."""
    pages = [
        {"objects": [
            {"value": "dup.com", "itype": "c2_domain", "type": "domain",
             "source": "crowdstrike", "expiration_ts":
                 "2023-11-01T00:00:00.000Z"},
            {"value": "dup.com", "itype": "mal_domain", "type": "domain",
             "source": "abuse.ch feed", "expiration_ts":
                 "2024-01-01T00:00:00.000Z"},
            {"value": "gone.com", "itype": "c2_domain", "type": "domain",
             "source": "crowdstrike", "expiration_ts":
                 "2020-01-01T00:00:00.000Z"},
        ], "meta": {"next": "/page/1", "offset": 1000}},
        # a LATER page re-writes dup.com with a smaller expiration: put_item
        # arrival order means THIS row wins, not the max-expiration one
        {"_url": "/page/1", "objects": [
            {"value": "dup.com", "itype": "resurfaced", "type": "domain",
             "source": "crowdstrike", "expiration_ts":
                 "2023-12-01T00:00:00.000Z"},
        ], "meta": {"next": None, "offset": 2000}},
    ]
    f = _feed(fetch=fake_feed_transport(pages))
    out = str(tmp_path / "ioc")
    written = ingest_feed(spark, f, out)
    assert written.count() == 2  # dup.com collapsed, gone.com kept
    dup = written.filter("ioc_value = 'dup.com'").collect()[0]
    assert dup.sub_type == "resurfaced"  # last ARRIVAL wins
    assert dup.source == "crowdstrike"
    assert dup.expiration_ts == calendar.timegm(
        datetime(2023, 12, 1).timetuple())

    now = calendar.timegm(datetime(2023, 6, 1).timetuple())
    live = load_ioc_table(spark, out, now_epoch=now)
    assert {r.ioc_value for r in live.collect()} == {"dup.com"}
