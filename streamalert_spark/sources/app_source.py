"""App-source pollers as a native Spark Python DataSource — the last
SURVEY §2.1 row, re-expressed Spark-first.

The reference runs each third-party API poller (duo, slack, aliyun, box,
...) as a scheduled Lambda: `AppIntegration.gather()` loops
`_gather_logs()` against the service API, checkpoints `_last_timestamp`
in the parameter store, re-invokes itself while `_more_to_poll`, and
ships batches to the classifier (reference: streamalert/apps/
app_base.py:65-390, apps/_apps/duo.py:86-161, slack.py:25-270,
aliyun.py:30-160, apps/_apps/__init__.py StreamAlertApp registry). On
Spark the SAME loop is a streaming SOURCE: each microbatch is one poll,
the engine's offset log replaces the parameter-store checkpoint (restart
resumes from the committed state), and `more_to_poll` simply means the
next microbatch has data waiting.

Implemented with the Spark 4 Python DataSource API:
- `AppPollerDataSource` registers as format "streamalert_app";
- batch reads run the gather loop to exhaustion (backfill — the
  reference's successive-invocation chain in one bounded loop);
- streaming reads use SimpleDataSourceStreamReader — designed for
  low-volume driver-side sources exactly like an API poller: offsets are
  the app's opaque state dicts ({"last_timestamp": ..., "next_page":
  ...}), `read(start)` performs ONE poll (one Lambda invocation), and
  `readBetweenOffsets` replays a committed range by re-querying the API
  for that window (the replay every timestamp-paginated API supports).

HTTP transports stay injectable exactly like the output connectors
(`streaming/outputs.py`): the request SHAPE (duo's signed headers,
slack's bearer + page/before pagination, aliyun's StartTime/EndTime/
NextToken protocol, checkpoint advance) is ported and unit-tested; the
network call is a pluggable fetch function, env-dependent by design.
Ported app TYPES (registry keys, mirroring the reference's ~24
StreamAlertApp registrations): duo_admin, duo_auth, slack_access,
slack_integration, aliyun_actiontrail, onelogin_events, intercom_admin,
box_admin_events, the 15 gsuite report subtypes (gsuite_admin,
gsuite_calendar, gsuite_drive, ...), the 5 salesforce event-log types
(salesforce_console, salesforce_login, salesforce_loginas,
salesforce_report, salesforce_reportexport), + the synthetic test app.
Transport-requiring apps register their fetchers in ``TRANSPORTS`` (the
stream reader runs driver-side, so closures are fine; batch backfill of
a transport app additionally requires the fetcher to be picklable).
"""

from __future__ import annotations

import json
import re
import time as _time
from abc import ABC, abstractmethod
from collections.abc import Callable, Iterator

APP_REGISTRY: dict[str, type["AppIntegration"]] = {}

# app_type -> constructor kwargs (fetch=..., clock=...) for apps that need
# an HTTP transport; populated by the deployment (or tests)
TRANSPORTS: dict[str, dict] = {}


def _iso_epoch(value: str, *formats: str) -> int:
    """Epoch seconds of an ISO-8601-ish timestamp, trying each format in
    order; 0 for empty/unparseable input. One shared helper — the per-app
    created_at shapes differ only in their strptime format list."""
    import calendar
    from datetime import datetime

    if not value:
        return 0
    for fmt in formats:
        try:
            if "%z" in fmt:
                return calendar.timegm(
                    datetime.strptime(value, fmt).utctimetuple())
            return calendar.timegm(datetime.strptime(value, fmt).timetuple())
        except ValueError:
            continue
    return 0


def streamalert_app(cls: type["AppIntegration"]) -> type["AppIntegration"]:
    """Mirror of the reference's StreamAlertApp registry decorator
    (apps/_apps/__init__.py): registers the app under its type name."""
    APP_REGISTRY[cls.app_type()] = cls
    return cls


class AppIntegration(ABC):
    """Transport-free port of apps/app_base.py:65-390.

    State is an EXPLICIT dict (passed in, returned out) instead of living
    on the instance + parameter store: Spark's offset log owns the
    checkpoint, and per-run pagination cursors (slack's next_page /
    before) ride in the same dict.
    """

    # duo returns at most 1000 logs per request (duo.py:34); subclasses
    # override with their service's page size
    MAX_RESPONSE_LOGS = 1000

    def __init__(self, auth: dict[str, str]):
        self.validate_auth(auth)
        self.auth = auth

    @classmethod
    @abstractmethod
    def service(cls) -> str:
        """Service name, e.g. 'duo' (app_base.py:94)."""

    @classmethod
    @abstractmethod
    def app_type(cls) -> str:
        """Full app type, e.g. 'duo_admin' (app_base.py:107)."""

    @classmethod
    def required_auth_info(cls) -> dict[str, dict]:
        """{key: {'description': ..., 'format': compiled-regex}}
        (duo.py:166-185)."""
        return {}

    @classmethod
    def validate_auth(cls, auth: dict[str, str]) -> None:
        """Auth-key presence + format validation (app_base.py:218):
        raises ValueError on a missing key or a format mismatch."""
        for key, info in cls.required_auth_info().items():
            if key not in auth:
                raise ValueError(f"{cls.app_type()}: missing auth key '{key}'")
            fmt = info.get("format")
            if fmt is not None and not fmt.match(str(auth[key])):
                raise ValueError(f"{cls.app_type()}: auth key '{key}' has invalid format")

    def sleep_seconds(self) -> int:
        """Inter-poll backoff (app_base.py:167-175). In the streaming
        form this maps to the query trigger interval; kept for parity."""
        return 0

    def initial_state(self, options: dict) -> dict:
        """First offset for a fresh checkpoint."""
        return {"last_timestamp": int(options.get("start_timestamp", 0))}

    @classmethod
    def record_timestamp(cls, record: dict) -> int:
        """Epoch seconds of one record, for the source's event_timestamp
        column. Default: the 'timestamp' field (duo-shaped)."""
        return int(record.get("timestamp", 0))

    @classmethod
    def record_payload(cls, record: dict) -> str:
        """The source's ``record`` column for one gathered record.
        Default: canonical JSON. Apps whose service emits non-JSON
        payloads (salesforce event log files are CSV) override this so
        the classifier sees the service's native line format."""
        return json.dumps(record, sort_keys=True)

    @abstractmethod
    def poll(self, state: dict) -> tuple[list[dict], dict, bool]:
        """ONE poll against the service from ``state``.

        Returns (records, new_state, more_to_poll) — the triple the
        reference tracks as (logs, self._last_timestamp,
        self._more_to_poll) in duo.py:129-161.
        """

    def _replay_run(self, start_state: dict, end_epoch: int) -> list[dict]:
        """Shared replay core: run poll() from ``start_state`` to run
        exhaustion, keeping records at-or-before ``end_epoch``. No early
        break on checkpoint comparison — second-granularity ties across a
        page boundary would drop committed records (replay is
        at-least-once; the next window's own filter de-duplicates)."""
        out: list[dict] = []
        state = dict(start_state)
        more = True
        while more:
            records, state, more = self.poll(state)
            out.extend(r for r in records if self.record_timestamp(r) <= end_epoch)
        return out

    def poll_between(self, start_state: dict, end_state: dict) -> list[dict]:
        """Replay a committed window for streaming recovery — re-query by
        range, the capability every timestamp-paginated API in the
        reference has (duo mintime, slack before, aliyun Start/EndTime).
        Default: iterate poll() from start and clip at the end state's
        last_timestamp (integer checkpoints; ISO-checkpoint apps override
        with an end-epoch extracted from their own formats)."""
        end_ts = int(end_state.get("last_timestamp", 0))
        out: list[dict] = []
        state = dict(start_state)
        more = True
        while more and int(state.get("last_timestamp", 0)) < end_ts:
            records, state, more = self.poll(state)
            out.extend(r for r in records if self.record_timestamp(r) <= end_ts)
        return out


# ---------------------------------------------------------------------------
# Synthetic app — a deterministic poller for tests and local runs.
# ---------------------------------------------------------------------------


@streamalert_app
class SyntheticApp(AppIntegration):
    """Deterministic event generator shaped like a timestamp-paginated
    API: events exist at every integer timestamp in [1, end_timestamp],
    at most MAX_RESPONSE_LOGS per poll — exercising the exact
    checkpoint-advance + more_to_poll loop of a real app."""

    MAX_RESPONSE_LOGS = 100

    def __init__(self, auth: dict[str, str], end_timestamp: int = 250,
                 page_size: int | None = None):
        super().__init__(auth)
        self.end_timestamp = int(end_timestamp)
        # page_size overrides the per-poll cap: bounded showcase queries
        # use larger pages to cut micro-batch fixed overhead while
        # keeping >=2 batches where cross-batch state is the property
        self.page_size = int(page_size) if page_size else self.MAX_RESPONSE_LOGS

    @classmethod
    def service(cls) -> str:
        return "synthetic"

    @classmethod
    def app_type(cls) -> str:
        return "synthetic"

    def poll(self, state: dict) -> tuple[list[dict], dict, bool]:
        last = int(state.get("last_timestamp", 0))
        start = last + 1  # mintime = last + 1 (duo.py:131)
        if start > self.end_timestamp:
            return [], {"last_timestamp": last}, False
        end = min(start + self.page_size - 1, self.end_timestamp)
        records = [
            {"timestamp": ts, "event_id": f"ev-{ts}", "result": "SUCCESS"}
            for ts in range(start, end + 1)
        ]
        # last = final record's timestamp (duo.py:156); more when the page
        # filled (duo.py:161)
        return records, {"last_timestamp": end}, len(records) >= self.page_size


# ---------------------------------------------------------------------------
# Duo admin app — real request construction, injectable transport.
# ---------------------------------------------------------------------------


def duo_signed_headers(
    hostname: str,
    endpoint: str,
    params: dict[str, str],
    integration_key: str,
    secret_key: str,
    formatted_date: str,
) -> dict[str, str]:
    """Duo's per-request signature (duo.py:55-84, itself derived from the
    public duo_client_python): hmac-sha1 over date/method/host/endpoint/
    urlencoded-params, shipped as basic auth ikey:hexdigest. Pure
    function — the date is a parameter so signatures are testable."""
    import hashlib
    import hmac as hmac_mod
    from base64 import b64encode
    from urllib.parse import urlencode

    auth_string = "\n".join(
        [formatted_date, "GET", hostname, endpoint, urlencode(sorted(params.items()))]
    ).encode()
    signature = hmac_mod.new(secret_key.encode(), auth_string, hashlib.sha1)  # noqa: S324
    basic_auth = ":".join([integration_key, signature.hexdigest()]).encode()
    return {
        "Date": formatted_date,
        "Authorization": f"Basic {b64encode(basic_auth).decode()}",
        "Host": hostname,
    }


class DuoApp(AppIntegration):
    """Duo base poller (duo.py:33-161 DuoApp): signed requests, mintime
    pagination; the admin/auth apps differ only in endpoint (duo.py:
    195-233). ``fetch`` is the injectable transport:
    (url, headers, params) -> response dict with a 'response' list —
    absent a transport, polling raises (env-dependent by design, like
    the output connectors' HTTP clients)."""

    _ENDPOINT_PREFIX = "/admin/v1/logs/"  # duo.py:37

    def __init__(self, auth: dict[str, str],
                 fetch: Callable[[str, dict, dict], dict] | None = None):
        super().__init__(auth)
        self.fetch = fetch

    @classmethod
    def service(cls) -> str:
        return "duo"

    @classmethod
    def _endpoint(cls) -> str:
        """Endpoint path for this duo log type (duo.py:39-49)."""
        raise NotImplementedError("subclasses implement _endpoint")

    @classmethod
    def required_auth_info(cls) -> dict[str, dict]:
        # duo.py:166-185 — identical formats
        return {
            "api_hostname": {"format": re.compile(r"^api-[a-f0-9]{8}\.duosecurity\.com$")},
            "integration_key": {"format": re.compile(r"^DI[A-Z0-9]{18}$")},
            "secret_key": {"format": re.compile(r"^[a-zA-Z0-9]{40}$")},
        }

    def sleep_seconds(self) -> int:
        return 1  # duo rate limit parity

    def poll(self, state: dict) -> tuple[list[dict], dict, bool]:
        if self.fetch is None:
            raise NotImplementedError(
                f"{self.app_type()} requires an HTTP transport; inject "
                "fetch=... (env-dependent by design — see "
                "streaming/outputs.py)")
        from datetime import datetime, timezone

        last = int(state.get("last_timestamp", 0))
        hostname = self.auth["api_hostname"]
        params = {"mintime": str(last + 1)}  # duo.py:131
        date = datetime.now(timezone.utc).strftime("%a, %d %b %Y %H:%M:%S -0000")
        headers = duo_signed_headers(
            hostname, self._endpoint(), params,
            self.auth["integration_key"], self.auth["secret_key"], date)
        response = self.fetch(f"https://{hostname}{self._endpoint()}", headers, params)
        logs = response.get("response") or []
        if not logs:
            return [], {"last_timestamp": last}, False
        return (logs, {"last_timestamp": logs[-1]["timestamp"]},
                len(logs) >= self.MAX_RESPONSE_LOGS)


@streamalert_app
class DuoAdminApp(DuoApp):
    """duo_admin poller (duo.py:217-233 DuoAdminApp): administrator-log
    endpoint over the shared DuoApp protocol."""

    @classmethod
    def app_type(cls) -> str:
        return "duo_admin"

    @classmethod
    def _endpoint(cls) -> str:
        return f"{cls._ENDPOINT_PREFIX}administrator"


@streamalert_app
class DuoAuthApp(DuoApp):
    """duo_auth poller (duo.py:200-214 DuoAuthApp): authentication-log
    endpoint over the shared DuoApp protocol."""

    @classmethod
    def app_type(cls) -> str:
        return "duo_auth"

    @classmethod
    def _endpoint(cls) -> str:
        return f"{cls._ENDPOINT_PREFIX}authentication"


# ---------------------------------------------------------------------------
# Slack apps — bearer auth, count/page pagination, value-level filtering.
# ---------------------------------------------------------------------------


class SlackApp(AppIntegration):
    """slack.py:25-131 SlackApp: POST form data with count/page, bearer
    token, per-endpoint response filtering (slack provides no server-side
    mintime, so new-record filtering happens on date fields client-side);
    last_timestamp advances to the poll's wall clock (slack.py:128-130).
    ``clock`` is injectable so checkpoint advance is testable."""

    MAX_ENTRY_COUNT = 1000   # slack.py:40
    MAX_PAGE_COUNT = 100     # slack.py:41
    _BASE_URL = "https://slack.com/api/"

    def __init__(self, auth: dict[str, str],
                 fetch: Callable[[str, dict, dict], dict] | None = None,
                 clock: Callable[[], float] = _time.time):
        super().__init__(auth)
        self.fetch = fetch
        self.clock = clock

    @classmethod
    def service(cls) -> str:
        return "slack"

    @classmethod
    def required_auth_info(cls) -> dict[str, dict]:
        # slack.py:72-80
        return {"auth_token": {"format": re.compile(r"^xoxp-[a-zA-Z0-9-]+$")}}

    @classmethod
    def endpoint(cls) -> str:
        raise NotImplementedError

    def request_data(self, state: dict) -> dict:
        # slack.py:92-99
        return {"count": self.MAX_ENTRY_COUNT, "page": int(state.get("next_page", 1))}

    def filter_response_entries(self, response: dict, last_timestamp: int) -> list[dict]:
        raise NotImplementedError

    def poll_between(self, start_state: dict, end_state: dict) -> list[dict]:
        """Replay = one full gather run from the start checkpoint.
        Slack's checkpoint is the poll's WALL CLOCK (not event time), so a
        replayed window cannot be clipped exactly — recovery is
        at-least-once: the run re-fetches everything newer than the start
        checkpoint, which is a superset of the committed records."""
        state = {"last_timestamp": int(start_state.get("last_timestamp", 0)),
                 "next_page": int(start_state.get("next_page", 1))}
        if start_state.get("before"):
            state["before"] = start_state["before"]
        out: list[dict] = []
        more = True
        while more:
            records, state, more = self.poll(state)
            out.extend(records)
        return out

    def check_for_more(self, response: dict, state: dict) -> tuple[dict, bool]:
        """slack.py:82-85 base pagination: advance the page; more unless
        the response says we're on the last one. Deliberate delta: a
        response with no/partial paging info terminates the run (the
        reference would loop until the Lambda timeout killed it — a
        bounded engine must not busy-poll forever)."""
        new_state = dict(state)
        new_state["next_page"] = int(state.get("next_page", 1)) + 1
        paging = response.get("paging") or {}
        more = bool(paging) and paging.get("pages", 1) != paging.get("page", 1)
        return new_state, more

    def poll(self, state: dict) -> tuple[list[dict], dict, bool]:
        if self.fetch is None:
            raise NotImplementedError(
                "slack apps require an HTTP transport; inject fetch=...")
        headers = {
            "Content-Type": "application/x-www-form-urlencoded",
            "Authorization": f"Bearer {self.auth['auth_token']}",  # slack.py:106-110
        }
        response = self.fetch(self._BASE_URL + self.endpoint(), headers,
                              self.request_data(state))
        if not response.get("ok"):
            # slack.py:121-124: error/warning ends the gather run
            return [], dict(state), False
        last = int(state.get("last_timestamp", 0))
        new_state, more = self.check_for_more(response, state)
        results = self.filter_response_entries(response, last)
        if more:
            # mid-pagination: KEEP filtering against the run-start
            # checkpoint. Deliberate delta from slack.py:128-130, which
            # advances _last_timestamp to the wall clock after EVERY page —
            # making pages 2..N filter against "now" and silently drop
            # (the reference loses them too; we don't replicate data loss).
            new_state["last_timestamp"] = last
        else:
            # gather run complete: advance the checkpoint to this run's
            # wall clock and reset the pagination cursors, like the
            # reference's fresh instance per invocation (slack.py:43-46)
            new_state["last_timestamp"] = int(self.clock())
            new_state["next_page"] = 1
            new_state.pop("before", None)
        return results, new_state, more


@streamalert_app
class SlackAccessApp(SlackApp):
    """slack.py:134-221 team.accessLogs: entries keyed (user, ip, agent)
    with date_first/date_last; filtered on date_last > checkpoint; page
    exhaustion at the API cap resets to page 1 with before=oldest
    date_first (slack.py:183-205)."""

    @classmethod
    def app_type(cls) -> str:
        return "slack_access"

    @classmethod
    def endpoint(cls) -> str:
        return "team.accessLogs"

    @classmethod
    def record_timestamp(cls, record: dict) -> int:
        return int(record.get("date_last", 0))

    def request_data(self, state: dict) -> dict:
        data = super().request_data(state)
        if state.get("before"):
            data["before"] = state["before"]  # slack.py:195-204
        return data

    def filter_response_entries(self, response: dict, last_timestamp: int) -> list[dict]:
        # slack.py:178-181
        return [x for x in response.get("logins", [])
                if x["date_last"] > last_timestamp]

    def check_for_more(self, response: dict, state: dict) -> tuple[dict, bool]:
        # slack.py:183-193: at the API's page cap, restart from page 1
        # bounded above by the oldest entry seen (guarded: an empty logins
        # list at the cap terminates instead of KeyErroring)
        paging = response.get("paging") or {}
        logins = response.get("logins") or []
        new_state = dict(state)
        if (logins
                and paging.get("page", 0) >= self.MAX_PAGE_COUNT
                and paging.get("count", 0) >= self.MAX_ENTRY_COUNT):
            new_state["before"] = logins[-1]["date_first"]
            new_state["next_page"] = 1
            return new_state, True
        new_state["next_page"] = int(state.get("next_page", 1)) + 1
        return new_state, paging.get("pages", 1) > paging.get("page", 1)


@streamalert_app
class SlackIntegrationsApp(SlackApp):
    """slack.py:223-270 team.integrationLogs: entries filtered on
    date > checkpoint; base pagination."""

    @classmethod
    def app_type(cls) -> str:
        return "slack_integration"

    @classmethod
    def endpoint(cls) -> str:
        return "team.integrationLogs"

    @classmethod
    def record_timestamp(cls, record: dict) -> int:
        return int(record.get("date", 0))

    def filter_response_entries(self, response: dict, last_timestamp: int) -> list[dict]:
        # slack.py:256-259
        return [x for x in response.get("logs", [])
                if int(x["date"]) > last_timestamp]


# ---------------------------------------------------------------------------
# Aliyun ActionTrail — StartTime/EndTime window + NextToken pagination.
# ---------------------------------------------------------------------------


@streamalert_app
class AliyunActionTrailApp(AppIntegration):
    """aliyun.py:30-160 AliyunApp: LookupEvents over a [StartTime,
    EndTime] window with NextToken pagination; the checkpoint advances to
    the response's EndTime (aliyun.py:146-152). The reference delegates
    wire signing to the public aliyun SDK (AcsClient), so the transport
    here is the injected ``fetch(params) -> response-dict`` — request
    parameters and pagination semantics are the ported surface."""

    MAX_RESULTS = 50  # aliyun.py:52

    def __init__(self, auth: dict[str, str],
                 fetch: Callable[[dict], dict] | None = None,
                 now_fn: Callable[[], str] | None = None):
        super().__init__(auth)
        self.fetch = fetch
        self.now_fn = now_fn

    @classmethod
    def service(cls) -> str:
        return "aliyun"

    @classmethod
    def app_type(cls) -> str:
        return "aliyun_actiontrail"

    @classmethod
    def date_formatter(cls) -> str:
        return "%Y-%m-%dT%H:%M:%SZ"  # aliyun.py:93

    @classmethod
    def required_auth_info(cls) -> dict[str, dict]:
        # aliyun.py:161+ — access keys + region
        return {
            "access_key_id": {"format": re.compile(r"^[a-zA-Z0-9]+$")},
            "access_key_secret": {"format": re.compile(r"^[a-zA-Z0-9]+$")},
            "region_id": {"format": re.compile(r"^[a-z0-9-]+$")},
        }

    def initial_state(self, options: dict) -> dict:
        return {"last_timestamp": options.get("start_time", "1970-01-01T00:00:00Z")}

    @classmethod
    def record_timestamp(cls, record: dict) -> int:
        return _iso_epoch(record.get("eventTime", ""), "%Y-%m-%dT%H:%M:%SZ")

    def poll(self, state: dict) -> tuple[list[dict], dict, bool]:
        """One LookupEvents page. The [StartTime, EndTime] window is FIXED
        across a NextToken continuation (the reference builds the request
        object once per run, aliyun.py:66-77 — a token is only valid for
        the window that issued it); the checkpoint advances to the
        window's EndTime only when its final page arrives. Deliberate
        delta: the reference moves last_timestamp to EndTime on the FIRST
        page (aliyun.py:140-152) and its own comment admits the remaining
        pages are lost on a crash — holding the checkpoint until the
        window completes makes recovery at-least-once instead."""
        if state.get("next_token"):
            end_t = state["window_end"]  # continue the SAME window
        else:
            from datetime import datetime, timezone

            end_t = (self.now_fn() if self.now_fn else
                     datetime.now(timezone.utc).strftime(self.date_formatter()))
        return self._poll_window(state, end_t)

    def _poll_window(self, state: dict, end_t: str) -> tuple[list[dict], dict, bool]:
        if self.fetch is None:
            raise NotImplementedError(
                "aliyun_actiontrail requires a transport (the reference "
                "uses the public aliyun SDK's AcsClient); inject fetch=...")
        start_t = state.get("last_timestamp", "1970-01-01T00:00:00Z")
        params = {
            "MaxResults": str(self.MAX_RESULTS),
            "StartTime": start_t,
            "EndTime": end_t,  # aliyun.py:74
        }
        if state.get("next_token"):
            params["NextToken"] = state["next_token"]  # aliyun.py:148-150
        response = self.fetch(params)
        if "NextToken" in response:
            new_state = {"last_timestamp": start_t, "window_end": end_t,
                         "next_token": response["NextToken"]}
            return response.get("Events", []), new_state, True
        return response.get("Events", []), {"last_timestamp": end_t}, False

    def poll_between(self, start_state: dict, end_state: dict) -> list[dict]:
        """Replay the committed window exactly: EndTime pinned to the end
        offset's timestamp (ISO strings — the generic int() loop does not
        apply), NextToken pages until exhausted."""
        state = dict(start_state)
        end_t = state.get("window_end") or end_state.get("last_timestamp")
        out: list[dict] = []
        more = True
        while more:
            records, state, more = self._poll_window(
                state, state.get("window_end", end_t))
            out.extend(records)
        return out


# ---------------------------------------------------------------------------
# OneLogin events — client-credentials token per run, next_link pagination.
# ---------------------------------------------------------------------------


@streamalert_app
class OneLoginEventsApp(AppIntegration):
    """onelogin.py:28-255 OneLoginApp: a fresh OAuth2 client-credentials
    token per gather run (onelogin.py:77-109), GET /api/1/events with
    server-side ``since`` filtering, pagination via the response's
    pagination.next_link (onelogin.py:181-223); the checkpoint advances
    to the last event's created_at per page — safe here because the
    ``since`` filter is server-side and only applies to fresh runs.

    Injectables: ``token_fetch(token_url, client_id, client_secret) ->
    access_token`` (the grant_type=client_credentials POST) and
    ``fetch(url, headers, params) -> response dict``."""

    MAX_RESPONSE_LOGS = 50  # onelogin.py:31

    def __init__(self, auth: dict[str, str],
                 fetch: Callable[[str, dict, dict | None], dict] | None = None,
                 token_fetch: Callable[[str, str, str], str] | None = None):
        super().__init__(auth)
        self.fetch = fetch
        self.token_fetch = token_fetch
        self._token: str | None = None

    @classmethod
    def service(cls) -> str:
        return "onelogin"

    @classmethod
    def app_type(cls) -> str:
        return "onelogin_events"

    @classmethod
    def required_auth_info(cls) -> dict[str, dict]:
        # onelogin.py:225-250
        return {
            "region": {"format": re.compile(r"^(en|us)$")},
            "client_secret": {"format": re.compile(r"^[a-z0-9]{64}$")},
            "client_id": {"format": re.compile(r"^[a-z0-9]{64}$")},
        }

    def initial_state(self, options: dict) -> dict:
        return {"last_timestamp": options.get("start_time", "1970-01-01T00:00:00Z")}

    @classmethod
    def record_timestamp(cls, record: dict) -> int:
        # onelogin.py:49-50 date format; tolerate fractional seconds
        return _iso_epoch(record.get("created_at", ""),
                          "%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ")

    def _token_url(self) -> str:
        return f"https://api.{self.auth['region']}.onelogin.com/auth/oauth2/v2/token"

    def _events_url(self) -> str:
        return f"https://api.{self.auth['region']}.onelogin.com/api/1/events"

    def poll(self, state: dict) -> tuple[list[dict], dict, bool]:
        if self.fetch is None or self.token_fetch is None:
            raise NotImplementedError(
                "onelogin_events requires HTTP transports; inject "
                "fetch=... and token_fetch=...")
        if not state.get("next_page_url"):
            # fresh gather run: request a new token; continuation pages
            # reuse it (onelogin.py:86-88 caches per run the same way)
            self._token = None
        if self._token is None:
            self._token = self.token_fetch(
                self._token_url(), self.auth["client_id"],
                self.auth["client_secret"])
        headers = {"Authorization": f"bearer:{self._token}"}  # onelogin.py:106-107
        if state.get("next_page_url"):
            url, params = state["next_page_url"], None  # onelogin.py:187-189
        else:
            url, params = self._events_url(), {"since": state["last_timestamp"]}
        response = self.fetch(url, headers, params)
        next_link = (response.get("pagination") or {}).get("next_link")
        data = response.get("data") or []
        new_state = {"last_timestamp": state["last_timestamp"]}
        if data:
            new_state["last_timestamp"] = data[-1]["created_at"]  # onelogin.py:218
        more = bool(next_link) and bool(data)
        if more:
            new_state["next_page_url"] = next_link
        return data, new_state, more

    def poll_between(self, start_state: dict, end_state: dict) -> list[dict]:
        """ISO-string checkpoints (the generic int() loop does not apply):
        replay one full run from the start checkpoint, clipped on PARSED
        epochs — raw string compare would misorder fractional-second
        timestamps, and an early checkpoint-comparison break would drop
        pages tied at second granularity."""
        end_epoch = _iso_epoch(end_state.get("last_timestamp", ""),
                               "%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ")
        return self._replay_run(dict(start_state), end_epoch)


# ---------------------------------------------------------------------------
# Intercom admin activity logs — bearer token, pages.next pagination.
# ---------------------------------------------------------------------------


@streamalert_app
class IntercomAdminApp(AppIntegration):
    """intercom.py:25-104 IntercomApp: GET admin activity_logs with
    created_at_before=now / created_at_after=checkpoint, pagination via
    pages.next, value-level created_at filtering, checkpoint = max
    created_at seen (intercom.py:54-104). Deliberate delta: during
    pagination the filter stays at the RUN-START checkpoint (the
    reference filters each page against the previous page's max, which
    drops out-of-order entries across pages); the checkpoint advances to
    the run's max only when the run completes."""

    def __init__(self, auth: dict[str, str],
                 fetch: Callable[[str, dict, dict | None], dict] | None = None,
                 clock: Callable[[], float] = _time.time):
        super().__init__(auth)
        self.fetch = fetch
        self.clock = clock

    _LOGS_URL = "https://api.intercom.io/admins/activity_logs"

    @classmethod
    def service(cls) -> str:
        return "intercom"

    @classmethod
    def app_type(cls) -> str:
        return "intercom_admin"

    @classmethod
    def required_auth_info(cls) -> dict[str, dict]:
        # intercom.py:30-36
        return {"token": {"format": re.compile(r"^dG9r([0-9A-Za-z+/=]*)$")}}

    @classmethod
    def record_timestamp(cls, record: dict) -> int:
        return int(record.get("created_at", 0))

    def poll(self, state: dict) -> tuple[list[dict], dict, bool]:
        if self.fetch is None:
            raise NotImplementedError(
                "intercom_admin requires an HTTP transport; inject fetch=...")
        headers = {"Authorization": f"Bearer {self.auth['token']}",
                   "Accept": "application/json"}  # intercom.py:55-56
        last = int(state.get("last_timestamp", 0))
        if state.get("next_page_url"):
            url, params = state["next_page_url"], None  # intercom.py:62-65
        else:
            url = self._LOGS_URL
            params = {"created_at_before": int(self.clock()),
                      "created_at_after": last}  # intercom.py:67-68
        response = self.fetch(url, headers, params)
        activities = [a for a in response.get("activity_logs", [])
                      if int(a["created_at"]) > last]  # intercom.py:82-86
        run_max = max(
            [int(state.get("run_max", last))]
            + [int(a["created_at"]) for a in activities])
        next_page = (response.get("pages") or {}).get("next")
        if next_page and activities:
            return activities, {"last_timestamp": last, "run_max": run_max,
                                "next_page_url": next_page}, True
        return activities, {"last_timestamp": run_max}, False

    def poll_between(self, start_state: dict, end_state: dict) -> list[dict]:
        """Replay = one full run from the start checkpoint, clipped at the
        committed end's newest event (run_max while mid-pagination). The
        generic loop cannot be used: mid-run end offsets hold
        last_timestamp at the run start, which would skip the replay and
        silently drop the committed records."""
        end_ts = int(end_state.get("run_max",
                                   end_state.get("last_timestamp", 0)))
        return self._replay_run(
            {"last_timestamp": int(start_state.get("last_timestamp", 0))},
            end_ts)


# ---------------------------------------------------------------------------
# Box admin events — stream_position cursor within a run, chunk_size gate.
# ---------------------------------------------------------------------------


@streamalert_app
class BoxAdminEventsApp(AppIntegration):
    """box.py:30-195 BoxApp: admin_events with created_after on a fresh
    run, stream_position continuation within a run, more_to_poll while
    chunk_size fills (box.py:108-195). The JWT-RS256 client is the
    boxsdk even in the reference — transport injected as
    ``fetch(params) -> response dict``; the keyfile rides in auth."""

    MAX_CHUNK_SIZE = 500  # box.py:32

    def __init__(self, auth: dict[str, str],
                 fetch: Callable[[dict], dict] | None = None):
        super().__init__(auth)
        self.fetch = fetch

    @classmethod
    def service(cls) -> str:
        return "box"

    @classmethod
    def app_type(cls) -> str:
        return "box_admin_events"

    @classmethod
    def required_auth_info(cls) -> dict[str, dict]:
        # box.py:197+ — a JSON service-account keyfile (validated for
        # presence; its inner shape is the boxsdk's contract)
        return {"keyfile": {}}

    def initial_state(self, options: dict) -> dict:
        return {"last_timestamp": options.get("start_time", "1970-01-01T00:00:00Z")}

    @classmethod
    def record_timestamp(cls, record: dict) -> int:
        return _iso_epoch(record.get("created_at", ""),
                          "%Y-%m-%dT%H:%M:%S%z", "%Y-%m-%dT%H:%M:%SZ")

    def poll(self, state: dict) -> tuple[list[dict], dict, bool]:
        if self.fetch is None:
            raise NotImplementedError(
                "box_admin_events requires the boxsdk JWT client (external "
                "lib even in the reference); inject fetch=...")
        params = {"limit": self.MAX_CHUNK_SIZE}  # box.py:108
        if state.get("stream_position"):
            params["stream_position"] = state["stream_position"]  # box.py:114-115
        else:
            params["created_after"] = state["last_timestamp"]  # box.py:116-117
        response = self.fetch(params)
        entries = response.get("entries") or []
        if not entries:
            return [], {"last_timestamp": state["last_timestamp"]}, False
        more = int(response.get("chunk_size", 0)) >= self.MAX_CHUNK_SIZE  # box.py:184
        new_state = {"last_timestamp": entries[-1]["created_at"]}  # box.py:191
        if more:
            # the cursor is run-scoped, like the reference's instance attr
            new_state["stream_position"] = response["next_stream_position"]
        return entries, new_state, more

    def poll_between(self, start_state: dict, end_state: dict) -> list[dict]:
        """ISO-string checkpoints (the generic int() loop does not apply):
        replay = re-query created_after = start checkpoint, follow the
        stream cursor, clip at the committed end's epoch (box created_at
        can carry a UTC offset, so compare parsed epochs, never strings)."""
        end_epoch = _iso_epoch(end_state.get("last_timestamp", ""),
                               "%Y-%m-%dT%H:%M:%S%z", "%Y-%m-%dT%H:%M:%SZ")
        return self._replay_run(
            {"last_timestamp": start_state.get("last_timestamp")}, end_epoch)


# ---------------------------------------------------------------------------
# G Suite admin reports — reverse-chronological pages, boundary-id dedup.
# ---------------------------------------------------------------------------


class GSuiteReportsApp(AppIntegration):
    """gsuite.py:30-245 GSuiteReportsApp base: activities.list with
    startTime held for the whole run, nextPageToken pagination, results
    in REVERSE chronological order so the new checkpoint is the FIRST
    page's first item; events at exactly the boundary timestamp carry
    their uniqueQualifiers in the state to de-duplicate the next run
    (gsuite.py:132-195 — the reference stores them in the app context).
    The applicationName subtypes (gsuite.py:245-371) are generated below
    from _GSUITE_REPORT_TYPES. The googleapiclient service is external
    even in the reference — transport injected as
    ``fetch(application, start_time, page_token) -> results dict``."""

    def __init__(self, auth: dict[str, str],
                 fetch: Callable[[str, str, str | None], dict] | None = None):
        super().__init__(auth)
        self.fetch = fetch

    @classmethod
    def service(cls) -> str:
        return "gsuite"

    @classmethod
    def app_type(cls) -> str:
        return f"gsuite_{cls.application_name()}"

    @classmethod
    def application_name(cls) -> str:
        raise NotImplementedError("subclasses pin their applicationName")

    @classmethod
    def required_auth_info(cls) -> dict[str, dict]:
        # gsuite.py keyfile + delegation email
        return {"keyfile": {}, "delegation_email": {}}

    def initial_state(self, options: dict) -> dict:
        return {"last_timestamp": options.get("start_time", "1970-01-01T00:00:00Z"),
                "event_ids": []}

    @classmethod
    def record_timestamp(cls, record: dict) -> int:
        return _iso_epoch((record.get("id") or {}).get("time", ""),
                          "%Y-%m-%dT%H:%M:%S.%fZ", "%Y-%m-%dT%H:%M:%SZ")

    def poll(self, state: dict) -> tuple[list[dict], dict, bool]:
        if self.fetch is None:
            raise NotImplementedError(
                f"{self.app_type()} requires the googleapiclient service "
                "(external lib even in the reference); inject fetch=...")
        # startTime holds for the whole run (gsuite.py:142-144)
        query_start = state.get("query_start", state["last_timestamp"])
        results = self.fetch(self.application_name(), query_start,
                             state.get("next_page_token"))
        prev_ids = set(state.get("event_ids", []))
        activities = [a for a in results.get("items", [])
                      if a["id"]["uniqueQualifier"] not in prev_ids]  # gsuite.py:169-172
        token = results.get("nextPageToken")
        # reverse-chronological: the FIRST page's first item is the run's
        # newest event (gsuite.py:179-187); later pages carry it through
        if activities and not state.get("next_page_token"):
            pending_last = activities[0]["id"]["time"]
            pending_ids = [a["id"]["uniqueQualifier"] for a in activities
                           if a["id"]["time"] == pending_last]
        else:
            pending_last = state.get("pending_last", state["last_timestamp"])
            pending_ids = state.get("pending_ids", state.get("event_ids", []))
        if token:
            return activities, {
                "last_timestamp": state["last_timestamp"],
                "event_ids": sorted(prev_ids),
                "query_start": query_start,
                "next_page_token": token,
                "pending_last": pending_last,
                "pending_ids": pending_ids,
            }, True
        return activities, {"last_timestamp": pending_last,
                            "event_ids": pending_ids}, False

    def poll_between(self, start_state: dict, end_state: dict) -> list[dict]:
        """ISO-string checkpoints (the generic int() loop does not apply),
        and mid-run end offsets hold last_timestamp at the run start:
        replay = one full run from the start checkpoint (boundary ids
        filtered as usual), clipped at the committed end's newest event
        (pending_last while mid-pagination)."""
        end_epoch = _iso_epoch(
            end_state.get("pending_last", end_state.get("last_timestamp", "")),
            "%Y-%m-%dT%H:%M:%S.%fZ", "%Y-%m-%dT%H:%M:%SZ")
        return self._replay_run(
            {"last_timestamp": start_state.get("last_timestamp"),
             "event_ids": list(start_state.get("event_ids", []))}, end_epoch)


# the reference's 15 applicationName subtypes (gsuite.py:245-371), each a
# _type()-only subclass of the shared base; generated rather than spelled
# out — the reference's 15 hand-written one-method classes are pure
# boilerplate this loop replaces
_GSUITE_REPORT_TYPES = (
    "access_transparency", "admin", "calendar", "drive", "gcp", "groups",
    "groups_enterprise", "gplus", "login", "meet", "mobile", "rules",
    "saml", "token", "user_accounts",
)

for _report_type in _GSUITE_REPORT_TYPES:
    streamalert_app(type(
        f"GSuite{_report_type.title().replace('_', '')}ReportsApp",
        (GSuiteReportsApp,),
        {
            "__doc__": (f"G Suite {_report_type} activity report "
                        f"(gsuite.py:245-371): applicationName-only "
                        f"subclass of GSuiteReportsApp."),
            "application_name": classmethod(
                lambda cls, _t=_report_type: _t),
        },
    ))

# admin keeps an importable name (pre-round-5 module API)
GSuiteAdminReportsApp = APP_REGISTRY["gsuite_admin"]


# ---------------------------------------------------------------------------
# Salesforce apps — OAuth token flow, API-version discovery, EventLogFile
# query + CSV fetch (salesforce.py:1-460).
# ---------------------------------------------------------------------------


class SalesforceApp(AppIntegration):
    """salesforce.py:33-405 SalesforceApp: each run (1) requests an OAuth
    token (grant_type=password with password+security_token concatenated,
    salesforce.py:103-137), (2) discovers the LATEST supported API
    version from /services/data/ (salesforce.py:259-290), (3) queries
    EventLogFile rows WHERE LogDate > last_timestamp AND EventType =
    _type() (salesforce.py:292-356), (4) GETs each LogFile and yields its
    CSV data lines minus the header (salesforce.py:358-378), then
    advances last_timestamp to the run's start wall clock formatted
    %Y-%m-%dT%H:%M:%SZ (salesforce.py:381-404). Log files are daily
    batches — there is no intra-run pagination, so one poll is one full
    run and more_to_poll is always False.

    ``fetch(method, url, headers, data)`` is the injectable transport:
    returns parsed JSON (token / versions / file list) or raw CSV text
    (log content), None on failure. ``clock`` injectable for
    deterministic checkpoint advance."""

    # URL construction mirrors salesforce.py:59-70 exactly (the query is
    # shipped pre-encoded with '+' separators)
    _TOKEN_URL = "https://login.salesforce.com/services/oauth2/token"  # noqa: S105
    _QUERY_URL = ("{instance_url}/services/data/v{api_version}/"
                  "{query}{start_time}{event_type}")
    _QUERY_FILTERS = ("query?q=SELECT+Id+,+EventType+,+LogFile+,+LogDate+,"
                      "+LogFileLength+FROM+EventLogFile+")
    _CREATE_AFTER = "WHERE+LogDate+>+{}+"

    def __init__(self, auth: dict[str, str],
                 fetch: Callable[[str, str, dict, dict | None], object] | None = None,
                 clock: Callable[[], float] = _time.time):
        super().__init__(auth)
        self.fetch = fetch
        self.clock = clock

    @classmethod
    def service(cls) -> str:
        return "salesforce"

    @classmethod
    def _type(cls) -> str:
        raise NotImplementedError("subclasses pin their EventType")

    @classmethod
    def app_type(cls) -> str:
        return f"salesforce_{cls._type()}"

    @classmethod
    def date_formatter(cls) -> str:
        """Salesforce API date format (salesforce.py:96-99)."""
        return "%Y-%m-%dT%H:%M:%SZ"

    @classmethod
    def required_auth_info(cls) -> dict[str, dict]:
        # salesforce.py:143-174 — identical formats
        return {
            "client_id": {"format": re.compile(r"^[a-zA-Z0-9._#@]{85}$")},
            "client_secret": {"format": re.compile(r"^[0-9]{19}$")},
            "username": {"format": re.compile(
                r"^[A-Za-z0-9-_.+]+@[A-Za-z0-9-.]+\.[A-Za-z]{2,}$")},
            "password": {"format": re.compile(r".*")},
            "security_token": {"format": re.compile(r"^[a-zA-Z0-9]{24}$")},
        }

    def initial_state(self, options: dict) -> dict:
        return {"last_timestamp": options.get(
            "start_time", "1970-01-01T00:00:00Z")}

    @classmethod
    def record_timestamp(cls, record: dict) -> int:
        # LogDate shape: 2014-03-14T00:00:00.000+0000 (salesforce.py:321)
        return _iso_epoch(record.get("log_date", ""),
                          "%Y-%m-%dT%H:%M:%S.%f%z", "%Y-%m-%dT%H:%M:%SZ")

    @classmethod
    def record_payload(cls, record: dict) -> str:
        # the service emits CSV event log files; ship the raw data line
        # (the reference hands splitlines()[1:] straight to the
        # classifier, salesforce.py:378-379)
        return record["raw"]

    def _request_token(self) -> tuple[dict, str] | None:
        """OAuth headers + instance url, or None (salesforce.py:103-137)."""
        data = {
            "grant_type": "password",
            "client_id": self.auth["client_id"],
            "client_secret": self.auth["client_secret"],
            "username": self.auth["username"],
            # password and security token concatenated (salesforce.py:113)
            "password": "{}{}".format(self.auth["password"],
                                      self.auth["security_token"]),
            "response_type": "code",
            "redirect_uri": self._TOKEN_URL,
        }
        response = self.fetch(
            "POST", self._TOKEN_URL,
            {"Content-Type": "application/x-www-form-urlencoded"}, data)
        if not isinstance(response, dict):
            return None
        token, instance_url = response.get("access_token"), response.get("instance_url")
        if not (token and instance_url):
            return None
        return ({"Content-Type": "application/json",
                 "Authorization": f"Bearer {token}"}, instance_url)

    def _get_latest_api_version(self, headers: dict, instance_url: str) -> str | None:
        """Largest advertised API version as a string, or None
        (salesforce.py:259-290)."""
        response = self.fetch("GET", f"{instance_url}/services/data/", headers, None)
        if not isinstance(response, list):
            return None
        versions = [float(v.get("version", 0)) for v in response]
        if not versions or max(versions) == 0.0:
            return None
        return str(sorted(versions)[-1])

    def _list_log_files(self, headers: dict, instance_url: str,
                        api_version: str, last_timestamp: str) -> list[dict]:
        """EventLogFile records newer than the checkpoint
        (salesforce.py:292-356)."""
        url = self._QUERY_URL.format(
            instance_url=instance_url,
            api_version=api_version,
            query=self._QUERY_FILTERS,
            start_time=self._CREATE_AFTER.format(last_timestamp),
            event_type="AND+EventType+=+'{}'".format(self._type()),
        )
        response = self.fetch("GET", url, headers, None)
        if not isinstance(response, dict):
            return []
        return [r for r in (response.get("records") or []) if r.get("LogFile")]

    def _fetch_event_logs(self, headers: dict, instance_url: str,
                          log_file: dict) -> list[dict]:
        """CSV data lines of one log file, header dropped
        (salesforce.py:358-378)."""
        text = self.fetch("GET", f"{instance_url}/{log_file['LogFile']}",
                          headers, None)
        if not isinstance(text, str):
            return []
        log_date = log_file.get("LogDate", "")
        return [{"raw": line, "log_date": log_date}
                for line in text.splitlines()[1:]]

    def poll(self, state: dict) -> tuple[list[dict], dict, bool]:
        if self.fetch is None:
            raise NotImplementedError(
                f"{self.app_type()} requires an HTTP transport; inject "
                "fetch=... (env-dependent by design — see "
                "streaming/outputs.py)")
        from datetime import datetime, timezone

        # run start time is the next checkpoint (salesforce.py:84,400-403)
        current_time = int(self.clock())
        auth = self._request_token()
        if auth is None:
            return [], dict(state), False
        headers, instance_url = auth
        api_version = self._get_latest_api_version(headers, instance_url)
        if api_version is None:
            return [], dict(state), False
        records: list[dict] = []
        for log_file in self._list_log_files(
                headers, instance_url, api_version,
                state.get("last_timestamp", "")):
            records.extend(self._fetch_event_logs(headers, instance_url, log_file))
        new_last = datetime.fromtimestamp(current_time, timezone.utc).strftime(
            self.date_formatter())
        return records, {"last_timestamp": new_last}, False

    def poll_between(self, start_state: dict, end_state: dict) -> list[dict]:
        """ISO-string checkpoints: replay is one full run from the start
        checkpoint (LogDate > start filter re-applies server-side),
        clipped at the committed end timestamp."""
        end_epoch = _iso_epoch(end_state.get("last_timestamp", ""),
                               "%Y-%m-%dT%H:%M:%SZ")
        return self._replay_run(dict(start_state), end_epoch)


# the reference's 5 EventType subclasses (salesforce.py:408-460), each a
# _type()-only subclass; generated like the gsuite report subtypes
_SALESFORCE_EVENT_TYPES = ("console", "login", "loginas", "report",
                           "reportexport")

for _sf_type in _SALESFORCE_EVENT_TYPES:
    streamalert_app(type(
        f"Salesforce{_sf_type.title()}App",
        (SalesforceApp,),
        {
            "__doc__": (f"Salesforce {_sf_type} event log app "
                        f"(salesforce.py:408-460): EventType-only "
                        f"subclass of SalesforceApp."),
            "_type": classmethod(lambda cls, _t=_sf_type: _t),
        },
    ))


# ---------------------------------------------------------------------------
# The Spark DataSource
# ---------------------------------------------------------------------------

APP_SOURCE_SCHEMA = "record string, log_type string, event_timestamp bigint"


def _build_app(options: dict, transports: dict | None = None) -> AppIntegration:
    app_type = options.get("app", "synthetic")
    if app_type not in APP_REGISTRY:
        raise ValueError(f"unknown app type: {app_type!r} "
                         f"(registered: {sorted(APP_REGISTRY)})")
    cls = APP_REGISTRY[app_type]
    auth = {k[5:]: v for k, v in options.items() if k.startswith("auth_")}
    # transports captured at DataSource construction (driver) win over the
    # module registry, which is empty in a fresh python worker process
    reg = TRANSPORTS if transports is None else transports
    kwargs = dict(reg.get(app_type, {}))
    if cls is SyntheticApp:
        if "end_timestamp" in options:
            kwargs["end_timestamp"] = int(options["end_timestamp"])
        if "page_size" in options:
            kwargs["page_size"] = int(options["page_size"])
    return cls(auth, **kwargs)


def _rows(app: AppIntegration, records: list[dict]) -> Iterator[tuple]:
    log_type = f"{app.service()}:{app.app_type()}"
    for r in records:
        yield (app.record_payload(r), log_type, app.record_timestamp(r))


def make_app_poller_datasource():
    """Build the DataSource class (deferred pyspark import keeps this
    module importable without an active Spark context)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    class AppBatchReader(DataSourceReader):
        """Backfill: the gather loop run to exhaustion — the reference's
        successive-invocation chain (app_base.py:236-258 _finalize ->
        _invoke_successive_app) collapsed into one bounded loop."""

        def __init__(self, options, transports):
            self.options = dict(options)
            self.transports = transports

        def partitions(self):
            return [InputPartition(0)]

        def read(self, partition):
            app = _build_app(self.options, self.transports)
            state = app.initial_state(self.options)
            more = True
            polls = 0
            while more:
                # bounded backfill: a paginating app that never reports
                # completion must fail loudly, not hang the Spark task
                polls += 1
                if polls > 100_000:
                    raise RuntimeError(
                        f"app backfill exceeded 100k polls without "
                        f"completing (app={app.app_type()}); the service "
                        f"is not terminating its pagination")
                records, state, more = app.poll(state)
                yield from _rows(app, records)

    class AppStreamReader(SimpleDataSourceStreamReader):
        """One poll per microbatch; Spark's offset log is the
        parameter-store checkpoint (app_base.py:222-247)."""

        def __init__(self, options, transports):
            self.options = dict(options)
            self.transports = transports
            self._app = None

        def __getstate__(self):
            # the cached app may hold unpicklable live handles; the
            # captured transports (closures via cloudpickle) are enough
            # to rebuild it on the other side
            state = dict(self.__dict__)
            state["_app"] = None
            return state

        def _get_app(self) -> AppIntegration:
            if self._app is None:
                self._app = _build_app(self.options, self.transports)
            return self._app

        def initialOffset(self) -> dict:
            return self._get_app().initial_state(self.options)

        def read(self, start: dict):
            app = self._get_app()
            records, new_state, more = app.poll(dict(start))
            rows = list(_rows(app, records))
            if not rows and not more:
                # no data and nothing pending: hold the offset STABLE so
                # the engine can see quiescence (a mutating offset would
                # make processAllAvailable spin forever)
                return iter([]), dict(start)
            return iter(rows), new_state

        def readBetweenOffsets(self, start: dict, end: dict):
            app = self._get_app()
            return iter(list(_rows(app, app.poll_between(dict(start), dict(end)))))

        def commit(self, end: dict) -> None:
            pass  # the engine's offset log is the durable checkpoint

    class AppPollerDataSource(DataSource):
        def __init__(self, options):
            super().__init__(options)
            # snapshot the transport registry NOW (driver-side): the
            # instance pickles to the streaming python worker with the
            # fetch closures serialized by value (cloudpickle), where the
            # module-level TRANSPORTS dict would be empty
            self._transports = {k: dict(v) for k, v in TRANSPORTS.items()}

        @classmethod
        def name(cls) -> str:
            return "streamalert_app"

        def schema(self) -> str:
            return APP_SOURCE_SCHEMA

        def reader(self, schema) -> AppBatchReader:
            return AppBatchReader(self.options, self._transports)

        def simpleStreamReader(self, schema) -> AppStreamReader:
            return AppStreamReader(self.options, self._transports)

    return AppPollerDataSource


def register_app_source(spark) -> None:
    """Register format 'streamalert_app' on this session:

        spark.readStream.format('streamalert_app')
             .option('app', 'synthetic').load()
    """
    spark.dataSource.register(make_app_poller_datasource())
