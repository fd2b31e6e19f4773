"""App-source pollers as a native Spark Python DataSource — the last
SURVEY §2.1 row, re-expressed Spark-first.

The reference runs each third-party API poller (duo, slack, box, ...) as
a scheduled Lambda: `AppIntegration.gather()` loops `_gather_logs()`
against the service API, checkpoints `_last_timestamp` in the parameter
store, re-invokes itself while `_more_to_poll`, and ships batches to the
classifier (reference: streamalert/apps/app_base.py:65-390,
apps/_apps/duo.py:86-161, apps/_apps/__init__.py StreamAlertApp
registry). On Spark the SAME loop is a streaming SOURCE: each microbatch
is one poll, the engine's offset log replaces the parameter-store
checkpoint (restart resumes from the committed last_timestamp), and
`more_to_poll` simply means the next microbatch has data waiting.

Implemented with the Spark 4 Python DataSource API:
- `AppPollerDataSource` registers as format "streamalert_app";
- batch reads run the gather loop to exhaustion (backfill);
- streaming reads use SimpleDataSourceStreamReader — designed for
  low-volume driver-side sources exactly like an API poller: offsets are
  {"last_timestamp": ...} dicts, `read(start)` performs ONE poll
  (mirroring one Lambda invocation), and `readBetweenOffsets` replays a
  committed range by re-querying the API for that time window (the same
  replay duo/box support via their mintime/created_after parameters).

HTTP transports stay injectable exactly like the output connectors
(`streaming/outputs.py`): the request SHAPE (duo's signed-header
construction, pagination, checkpoint advance) is ported and unit-tested;
the network call is a pluggable fetch function, env-dependent by design.
"""

from __future__ import annotations

import json
import re
from abc import ABC, abstractmethod
from collections.abc import Callable, Iterator

APP_REGISTRY: dict[str, type["AppIntegration"]] = {}


def streamalert_app(cls: type["AppIntegration"]) -> type["AppIntegration"]:
    """Mirror of the reference's StreamAlertApp registry decorator
    (apps/_apps/__init__.py): registers the app under its type name."""
    APP_REGISTRY[cls.app_type()] = cls
    return cls


class AppIntegration(ABC):
    """Transport-free port of apps/app_base.py:65-390.

    State is EXPLICIT (passed in, returned out) instead of living on the
    instance + parameter store: Spark's offset log owns the checkpoint.
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
        """Auth-key presence + format validation (app_base.py:218,
        config validate_auth): raises ValueError on a missing key or a
        format mismatch."""
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

    @abstractmethod
    def poll(self, last_timestamp: int) -> tuple[list[dict], int, bool]:
        """ONE poll against the service from (exclusive) last_timestamp.

        Returns (records, new_last_timestamp, more_to_poll) — the triple
        the reference tracks as (logs, self._last_timestamp,
        self._more_to_poll) in duo.py:129-161.
        """

    def poll_between(self, start_ts: int, end_ts: int) -> list[dict]:
        """Replay a committed window [start_ts+1, end_ts] for streaming
        recovery — re-query by time range, the capability every
        timestamp-paginated API in the reference has (duo mintime, box
        created_after). Default: iterate poll() and clip."""
        out: list[dict] = []
        ts = start_ts
        more = True
        while more and ts < end_ts:
            records, ts, more = self.poll(ts)
            out.extend(r for r in records if r.get("timestamp", 0) <= end_ts)
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

    def __init__(self, auth: dict[str, str], end_timestamp: int = 250):
        super().__init__(auth)
        self.end_timestamp = int(end_timestamp)

    @classmethod
    def service(cls) -> str:
        return "synthetic"

    @classmethod
    def app_type(cls) -> str:
        return "synthetic"

    def poll(self, last_timestamp: int) -> tuple[list[dict], int, bool]:
        start = int(last_timestamp) + 1  # mintime = last + 1 (duo.py:131)
        if start > self.end_timestamp:
            return [], int(last_timestamp), False
        end = min(start + self.MAX_RESPONSE_LOGS - 1, self.end_timestamp)
        records = [
            {"timestamp": ts, "event_id": f"ev-{ts}", "result": "SUCCESS"}
            for ts in range(start, end + 1)
        ]
        # last = final record's timestamp (duo.py:156); more when the page
        # filled (duo.py:161)
        return records, end, len(records) >= self.MAX_RESPONSE_LOGS


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


@streamalert_app
class DuoAdminApp(AppIntegration):
    """duo_admin poller (duo.py:198-214 DuoAdminApp): admin-log endpoint,
    signed requests, mintime pagination. ``fetch`` is the injectable
    transport: (url, headers, params) -> response dict with a 'response'
    list — absent a transport, polling raises (env-dependent by design,
    like the output connectors' HTTP clients)."""

    _ENDPOINT = "/admin/v1/logs/administrator"

    def __init__(self, auth: dict[str, str],
                 fetch: Callable[[str, dict, dict], dict] | None = None):
        super().__init__(auth)
        self.fetch = fetch

    @classmethod
    def service(cls) -> str:
        return "duo"

    @classmethod
    def app_type(cls) -> str:
        return "duo_admin"

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

    def poll(self, last_timestamp: int) -> tuple[list[dict], int, bool]:
        if self.fetch is None:
            raise NotImplementedError(
                "duo_admin requires an HTTP transport; inject fetch=... "
                "(env-dependent by design — see streaming/outputs.py)")
        from datetime import datetime, timezone

        hostname = self.auth["api_hostname"]
        params = {"mintime": str(int(last_timestamp) + 1)}  # duo.py:131
        date = datetime.now(timezone.utc).strftime("%a, %d %b %Y %H:%M:%S -0000")
        headers = duo_signed_headers(
            hostname, self._ENDPOINT, params,
            self.auth["integration_key"], self.auth["secret_key"], date)
        response = self.fetch(f"https://{hostname}{self._ENDPOINT}", headers, params)
        logs = response.get("response") or []
        if not logs:
            return [], int(last_timestamp), False
        return logs, logs[-1]["timestamp"], len(logs) >= self.MAX_RESPONSE_LOGS


# ---------------------------------------------------------------------------
# The Spark DataSource
# ---------------------------------------------------------------------------

APP_SOURCE_SCHEMA = "record string, log_type string, event_timestamp bigint"


def _build_app(options: dict) -> AppIntegration:
    app_type = options.get("app", "synthetic")
    if app_type not in APP_REGISTRY:
        raise ValueError(f"unknown app type: {app_type!r} "
                         f"(registered: {sorted(APP_REGISTRY)})")
    cls = APP_REGISTRY[app_type]
    auth = {k[5:]: v for k, v in options.items() if k.startswith("auth_")}
    kwargs = {}
    if "end_timestamp" in options and cls is SyntheticApp:
        kwargs["end_timestamp"] = int(options["end_timestamp"])
    return cls(auth, **kwargs)


def _rows(app: AppIntegration, records: list[dict]) -> Iterator[tuple]:
    log_type = f"{app.service()}:{app.app_type()}"
    for r in records:
        yield (json.dumps(r, sort_keys=True), log_type, int(r.get("timestamp", 0)))


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

        def __init__(self, options):
            self.options = dict(options)

        def partitions(self):
            return [InputPartition(0)]

        def read(self, partition):
            app = _build_app(self.options)
            ts = int(self.options.get("start_timestamp", 0))
            more = True
            while more:
                records, ts, more = app.poll(ts)
                yield from _rows(app, records)

    class AppStreamReader(SimpleDataSourceStreamReader):
        """One poll per microbatch; Spark's offset log is the
        parameter-store checkpoint (app_base.py:222-247)."""

        def __init__(self, options):
            self.options = dict(options)
            self._app = None

        def _get_app(self) -> AppIntegration:
            if self._app is None:
                self._app = _build_app(self.options)
            return self._app

        def initialOffset(self) -> dict:
            return {"last_timestamp": int(self.options.get("start_timestamp", 0))}

        def read(self, start: dict):
            app = self._get_app()
            records, new_ts, _more = app.poll(int(start["last_timestamp"]))
            return iter(list(_rows(app, records))), {"last_timestamp": int(new_ts)}

        def readBetweenOffsets(self, start: dict, end: dict):
            app = self._get_app()
            records = app.poll_between(
                int(start["last_timestamp"]), int(end["last_timestamp"]))
            return iter(list(_rows(app, records)))

        def commit(self, end: dict) -> None:
            pass  # the engine's offset log is the durable checkpoint

    class AppPollerDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "streamalert_app"

        def schema(self) -> str:
            return APP_SOURCE_SCHEMA

        def reader(self, schema) -> AppBatchReader:
            return AppBatchReader(self.options)

        def simpleStreamReader(self, schema) -> AppStreamReader:
            return AppStreamReader(self.options)

    return AppPollerDataSource


def register_app_source(spark) -> None:
    """Register format 'streamalert_app' on this session:

        spark.readStream.format('streamalert_app')
             .option('app', 'synthetic').load()
    """
    spark.dataSource.register(make_app_poller_datasource())
