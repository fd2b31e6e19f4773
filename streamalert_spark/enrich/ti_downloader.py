"""Threat-intel feed ingester — the job that POPULATES the IOC table
consumed by ``enrich.threat_intel.ThreatIntel``.

Reference behavior (streamalert/threat_intel_downloader/main.py:41-347):
a scheduled Lambda queries the ThreatStream `intelligence` API with a
status/type/sub-type query string (main.py:298-312), follows the
paginated ``meta.next`` cursor until it is empty or the offset reaches
a threshold (main.py:116-147), retries failed responses up to the
backoff cap — including 401/unknown codes, whose exception message says
"do not retry" but whose ThreatStreamRequestsError type IS in the
reference's EXCEPTIONS_TO_BACKOFF tuple, so the @backoff decorator
retries them anyway (main.py:116-147 + the backoff wiring; the quirk is
ported faithfully), filters each object to the
configured sources and projects it to ``ioc_keys`` (main.py:208-257),
converts the expiration time to epoch seconds with a 90-days-from-now
default (main.py:184-206), and batch-writes
(ioc_value, ioc_type, sub_type, source, expiration_ts) rows to DynamoDB
(main.py:259-277). The Lambda re-invokes itself with ``next_url`` to
continue past its own time limit (main.py:170-182).

Spark mapping: the feed protocol is inherently SERIAL (each page hands
you the next cursor), so the fetch loop runs on the driver — exactly
like the app-source pollers (`sources/app_source.py`) — with the HTTP
transport injectable (nothing network-backed is buildable in this
sandbox; the request/response SHAPE is what's ported and tested). The
Lambda self-invocation chain becomes a plain loop with the same
threshold stop; the DynamoDB batch write becomes a snapshot write of the
ioc Parquet table, deduped by ioc_value keeping the LAST-ARRIVED row
(Dynamo put_item last-write-wins is arrival-order — a later page's row
overwrites even when its expiration is smaller). Consumers read the table
through ``load_ioc_table``, which applies the expiration filter the
reference delegates to DynamoDB's TTL sweeper.

Scale: a feed run is bounded by the reference's own 500k-object API
index cap — metadata-scale next to the event stream; the parquet write
and the downstream broadcast-gated join are the distributed parts.
"""

from __future__ import annotations

import calendar
from collections.abc import Callable
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from streamalert_spark.session import local_rows_df

# main.py:43-51 constants
API_URL = "https://api.threatstream.com"
API_RESOURCE = "intelligence"
IOC_STATUS = "active"
API_MAX_LIMIT = 1000
API_MAX_INDEX = 500000
MAX_RETRIES = 3  # main.py:57 BACKOFF_MAX_RETRIES

IOC_TABLE_COLUMNS = ["ioc_value", "ioc_type", "sub_type", "source",
                     "expiration_ts"]


class FeedRequestError(Exception):
    """Non-retryable feed response (401 / unknown status)."""


class FeedRetryError(Exception):
    """Retryable feed response (5xx / transport timeout)."""


class ThreatStreamFeed:
    """The feed protocol: query construction, pagination, filtering.

    ``fetch(url) -> (status_code, body_dict)`` is the injectable
    transport. Everything else — the query string grammar, the
    next-cursor/threshold stop rule, retry classification, source
    filtering, key projection, expiry epoch conversion — is pure and
    unit-tested for parity with the reference.
    """

    def __init__(
        self,
        api_user: str,
        api_key: str,
        ioc_types: list[str],
        excluded_sub_types: list[str],
        ioc_sources: list[str],
        ioc_keys: list[str] | None = None,
        fetch: Callable[[str], tuple[int, dict]] | None = None,
        now_epoch: int | None = None,
    ):
        self.api_user = api_user
        self.api_key = api_key
        self.ioc_types = ioc_types
        self.excluded_sub_types = excluded_sub_types
        # main.py:250-252: substring match against obj['source'].lower()
        self.ioc_sources = [s.lower() for s in ioc_sources]
        # main.py:321-322 config 'ioc_keys' projection
        self.ioc_keys = ioc_keys or ["value", "itype", "source", "type",
                                     "expiration_ts"]
        self.fetch = fetch
        self._now_epoch = now_epoch

    # -- query / url construction (main.py:298-312) -------------------------
    def query_string(self) -> str:
        return '(status="{}")+AND+({})+AND+NOT+({})'.format(
            IOC_STATUS,
            "+OR+".join(f'type="{t}"' for t in self.ioc_types),
            "+OR+".join(f'itype="{t}"' for t in self.excluded_sub_types),
        )

    def initial_url(self) -> str:
        return "/api/v2/{}/?username={}&api_key={}&limit={}&q={}".format(
            API_RESOURCE, self.api_user, self.api_key, API_MAX_LIMIT,
            self.query_string())

    @property
    def threshold(self) -> int:
        # main.py:341-342
        return API_MAX_INDEX - API_MAX_LIMIT

    # -- expiry (main.py:184-206) -------------------------------------------
    def epoch_time(self, time_str: str | None, days: int = 90) -> int:
        if not time_str:
            now = (self._now_epoch if self._now_epoch is not None
                   else calendar.timegm(datetime.utcnow().utctimetuple()))
            return now + int(timedelta(days=days).total_seconds())
        # raises ValueError on malformed input, like the reference
        utc = datetime.strptime(time_str, "%Y-%m-%dT%H:%M:%S.%fZ")
        return calendar.timegm(utc.timetuple())

    # -- object filter + projection (main.py:208-257) -------------------------
    def process_objects(self, objects: list[dict]) -> list[dict]:
        results = []
        for obj in objects:
            for source in self.ioc_sources:
                if source in obj["source"].lower():
                    row = {k: v for k, v in obj.items() if k in self.ioc_keys}
                    row["expiration_ts"] = self.epoch_time(
                        row.get("expiration_ts"))
                    results.append(row)
        return results

    # -- one page (main.py:116-147) -------------------------------------------
    def read_page(self, url: str) -> tuple[list[dict], str | None]:
        """Fetch one page, retrying ANY failure up to MAX_RETRIES before
        raising; returns (processed rows, next_url or None when
        pagination must stop). Retry parity note: the reference's 401/
        unknown-status messages say "do not retry", but the exception
        type it raises is in EXCEPTIONS_TO_BACKOFF, so its @backoff
        decorator retries them up to the same cap as 5xx — the quirk is
        ported as-is; only the exception CLASS differs by status."""
        if self.fetch is None:
            raise NotImplementedError(
                "ThreatStreamFeed requires an HTTP transport; inject "
                "fetch=... (env-dependent by design)")
        last_err: Exception | None = None
        for _ in range(MAX_RETRIES):
            status, body = self.fetch(API_URL + url)
            if status == 200:
                rows = self.process_objects(body.get("objects") or [])
                meta = body.get("meta") or {}
                nxt = meta.get("next")
                # main.py:134-138: stop when next empty OR offset reached
                # the index threshold
                if not (nxt and meta.get("offset", 0) < self.threshold):
                    nxt = None
                return rows, nxt
            if status == 401:
                last_err = FeedRequestError(
                    "Response status code 401, unauthorized.")
            elif status == 500:
                last_err = FeedRetryError(
                    "Response status code 500, retry now.")
            else:
                last_err = FeedRequestError(
                    f"Unknown status code {status}, do not retry.")
        raise last_err  # retries exhausted

    def run(self, next_url: str | None = None,
            max_pages: int | None = None) -> list[dict]:
        """The full pagination chain (the reference's Lambda
        self-invocation loop, main.py:149-182, as a plain loop).
        ``max_pages`` bounds a single run the way the Lambda's remaining
        time did; resume by passing the returned cursor back in — the
        cursor is exposed via ``self.last_cursor`` after each run."""
        url = next_url or self.initial_url()
        rows: list[dict] = []
        pages = 0
        self.last_cursor: str | None = url
        while url is not None:
            if max_pages is not None and pages >= max_pages:
                break
            page_rows, url = self.read_page(url)
            rows.extend(page_rows)
            pages += 1
            self.last_cursor = url
        return rows


def ingest_feed(
    spark: SparkSession,
    feed: ThreatStreamFeed,
    out_path: str,
    next_url: str | None = None,
) -> DataFrame:
    """Run the feed to exhaustion and write the ioc Parquet table
    snapshot: (ioc_value, ioc_type, sub_type, source, expiration_ts),
    deduped by ioc_value keeping the LAST-ARRIVED row — DynamoDB
    put_item last-write-wins is arrival-order (main.py:259-277), so a
    later page's row overwrites even when its expiration is SMALLER.
    Returns the written frame."""
    rows = feed.run(next_url=next_url)
    # the arrival sequence IS the dedup key's tiebreak (put_item order)
    records = [
        (seq, r["value"], r["type"], r["itype"], r["source"],
         int(r["expiration_ts"]))
        for seq, r in enumerate(rows)
    ]
    # VALUES-style local relation so downstream size gates see real stats
    df = local_rows_df(
        spark,
        records,
        "seq bigint, ioc_value string, ioc_type string, sub_type string, "
        "source string, expiration_ts bigint",
    )
    deduped = (
        df.groupBy("ioc_value")
        .agg(
            F.max_by("ioc_type", "seq").alias("ioc_type"),
            F.max_by("sub_type", "seq").alias("sub_type"),
            F.max_by("source", "seq").alias("source"),
            F.max_by("expiration_ts", "seq").alias("expiration_ts"),
        )
        .select(*IOC_TABLE_COLUMNS)
    )
    deduped.write.mode("overwrite").parquet(out_path)
    return deduped


def load_ioc_table(spark: SparkSession, path: str,
                   now_epoch: int) -> DataFrame:
    """Read the ioc table, dropping expired entries — the filter the
    reference delegates to DynamoDB's TTL on expiration_ts."""
    return (
        spark.read.parquet(path)
        .filter(F.col("expiration_ts") > F.lit(int(now_epoch)))
    )


def fake_feed_transport(pages: list[dict]) -> Callable[[str], tuple[int, dict]]:
    """A deterministic in-memory transport for tests/demos: serves
    ``pages`` in next_url-chain order. Page i's meta.next must point at
    a key identifying page i+1 (or None)."""
    by_url: dict[str | None, dict] = {}
    for i, page in enumerate(pages):
        # page 0 answers the initial /api/v2/ query URL; later pages are
        # addressed by the _url their predecessor's meta.next named
        by_url[page.get("_url") if i else None] = page

    def fetch(full_url: str) -> tuple[int, dict]:
        assert full_url.startswith(API_URL)
        url = full_url[len(API_URL):]
        if url.startswith(f"/api/v2/{API_RESOURCE}/"):
            page = by_url.get(None)
        else:
            page = by_url.get(url)
        if page is None:
            return 404, {}
        status = page.get("_status", 200)
        if status != 200 and page.get("_then_ok"):
            # consume the failure once, then succeed (retry testing)
            page["_status"] = 200
        return status, {k: v for k, v in page.items()
                        if not k.startswith("_")}

    return fetch


__all__ = [
    "ThreatStreamFeed", "ingest_feed", "load_ioc_table",
    "fake_feed_transport", "FeedRequestError", "FeedRetryError",
    "IOC_TABLE_COLUMNS", "API_MAX_INDEX", "API_MAX_LIMIT",
]
