"""Scheduled queries ("StreamQuery") — parameterized SQL packs on a clock,
results fed back into the stream.

Reference (streamalert/scheduled_queries/):
- QueryPackConfiguration registers a named, tagged, parameterized SQL string
  (query_packs/configuration.py:19-61); parameters substitute via
  str.format (configuration.py:40-58);
- time macros computed from the invocation clock: utcdatehour_minus1hour,
  utcdatehour, utctimestamp, utcisotime, ... (query_packs/parameters.py:24-76),
  plus callable custom params (parameters.py:71-76);
- packs are selected by tag per schedule tick (manager.py:235-253);
- the nonblocking Athena start/poll/collect loop (command/processor.py:32-56)
  collapses to a synchronous spark.sql call — Spark IS the executor;
- results serialize back into the input stream as the 'streamquery:version'
  log type (streamalert/kinesis.py:29-86, conf/schemas/streamquery.json) so
  rules can fire on aggregates.

Scale: each pack is a full Spark SQL query over the dt-partitioned store —
partition pruning comes from the dt parameter the macros inject, exactly the
reference's convention (sample/athena.py:36).
"""

from __future__ import annotations

import json
import time as _time
from collections.abc import Callable
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from streamalert_spark.session import local_rows_df


def generate_time_parameters(now: datetime | None = None) -> dict[str, str]:
    """The reference's time-macro table (query_packs/parameters.py:31-76).
    All values derive from one UTC clock read."""
    now = now or datetime.now(timezone.utc)
    hour_fmt = "%Y-%m-%d-%H"

    def minus(hours: int = 0, days: int = 0) -> str:
        from datetime import timedelta

        return (now - timedelta(hours=hours, days=days)).strftime(hour_fmt)

    return {
        "utcdatehour_minus1hour": minus(hours=1),
        "utcdatehour_minus2hour": minus(hours=2),
        "utcdatehour_minus1day": minus(days=1),
        "utcdatehour_minus2day": minus(days=2),
        "utcdatehour_minus7day": minus(days=7),
        "utcdatehour": now.strftime(hour_fmt),
        "utctimestamp": str(int(now.timestamp())),
        "utcisotime": now.strftime("%Y-%m-%dT%H:%M:%SZ"),
    }


@dataclass
class QueryPack:
    """Mirror of QueryPackConfiguration (configuration.py:19-61)."""

    name: str
    description: str
    query: str                                   # with {param} placeholders
    tags: list[str] = field(default_factory=list)
    custom_params: dict[str, Callable[[], str]] = field(default_factory=dict)

    def generate_query_string(self, params: dict[str, str]) -> str:
        """str.format substitution kept identical to the reference
        (manager.py:195-201, configuration.py:40-58)."""
        merged = dict(params)
        for key, fn in self.custom_params.items():
            merged[key] = fn()
        return self.query.format(**merged)


class QueryPackRepository:
    """Named pack registry with tag selection (manager.py:235-253)."""

    def __init__(self) -> None:
        self._packs: dict[str, QueryPack] = {}

    def register(self, pack: QueryPack) -> QueryPack:
        if pack.name in self._packs:
            raise ValueError(f"duplicate query pack: {pack.name}")
        self._packs[pack.name] = pack
        return pack

    def get_packs(self, tags: list[str] | None = None) -> list[QueryPack]:
        if not tags:
            return list(self._packs.values())
        want = set(tags)
        return [p for p in self._packs.values() if want & set(p.tags)]


STREAMQUERY_SCHEMA_VERSION = "1.0.0"

# Feedback records ride the ingest stream as single messages, so each pack's
# payload must respect transport record limits — the reference's Kinesis
# put_records enforces 1 MB/record implicitly (kinesis.py:69-77 would fail
# the put); here the bound is pinned in code. MAX_FEEDBACK_ROWS also bounds
# the driver-side collect itself (the limit is pushed into the plan).
MAX_FEEDBACK_ROWS = 10_000
MAX_FEEDBACK_BYTES = 1_000_000


class ScheduledQueryRunner:
    """One schedule tick: run due packs, collect results + execution
    metadata, optionally feed them back into the stream as
    'streamquery:version' records (kinesis.py:29-86 shape)."""

    def __init__(self, spark: SparkSession, repository: QueryPackRepository):
        self.spark = spark
        self.repository = repository

    def run_pack(self, pack: QueryPack, params: dict[str, str]) -> tuple[DataFrame, dict]:
        sql = pack.generate_query_string(params)
        t0 = _time.perf_counter()
        df = self.spark.sql(sql)
        execution = {
            "name": pack.name,
            "description": pack.description,
            "query": sql,
            "query_parameters": params,
            "tags": pack.tags,
            "engine_execution_time_in_millis": int((_time.perf_counter() - t0) * 1000),
        }
        return df, execution

    def run(self, tags: list[str] | None = None,
            now: datetime | None = None) -> dict[str, tuple[DataFrame, dict]]:
        params = generate_time_parameters(now)
        return {
            pack.name: self.run_pack(pack, params)
            for pack in self.repository.get_packs(tags)
        }

    def to_streamquery_records(self, results: dict[str, tuple[DataFrame, dict]],
                               max_rows: int = MAX_FEEDBACK_ROWS,
                               max_bytes: int = MAX_FEEDBACK_BYTES) -> DataFrame:
        """Serialize results as streamquery-log-shaped JSON rows
        (conf/schemas/streamquery.json: streamquery_schema_version,
        execution{...}, data{headers, rows, count}) for union back into the
        ingest stream. Row payloads are expected to be aggregate-scale, but
        the bound is enforced, not assumed: the collect is LIMITed to
        max_rows + 1 (pushed into the plan — an unbounded result never
        reaches the driver) and the serialized record is trimmed from the
        tail to max_bytes, mirroring the transport's 1 MB record cap. A
        trimmed record carries data.truncated = true and data.count =
        rows kept (the schema's `data` map is open, so the extra key does
        not affect classification)."""
        rows = []
        for name, (df, execution) in results.items():
            headers = df.columns
            data_rows = [
                {k: ("" if v is None else str(v)) for k, v in r.asDict().items()}
                for r in df.limit(max_rows + 1).collect()
            ]
            truncated = len(data_rows) > max_rows
            data_rows = data_rows[:max_rows]

            def record(kept: list[dict], truncated: bool) -> str:
                data = {"headers": headers, "rows": kept, "count": len(kept)}
                if truncated:
                    data["truncated"] = True
                return json.dumps({
                    "streamquery_schema_version": STREAMQUERY_SCHEMA_VERSION,
                    "execution": {k: (v if isinstance(v, (str, int, list)) else str(v))
                                  for k, v in execution.items()},
                    "data": data,
                })

            payload = record(data_rows, truncated)
            while len(payload.encode()) > max_bytes and data_rows:
                # drop ~the overage's worth of tail rows per pass (>=1), so
                # trimming is O(passes), deterministic, and always terminates
                overshoot = len(payload.encode()) - max_bytes
                per_row = max(1, len(payload.encode()) // max(1, len(data_rows)))
                data_rows = data_rows[:-max(1, overshoot // per_row)]
                truncated = True
                payload = record(data_rows, truncated)
            if len(payload.encode()) > max_bytes:
                # the ENVELOPE alone (execution metadata incl. the full SQL
                # text) exceeds the record cap — no row trimming can fix
                # that; refuse deterministically rather than emit a record
                # the transport would reject (the reference's put_records
                # would fail the same way)
                raise ValueError(
                    f"streamquery feedback record for pack '{name}' exceeds "
                    f"{max_bytes} bytes with zero data rows "
                    f"({len(payload.encode())} bytes of envelope); shorten "
                    f"the pack query/description or raise max_bytes")
            rows.append((payload,))
        return local_rows_df(self.spark, rows, "value string")
