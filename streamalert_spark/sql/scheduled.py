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

    def to_streamquery_records(self, results: dict[str, tuple[DataFrame, dict]]) -> DataFrame:
        """Serialize results as streamquery-log-shaped JSON rows
        (conf/schemas/streamquery.json: streamquery_schema_version,
        execution{...}, data{headers, rows, count}) for union back into the
        ingest stream. Row payloads are bounded (aggregate outputs), so the
        local collect per pack mirrors the reference's Kinesis put."""
        rows = []
        for name, (df, execution) in results.items():
            headers = df.columns
            data_rows = [
                {k: ("" if v is None else str(v)) for k, v in r.asDict().items()}
                for r in df.collect()
            ]
            rows.append((json.dumps({
                "streamquery_schema_version": STREAMQUERY_SCHEMA_VERSION,
                "execution": {k: (v if isinstance(v, (str, int, list)) else str(v))
                              for k, v in execution.items()},
                "data": {"headers": headers, "rows": data_rows, "count": len(data_rows)},
            }),))
        return self.spark.createDataFrame(rows, "value string")
