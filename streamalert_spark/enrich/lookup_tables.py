"""Lookup tables: key->value enrichment.

Reference behavior (streamalert/shared/lookup_tables/): rules call
LookupTables.get(table, key, default) (core.py:43-66,141-152); storage is a
whole JSON file in S3 with a TTL cache (driver_s3.py:36-79) or a DynamoDB
table probed per key (driver_dynamodb.py:32-164).

Spark mapping (SURVEY.md §2.3):
- small S3-file-like tables -> a broadcast dict, refreshed per trigger —
  usable inside Python rule bodies exactly like the reference API;
- large Dynamo-like tables -> a DataFrame joined broadcast-hash on the key,
  used engine-side as a join (enrich_join) rather than point lookups.

At 100 TB the join form is the scale path: a broadcast join adds zero
shuffle, and the hint is size-gated (``gated_broadcast``) — a Dynamo-like
lookup table has no size bound by construction, so over the budget the
un-hinted equi-join falls back to AQE, which picks a shuffled hash/merge
join on the key.
"""

from __future__ import annotations

import json
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from streamalert_spark.ops.hints import gated_broadcast

DEFAULT_CACHE_REFRESH_MINUTES = 10  # conf/lookup_tables.json:5-18 default


class LookupTables:
    """Registry of named lookup tables (dict- or DataFrame-backed)."""

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._dicts: dict[str, Any] = {}          # broadcast handles
        self._frames: dict[str, DataFrame] = {}
        # file-backed tables: name -> (path, ttl_seconds, loaded_at)
        self._files: dict[str, tuple[str, float, float]] = {}

    # -- S3-file-like: broadcast dict ----------------------------------------
    def register_dict(self, name: str, data: dict) -> None:
        old = self._dicts.get(name)
        self._dicts[name] = self._spark.sparkContext.broadcast(data)
        if old is not None:
            old.unpersist()

    def register_json_file(
        self,
        name: str,
        path: str,
        cache_refresh_minutes: float = DEFAULT_CACHE_REFRESH_MINUTES,
    ) -> None:
        """Whole-file JSON table with TTL refresh (driver_s3.py:36-79,
        ``cache_refresh_minutes``): maybe_refresh() re-reads + re-broadcasts
        only after the TTL elapses — call it per trigger/batch."""
        with open(path) as fh:
            self.register_dict(name, json.load(fh))
        self._files[name] = (path, cache_refresh_minutes * 60.0, time.monotonic())

    def maybe_refresh(self, now: float | None = None) -> list[str]:
        """Reload every file-backed table whose TTL has lapsed
        (driver_s3.py:46-79). Returns the names refreshed. Spark shape of
        the reference's warm-container cache: the driver re-reads, the new
        broadcast replaces the old one for subsequent batches."""
        now = time.monotonic() if now is None else now
        refreshed = []
        for name, (path, ttl, loaded_at) in list(self._files.items()):
            if now - loaded_at >= ttl:
                with open(path) as fh:
                    self.register_dict(name, json.load(fh))
                self._files[name] = (path, ttl, now)
                refreshed.append(name)
        return refreshed

    def get(self, table: str, key: str, default=None):
        """The rule-facing API (core.py:141-152). Valid on the driver and
        inside executors (broadcast value)."""
        b = self._dicts.get(table)
        if b is None:
            return default
        return b.value.get(key, default)

    def broadcast_handle(self, table: str):
        """Pass this into rule closures; .value is the dict on executors."""
        return self._dicts[table]

    def view(self) -> "LookupTablesView":
        """Picklable accessor for rule closures (the reference's in-rule
        ``LookupTables.get(...)`` API, lookup_tables/core.py:141-152).

        Carries the broadcast-handle map by reference — NOT the session —
        so tables registered after the rule is built (e.g. golden-event
        ``test_fixtures.lookup_tables``) are visible when the task
        serializes at action time."""
        return LookupTablesView(self._dicts)

    # -- Dynamo-like: DataFrame join ------------------------------------------
    def register_frame(self, name: str, df: DataFrame, key_col: str = "key") -> None:
        self._frames[name] = df.withColumnRenamed(key_col, "__lookup_key")

    def enrich_join(
        self,
        df: DataFrame,
        table: str,
        key_col: str,
        value_cols: list[str] | None = None,
        how: str = "left",
    ) -> DataFrame:
        """Broadcast-hash join df against the lookup table on key_col."""
        lk = self._frames[table]
        if value_cols:
            lk = lk.select("__lookup_key", *value_cols)
        out = df.join(gated_broadcast(lk), df[key_col] == lk["__lookup_key"], how)
        return out.drop("__lookup_key")


class LookupTablesView:
    """Executor-safe lookup accessor: holds broadcast handles only.

    Rule bodies capture this in their closure; ``get`` reads the broadcast
    value, valid on the driver and inside Arrow-batched rule evaluation.
    """

    def __init__(self, dicts: dict[str, Any]):
        self._dicts = dicts

    def get(self, table: str, key: str, default=None):
        b = self._dicts.get(table)
        if b is None:
            return default
        return b.value.get(key, default)
