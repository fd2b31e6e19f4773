"""Log-schema registry.

The reference's conf/schemas/*.json declares named log types
('source:subtype', e.g. 'cloudwatch:cloudtrail') each with a field->type
map, a parser name, and parser configuration (json_path, envelope_keys,
delimiter, optional_top_level_keys, log_patterns, normalization...)
(reference: conf/schemas/cloudwatch.json, conf/schemas/osquery.json;
loading at streamalert/shared/config.py).

Here a LogSchema carries the same declaration; SchemaRegistry maps
(service, resource) -> ordered candidate schemas the classifier trial-parses
(reference: streamalert/classifier/classifier.py:82-149).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

from streamalert_spark.schema.types import schema_to_struct


@dataclass
class LogSchema:
    """One named log type: declared fields + parser + parser options."""

    name: str                      # 'source:subtype'
    schema: dict[str, Any]         # field -> type token (§1.2)
    parser: str = "json"           # json | csv | kv | syslog
    configuration: dict[str, Any] = field(default_factory=dict)

    @property
    def struct(self) -> T.StructType:
        return schema_to_struct(self.schema)

    @property
    def optional_top_level_keys(self) -> list[str]:
        return list(self.configuration.get("optional_top_level_keys", []))

    @property
    def required_keys(self) -> set[str]:
        return set(self.schema) - set(self.optional_top_level_keys)

    @property
    def envelope_keys(self) -> dict[str, Any]:
        return dict(self.configuration.get("envelope_keys", {}))

    @property
    def json_path(self) -> str | None:
        return self.configuration.get("json_path")

    @property
    def json_regex_key(self) -> str | None:
        return self.configuration.get("json_regex_key")

    @property
    def log_patterns(self) -> dict[str, list[str]]:
        return dict(self.configuration.get("log_patterns", {}))

    @property
    def normalization(self) -> dict[str, Any]:
        return dict(self.configuration.get("normalization", {}))


class SchemaRegistry:
    """Named schemas + (service, resource) -> candidate-schema routing.

    Mirrors Classifier._load_logs_for_resource (classifier.py:82-114): the
    cluster config assigns each data source a list of log-type names; trial
    parsing walks them in declared order and the first full parse wins.
    """

    def __init__(self) -> None:
        self._schemas: dict[str, LogSchema] = {}
        self._routing: dict[tuple[str, str], list[str]] = {}

    def register(self, schema: LogSchema) -> LogSchema:
        if schema.name in self._schemas:
            raise ValueError(f"duplicate log schema: {schema.name}")
        self._schemas[schema.name] = schema
        return schema

    def register_dict(self, schemas: dict[str, dict[str, Any]]) -> None:
        """Load a conf/schemas-style dict: {name: {schema: {...}, parser: ...,
        configuration: {...}}}."""
        for name, spec in schemas.items():
            self.register(
                LogSchema(
                    name=name,
                    schema=spec["schema"],
                    parser=spec.get("parser", "json"),
                    configuration=spec.get("configuration", {}),
                )
            )

    def route(self, service: str, resource: str, log_names: list[str]) -> None:
        for name in log_names:
            if name not in self._schemas:
                raise ValueError(f"unknown log schema in routing: {name}")
        self._routing[(service, resource)] = list(log_names)

    def get(self, name: str) -> LogSchema:
        return self._schemas[name]

    def candidates(self, service: str, resource: str) -> list[LogSchema]:
        names = self._routing.get((service, resource))
        if names is None:
            # no explicit routing: every schema is a candidate, declared order
            names = list(self._schemas)
        return [self._schemas[n] for n in names]

    def all(self) -> dict[str, LogSchema]:
        return dict(self._schemas)
