"""Config-directory loading — the reference's conf/ layout, verbatim.

Reference layout (streamalert/shared/config.py load_config):
- conf/schemas/*.json: {log_name: {schema: {...}, parser: ...,
  configuration: {...}}} — multiple files merge into one namespace;
- conf/clusters/*.json: per-cluster data_sources mapping
  {service: {resource: [log_names]}} that routes (service, resource) to
  its ordered candidate schemas (classifier.py:82-114).

A reference deployment's conf/ directory drops in unchanged.
"""

from __future__ import annotations

import json
from pathlib import Path

from streamalert_spark.schema.registry import SchemaRegistry


def load_conf_dir(path: str | Path) -> SchemaRegistry:
    """Build a SchemaRegistry (+routing) from a conf/ directory."""
    root = Path(path)
    registry = SchemaRegistry()

    schemas_dir = root / "schemas"
    for fp in sorted(schemas_dir.glob("*.json")) if schemas_dir.is_dir() else []:
        registry.register_dict(json.loads(fp.read_text()))

    clusters_dir = root / "clusters"
    for fp in sorted(clusters_dir.glob("*.json")) if clusters_dir.is_dir() else []:
        cluster = json.loads(fp.read_text())
        for service, resources in cluster.get("data_sources", {}).items():
            for resource, log_names in resources.items():
                # a data source may name a log family ('cloudwatch') or a
                # fully-qualified type ('cloudwatch:events') — expand
                # families in declared registry order (classifier.py:96-113)
                expanded: list[str] = []
                for name in log_names:
                    if name in registry.all():
                        expanded.append(name)
                    else:
                        expanded.extend(
                            n for n in registry.all() if n.split(":")[0] == name
                        )
                registry.route(service, resource, expanded)
    return registry


def normalizers_from_conf(registry: SchemaRegistry) -> dict:
    """Per-log-type Normalizers from each schema's ``configuration.
    normalization`` block (conf/schemas/*.json, normalize.py:130-173) —
    what the reference classifier wires at Normalizer.normalize time
    (classifier.py:191-198)."""
    from streamalert_spark.normalize import NormalizationSpec, Normalizer

    out = {}
    for name, schema in registry.all().items():
        cfg = schema.normalization
        if cfg:
            out[name] = Normalizer(NormalizationSpec.from_config(cfg))
    return out
